"""The five dilated network variants (SURVEY.md C6–C10).

All variants: stacks of DilatedConvBlock with ramping dilation rates and a
1x1-conv score head; stride-1 everywhere, so logits have the same spatial
shape as the input for ANY patch size.

Architecture details are reconstructions (reference mount empty — SURVEY.md
§0 provenance warning). Kernel/channel/dilation schedules follow the TGRS'19
paper's tables as surveyed:
  * dilated_icpr_rate6:        k=5,5,4,4,3,3  ch=64,64,128,128,256,256  d=1..6
  * dilated_icpr_rate6_densely: same stack with dense (concat) connectivity
  * dilated_grsl:              k=5,5,4,4,3    ch=64,64,128,128,256      d=1..5
  * dilated_grsl_rate8:        k=5,5,4,4,3,3  ch=64,64,128,128,192,192  d=1,2,3,4,6,8
  * dilated_icpr_original:     icpr stack with all dilations = 1 (baseline)
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from dynseg.config import ModelConfig
from dynseg.models.blocks import DilatedConvBlock, ScoreHead

# (kernel, features, dilation, pool) per block.
_ARCH: dict[str, Tuple[Tuple[int, int, int, bool], ...]] = {
    "dilated_icpr_rate6": (
        (5, 64, 1, True),
        (5, 64, 2, True),
        (4, 128, 3, True),
        (4, 128, 4, True),
        (3, 256, 5, True),
        (3, 256, 6, True),
    ),
    "dilated_icpr_original": (
        (5, 64, 1, True),
        (5, 64, 1, True),
        (4, 128, 1, True),
        (4, 128, 1, True),
        (3, 256, 1, True),
        (3, 256, 1, True),
    ),
    "dilated_grsl": (
        (5, 64, 1, True),
        (5, 64, 2, True),
        (4, 128, 3, True),
        (4, 128, 4, True),
        (3, 256, 5, True),
    ),
    "dilated_grsl_rate8": (
        (5, 64, 1, True),
        (5, 64, 2, True),
        (4, 128, 3, True),
        (4, 128, 4, True),
        (3, 192, 6, True),
        (3, 192, 8, True),
    ),
}


class DilatedNet(nn.Module):
    """Sequential dilated ConvNet (icpr_rate6 / grsl / grsl_rate8 / original)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dtype = jnp.dtype(self.cfg.compute_dtype)
        for k, feats, dil, pool in _ARCH[self.cfg.net_type]:
            x = DilatedConvBlock(
                features=max(1, int(feats * self.cfg.width_multiplier)),
                kernel=k,
                dilation=dil,
                leaky_slope=self.cfg.leaky_slope,
                use_batch_norm=self.cfg.use_batch_norm,
                bn_momentum=self.cfg.bn_momentum,
                pool=pool,
                pool_window=self.cfg.pool_window,
                pool_backward=self.cfg.pool_backward,
                compute_dtype=dtype,
            )(x, train=train)
        if self.cfg.dropout_rate > 0:
            x = nn.Dropout(rate=self.cfg.dropout_rate, deterministic=not train)(x)
        return ScoreHead(self.cfg.num_classes, compute_dtype=dtype)(x)


class DilatedDenseNet(nn.Module):
    """dilated_icpr_rate6_densely: icpr stack with dense connectivity —
    each block consumes the channel-concat of all previous block outputs
    (SURVEY.md C7, MED confidence on exact wiring)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dtype = jnp.dtype(self.cfg.compute_dtype)
        feats_so_far = [x.astype(dtype)]
        for k, feats, dil, pool in _ARCH["dilated_icpr_rate6"]:
            inp = jnp.concatenate(feats_so_far, axis=-1)
            out = DilatedConvBlock(
                features=max(1, int(feats * self.cfg.width_multiplier)),
                kernel=k,
                dilation=dil,
                leaky_slope=self.cfg.leaky_slope,
                use_batch_norm=self.cfg.use_batch_norm,
                bn_momentum=self.cfg.bn_momentum,
                pool=pool,
                pool_window=self.cfg.pool_window,
                pool_backward=self.cfg.pool_backward,
                compute_dtype=dtype,
            )(inp, train=train)
            feats_so_far.append(out)
        x = jnp.concatenate(feats_so_far[1:], axis=-1)
        if self.cfg.dropout_rate > 0:
            x = nn.Dropout(rate=self.cfg.dropout_rate, deterministic=not train)(x)
        return ScoreHead(self.cfg.num_classes, compute_dtype=dtype)(x)


def receptive_radius(cfg: ModelConfig) -> int:
    """Receptive-field RADIUS of a variant (half the diameter, rounded
    up — even kernels have an asymmetric SAME footprint). Dense-mode
    blockwise inference is exact iff its halo >= this (infer.py); the
    CLI warns when a user-supplied --dense_halo falls short."""
    arch = _ARCH["dilated_icpr_rate6"] if (
        cfg.net_type == "dilated_icpr_rate6_densely") else _ARCH[cfg.net_type]
    diameter = 1
    for k, _, dil, pool in arch:
        diameter += (k - 1) * dil
        if pool:
            diameter += cfg.pool_window - 1
    return (diameter - 1 + 1) // 2


def build_model(cfg: ModelConfig) -> nn.Module:
    """Model factory mirroring the reference's net_type dispatch
    ([R] dynamic.py:≈model_factory; SURVEY.md L1)."""
    if cfg.net_type == "dilated_icpr_rate6_densely":
        return DilatedDenseNet(cfg)
    if cfg.net_type in _ARCH:
        return DilatedNet(cfg)
    raise ValueError(f"unknown net_type: {cfg.net_type!r}")
