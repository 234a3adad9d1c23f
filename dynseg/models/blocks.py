"""Building blocks for the dilated segmentation networks.

Every block is stride-1 / SAME so spatial resolution is preserved end-to-end
— the invariant that lets one parameter set serve any patch size and makes
dynamic multi-context training and multi-scale test fusion possible
(SURVEY.md §3.3). Rebuilt TPU-first: convolutions lower to
`lax.conv_general_dilated` in NHWC, which XLA tiles onto the MXU and fuses
with bias/BN/activation; the optional Pallas path (dynseg.ops.conv_block)
covers what XLA does not fuse.

Reference anchors (reconstructed, mount was empty — see SURVEY.md §0):
[R] dynamic.py:≈_conv_layer/_max_pool helpers (conv → batch_norm →
leaky_relu → stride-1 max-pool).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class DilatedConvBlock(nn.Module):
    """conv(dilated, SAME, stride1) → [BN] → leaky-ReLU → [3x3 stride-1 max-pool].

    Mirrors the reference `_conv_layer` + `_max_pool` pair (SURVEY.md C6).
    """

    features: int
    kernel: int
    dilation: int = 1
    leaky_slope: float = 0.1
    use_batch_norm: bool = True
    # BN running-statistics momentum. 0.9 = reference-parity default
    # (TF-era BN). The r4 collapse diagnosis showed the late-LR
    # oscillation is BN-COUPLED (BENCHMARKS.md "Params EMA" follow-up 2:
    # without BN the collapse cell does not collapse) — a slower
    # statistics track (0.99) is the testable knob on that feedback loop.
    bn_momentum: float = 0.9
    pool: bool = True
    pool_window: int = 3
    pool_backward: str = "xla"
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.astype(self.compute_dtype)
        x = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel, self.kernel),
            strides=(1, 1),
            padding="SAME",
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=not self.use_batch_norm,
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
        )(x)
        if self.use_batch_norm:
            # Runs in compute_dtype: flax computes the batch statistics in
            # float32 internally regardless, and keeping activations in
            # bfloat16 avoids a cast ping-pong per block that would force
            # extra full-precision HBM passes (measured: it erased the
            # whole bf16 speedup).
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=1e-5,
                dtype=self.compute_dtype,
                param_dtype=jnp.float32,
            )(x)
        x = nn.leaky_relu(x, negative_slope=self.leaky_slope)
        if self.pool:
            # Stride-1 SAME max pool: local max filtering without
            # downsampling ([R] dynamic.py:≈_max_pool). Its backward
            # (select_and_scatter, ~23% of the train step) was pressure-
            # tested against four alternatives (docs/DESIGN.md "Kernel
            # decisions"); attempt 5 is the opt-in (H*W, C) Pallas
            # kernel (ops/pool.py, --pool_backward pallas).
            if self.pool_backward == "pallas":
                from dynseg.ops.pool import max_pool_s1

                x = max_pool_s1(x, self.pool_window)
            else:
                x = nn.max_pool(
                    x,
                    window_shape=(self.pool_window, self.pool_window),
                    strides=(1, 1),
                    padding="SAME",
                )
        return x


class ScoreHead(nn.Module):
    """1x1 conv producing per-pixel class logits (SURVEY.md §3.3 head)."""

    num_classes: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            features=self.num_classes,
            kernel_size=(1, 1),
            padding="SAME",
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
        )(x)
        # Logits always in float32 for a stable softmax-CE.
        return x.astype(jnp.float32)
