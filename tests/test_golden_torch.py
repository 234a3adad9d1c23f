"""Cross-framework golden test: the Flax dilated blocks must numerically
match an independent PyTorch implementation of the same layer semantics
(conv SAME/stride-1 with kernel dilation -> BN -> leaky ReLU -> 3x3
stride-1 SAME max pool). The reference is TF1; since its exact graph is
unavailable (SURVEY.md §0), agreement between two independent
implementations of the documented semantics is the strongest available
evidence that the layer math is right (SURVEY.md §4 parity strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from dynseg.config import ModelConfig
from dynseg.models.blocks import DilatedConvBlock
from dynseg.models.dilated import build_model


def torch_block(x, kernel_w, bias, bn, dilation, leaky_slope, pool_window):
    """(B,H,W,C) numpy -> torch NCHW block forward -> (B,H,W,C) numpy."""
    import torch.nn.functional as F

    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).double()
    w = torch.from_numpy(np.transpose(kernel_w, (3, 2, 0, 1))).double()  # HWIO->OIHW
    t = F.conv2d(t, w, bias=None if bias is None else torch.from_numpy(bias).double(),
                 stride=1, padding="same", dilation=dilation)
    if bn is not None:
        mean, var, scale, offset = (torch.from_numpy(v).double() for v in bn)
        t = (t - mean[:, None, None]) / torch.sqrt(var[:, None, None] + 1e-5)
        t = t * scale[:, None, None] + offset[:, None, None]
    t = F.leaky_relu(t, negative_slope=leaky_slope)
    if pool_window:
        assert pool_window % 2 == 1
        t = F.max_pool2d(t, kernel_size=pool_window, stride=1,
                         padding=pool_window // 2)
    return np.transpose(t.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("kernel,dilation,use_bn", [
    (5, 1, False), (5, 2, True), (4, 3, False), (3, 6, True),
])
def test_block_matches_torch(rng, kernel, dilation, use_bn):
    B, H, W, C, F_ = 2, 21, 19, 5, 8
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)
    block = DilatedConvBlock(
        features=F_, kernel=kernel, dilation=dilation, leaky_slope=0.1,
        use_batch_norm=use_bn, pool=True, pool_window=3,
    )
    variables = block.init(jax.random.key(0), jnp.asarray(x), train=False)
    params = variables["params"]

    out_jax = np.asarray(block.apply(variables, jnp.asarray(x), train=False))

    kw = np.asarray(params["Conv_0"]["kernel"])
    bias = np.asarray(params["Conv_0"]["bias"]) if not use_bn else None
    bn = None
    if use_bn:
        bn = (
            np.asarray(variables["batch_stats"]["BatchNorm_0"]["mean"]),
            np.asarray(variables["batch_stats"]["BatchNorm_0"]["var"]),
            np.asarray(params["BatchNorm_0"]["scale"]),
            np.asarray(params["BatchNorm_0"]["bias"]),
        )
    out_ref = torch_block(x, kw, bias, bn, dilation, 0.1, 3)
    np.testing.assert_allclose(out_jax, out_ref, atol=2e-5, rtol=1e-5)


def _torch_block_from_vars(t, params, stats, dilation, leaky_slope, pool_window):
    bn = (
        np.asarray(stats["BatchNorm_0"]["mean"]),
        np.asarray(stats["BatchNorm_0"]["var"]),
        np.asarray(params["BatchNorm_0"]["scale"]),
        np.asarray(params["BatchNorm_0"]["bias"]),
    )
    return torch_block(t.astype(np.float64), np.asarray(params["Conv_0"]["kernel"]),
                       None, bn, dilation, leaky_slope, pool_window)


@pytest.mark.parametrize("net_type", [
    "dilated_icpr_rate6", "dilated_icpr_original",
    "dilated_grsl", "dilated_grsl_rate8",
])
def test_full_net_matches_torch_composition(rng, net_type):
    """Every sequential variant end-to-end: compose the torch reference
    blocks with the Flax net's own weights and compare final logits."""
    cfg = ModelConfig(net_type=net_type, num_classes=4,
                      num_input_bands=3, width_multiplier=0.25,
                      use_batch_norm=True)
    model = build_model(cfg)
    x = rng.normal(size=(2, 17, 17, 3)).astype(np.float32)
    variables = model.init(jax.random.key(1), jnp.asarray(x), train=False)
    out_jax = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    from dynseg.models.dilated import _ARCH

    params = variables["params"]
    stats = variables["batch_stats"]
    t = x
    for i, (k, _, d, _) in enumerate(_ARCH[net_type]):
        t = _torch_block_from_vars(
            t, params[f"DilatedConvBlock_{i}"], stats[f"DilatedConvBlock_{i}"],
            d, cfg.leaky_slope, cfg.pool_window)
    # 1x1 score head
    hp = params["ScoreHead_0"]["Conv_0"]
    kw = np.asarray(hp["kernel"])  # (1,1,Cin,nc)
    out_ref = t @ kw[0, 0] + np.asarray(hp["bias"])
    np.testing.assert_allclose(out_jax, out_ref, atol=5e-5, rtol=1e-4)


def test_dense_net_matches_torch_composition(rng):
    """dilated_icpr_rate6_densely: the torch composition must reproduce the
    dense concat wiring (block i consumes [input, out_1..out_{i-1}]; head
    consumes concat of all block outputs, input excluded)."""
    cfg = ModelConfig(net_type="dilated_icpr_rate6_densely", num_classes=3,
                      num_input_bands=3, width_multiplier=0.125,
                      use_batch_norm=True)
    model = build_model(cfg)
    x = rng.normal(size=(2, 13, 13, 3)).astype(np.float32)
    variables = model.init(jax.random.key(2), jnp.asarray(x), train=False)
    out_jax = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    from dynseg.models.dilated import _ARCH

    params = variables["params"]
    stats = variables["batch_stats"]
    feats = [x.astype(np.float64)]
    for i, (k, _, d, _) in enumerate(_ARCH["dilated_icpr_rate6"]):
        inp = np.concatenate(feats, axis=-1)
        out = _torch_block_from_vars(
            inp, params[f"DilatedConvBlock_{i}"], stats[f"DilatedConvBlock_{i}"],
            d, cfg.leaky_slope, cfg.pool_window)
        feats.append(out)
    t = np.concatenate(feats[1:], axis=-1)
    hp = params["ScoreHead_0"]["Conv_0"]
    out_ref = t @ np.asarray(hp["kernel"])[0, 0] + np.asarray(hp["bias"])
    np.testing.assert_allclose(out_jax, out_ref, atol=5e-5, rtol=1e-4)
