"""K5 Pallas int8 block-conv kernel (dynseg/ops/pallas_conv.py): the
quantized serving forward through the kernel must match the XLA emitter
path — same quantized tree, same calibration — at interpret-mode CPU
tolerances (the epilogue runs f32 in-kernel vs the compute-dtype XLA
chain, so near-exact, argmax-exact)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynseg.config import ModelConfig
from dynseg.models.dilated import build_model
from dynseg.ops import quant as Q
from dynseg.ops import pallas_conv


def _quantized_setup(use_bn=True, hw=24, seed=0):
    # FULL-width model: the kernel needs >=128-channel blocks (the same
    # gate as the int8 plan itself).
    mcfg = ModelConfig(net_type="dilated_icpr_rate6", num_classes=4,
                       num_input_bands=3, use_batch_norm=use_bn,
                       quant_conv="xla")
    model = build_model(mcfg)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(
        scale=1.0, size=(1, hw, hw, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(seed), x, train=False)
    ranges = Q.calibrate(mcfg, variables, [x])
    qvars = Q.quantize_variables(mcfg, variables, ranges)
    return mcfg, qvars, x


def test_supported_gate():
    assert pallas_conv.supported(592, 256, 256, 3, 6)
    assert pallas_conv.supported(592, 128, 256, 3, 5)
    assert pallas_conv.supported(592, 128, 128, 4, 4)
    assert not pallas_conv.supported(592, 64, 128, 3, 2)  # lane tiling
    assert not pallas_conv.supported(4096, 256, 256, 3, 6)  # VMEM


@pytest.mark.parametrize("use_bn", [True, False])
@pytest.mark.parametrize("hw", [24, 21])  # 21: the row-padding path
def test_pallas_quant_forward_matches_xla(use_bn, hw):
    mcfg, qvars, x = _quantized_setup(use_bn=use_bn, hw=hw)
    ref = Q.make_apply(mcfg)(qvars, x, train=False)
    pcfg = dataclasses.replace(mcfg, quant_conv="pallas")
    got = Q.make_apply(pcfg)(qvars, x, train=False)
    ref, got = np.asarray(ref), np.asarray(got)
    # logits: near-exact (f32 in-kernel epilogue vs compute-dtype XLA
    # chain); labels: identical
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-2)
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))


def test_pallas_kernel_matches_emitter_directly():
    """The raw kernel (no net): int8 conv + affine + leaky + requant
    against the same ops composed in XLA, exact int8 equality on the
    requant output."""
    rng = np.random.default_rng(3)
    cin = cout = 128
    k, dil = 3, 5
    x = jnp.asarray(rng.integers(-127, 127, (2, 24, 22, cin),
                                 dtype=np.int8))
    w = jnp.asarray(rng.integers(-8, 8, (k, k, cin, cout), dtype=np.int8))
    a = jnp.asarray(rng.uniform(1e-4, 3e-4, (cout,)).astype(np.float32))
    b = jnp.asarray(rng.normal(scale=0.1, size=(cout,)).astype(np.float32))
    out_scale = 0.05

    acc = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", rhs_dilation=(dil, dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * a + b
    y = jnp.where(y >= 0, y, y * 0.1)
    want = jnp.round(jnp.clip(y / out_scale, -127, 127)).astype(jnp.int8)

    got = pallas_conv.int8_block_conv(
        x, w, a, b, dilation=dil, leaky_slope=0.1, out_scale=out_scale,
        interpret=jax.devices()[0].platform != "tpu")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_kernel_even_kernel_4x4():
    """Block_3's geometry: 4x4 kernel, dilation 4 (asymmetric-extent
    SAME padding)."""
    rng = np.random.default_rng(4)
    cin = cout = 128
    k, dil = 4, 4
    x = jnp.asarray(rng.integers(-64, 64, (1, 16, 19, cin),
                                 dtype=np.int8))
    w = jnp.asarray(rng.integers(-4, 4, (k, k, cin, cout), dtype=np.int8))
    a = jnp.full((cout,), 2e-4, jnp.float32)
    b = jnp.zeros((cout,), jnp.float32)

    acc = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", rhs_dilation=(dil, dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * a + b
    want = jnp.where(y >= 0, y, y * 0.1).astype(jnp.bfloat16)

    got = pallas_conv.int8_block_conv(
        x, w, a, b, dilation=dil, leaky_slope=0.1,
        interpret=jax.devices()[0].platform != "tpu")
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0, atol=1e-2)


def test_export_falls_back_to_xla_under_symbolic_shapes():
    """jax.export traces shape-polymorphic, multi-platform programs —
    a Mosaic custom call is neither, so the quantized export must route
    through the XLA emitter even with quant_conv='pallas'."""
    from jax import export as jexport

    mcfg, qvars, x = _quantized_setup(hw=24)
    pcfg = dataclasses.replace(mcfg, quant_conv="pallas")
    apply_fn = Q.make_apply(pcfg)

    def probs(xx):
        return jax.nn.softmax(apply_fn(qvars, xx, train=False), -1)

    b, h, w = jexport.symbolic_shape("b, h, w")
    spec = jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32)
    exported = jexport.export(jax.jit(probs), platforms=("cpu",))(spec)
    got = np.asarray(exported.call(x))  # runs the XLA path
    want = np.asarray(jax.nn.softmax(
        Q.make_apply(mcfg)(qvars, x, train=False), -1))
    # exported programs may pick different conv algorithms — close in
    # softmax space (near-tie pixels can flip labels either way, same
    # as any algorithm change; the pallas-vs-xla argmax exactness is
    # pinned separately above)
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-3)


def test_quant_conv_default_is_xla():
    """The K5 measurement decided the default (DESIGN.md K5): the fused
    emitter wins in the full net. A silent default flip would re-ship
    the measured 1.7x in-net loss."""
    from dynseg.config import ModelConfig

    assert ModelConfig().quant_conv == "xla"
    from dynseg.cli import build_argparser

    a = next(a for a in build_argparser()._actions
             if "--quant_conv" in a.option_strings)
    assert a.default == "xla"
