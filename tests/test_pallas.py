"""Pallas K2 gather kernel parity vs the XLA fallback (SURVEY.md §4).

Runs in Mosaic interpret mode so correctness is checked on CPU CI; the
same kernel is parity-checked on real hardware by scripts/tpu_checks.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from dynseg.ops.gather import dihedral_batch, gather_batch
from dynseg.ops.pallas_gather import pallas_gather_supported


@pytest.mark.parametrize("size", [9, 16, 25])
def test_pallas_gather_matches_fallback(size, rng):
    T, H, W, C = 3, 80, 70, 3
    images = rng.normal(size=(T, H, W, C)).astype(np.float32)
    masks = rng.integers(0, 4, (T, H, W)).astype(np.int32)
    mean = images.mean((0, 1, 2)).astype(np.float32)
    std = images.std((0, 1, 2)).astype(np.float32)
    B = 16
    half = size // 2
    pos = np.stack(
        [
            rng.integers(0, T, B),
            rng.integers(half, H - size + half, B),
            rng.integers(half, W - size + half, B),
        ],
        axis=1,
    ).astype(np.int32)
    aug = rng.integers(0, 8, B).astype(np.int32)

    with pltpu.force_tpu_interpret_mode():
        ip, lp = gather_batch(
            images, masks, mean, std, pos, aug, size, use_pallas=True
        )
    ij, lj = gather_batch(
        images, masks, mean, std, pos, aug, size, use_pallas=False
    )
    np.testing.assert_allclose(np.asarray(ip), np.asarray(ij), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(lp), np.asarray(lj))


def test_pallas_gather_edge_positions(rng):
    """Patch centers at the extreme valid corners (offset-alignment edge
    cases: row/lane residuals 0 and max)."""
    size, T, H, W, C = 8, 1, 40, 40, 3
    images = rng.normal(size=(T, H, W, C)).astype(np.float32)
    masks = rng.integers(0, 2, (T, H, W)).astype(np.int32)
    mean = np.zeros(C, np.float32)
    std = np.ones(C, np.float32)
    half = size // 2
    corners = [
        (0, half, half),
        (0, H - size + half, W - size + half),
        (0, half, W - size + half),
        (0, H - size + half, half),
        (0, 8 + half, 8 + half),
    ]
    pos = np.array(corners, dtype=np.int32)
    aug = np.zeros(len(corners), np.int32)
    with pltpu.force_tpu_interpret_mode():
        ip, lp = gather_batch(
            images, masks, mean, std, pos, aug, size, use_pallas=True
        )
    ij, lj = gather_batch(
        images, masks, mean, std, pos, aug, size, use_pallas=False
    )
    np.testing.assert_allclose(np.asarray(ip), np.asarray(ij), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(lp), np.asarray(lj))


def test_dihedral_batch_matches_numpy(rng):
    B, s, C = 16, 7, 3
    x = rng.normal(size=(B, s, s, C)).astype(np.float32)
    k = np.arange(16, dtype=np.int32) % 8
    out = np.asarray(dihedral_batch(x, k))
    for b in range(B):
        ref = x[b]
        kk = k[b]
        if kk >= 4:
            ref = np.flip(ref, axis=1)
            kk -= 4
        ref = np.rot90(ref, kk, (0, 1))
        np.testing.assert_allclose(out[b], ref, atol=1e-6)


def test_vmem_budget_guard():
    # tiny config fits; absurd batch does not
    assert pallas_gather_supported((4, 300, 300, 3), 25, 100)
    assert not pallas_gather_supported((4, 300, 300, 3), 65, 100000)


def test_pallas_gather_uint8_storage(rng):
    """uint8 device tiles (lossless integer imagery): pallas and XLA
    paths agree, and values match the float pipeline exactly."""
    T, H, W, C = 2, 60, 56, 3
    images_u8 = rng.integers(0, 256, (T, H, W, C)).astype(np.uint8)
    images_f32 = images_u8.astype(np.float32)
    masks = rng.integers(0, 4, (T, H, W)).astype(np.uint8)
    mean = images_f32.mean((0, 1, 2)).astype(np.float32)
    std = images_f32.std((0, 1, 2)).astype(np.float32)
    size, B = 9, 12
    half = size // 2
    pos = np.stack(
        [rng.integers(0, T, B),
         rng.integers(half, H - size + half, B),
         rng.integers(half, W - size + half, B)], 1).astype(np.int32)
    aug = rng.integers(0, 8, B).astype(np.int32)
    with pltpu.force_tpu_interpret_mode():
        ip, lp = gather_batch(images_u8, masks, mean, std, pos, aug, size,
                              use_pallas=True)
    ij, lj = gather_batch(images_u8, masks, mean, std, pos, aug, size,
                          use_pallas=False)
    if32, lf32 = gather_batch(images_f32, masks.astype(np.int32), mean, std,
                              pos, aug, size, use_pallas=False)
    np.testing.assert_allclose(np.asarray(ip), np.asarray(ij), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ip), np.asarray(if32), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(lp), np.asarray(lj))
    np.testing.assert_array_equal(np.asarray(lp), np.asarray(lf32))


def test_storage_dtype_selection(rng):
    from dynseg.data.tiles import storage_dtype

    assert storage_dtype(np.array([[0.0, 255.0]])) == np.uint8
    assert storage_dtype(np.array([[0.5, 12.0]])) == np.float32
    assert storage_dtype(np.array([[-1.0, 3.0]])) == np.float32
    assert storage_dtype(np.array([[0.0, 256.0]])) == np.float32


# --------------------------------------------------------------------- #
# K4 attempt 5: (H*W, C)-layout Pallas pool backward (DESIGN.md K4).
# --------------------------------------------------------------------- #

def _xla_pool_grad(x, g, window=3):
    import dynseg.ops.pool as pool

    _, vjp = jax.vjp(lambda v: pool.pool_forward(v, window), x)
    return vjp(g)[0]


def test_pallas_pool_bwd_matches_xla_no_ties(rng):
    """With all-distinct window values the tie-split and first-max
    subgradients coincide — the kernel must match XLA select_and_scatter
    exactly."""
    import dynseg.ops.pool as pool

    b, h, w, c = 2, 7, 5, 8
    # distinct values guarantee no ties
    x = jnp.asarray(
        rng.permutation(b * h * w * c).reshape(b, h, w, c).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    y = pool.pool_forward(x)
    dx = pool.pallas_pool_bwd(x, y, g, interpret=True)
    np.testing.assert_allclose(np.asarray(dx),
                               np.asarray(_xla_pool_grad(x, g)), atol=1e-5)


def test_pallas_pool_bwd_tie_split_conserves_mass(rng):
    """Plateaus (common under stacked stride-1 pools): the kernel splits
    each window's gradient equally across argmax ties; total gradient
    mass equals sum(g) either way."""
    import dynseg.ops.pool as pool

    b, h, w, c = 1, 6, 6, 8
    x = jnp.asarray(
        (rng.integers(0, 3, size=(b, h, w, c))).astype(np.float32))  # ties
    g = jnp.asarray(rng.uniform(1, 2, size=(b, h, w, c)).astype(np.float32))
    y = pool.pool_forward(x)
    dx = pool.pallas_pool_bwd(x, y, g, interpret=True)
    np.testing.assert_allclose(float(dx.sum()), float(g.sum()), rtol=1e-5)
    # an all-equal window splits its gradient 1/9 per tap
    x0 = jnp.zeros((1, 9, 9, 8), jnp.float32)
    g0 = jnp.ones_like(x0)
    dx0 = pool.pallas_pool_bwd(x0, pool.pool_forward(x0), g0, interpret=True)
    np.testing.assert_allclose(float(dx0[0, 4, 4, 0]), 1.0, rtol=1e-5)


def test_pallas_pool_bwd_window5(rng):
    import dynseg.ops.pool as pool

    x = jnp.asarray(rng.permutation(8 * 8 * 8).reshape(1, 8, 8, 8)
                    .astype(np.float32))
    g = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    y = pool.pool_forward(x, window=5)
    dx = pool.pallas_pool_bwd(x, y, g, window=5, interpret=True)
    np.testing.assert_allclose(np.asarray(dx),
                               np.asarray(_xla_pool_grad(x, g, 5)), atol=1e-5)


def test_max_pool_s1_custom_vjp_grad(rng):
    """End-to-end custom_vjp: gradient through max_pool_s1 equals the
    XLA pool gradient on tie-free input (interpret-safe on CPU via the
    support gate fallback)."""
    import dynseg.ops.pool as pool

    x = jnp.asarray(rng.permutation(5 * 6 * 8).reshape(1, 5, 6, 8)
                    .astype(np.float32))

    def loss_custom(v):
        return (pool.max_pool_s1(v) ** 2).sum()

    def loss_xla(v):
        return (pool.pool_forward(v) ** 2).sum()

    g1 = jax.grad(loss_custom)(x)
    g2 = jax.grad(loss_xla)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_pallas_pool_bwd_even_window_rejected():
    """Even SAME windows have an asymmetric footprint the symmetric tap
    set cannot express — the gate must refuse and the kernel assert."""
    import dynseg.ops.pool as pool

    assert not pool.pallas_pool_bwd_supported((1, 8, 8, 8), jnp.float32,
                                              window=2)
    x = jnp.zeros((1, 8, 8, 8), jnp.float32)
    with pytest.raises(AssertionError, match="even window"):
        pool.pallas_pool_bwd(x, x, x, window=2, interpret=True)


def test_gather_supported_is_dtype_aware():
    """review r2 (round 2): the VMEM estimate mixed the uint8 row count
    (32-row tiles) with 4-byte elements, overestimating uint8 scratch 4x
    and spuriously falling back to the XLA gather for batches that fit."""
    shape = (4, 300, 300, 5)
    # batch chosen so uint8 fits but f32 does not: outputs 88*65*65*6*4
    # = 8.9 MB; u8 scratch 0.66 MB (total 9.6 < 10 MB budget), f32
    # scratch 1.6 MB (total 10.5 > budget).
    assert pallas_gather_supported(shape, 65, 88, np.uint8)
    assert not pallas_gather_supported(shape, 65, 88, np.float32)
    # dtype=None keeps a conservative worst case over both
    assert pallas_gather_supported(shape, 65, 88) == \
        pallas_gather_supported(shape, 65, 88, np.float32)


def test_pool_backward_fallback_warns_and_matches_xla():
    """review r2 (round 2): --pool_backward pallas silently no-opped on
    unsupported shapes/backends (e.g. bf16, C%8!=0, CPU) — the user
    believed the K4 kernel was active. The fallback now warns at trace
    time and still computes the exact XLA VJP; the dead y residual is
    no longer saved."""
    import warnings as _w

    from dynseg.ops import pool as pool_mod
    from dynseg.ops.pool import max_pool_s1, pool_forward

    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(2, 7, 7, 12)).astype(np.float32))  # C%8!=0 -> unsupported

    def loss(v):
        return max_pool_s1(v, 3).sum()

    pool_mod._warned_fallbacks.clear()
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        g = jax.grad(loss)(x)
    assert any("falling back to the XLA VJP" in str(r.message) for r in rec)

    def ref_loss(v):
        return pool_forward(v, 3).sum()

    np.testing.assert_allclose(np.asarray(g),
                               np.asarray(jax.grad(ref_loss)(x)), atol=1e-6)
