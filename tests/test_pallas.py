"""Pallas K2 gather kernel parity vs the XLA fallback (SURVEY.md §4).

Runs in Mosaic interpret mode so correctness is checked on CPU CI; the
same kernel is parity-checked on real hardware by scripts/tpu_checks.py.
"""

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
