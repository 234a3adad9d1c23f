"""Native (C++) position-table builder: exact parity with the numpy
fallback, permutation-correct shuffling, and sampler integration."""

import numpy as np
import pytest

from dynseg.data import native
from dynseg.data.sampler import BalancedPatchSampler
from dynseg.data.tiles import pack_tiles

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (g++ missing?)"
)


def test_tables_match_numpy(rng):
    masks = rng.integers(0, 5, size=(3, 64, 48)).astype(np.int32)
    masks[0, :3] = 255  # IGNORE rows skipped
    tables = native.build_position_tables(masks, 5)
    for c in range(5):
        t, r, cc = np.nonzero(masks == c)
        ref = np.stack([t, r, cc], axis=1).astype(np.int32)
        np.testing.assert_array_equal(tables[c], ref)


def test_large_volume_counts(rng):
    # >1M pixels takes the multithreaded-counting branch when the host has
    # cores (on 1-vCPU hosts hardware_concurrency caps it back to 1 —
    # see test_forced_multithread_counts for the cross-thread parity check)
    masks = rng.integers(0, 3, size=(1, 1200, 1000)).astype(np.int32)
    tables = native.build_position_tables(masks, 3)
    counts = np.bincount(masks.ravel(), minlength=3)
    assert [len(t) for t in tables] == list(counts)


@pytest.mark.parametrize("threads", ["4", "7"])
def test_forced_multithread_counts(rng, monkeypatch, threads):
    # DYNSEG_NATIVE_THREADS forces the partial-counts merge path even on a
    # single-core host / small input (chunk boundaries land mid-raster for
    # the odd thread count): counts and tables must match numpy exactly.
    monkeypatch.setenv("DYNSEG_NATIVE_THREADS", threads)
    masks = rng.integers(0, 4, size=(2, 53, 41)).astype(np.int32)
    masks[1, 10:12] = 255  # IGNORE must be skipped in every chunk
    tables = native.build_position_tables(masks, 4)
    for c in range(4):
        t, r, cc = np.nonzero(masks == c)
        ref = np.stack([t, r, cc], axis=1).astype(np.int32)
        np.testing.assert_array_equal(tables[c], ref)


def test_shuffle_is_permutation(rng):
    masks = rng.integers(0, 2, size=(1, 30, 30)).astype(np.int32)
    tables = native.build_position_tables(masks, 2)
    tb = tables[0].copy()
    native.shuffle_table(tb, seed=7)
    assert sorted(map(tuple, tb)) == sorted(map(tuple, tables[0]))
    assert not np.array_equal(tb, tables[0])
    # deterministic given seed
    tb2 = tables[0].copy()
    native.shuffle_table(tb2, seed=7)
    np.testing.assert_array_equal(tb, tb2)


def test_sampler_native_vs_numpy_equivalent(rng):
    masks = rng.integers(0, 3, size=(2, 40, 40)).astype(np.int32)
    ts = pack_tiles(list(np.zeros((2, 40, 40, 3), np.float32)), list(masks))
    a = BalancedPatchSampler(ts, 3, pad=0, seed=0, use_native=True)
    b = BalancedPatchSampler(ts, 3, pad=0, seed=0, use_native=False)
    # same positions drawn: tables identical (raster order) + same host rng
    np.testing.assert_array_equal(a.sample(64), b.sample(64))


def test_shuffle_table_rejects_bad_buffers(rng):
    """review r2 (round 2): bare asserts vanished under python -O and a
    non-contiguous view's base pointer went straight to the C
    Fisher-Yates, silently corrupting the parent array."""
    from dynseg.data import native

    if not native.available():
        pytest.skip("native library unavailable")
    tab = rng.integers(0, 100, size=(10, 6)).astype(np.int32)
    with pytest.raises(ValueError, match="contiguous"):
        native.shuffle_table(tab[:, :3], seed=1)  # non-contiguous view
    with pytest.raises(ValueError):
        native.shuffle_table(tab.astype(np.int64)[:, :3].copy(), seed=1)
