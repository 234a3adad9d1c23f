"""Data-layer tests: packing, stats, mirror-pad, balanced sampling, and
the on-device K2 gather's bit-parity vs a host numpy extraction
(SURVEY.md §4 golden-value strategy)."""

import jax
import numpy as np
import pytest

from dynseg.data.datasets import load_synthetic
from dynseg.data.sampler import BalancedPatchSampler
from dynseg.data.tiles import IGNORE_LABEL, compute_stats, mirror_pad, pack_tiles
from dynseg.ops.gather import gather_batch


def test_pack_tiles_pads_with_ignore():
    ims = [np.ones((4, 6, 3), np.float32), np.ones((8, 3, 3), np.float32)]
    mks = [np.zeros((4, 6), np.int32), np.ones((8, 3), np.int32)]
    ts = pack_tiles(ims, mks)
    assert ts.images.shape == (2, 8, 6, 3)
    assert ts.masks[0, 5, 0] == IGNORE_LABEL
    assert ts.masks[1, 0, 4] == IGNORE_LABEL
    assert (ts.valid_hw == [[4, 6], [8, 3]]).all()


def test_stats_exclude_padding():
    ims = [np.full((4, 4, 1), 10.0, np.float32)]
    # poison the IGNORED pixel so inclusion would shift mean/std (review
    # r2: a constant image made this test vacuous)
    ims[0][0, 0] = 1000.0
    mks = [np.zeros((4, 4), np.int32)]
    mks[0][0, 0] = IGNORE_LABEL
    ts = pack_tiles(ims, mks)
    mean, std = compute_stats(ts)
    assert mean[0] == 10.0 and std[0] == 1.0  # zero-var guarded to 1


def test_mirror_pad_reflects():
    ims = [np.arange(16, dtype=np.float32).reshape(4, 4, 1)]
    mks = [np.zeros((4, 4), np.int32)]
    ts = mirror_pad(pack_tiles(ims, mks), 2)
    ref = np.pad(ims[0], ((2, 2), (2, 2), (0, 0)), mode="reflect")
    np.testing.assert_array_equal(ts.images[0], ref)
    assert (ts.masks[0, :2, :] == IGNORE_LABEL).all()


def test_balanced_sampler_class_counts(synthetic_data):
    train, _ = synthetic_data
    pad = 33
    padded = mirror_pad(train, pad)
    s = BalancedPatchSampler(padded, num_classes=2, pad=pad, seed=0)
    pos = s.sample(100)
    assert pos.shape == (100, 3)
    labels = padded.masks[pos[:, 0], pos[:, 1], pos[:, 2]]
    counts = np.bincount(labels, minlength=2)
    assert abs(counts[0] - counts[1]) <= 2, counts  # balanced round-robin
    # positions always index valid (non-ignored) pixels
    assert (labels != IGNORE_LABEL).all()


def test_sampler_position_cap(synthetic_data):
    train, _ = synthetic_data
    padded = mirror_pad(train, 8)
    s = BalancedPatchSampler(
        padded, 2, pad=8, seed=0, max_positions_per_class=500
    )
    assert all(len(t) <= 500 for t in s.tables)
    pos = s.sample(200)
    labels = padded.masks[pos[:, 0], pos[:, 1], pos[:, 2]]
    assert (labels != IGNORE_LABEL).all()
    counts = np.bincount(labels, minlength=2)
    assert abs(int(counts[0]) - int(counts[1])) <= 2


def test_sampler_epoch_cycling():
    ims = [np.zeros((6, 6, 1), np.float32)]
    mks = [np.zeros((6, 6), np.int32)]
    ts = pack_tiles(ims, mks)
    s = BalancedPatchSampler(ts, num_classes=2, pad=0, seed=0)
    pos = s.sample(72)  # exactly two epochs of 36 pixels
    flat = pos[:, 1] * 6 + pos[:, 2]
    # each pixel visited exactly twice (shuffled epochs, no repeats within)
    assert (np.bincount(flat, minlength=36) == 2).all()


def test_sampler_reseed_changes_stream():
    """Resume must not replay the iteration-0 position stream (review
    r2): reseed(salt) derives a distinct deterministic stream."""
    ims = [np.zeros((8, 8, 1), np.float32)]
    mks = [np.zeros((8, 8), np.int32)]
    ts = pack_tiles(ims, mks)
    a = BalancedPatchSampler(ts, num_classes=1, pad=0, seed=5)
    b = BalancedPatchSampler(ts, num_classes=1, pad=0, seed=5)
    b.reseed(100)
    sa, sb = a.sample(32), b.sample(32)
    assert not np.array_equal(sa, sb)          # no replay after reseed
    c = BalancedPatchSampler(ts, num_classes=1, pad=0, seed=5)
    c.reseed(100)
    np.testing.assert_array_equal(sb, c.sample(32))  # but deterministic


@pytest.mark.parametrize("size", [5, 8])
def test_gather_parity_vs_numpy(size, rng):
    """K2 on-device gather == host extraction + dihedral + normalize."""
    T, H, W, C = 2, 32, 32, 3
    images = rng.normal(size=(T, H, W, C)).astype(np.float32)
    masks = rng.integers(0, 3, size=(T, H, W)).astype(np.int32)
    mean = images.mean(axis=(0, 1, 2))
    std = images.std(axis=(0, 1, 2))
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

    imgs, labs = gather_batch(images, masks, mean, std, pos, aug, size)
    imgs, labs = np.asarray(imgs), np.asarray(labs)

    for b in range(B):
        t, r, c = pos[b]
        r0, c0 = r - half, c - half
        im = images[t, r0 : r0 + size, c0 : c0 + size].copy()
        lb = masks[t, r0 : r0 + size, c0 : c0 + size].copy()
        k = aug[b]
        if k >= 4:
            im, lb = np.flip(im, axis=1), np.flip(lb, axis=1)
            k -= 4
        im, lb = np.rot90(im, k, (0, 1)), np.rot90(lb, k, (0, 1))
        im = (im - mean) / std
        np.testing.assert_allclose(imgs[b], im, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(labs[b], lb)


def test_synthetic_dataset_structure():
    train, test = load_synthetic(seed=1, num_tiles=2, size=96)
    assert train.images.shape == (2, 96, 96, 3)
    assert train.mean is not None and test.mean is not None
    np.testing.assert_array_equal(train.mean, test.mean)
    assert set(np.unique(train.masks)) <= {0, 1}


# --------------------------------------------------------------------- #
# Context-sensitive texture benchmark (round-1 verdict #2): the generator
# must carry ZERO first-order signal — classes separable only by period.
# --------------------------------------------------------------------- #

def test_texture_benchmark_no_first_order_signal():
    from dynseg.data.datasets import load_synthetic_texture

    tr, te = load_synthetic_texture(seed=3, num_tiles=3, size=192,
                                    cells=(2, 4, 12, 24))
    means, stds = [], []
    for c in range(4):
        sel = tr.masks == c
        assert sel.sum() > 500  # every class present
        means.append(tr.images[sel].mean())
        stds.append(tr.images[sel].std())
    # identical two-value checkers + shared noise: per-class channel mean
    # within a few gray levels (finite-phase wobble), std within ~5%
    assert max(means) - min(means) < 6.0, means
    assert (max(stds) - min(stds)) / np.mean(stds) < 0.06, stds
    # a 1x1-conv-equivalent (per-pixel color classifier) cannot beat the
    # prior by much: nearest-class-mean per-pixel accuracy ~= chance
    cm = np.array(means)
    pix = tr.images[..., 0].ravel()
    pred = np.abs(pix[:, None] - cm[None, :]).argmin(1)
    acc = (pred == tr.masks.ravel()).mean()
    assert acc < 0.45, f"color-only accuracy {acc:.3f} — first-order leak"


def test_texture_benchmark_label_noise_train_only():
    from dynseg.data.datasets import load_synthetic_texture

    tr_clean, te_clean = load_synthetic_texture(seed=5, num_tiles=2,
                                                size=96, label_noise=0.0)
    tr_noisy, te_noisy = load_synthetic_texture(seed=5, num_tiles=2,
                                                size=96, label_noise=0.1)
    # corruption uses a separate rng stream -> identical imagery
    np.testing.assert_array_equal(tr_clean.images, tr_noisy.images)
    frac = (tr_clean.masks != tr_noisy.masks).mean()
    assert 0.05 < frac < 0.15  # ~10% of train labels flipped
    assert set(np.unique(tr_noisy.masks)) <= {0, 1, 2, 3}
    # evaluation masks stay clean
    np.testing.assert_array_equal(te_clean.masks, te_noisy.masks)


def test_texture_benchmark_coarse_pair_locally_ambiguous():
    """The design property that makes the benchmark context-sensitive: a
    small window inside a coarse cell is FLAT for both coarse classes
    (indistinguishable), while fine-pair windows always show edges."""
    from dynseg.data.datasets import load_synthetic_texture

    tr, _ = load_synthetic_texture(seed=7, num_tiles=2, size=192,
                                   cells=(2, 4, 24, 48), noise=0.0)
    w = 9

    def flat_fraction(cls):
        hits = flats = 0
        for t in range(tr.num_tiles):
            ys, xs = np.where(tr.masks[t] == cls)
            for y, x in zip(ys[::29], xs[::29]):
                if y + w >= 192 or x + w >= 192:
                    continue
                if not (tr.masks[t, y:y + w, x:x + w] == cls).all():
                    continue
                patch = tr.images[t, y:y + w, x:x + w, 0]
                hits += 1
                flats += int(patch.std() < 1e-3)
        return flats / max(hits, 1)

    assert flat_fraction(2) > 0.2   # cell-24: many flat 9px windows
    assert flat_fraction(3) > 0.2   # cell-48: likewise
    assert flat_fraction(0) == 0.0  # cell-2: never flat
    assert flat_fraction(1) == 0.0  # cell-4: never flat


def test_training_pad_fills_small_tile_context(rng):
    """review r2 (round 2): Trainer mirror-padded the PACKED array
    directly, so patches near the valid edge of tiles smaller than the
    packed shape gathered normalized zeros as context — inference had
    the per-tile reflect fill, training did not. put_tiles (and Trainer
    init) now share fill_padded_context; the padded crop of the small
    tile must equal the tile padded alone."""
    from dynseg.config import Config, ModelConfig
    from dynseg.data.tiles import pack_tiles
    from dynseg.train import Trainer

    small = rng.uniform(1, 255, size=(24, 20, 3)).astype(np.float32)
    big = rng.uniform(1, 255, size=(56, 60, 3)).astype(np.float32)
    zeros = lambda im: np.zeros(im.shape[:2], np.int32)
    ts = pack_tiles([small, big], [zeros(small), zeros(big)])
    ts.mean = np.zeros(3, np.float32)
    ts.std = np.ones(3, np.float32)
    cfg = Config(model=ModelConfig(num_classes=2, width_multiplier=0.125))
    trainer = Trainer(cfg, ts)
    _, padded = trainer.put_tiles(ts)
    p = trainer.pad
    solo = np.pad(small, ((p, p), (p, p), (0, 0)), mode="reflect")
    got = padded.images[0][: 24 + 2 * p, : 20 + 2 * p]
    np.testing.assert_array_equal(got, solo)


def test_unbalanced_sampling_uses_precap_weights(rng):
    """review r2 (round 2): unbalanced mode weighted classes by CAPPED
    table lengths, silently reshaping 'uniform over all labeled pixels'
    toward class-uniform under --max_positions_per_class."""
    from dynseg.data.sampler import BalancedPatchSampler
    from dynseg.data.tiles import TileSet

    masks = np.zeros((1, 100, 100), np.int32)
    masks[0, :10]  = 1  # class 1: 10% of pixels
    ts = TileSet(images=np.zeros((1, 100, 100, 1), np.float32),
                 masks=masks, valid_hw=np.array([[100, 100]], np.int32))
    s = BalancedPatchSampler(ts, num_classes=2, pad=0, seed=0,
                             balanced=False, use_native=False,
                             max_positions_per_class=500)
    pos = s.sample(4000)
    # class of each draw via the mask
    cls = masks[0, pos[:, 1], pos[:, 2]]
    frac1 = (cls == 1).mean()
    assert 0.05 < frac1 < 0.15, f"expected ~0.10 (true pixel share), got {frac1}"
