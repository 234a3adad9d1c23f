"""Dataset-loader tests against the published on-disk formats (SURVEY.md
C2) using small fake datasets written to tmp dirs — the real rasters are
not on this machine, so these pin the format contracts."""

import numpy as np
import pytest
from PIL import Image

from dynseg.data.datasets import (
    ISPRS_PALETTE, NUM_CLASSES, load_coffee, load_dataset, load_grss_dfc_2014,
    load_vaihingen,
)
from dynseg.data.tiles import IGNORE_LABEL


def _save(path, arr):
    Image.fromarray(arr).save(path)


@pytest.fixture()
def coffee_root(tmp_path, rng):
    """5 county dirs, each one image + binary mask pair."""
    for county in ["alfenas", "arceburgo", "guaxupe", "guaranesia", "montesanto"]:
        d = tmp_path / county
        d.mkdir()
        img = rng.integers(0, 255, (40, 50, 3)).astype(np.uint8)
        mask = np.zeros((40, 50, 3), np.uint8)
        mask[..., 1] = (rng.random((40, 50)) < 0.4) * 255  # green = coffee
        _save(d / f"{county}.png", img)
        _save(d / f"{county}_mask.png", mask)
    return tmp_path


def test_coffee_cross_county_folds(coffee_root):
    for fold in range(5):
        train, test = load_coffee(str(coffee_root), fold)
        assert train.num_tiles == 4 and test.num_tiles == 1
        assert set(np.unique(test.masks)) <= {0, 1, IGNORE_LABEL}
        assert train.mean is not None
        np.testing.assert_array_equal(train.mean, test.mean)  # train stats
    # different folds hold out different counties
    t0 = load_coffee(str(coffee_root), 0)[1].images
    t1 = load_coffee(str(coffee_root), 1)[1].images
    assert not np.array_equal(t0, t1)


def test_vaihingen_color_coded_gt(tmp_path, rng):
    (tmp_path / "top").mkdir()
    (tmp_path / "gts_for_participants").mkdir()
    for i in range(2):
        img = rng.integers(0, 255, (30, 30, 3)).astype(np.uint8)
        classes = rng.integers(0, 6, (30, 30))
        gt = ISPRS_PALETTE[classes]
        _save(tmp_path / "top" / f"tile{i}.tif", img)
        _save(tmp_path / "gts_for_participants" / f"tile{i}.tif", gt)
    train, test = load_vaihingen(str(tmp_path))
    assert train.num_tiles >= 1 and test.num_tiles >= 1
    assert train.masks.max() < 6  # colors decoded to ids
    assert (train.masks != IGNORE_LABEL).any()


def test_grss_label_remap(tmp_path, rng):
    img = rng.integers(0, 255, (20, 24, 3)).astype(np.uint8)
    labels = rng.integers(0, 6, (20, 24)).astype(np.uint8)  # 0=unlabeled
    _save(tmp_path / "train_image.png", img)
    _save(tmp_path / "train_labels.png", labels)
    _save(tmp_path / "test_image.png", img)
    _save(tmp_path / "test_labels.png", labels)
    train, test = load_grss_dfc_2014(str(tmp_path))
    # 0 -> IGNORE, 1..5 -> 0..4
    vals = set(np.unique(train.masks))
    assert IGNORE_LABEL in vals
    assert vals - {IGNORE_LABEL} <= {0, 1, 2, 3, 4}


def test_load_dataset_dispatch_missing_path(tmp_path):
    with pytest.raises((FileNotFoundError, OSError)):
        load_dataset("vaihingen", str(tmp_path))
    with pytest.raises((FileNotFoundError, OSError, AssertionError)):
        load_dataset("coffee", str(tmp_path))


def test_num_classes_table_covers_all_datasets():
    from dynseg.config import DATASETS

    assert set(DATASETS) <= set(NUM_CLASSES)


def test_load_unlabeled_dir_and_formats(tmp_path, rng):
    """predict-path loader: all supported formats including uppercase
    .NPY, files with 'mask' in the name are NOT skipped (arbitrary
    unlabeled imagery), masks all-IGNORE."""
    from dynseg.data.datasets import load_unlabeled

    a = rng.integers(0, 255, (20, 24, 3)).astype(np.uint8)
    Image.fromarray(a).save(tmp_path / "unmasked_region.png")
    b = rng.normal(size=(16, 18, 3)).astype(np.float32)
    np.save(tmp_path / "tile_b.npy", b)
    (tmp_path / "TILE_C.NPY").write_bytes((tmp_path / "tile_b.npy").read_bytes())
    (tmp_path / "notes.txt").write_text("ignored")

    ts, names = load_unlabeled(str(tmp_path))
    assert ts.num_tiles == 3
    assert set(names) == {"unmasked_region", "tile_b", "TILE_C"}
    assert (ts.masks == IGNORE_LABEL).all()

    # single-file form
    ts1, names1 = load_unlabeled(str(tmp_path / "tile_b.npy"))
    assert ts1.num_tiles == 1 and names1 == ["tile_b"]

    with pytest.raises(FileNotFoundError):
        load_unlabeled(str(tmp_path / "missing_dir"))


def test_potsdam_rgb_label_filename_convention(tmp_path, rng):
    """Real Potsdam names images top_potsdam_X_Y_RGB.tif but ground truth
    top_potsdam_X_Y_label.tif — the loader must pair them."""
    from dynseg.data.datasets import load_potsdam

    (tmp_path / "2_Ortho_RGB").mkdir()
    (tmp_path / "5_Labels_for_participants").mkdir()
    for i in range(2):
        img = rng.integers(0, 255, (24, 24, 3)).astype(np.uint8)
        classes = rng.integers(0, 6, (24, 24))
        _save(tmp_path / "2_Ortho_RGB" / f"top_potsdam_{i}_10_RGB.tif", img)
        _save(tmp_path / "5_Labels_for_participants" /
              f"top_potsdam_{i}_10_label.tif",
              ISPRS_PALETTE[classes].astype(np.uint8))
    train, test = load_potsdam(str(tmp_path))
    assert train.num_tiles >= 1 and test.num_tiles >= 1
    assert train.masks.max() < 6
