"""--operation check_data: pre-flight dump validation (verdict r2 #7).
Uses the same fake on-disk dumps as test_loaders.py so the command's
pass/fail behavior is pinned to the format contracts."""

import numpy as np
import pytest
from PIL import Image

from dynseg.cli import main as cli_main
from dynseg.data.check import check_data
from dynseg.data.datasets import ISPRS_PALETTE


def _save(path, arr):
    Image.fromarray(arr).save(path)


def _fake_coffee(root, rng, counties=("alfenas", "arceburgo", "guaxupe")):
    for county in counties:
        d = root / county
        d.mkdir()
        img = rng.integers(0, 255, (40, 50, 3)).astype(np.uint8)
        mask = np.zeros((40, 50, 3), np.uint8)
        mask[..., 1] = (rng.random((40, 50)) < 0.4) * 255
        _save(d / f"{county}.png", img)
        _save(d / f"{county}_mask.png", mask)


def _fake_vaihingen(root, rng, areas=("1", "11", "15", "3")):
    (root / "top").mkdir()
    (root / "gts_for_participants").mkdir()
    for a in areas:
        img = rng.integers(0, 255, (24, 24, 3)).astype(np.uint8)
        classes = rng.integers(0, 6, (24, 24))
        _save(root / "top" / f"top_mosaic_09cm_area{a}.tif", img)
        _save(root / "gts_for_participants" /
              f"top_mosaic_09cm_area{a}.tif", ISPRS_PALETTE[classes])


def test_good_coffee_dump_passes(tmp_path, rng, capsys):
    _fake_coffee(tmp_path, rng)
    report = check_data("coffee", str(tmp_path), fold=0)
    assert report["ok"] and not report["errors"]
    assert report["info"]["train_tiles"] == 2
    assert report["info"]["test_tiles"] == 1
    hist = report["info"]["train_hist"]
    assert len(hist["per_class"]) == 2 and all(n > 0 for n in hist["per_class"])
    out = capsys.readouterr().out
    assert "CHECK PASSED" in out
    assert "RECONSTRUCTED" in out  # speculative-layout honesty


def test_bad_layout_fails_with_expected_layout(tmp_path, capsys):
    (tmp_path / "not_a_county.png").write_bytes(b"x")
    report = check_data("coffee", str(tmp_path), fold=0)
    assert not report["ok"] and report["errors"]
    out = capsys.readouterr().out
    assert "CHECK FAILED" in out
    assert "expected layout" in out
    assert "_mask" in out  # the layout hint names the pairing convention


def test_vaihingen_split_membership_and_pass(tmp_path, rng, capsys):
    _fake_vaihingen(tmp_path, rng, areas=("1", "11", "15", "3"))
    report = check_data("vaihingen", str(tmp_path))
    assert report["ok"]
    assert report["info"]["split"]["validation"] == ["11", "15"]
    assert report["info"]["split"]["train"] == ["1", "3"]
    out = capsys.readouterr().out
    assert "split membership" in out


def test_palette_mismatch_flags_high_ignore(tmp_path, rng, capsys):
    """GT rasters whose colors are NOT the ISPRS palette (re-encoded /
    anti-aliased dumps) must surface as an ignore-fraction warning, not
    a silent all-IGNORE training run."""
    (tmp_path / "top").mkdir()
    (tmp_path / "gts_for_participants").mkdir()
    for a in ("1", "11"):
        img = rng.integers(0, 255, (24, 24, 3)).astype(np.uint8)
        bad_gt = rng.integers(80, 180, (24, 24, 3)).astype(np.uint8)
        _save(tmp_path / "top" / f"top_mosaic_09cm_area{a}.tif", img)
        _save(tmp_path / "gts_for_participants" /
              f"top_mosaic_09cm_area{a}.tif", bad_gt)
    report = check_data("vaihingen", str(tmp_path))
    assert any("IGNORE" in w for w in report["warnings"])
    # all-ignore ALSO means zero labeled pixels per class -> train error
    assert not report["ok"]
    assert any("ZERO labeled pixels" in e for e in report["errors"])


def test_grss_wrong_label_encoding_fails(tmp_path, rng):
    """Class ids beyond the dataset's range (e.g. 0..255 grayscale saved
    as labels) must be a hard error naming the invalid ids."""
    img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    for stem in ("train", "test"):
        _save(tmp_path / f"{stem}_image.png", img)
        np.save(tmp_path / f"{stem}_labels.npy",
                rng.integers(0, 200, (32, 32)).astype(np.int32))
    report = check_data("grss_dfc_2014", str(tmp_path))
    assert not report["ok"]
    assert any("outside [0,5)" in e for e in report["errors"])


def test_small_tiles_vs_max_scale_warns(tmp_path, rng):
    _fake_coffee(tmp_path, rng)
    report = check_data("coffee", str(tmp_path), max_scale=65)
    assert report["ok"]  # warning, not error
    assert any("smaller than the largest patch scale" in w
               for w in report["warnings"])


def test_cli_operation_check_data_exit_codes(tmp_path, rng, capsys):
    _fake_coffee(tmp_path, rng)
    rc = cli_main(["--operation", "check_data", "--dataset", "coffee",
                   "--dataset_path", str(tmp_path)])
    assert rc == 0
    assert "CHECK PASSED" in capsys.readouterr().out
    bad = tmp_path / "empty"
    bad.mkdir()
    rc = cli_main(["--operation", "check_data", "--dataset", "coffee",
                   "--dataset_path", str(bad)])
    assert rc == 1


def test_synthetic_check_runs_without_path(capsys):
    rc = cli_main(["--operation", "check_data", "--dataset",
                   "synthetic_texture"])
    assert rc == 0
    assert "CHECK PASSED" in capsys.readouterr().out
