"""Dataset loaders (SURVEY.md C2) + synthetic rasters for development.

Real datasets (Brazilian Coffee, GRSS DFC 2014, ISPRS Vaihingen, Potsdam)
are not present on this machine (SURVEY.md §7 hard part 5); the loaders
below are written to the published on-disk formats and raise a clear error
when the path is missing. All development/tests run on the synthetic
generator, which produces rasters with known structure so the end-to-end
smoke test can demand near-perfect F1 (SURVEY.md §4).

Reference anchors: [R] dynamic.py:≈loader section / per-dataset branches.
"""

from __future__ import annotations

import glob
import os
from typing import List, Tuple

import numpy as np

from dynseg.data.tiles import IGNORE_LABEL, TileSet, compute_stats, pack_tiles

# Per-dataset class palettes for prediction-map export (SURVEY.md C18).
# ISPRS standard colors (impervious, building, low veg, tree, car, clutter).
ISPRS_PALETTE = np.array(
    [
        [255, 255, 255],
        [0, 0, 255],
        [0, 255, 255],
        [0, 255, 0],
        [255, 255, 0],
        [255, 0, 0],
    ],
    dtype=np.uint8,
)
COFFEE_PALETTE = np.array([[0, 0, 0], [0, 255, 0]], dtype=np.uint8)
GRSS_PALETTE = np.array(
    [[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0], [0, 255, 255]],
    dtype=np.uint8,
)

NUM_CLASSES = {
    "coffee": 2,
    "grss_dfc_2014": 5,
    "vaihingen": 6,
    "potsdam": 6,
    "synthetic": 2,
    # 6-class, 4-band synthetic — exercises the Vaihingen/Potsdam code
    # paths (multi-class balancing, palettes, F1 averaging) without data.
    "synthetic_multi": 6,
}
PALETTES = {
    "coffee": COFFEE_PALETTE,
    "grss_dfc_2014": GRSS_PALETTE,
    "vaihingen": ISPRS_PALETTE,
    "potsdam": ISPRS_PALETTE,
    "synthetic": COFFEE_PALETTE,
    "synthetic_multi": ISPRS_PALETTE,
}


def _read_image(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im)


def _isprs_rgb_to_classes(rgb: np.ndarray) -> np.ndarray:
    """Map ISPRS color-coded ground truth to class ids."""
    out = np.full(rgb.shape[:2], IGNORE_LABEL, dtype=np.int32)
    for cid, color in enumerate(ISPRS_PALETTE):
        out[np.all(rgb[..., :3] == color, axis=-1)] = cid
    return out


def load_synthetic(
    seed: int = 0,
    num_tiles: int = 4,
    size: int = 256,
    num_classes: int = 2,
    num_bands: int = 3,
) -> Tuple[TileSet, TileSet]:
    """Synthetic rasters with learnable spatial structure.

    Class identity is driven by smooth blob fields; each class gets a
    distinct band signature plus noise, so a ConvNet with modest context
    should reach ~100% F1 (SURVEY.md §4 smoke-test requirement).
    Returns (train_tiles, test_tiles).
    """
    rng = np.random.default_rng(seed)

    def make(n: int) -> TileSet:
        ims: List[np.ndarray] = []
        mks: List[np.ndarray] = []
        for _ in range(n):
            # Smooth random field via low-res upsample -> class argmax.
            low = rng.normal(size=(num_classes, size // 32 + 1, size // 32 + 1))
            fields = np.stack(
                [
                    np.kron(low[c], np.ones((32, 32)))[:size, :size]
                    for c in range(num_classes)
                ]
            )
            # Blur the blocky field a little with a box filter.
            k = 9
            pad = k // 2
            f = np.pad(fields, ((0, 0), (pad, pad), (pad, pad)), mode="edge")
            csum = np.cumsum(np.cumsum(f, axis=1), axis=2)
            csum = np.pad(csum, ((0, 0), (1, 0), (1, 0)))
            fields = (
                csum[:, k:, k:]
                - csum[:, :-k, k:]
                - csum[:, k:, :-k]
                + csum[:, :-k, :-k]
            ) / (k * k)
            mask = np.argmax(fields, axis=0).astype(np.int32)
            # Band signatures: distinct per class (seeded uniform draws —
            # a modular pattern collides for num_classes > num_bands+1).
            sig_rng = np.random.default_rng(12345)
            sig = sig_rng.uniform(35.0, 220.0, size=(num_classes, num_bands))
            im = sig[mask] + rng.normal(scale=18.0, size=(size, size, num_bands))
            ims.append(np.clip(im, 0, 255).astype(np.float32))
            mks.append(mask)
        return pack_tiles(ims, mks)

    train = make(num_tiles)
    test = make(max(1, num_tiles // 2))
    compute_stats(train)
    test.mean, test.std = train.mean, train.std
    return train, test


_POOL = None


def _decode_pool():
    """Shared raster-decode thread pool. PIL decodes and np.load release
    the GIL, so this parallelizes on multi-core production hosts; the
    floor of 4 still overlaps file I/O with decode on small machines.
    (This dev box exposes 1 vCPU, so the speedup could not be validated
    here — behavior-tested only.)"""
    global _POOL
    if _POOL is None:
        from concurrent.futures import ThreadPoolExecutor

        _POOL = ThreadPoolExecutor(
            max_workers=min(16, max(4, os.cpu_count() or 4)),
            thread_name_prefix="dynseg-decode",
        )
    return _POOL


def load_coffee(path: str, fold: int) -> Tuple[TileSet, TileSet]:
    """Brazilian Coffee scenes: 5-fold cross-county protocol — train on 4
    counties, test on the held-out one (SURVEY.md C2a).

    Expected layout: {path}/{county}/ with paired image/mask files, e.g.
    montesanto.tif + montesanto_mask.tif (or .png/.jpg variants).
    """
    counties = sorted(
        d for d in os.listdir(path) if os.path.isdir(os.path.join(path, d))
    )
    if len(counties) < 2:
        raise FileNotFoundError(
            f"coffee dataset at {path!r}: expected per-county subdirectories"
        )
    test_county = counties[fold % len(counties)]

    def load_county(county: str) -> Tuple[np.ndarray, np.ndarray]:
        root = os.path.join(path, county)
        img_files = [
            f
            for f in sorted(glob.glob(os.path.join(root, "*")))
            if "mask" not in os.path.basename(f).lower()
            and f.lower().endswith((".tif", ".tiff", ".png", ".jpg", ".npy"))
        ]
        assert img_files, f"no image found under {root}"
        imgs, masks = [], []
        for f in img_files:
            base, ext = os.path.splitext(f)
            mask_file = next(
                (
                    m
                    for m in (base + "_mask" + ext, base + "_mask.png")
                    if os.path.exists(m)
                ),
                None,
            )
            assert mask_file, f"no mask for {f}"
            im = np.load(f) if f.endswith(".npy") else _read_image(f)
            mk = np.load(mask_file) if mask_file.endswith(".npy") else _read_image(mask_file)
            if mk.ndim == 3:
                mk = (mk[..., 1] > 127).astype(np.int32)  # green = coffee
            else:
                mk = (mk > 127).astype(np.int32)
            imgs.append(im.astype(np.float32))
            masks.append(mk)
        return imgs, masks

    tr_i: List[np.ndarray] = []
    tr_m: List[np.ndarray] = []
    for c in counties:
        if c == test_county:
            continue
        i, m = load_county(c)
        tr_i += i
        tr_m += m
    te_i, te_m = load_county(test_county)
    train, test = pack_tiles(tr_i, tr_m), pack_tiles(te_i, te_m)
    compute_stats(train)
    test.mean, test.std = train.mean, train.std
    return train, test


def _load_isprs(path: str, image_dir: str, gt_dir: str, split_frac: float = 0.75
                ) -> Tuple[TileSet, TileSet]:
    imgs = sorted(glob.glob(os.path.join(path, image_dir, "*.tif")))
    if not imgs:
        raise FileNotFoundError(f"no tiles under {os.path.join(path, image_dir)}")
    pairs = []
    for f in imgs:
        base = os.path.basename(f)
        # Vaihingen GT shares the image filename; Potsdam images are
        # top_potsdam_X_Y_RGB.tif with GT top_potsdam_X_Y_label.tif.
        candidates = [base, base.replace("_RGB", "_label"),
                      base.replace("RGB", "label")]
        gt = next(
            (p for c in candidates
             if os.path.exists(p := os.path.join(path, gt_dir, c))), None)
        if gt is not None:
            pairs.append((f, gt))
    # Threaded decode (see load_unlabeled): ISPRS tiles are ~100 Mpx TIFFs.
    ims = list(_decode_pool().map(
        lambda p: _read_image(p[0]).astype(np.float32), pairs))
    mks = list(_decode_pool().map(
        lambda p: _isprs_rgb_to_classes(_read_image(p[1])), pairs))
    if not ims:
        raise FileNotFoundError(
            f"{len(imgs)} image tiles under {os.path.join(path, image_dir)} "
            f"but none paired with ground truth in "
            f"{os.path.join(path, gt_dir)} (tried exact filename and the "
            f"RGB->label substitution, e.g. {os.path.basename(imgs[0])})"
        )
    n_train = max(1, int(len(ims) * split_frac))
    train = pack_tiles(ims[:n_train], mks[:n_train])
    test = pack_tiles(ims[n_train:] or ims[-1:], mks[n_train:] or mks[-1:])
    compute_stats(train)
    test.mean, test.std = train.mean, train.std
    return train, test


def load_vaihingen(path: str, fold: int = 0) -> Tuple[TileSet, TileSet]:
    """ISPRS Vaihingen: IRRG 9cm tiles, 6 classes (SURVEY.md C2c)."""
    del fold
    return _load_isprs(path, "top", "gts_for_participants")


def load_potsdam(path: str, fold: int = 0) -> Tuple[TileSet, TileSet]:
    """ISPRS Potsdam: 5cm tiles, 6 classes (SURVEY.md C2d)."""
    del fold
    return _load_isprs(path, "2_Ortho_RGB", "5_Labels_for_participants")


def load_grss_dfc_2014(path: str, fold: int = 0) -> Tuple[TileSet, TileSet]:
    """GRSS Data Fusion Contest 2014 VHR scene, 5 classes (SURVEY.md C2b).

    Expected layout: {path}/train_image.* + train_labels.* and
    test_image.* + test_labels.* (labels as class-id rasters, 0 = unlabeled
    → remapped to IGNORE, classes 1..5 → 0..4).
    """
    del fold

    def load_pair(stem: str) -> Tuple[np.ndarray, np.ndarray]:
        img = glob.glob(os.path.join(path, f"{stem}_image.*"))
        lab = glob.glob(os.path.join(path, f"{stem}_labels.*"))
        if not img or not lab:
            raise FileNotFoundError(f"missing {stem} pair under {path!r}")

        def read(f):  # .npy supports >3-band imagery (PNG/TIFF cap at RGB+A)
            return np.load(f) if f.lower().endswith(".npy") else _read_image(f)

        im = read(img[0]).astype(np.float32)
        mk = read(lab[0]).astype(np.int32)
        mk = np.where(mk == 0, IGNORE_LABEL, mk - 1)
        return im, mk

    tr = load_pair("train")
    te = load_pair("test")
    train, test = pack_tiles([tr[0]], [tr[1]]), pack_tiles([te[0]], [te[1]])
    compute_stats(train)
    test.mean, test.std = train.mean, train.std
    return train, test


def list_rasters(path: str) -> List[str]:
    """Raster files under a path (or the path itself) for predict."""
    exts = (".tif", ".tiff", ".png", ".jpg", ".jpeg", ".npy")
    if os.path.isdir(path):
        files = [
            f for f in sorted(glob.glob(os.path.join(path, "*")))
            if f.lower().endswith(exts)
        ]
    else:
        files = [path] if os.path.exists(path) else []
    if not files:
        raise FileNotFoundError(f"no rasters ({'/'.join(exts)}) under {path!r}")
    return files


def load_unlabeled(path: str, pad_to_multiple: int = 1
                   ) -> Tuple[TileSet, List[str]]:
    """Production predict path: load raw rasters (no ground truth) from a
    file or directory for `--operation predict`. Masks are all-IGNORE;
    normalization stats must be supplied by the caller (from the
    checkpoint's stats sidecar). Returns (tiles, source names)."""
    return load_rasters(list_rasters(path), pad_to_multiple)


def load_rasters(files: List[str], pad_to_multiple: int = 1
                 ) -> Tuple[TileSet, List[str]]:
    def load_one(f: str) -> np.ndarray:
        im = np.load(f) if f.lower().endswith(".npy") else _read_image(f)
        if im.ndim == 2:
            im = im[..., None]
        return im.astype(np.float32)

    # Decode in a thread pool: PIL/numpy release the GIL during the
    # actual decode, and a production predict batch is hundreds of tiles
    # — serial decoding was the dominant host cost before first launch.
    ims = list(_decode_pool().map(load_one, files))
    mks = [np.full(im.shape[:2], IGNORE_LABEL, np.int32) for im in ims]
    names = [os.path.splitext(os.path.basename(f))[0] for f in files]
    # NOTE: no reflect fill here — the Inferencer extends each tile's
    # mirrored context after ITS padding step (infer._fill_padded_context),
    # which is the only placement that keeps chunked == unchunked.
    return pack_tiles(ims, mks, pad_to_multiple=pad_to_multiple), names


LOADERS = {
    "coffee": load_coffee,
    "grss_dfc_2014": load_grss_dfc_2014,
    "vaihingen": load_vaihingen,
    "potsdam": load_potsdam,
}


def load_dataset(name: str, path: str = "", fold: int = 0, **synth_kwargs
                 ) -> Tuple[TileSet, TileSet]:
    """Dispatch mirroring the reference's per-dataset branches
    ([R] dynamic.py:≈load_images; SURVEY.md C2)."""
    if name == "synthetic":
        return load_synthetic(**synth_kwargs)
    if name == "synthetic_multi":
        synth_kwargs.setdefault("num_classes", 6)
        synth_kwargs.setdefault("num_bands", 4)
        return load_synthetic(**synth_kwargs)
    return LOADERS[name](path, fold)
