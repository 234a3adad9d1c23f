"""Realistic multi-tile inference benchmark (hardware): four odd-sized
uint8 tiles (~12 Mpx total, Vaihingen-scale), full validate_test passes.

Reports pass 1 (includes any compile) and pass 2 (warm). With fixed-size
launch chunks the compiled programs are tile-size independent, so pass 1
compiles one bulk + one tail program per scale — not one per tile shape.

Usage: python scripts/profile_multitile.py [--scales 25,35,45,55,65]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dynseg.cli import enable_compilation_cache
from dynseg.config import Config, InferConfig, ModelConfig
from dynseg.data.tiles import compute_stats, pack_tiles
from dynseg.infer import validate_test
from dynseg.models.dilated import build_model

SIZES = [(2048, 1536), (1792, 1664), (1920, 1440), (1856, 1600)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", type=str, default="25,35,45,55,65")
    ap.add_argument("--window_batch", type=int, default=128)
    args = ap.parse_args()
    scales = tuple(int(s) for s in args.scales.split(","))

    enable_compilation_cache()
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 256, (h, w, 3)).astype(np.uint8) for h, w in SIZES]
    masks = [rng.integers(0, 6, (h, w)).astype(np.int32) for h, w in SIZES]
    ts = pack_tiles(imgs, masks)
    compute_stats(ts)
    mpx = sum(h * w for h, w in SIZES) / 1e6
    print(f"{len(SIZES)} tiles, {mpx:.1f} Mpx total, uint8 storage", flush=True)

    model = build_model(
        ModelConfig(net_type="dilated_icpr_rate6", num_classes=6)
    )
    variables = model.init(jax.random.key(0), jnp.zeros((1, 25, 25, 3)))

    cfg = Config(
        model=ModelConfig(net_type="dilated_icpr_rate6", num_classes=6),
        infer=InferConfig(
            scales=scales, window_batch=args.window_batch,
            dense_block=512, dense_halo=40,
        ),
    )

    # end-to-end (cold includes compile; warm includes tile re-upload —
    # what a fresh CLI validate_test run would pay after the compile cache
    # is populated)
    for label in ("pass1(+compile)", "pass2(warm, incl upload)"):
        t0 = time.perf_counter()
        validate_test(cfg, variables, ts, log=lambda *_: None)
        dt = time.perf_counter() - t0
        print(f"window e2e {label}: {dt:.2f}s = {mpx / dt:.2f} Mpx/s", flush=True)

    # decomposition: one Inferencer (upload once), warm per-tile predicts
    from dynseg.infer import Inferencer

    t0 = time.perf_counter()
    inf = Inferencer(cfg, ts)
    # sync via a scalar slice — NOT .ravel(), which forces a full uint8
    # relayout on device (~2 min for 53 MB on this platform)
    float(inf.images[0, 0, 0, 0])
    t_up = time.perf_counter() - t0
    print(f"Inferencer init + tile upload: {t_up:.2f}s", flush=True)

    for t in range(ts.num_tiles):  # warm both paths on every tile shape
        inf.predict_tile(variables, t, return_probs=False)
        inf.predict_tile_dense(variables, t, block=512, halo=40,
                               return_probs=False)
    for name, fn in (
        ("window", lambda t: inf.predict_tile(variables, t, return_probs=False)),
        ("dense", lambda t: inf.predict_tile_dense(
            variables, t, block=512, halo=40, return_probs=False)),
    ):
        t0 = time.perf_counter()
        for t in range(ts.num_tiles):
            fn(t)
        dt = time.perf_counter() - t0
        print(f"{name} warm device-resident: {dt:.2f}s = {mpx / dt:.2f} Mpx/s",
              flush=True)


if __name__ == "__main__":
    main()
