"""Decompose inference wall time on a production-size tile (hardware).

Separates, for window and dense modes and for f32 vs uint8 tile storage:
  * per-scale overlap-add launch time (honest sync: predict_tile returns
    the prediction as HOST numpy, a data-dependent fetch of the full map
    — NOT block_until_ready; see docs/DESIGN.md measurement rules)
  * final argmax + uint8 map fetch

Usage: python scripts/profile_infer.py [--size 2048] [--scales 25,45,65]
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
from dynseg.infer import Inferencer, window_origins
from dynseg.models.dilated import build_model


def profile(ts, label, cfg, variables, scales):
    inf = Inferencer(cfg, ts)
    h, w = (int(v) for v in ts.valid_hw[0])
    Hp, Wp = inf.padded_hw
    B = cfg.infer.window_batch

    # ---- window mode (product path: predict_tile), per-scale -----------
    inf.predict_tile(variables, 0, return_probs=False)  # compile + warm
    for s in scales:
        stride = min(s, max(1, int(round(s * cfg.infer.stride_fraction))))
        rows = window_origins(inf.pad, inf.pad + h, s, stride, Hp - s)
        cols = window_origins(inf.pad, inf.pad + w, s, stride, Wp - s)
        n = len(rows) * len(cols)
        t0 = time.perf_counter()
        inf.predict_tile(variables, 0, scales=[s], return_probs=False)
        dt = time.perf_counter() - t0
        print(f"  [{label}] scale {s}: {n} windows ({-(-n // B)} batches), "
              f"{dt:.3f}s  ({n * s * s / dt / 1e6:.1f} forward-Mpx/s)",
              flush=True)
    t0 = time.perf_counter()
    pred, _ = inf.predict_tile(variables, 0, return_probs=False)
    dt = time.perf_counter() - t0
    print(f"  [{label}] window all scales: {dt:.3f}s "
          f"-> {h * w / dt / 1e6:.2f} Mpx/s", flush=True)

    # ---- dense mode -----------------------------------------------------
    inf.predict_tile_dense(variables, 0, block=512, halo=40, return_probs=False)
    t0 = time.perf_counter()
    inf.predict_tile_dense(variables, 0, block=512, halo=40, return_probs=False)
    dt = time.perf_counter() - t0
    print(f"  [{label}] dense block=512: {dt:.3f}s -> {h * w / dt / 1e6:.2f} Mpx/s",
          flush=True)
    return pred


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--scales", type=str, default="25,35,45,55,65")
    args = ap.parse_args()
    scales = tuple(int(s) for s in args.scales.split(","))

    enable_compilation_cache()
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    img_u8 = rng.integers(0, 256, (args.size, args.size, 3)).astype(np.uint8)
    mask = rng.integers(0, 6, (args.size, args.size)).astype(np.int32)

    cfg = Config(
        model=ModelConfig(net_type="dilated_icpr_rate6", num_classes=6),
        infer=InferConfig(scales=scales, window_batch=128),
    )
    model = build_model(cfg.model)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 25, 25, 3)))

    # +0.5 forces true f32 device storage (storage_dtype sniffs integer
    # values); per-channel normalization cancels the constant offset.
    ts_f32 = pack_tiles([img_u8.astype(np.float32) + 0.5], [mask])
    compute_stats(ts_f32)
    print("== f32 tile storage ==", flush=True)
    p_f32 = profile(ts_f32, "f32", cfg, variables, scales)

    ts_u8 = pack_tiles([img_u8], [mask])
    compute_stats(ts_u8)
    print("== uint8 tile storage ==", flush=True)
    p_u8 = profile(ts_u8, "u8", cfg, variables, scales)

    agree = (p_f32 == p_u8).mean()
    print(f"u8/f32 prediction agreement: {agree:.4f}", flush=True)


if __name__ == "__main__":
    main()
