"""Sweep dense-mode block size and compute dtype on hardware.

Dense blocks spill activations to HBM (ext^2 * channels * 4B per layer >>
VMEM), so throughput trades halo overhead (small blocks) against spill
(large blocks); bf16 halves the traffic. Reports Mpx/s + agreement vs
the f32 block=512 reference.

Usage: python scripts/sweep_dense.py [--size 2048] [--blocks 256,384,512,768]
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
from dynseg.infer import Inferencer
from dynseg.models.dilated import build_model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--blocks", type=str, default="256,384,512,768,1024")
    ap.add_argument("--halo", type=int, default=40)
    args = ap.parse_args()
    blocks = [int(b) for b in args.blocks.split(",")]

    enable_compilation_cache()
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (args.size, args.size, 3)).astype(np.uint8)
    mask = rng.integers(0, 6, (args.size, args.size)).astype(np.int32)
    ts = pack_tiles([img], [mask])
    compute_stats(ts)
    px = args.size * args.size

    ref = None
    for dtype in ("float32", "bfloat16"):
        mc = ModelConfig(net_type="dilated_icpr_rate6", num_classes=6,
                         compute_dtype=dtype)
        cfg = Config(model=mc, infer=InferConfig(scales=(25,), dense_halo=args.halo))
        variables = build_model(mc).init(jax.random.key(0), jnp.zeros((1, 25, 25, 3)))
        inf = Inferencer(cfg, ts)
        if ref is None:  # f32 block=512 reference predictions
            ref, _ = inf.predict_tile_dense(
                variables, 0, block=512, halo=args.halo, return_probs=False)
        for b in blocks:
            kw = dict(block=b, halo=args.halo, return_probs=False)
            inf.predict_tile_dense(variables, 0, **kw)  # compile + warm
            t0 = time.perf_counter()
            pred, _ = inf.predict_tile_dense(variables, 0, **kw)
            dt = time.perf_counter() - t0
            ext = b + 2 * args.halo
            print(f"{dtype} block={b} (ext={ext}, halo-ovh x{ext * ext / b / b:.2f}): "
                  f"{dt:.3f}s = {px / dt / 1e6:.2f} Mpx/s"
                  f"  agree(ref)={np.mean(pred == ref):.4f}", flush=True)


if __name__ == "__main__":
    main()
