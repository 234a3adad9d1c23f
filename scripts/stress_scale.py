"""Production-scale rehearsal on real hardware: a Potsdam-sized synthetic
set (default 20 x 3000^2 uint8 training tiles ~ 180 Mpx + 2 test tiles)
through the FULL pipeline — sampler tables (capped), device upload,
dynamic 5-scale training, crop validation, and both inference modes.

Usage: python scripts/stress_scale.py [--tiles 20] [--size 3000] [--iters 200]
"""

import argparse
import resource
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dynseg.cli import enable_compilation_cache
from dynseg.config import Config, DataConfig, InferConfig, ModelConfig, SchedulerConfig, TrainConfig
from dynseg.data.tiles import compute_stats, pack_tiles
from dynseg.infer import validate_test
from dynseg.sched.scheduler import ScaleScheduler
from dynseg.train import Trainer, train_loop


def synth_tiles(rng, n, size, num_classes=6, bands=3):
    """Potsdam-like uint8 rasters with learnable blob structure."""
    ims, mks = [], []
    sig = np.random.default_rng(7).uniform(40, 215, (num_classes, bands))
    for _ in range(n):
        low = rng.normal(size=(num_classes, size // 64 + 1, size // 64 + 1))
        fields = np.stack([np.kron(low[c], np.ones((64, 64)))[:size, :size]
                           for c in range(num_classes)])
        mask = np.argmax(fields, axis=0).astype(np.int32)
        im = sig[mask] + rng.normal(scale=14.0, size=(size, size, bands))
        ims.append(np.clip(np.round(im), 0, 255).astype(np.float32))
        mks.append(mask)
    return ims, mks


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=20)
    ap.add_argument("--size", type=int, default=3000)
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    enable_compilation_cache()
    print(f"platform: {jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)

    t0 = time.perf_counter()
    ims, mks = synth_tiles(rng, args.tiles, args.size)
    train_tiles = pack_tiles(ims, mks)
    compute_stats(train_tiles)
    ims_t, mks_t = synth_tiles(rng, 2, args.size)
    test_tiles = pack_tiles(ims_t, mks_t)
    test_tiles.mean, test_tiles.std = train_tiles.mean, train_tiles.std
    mpx = args.tiles * args.size ** 2 / 1e6
    print(f"built {args.tiles}x{args.size}^2 = {mpx:.0f} Mpx train set "
          f"in {time.perf_counter() - t0:.1f}s (host RSS {rss_gb():.1f} GB)",
          flush=True)

    cfg = Config(
        model=ModelConfig(net_type="dilated_icpr_rate6", num_classes=6),
        sched=SchedulerConfig(distribution_type="multinomial",
                              values=(25, 35, 45, 55, 65)),
        train=TrainConfig(batch_size=100, seed=0, steps_per_call=8,
                          metric_fetch_depth=4, rescale_batch_by_area=True,
                          niter=args.iters),
        infer=InferConfig(scales=(25, 35, 45, 55, 65), window_batch=128,
                          dense_block=512, dense_halo=40),
        data=DataConfig(dataset="synthetic",
                        max_positions_per_class=2_000_000),
    )
    t0 = time.perf_counter()
    trainer = Trainer(cfg, train_tiles)
    print(f"Trainer init (tables + upload): {time.perf_counter() - t0:.1f}s "
          f"(host RSS {rss_gb():.1f} GB; tile storage "
          f"{np.asarray(trainer.images).dtype})", flush=True)

    state = trainer.init_state(jax.random.key(0))
    t0 = time.perf_counter()
    times = trainer.compile_buckets(state)
    print("bucket compiles: "
          + " ".join(f"{s}:{dt:.0f}s" for s, dt in times.items()), flush=True)

    sched = ScaleScheduler(cfg.sched, seed=0)
    logs = []
    t0 = time.perf_counter()
    state = train_loop(cfg, trainer, state, sched, niter=args.iters,
                       log_every=max(50, args.iters // 4), log=logs.append)
    float(np.asarray(jax.tree_util.tree_leaves(state.params)[0]).ravel()[0])
    dt = time.perf_counter() - t0
    for line in logs:
        print("  " + line, flush=True)
    print(f"train {args.iters} iters (5-scale dynamic): {dt:.1f}s", flush=True)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    for mode in ("dense", "window"):
        import dataclasses
        c = dataclasses.replace(
            cfg, infer=dataclasses.replace(cfg.infer, mode=mode))
        t0 = time.perf_counter()
        scores = validate_test(c, variables, test_tiles, log=lambda *_: None)
        dt = time.perf_counter() - t0
        print(f"validate_test[{mode}] 2x{args.size}^2: {dt:.1f}s "
              f"({2 * args.size ** 2 / dt / 1e6:.2f} Mpx/s) "
              f"OA={scores['oa']:.4f} meanF1={scores['mean_f1']:.4f}",
              flush=True)
    print(f"final host RSS {rss_gb():.1f} GB", flush=True)


if __name__ == "__main__":
    main()
