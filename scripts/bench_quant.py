"""Measure the int8 serving-path speedup: float vs --quant int8.

Steady-state inference-only timing (restore/compile excluded): restores
the checkpoint in --output_path, binds synthetic tiles of --size, warms
every program with one full pass, then times --reps passes over all
tiles for each of {float, int8} x {dense, window}. Prints one JSON line
per row plus the speedup summary.

Usage:
  python scripts/bench_quant.py --output_path /tmp/verify_run \
      --values 25,35 --size 1024 --tiles 2 --reps 3
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output_path", required=True)
    ap.add_argument("--values", default="25,35")
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--tiles", type=int, default=2)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--window_batch", type=int, default=64)
    ap.add_argument("--modes", default="dense,window")
    ap.add_argument("--dense_block", type=int, default=None)
    ap.add_argument("--compute_dtype", default="float32")
    ap.add_argument("--quant_exit", action="store_true")
    ap.add_argument("--platform", default="",
                    help="force a jax platform (cpu for logic smoke)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from dynseg.checkpoint import CheckpointManager
    from dynseg.cli import (build_argparser, config_from_args,
                            enable_compilation_cache, _adopt_checkpoint_model)
    from dynseg.data.datasets import load_dataset
    from dynseg.infer import Inferencer
    from dynseg.sched.scheduler import ScaleScheduler
    from dynseg.train import init_state_template

    enable_compilation_cache()
    cli_args = build_argparser().parse_args([
        "--operation", "validate_test", "--dataset", "synthetic",
        "--output_path", args.output_path, "--values", args.values,
        "--window_batch", str(args.window_batch),
        "--compute_dtype", args.compute_dtype,
    ] + (["--dense_block", str(args.dense_block)]
         if args.dense_block else [])
      + (["--quant_exit"] if args.quant_exit else []))
    cfg = config_from_args(cli_args)
    ckpt = CheckpointManager(cfg.train.output_path)
    stats = ckpt.load_stats()
    if stats is None:
        raise SystemExit("no stats sidecar in --output_path; train first")
    cfg = _adopt_checkpoint_model(cfg, stats)
    scheduler = ScaleScheduler(cfg.sched, seed=cfg.train.seed)
    state, step = ckpt.restore_state(init_state_template(cfg), scheduler)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    print(f"platform={jax.devices()[0].platform} checkpoint@{step} "
          f"net={cfg.model.net_type}", flush=True)

    # load_dataset's num_tiles counts the TRAIN split; request enough
    # that the test split carries >= the asked-for tile count.
    _, tiles = load_dataset("synthetic", size=args.size,
                            num_tiles=max(4, 2 * args.tiles), seed=0)
    n_tiles = min(args.tiles, tiles.num_tiles)
    tiles.mean = np.asarray(stats["mean"], np.float32)
    tiles.std = np.asarray(stats["std"], np.float32)
    px = n_tiles * args.size * args.size

    results = {}
    for quant in ("none", "int8"):
        import dataclasses

        qcfg = dataclasses.replace(
            cfg, infer=dataclasses.replace(cfg.infer, quant=quant))
        inf = Inferencer(qcfg, tiles)
        qv = inf.enable_quant(variables)
        for mode in args.modes.split(","):
            def one_pass():
                outs = [
                    inf.predict_tile_device(qv, t)
                    if mode == "window"
                    else inf._dense_device(qv, t, qcfg.infer.dense_block,
                                           qcfg.infer.dense_halo)[0]
                    for t in range(n_tiles)
                ]
                for o in outs:
                    jax.block_until_ready(o)

            one_pass()  # warm: trace+compile every program
            t0 = time.perf_counter()
            for _ in range(args.reps):
                one_pass()
            dt = (time.perf_counter() - t0) / args.reps
            rate = px / dt / 1e6
            results[(quant, mode)] = rate
            print(json.dumps({
                "quant": quant, "mode": mode, "size": args.size,
                "tiles": n_tiles, "wall_s": round(dt, 3),
                "mpx_per_s": round(rate, 2),
            }), flush=True)
    for mode in args.modes.split(","):
        f, q = results[("none", mode)], results[("int8", mode)]
        print(json.dumps({"mode": mode,
                          "int8_speedup": round(q / f, 3)}), flush=True)


if __name__ == "__main__":
    main()
