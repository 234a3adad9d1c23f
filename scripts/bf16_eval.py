"""bf16 inference: accuracy delta + dense throughput, end to end.

The MFU probe (docs/mfu_probe.json) measured the bare dense forward at
+13% with bfloat16 activations (96.5 -> 108.9 TF/s, batch-8 block
shape). This driver answers the two questions that decide whether the
lever ships as a default: (1) what does bf16 COMPUTE (params stay f32,
`ModelConfig.compute_dtype`) cost in accuracy on the context-sensitive
texture benchmark, per seed, in both window-voting and dense modes; and
(2) how much of the bare +13% survives to end-to-end dense Mpx/s.

Trains each seed ONCE in f32 (training dtype is not under test — the
reference-parity trainer is f32; SURVEY.md C11), then restores the same
checkpoint with f32 vs bf16 compute for evaluation.

Usage:
    python scripts/bf16_eval.py [--seeds 3] [--niter 1000]
        [--out docs/bf16_eval.json]
"""

import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--niter", type=int, default=1000)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--values", default="25,35,45,55,65")
    ap.add_argument("--dense_block", type=int, default=512)
    ap.add_argument("--out", default="docs/bf16_eval.json")
    ap.add_argument("--platform", default="",
                    help="'cpu' forces XLA-CPU (axon ignores JAX_PLATFORMS)")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from dynseg.cli import (build_argparser, config_from_args,
                            enable_compilation_cache, run_testing,
                            run_training)

    enable_compilation_cache()
    results = []
    for seed in range(args.seeds):
        with tempfile.TemporaryDirectory() as tmp:
            base = [
                "--operation", "training",
                "--dataset", "synthetic_texture",
                "--output_path", tmp,
                "--net_type", "dilated_icpr_rate6",
                "--distribution_type", "multinomial",
                "--values", args.values,
                "--niter", str(args.niter),
                "--batch_size", str(args.batch_size),
                "--seed", str(seed),
                "--eval_every", str(10 * args.niter),
                "--checkpoint_every", str(10 * args.niter),
                "--window_batch", "256",
                "--no_prediction_maps",
            ]
            cli = build_argparser().parse_args(base)
            run_training(config_from_args(cli), log=lambda *a: None)

            row = {"seed": seed}
            for mode in ("window", "dense"):
                for dtype in ("float32", "bfloat16"):
                    cli = build_argparser().parse_args(base + [
                        "--compute_dtype", dtype,
                        "--inference_mode", mode,
                        "--dense_block", str(args.dense_block),
                    ])
                    cfg = config_from_args(cli)
                    t0 = time.time()
                    scores = run_testing(cfg, log=lambda *a: None)
                    key = f"{mode}_" + (
                        "f32" if dtype == "float32" else "bf16")
                    row[key] = {
                        "oa": round(float(scores["oa"]), 4),
                        "mean_f1": round(float(scores["mean_f1"]), 4),
                        "wall_s": round(time.time() - t0, 1),
                    }
                    print(f"[seed {seed}] {mode}/{dtype}: "
                          f"OA={row[key]['oa']:.4f} "
                          f"({row[key]['wall_s']}s)", flush=True)
            results.append(row)

    def agg(key, field):
        vals = [r[key][field] for r in results]
        return round(sum(vals) / len(vals), 4)

    summary = {
        "window_oa_f32": agg("window_f32", "oa"),
        "window_oa_bf16": agg("window_bf16", "oa"),
        "dense_oa_f32": agg("dense_f32", "oa"),
        "dense_oa_bf16": agg("dense_bf16", "oa"),
        "per_seed": results,
        "protocol": {
            "train": "f32 multinomial, texture benchmark",
            "niter": args.niter, "batch_size": args.batch_size,
            "values": args.values, "dense_block": args.dense_block,
        },
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items()
                      if k not in ("per_seed", "protocol")}))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
