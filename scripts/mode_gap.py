"""Quantify the dense-vs-window estimator accuracy gap (round-1 verdict
"What's weak" #3 / "Next round" #5).

`dense` inference is ~7x faster than reference-parity `window` voting but
is a DIFFERENT estimator: one full-receptive-field forward per pixel,
where the window mode feeds the net patch-sized contexts like training
did. Round 1 asserted-but-never-measured the accuracy cost. This driver
measures it on the context-sensitive texture benchmark for two training
regimes:

  * single_fixed@25 — trained on small contexts only: dense inference
    hands the net far more context than it ever saw (worst case for the
    estimator mismatch);
  * multinomial 25..65 — dynamic training covered contexts up to 65 px
    (~ the nets' receptive field): dense input looks in-distribution.

For each: OA/meanF1 under window (trained scales), dense, and the wall
time of each mode — the committed mode-choice table for BENCHMARKS.md.

Usage: python scripts/mode_gap.py [--niter 1500] [--seeds 2]
"""

import argparse
import dataclasses
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="synthetic_texture")
    ap.add_argument("--niter", type=int, default=1500)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--net_type", default="dilated_icpr_rate6")
    ap.add_argument("--out", default="docs/mode_gap.json")
    args = ap.parse_args()
    if args.seeds < 1:
        # review r2 (round 2): 0 crashed the summary with
        # ZeroDivisionError after the (empty) sweep
        ap.error("--seeds must be >= 1")

    from dynseg.cli import (build_argparser, config_from_args,
                            enable_compilation_cache, run_testing,
                            run_training)

    # Persistent compile cache (cli.main enables it for CLI runs; direct
    # run_training callers must too) — without it every combo pays full
    # per-scale bucket compiles AND the timed run_testing legs below
    # would charge compile time to the mode-choice wall_s table.
    enable_compilation_cache()

    regimes = [
        ("single_fixed@25", "single_fixed", "25"),
        ("multinomial25-65", "multinomial", "25,35,45,55,65"),
    ]
    rows = []
    for name, dist, values in regimes:
        for seed in range(args.seeds):
            with tempfile.TemporaryDirectory() as tmp:
                cli = build_argparser().parse_args([
                    "--operation", "training",
                    "--dataset", args.dataset,
                    "--output_path", tmp,
                    "--net_type", args.net_type,
                    "--distribution_type", dist,
                    "--values", values,
                    "--niter", str(args.niter),
                    "--batch_size", str(args.batch_size),
                    "--rescale_batch_by_area",
                    "--seed", str(seed),
                    "--eval_every", str(10 * args.niter),
                    "--checkpoint_every", str(10 * args.niter),
                    "--window_batch", "256",
                    "--no_prediction_maps",
                ])
                cfg = config_from_args(cli)
                scores = run_training(cfg, log=lambda *_: None)
                if scores.get("preempted"):
                    # SIGINT/SIGTERM lands inside train_loop's handler and
                    # run_training RETURNS (it does not raise) — without
                    # this check a half-trained checkpoint would be
                    # evaluated and recorded as a real row (review r2).
                    print("preempted — aborting sweep", file=sys.stderr)
                    return 1
                row = {"train": name, "seed": seed}
                for mode in ("window", "dense"):
                    # warm the mode's programs, then read the library's
                    # own inference-only timer: an end-to-end stopwatch
                    # around run_testing charged dataset regeneration +
                    # checkpoint restore to the mode, distorting the
                    # fast (dense) leg most (review r2, round 2)
                    cfg_m = dataclasses.replace(
                        cfg, infer=dataclasses.replace(cfg.infer, mode=mode))
                    run_testing(cfg_m, log=lambda *_: None)
                    s = run_testing(cfg_m, log=lambda *_: None)
                    row[mode] = {
                        "oa": round(float(s["oa"]), 4),
                        "mean_f1": round(float(s["mean_f1"]), 4),
                        "wall_s": float(s["infer_wall_s"]),
                    }
                row["gap_oa"] = round(row["window"]["oa"] - row["dense"]["oa"], 4)
                print(json.dumps(row), flush=True)
                rows.append(row)

    summary = []
    for name, _, _ in regimes:
        rs = [r for r in rows if r["train"] == name]
        summary.append({
            "train": name,
            "window_oa": round(sum(r["window"]["oa"] for r in rs) / len(rs), 4),
            "dense_oa": round(sum(r["dense"]["oa"] for r in rs) / len(rs), 4),
            "gap_oa": round(sum(r["gap_oa"] for r in rs) / len(rs), 4),
        })
    payload = {"dataset": args.dataset, "niter": args.niter,
               "seeds": args.seeds, "rows": rows, "summary": summary}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
