"""Accuracy-parity bracket driver (SURVEY.md §7 hard part 1).

The reference source is unavailable (mount empty — SURVEY.md §0), so a
handful of semantic choices are MED-confidence reconstructions that can
each move F1 by >0.5%:

  * scheduler sign convention  (favor_high_score: exploit good contexts
    vs train struggling ones — SURVEY.md §3.4)
  * scheduler score source     (update_type: acc vs loss)
  * leaky-ReLU slope           (0.1 vs TF's default 0.2)
  * batch norm in conv blocks  (present vs absent)

This script trains every bracket combination on the same dataset/seed
schedule and reports validation mean-F1 per combination, so the winning
semantics can be picked by validation score — the paper's protocol
permits exactly that. Run it on the real dataset the moment one is
available; on this machine it exercises the bracket on synthetic rasters
(which also guards every combination against crashes/NaNs).

Usage:
    python scripts/parity_bracket.py [--dataset synthetic_multi]
        [--niter 300] [--seeds 2] [--values 9,15] [--out bracket.json]
"""

import argparse
import dataclasses
import itertools
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="synthetic_multi")
    ap.add_argument("--dataset_path", default="")
    ap.add_argument("--fold", type=int, default=0)
    ap.add_argument("--niter", type=int, default=300)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--values", default="9,15")
    ap.add_argument("--seeds", type=int, default=2,
                    help="repeat each combination with this many seeds")
    ap.add_argument("--width_multiplier", type=float, default=0.25)
    ap.add_argument("--net_type", default="dilated_icpr_rate6")
    ap.add_argument("--out", default="bracket.json")
    ap.add_argument("--platform", default="",
                    help="'cpu' forces XLA-CPU (smoke runs; the axon "
                         "sitecustomize ignores JAX_PLATFORMS)")
    ap.add_argument("--combos", type=int, default=0,
                    help="only run the first N bracket combinations (smoke)")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from dynseg.cli import (build_argparser, config_from_args,
                            enable_compilation_cache, run_training)

    enable_compilation_cache()  # combos share per-scale bucket programs

    bracket = list(itertools.product(
        (True, False),        # favor_high_score
        ("acc", "loss"),      # update_type
        (0.1, 0.2),           # leaky_slope
        (True, False),        # use_batch_norm
    ))
    if args.combos:
        bracket = bracket[: args.combos]
    results = []
    try:
        _run_bracket(args, bracket, results,
                     build_argparser, config_from_args, run_training)
    except KeyboardInterrupt:
        # train_loop's graceful handler only covers interrupts landing
        # inside the hot loop; Ctrl-C during dataset load / bucket
        # compile / between combos raised through here and lost the
        # completed combos' ranking (review r2).
        print("interrupted outside train_loop — writing partial ranking")
        _write(results, args.out)
        return 130
    _write(results, args.out)
    return 0


def _run_bracket(args, bracket, results,
                 build_argparser, config_from_args, run_training) -> None:
    for favor, upd, slope, bn in bracket:
        f1s = []
        for seed in range(args.seeds):
            with tempfile.TemporaryDirectory() as tmp:
                cli = build_argparser().parse_args([
                    "--operation", "training",
                    "--dataset", args.dataset,
                    "--dataset_path", args.dataset_path,
                    "--fold", str(args.fold),
                    "--output_path", tmp,
                    "--net_type", args.net_type,
                    "--distribution_type", "multinomial",
                    "--values", args.values,
                    "--update_type", upd,
                    "--niter", str(args.niter),
                    "--batch_size", str(args.batch_size),
                    "--seed", str(seed),
                    "--eval_every", str(10 * args.niter),
                    "--checkpoint_every", str(10 * args.niter),
                    "--no_prediction_maps",
                ])
                cfg = config_from_args(cli)
                cfg = dataclasses.replace(
                    cfg,
                    model=dataclasses.replace(
                        cfg.model, leaky_slope=slope, use_batch_norm=bn,
                        width_multiplier=args.width_multiplier),
                    sched=dataclasses.replace(
                        cfg.sched, favor_high_score=favor),
                )
                scores = run_training(cfg, log=lambda *_: None)
                if scores.get("preempted"):
                    # Ctrl-C inside train_loop lands here via its
                    # graceful stop; re-raise so main()'s handler writes
                    # the partial ranking exactly once and exits 130.
                    raise KeyboardInterrupt
                f1s.append(float(scores["mean_f1"]))
        mean = sum(f1s) / len(f1s)
        combo = {"favor_high_score": favor, "update_type": upd,
                 "leaky_slope": slope, "use_batch_norm": bn,
                 "mean_f1": round(mean, 4), "per_seed": f1s}
        results.append(combo)
        print(json.dumps(combo))


def _write(results, out_path: str) -> None:
    if not results:
        return
    results.sort(key=lambda r: -r["mean_f1"])
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    best = results[0]
    print(f"\nBEST bracket: favor_high_score={best['favor_high_score']} "
          f"update_type={best['update_type']} "
          f"leaky_slope={best['leaky_slope']} "
          f"use_batch_norm={best['use_batch_norm']} "
          f"meanF1={best['mean_f1']}")
    print(f"full ranking -> {out_path}")


if __name__ == "__main__":
    raise SystemExit(main())
