"""Coffee 5-fold cross-county protocol driver (SURVEY.md C2a / §4).

The reference reports fold-averaged metrics for the Brazilian Coffee
dataset; its CLI runs one fold per invocation. This driver runs all
folds (training + validate_test each) and aggregates mean +- std of
OA / kappa / mean-F1 into folds_summary.json.

Usage: python scripts/run_folds.py --dataset coffee --dataset_path ... \
           --output_path /out [--folds 5] [any dynseg CLI flag...]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _write_summary(output_path: str, results: list, folds: int) -> None:
    summary = {
        "folds": results,
        "folds_requested": folds,
        "complete": len(results) == folds,
    }
    if results:
        summary.update({
            "oa_mean": float(np.mean([r["oa"] for r in results])),
            "oa_std": float(np.std([r["oa"] for r in results])),
            "kappa_mean": float(np.mean([r["kappa"] for r in results])),
            "kappa_std": float(np.std([r["kappa"] for r in results])),
            "mean_f1_mean": float(np.mean([r["mean_f1"] for r in results])),
            "mean_f1_std": float(np.std([r["mean_f1"] for r in results])),
        })
    path = os.path.join(output_path, "folds_summary.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    print(f"wrote {path}")


def main(argv=None) -> int:
    # allow_abbrev=False: --fold is a REAL dynseg CLI flag; with
    # abbreviation on, argparse would swallow it as --folds and the
    # documented pass-through silently breaks (review r2).
    ap = argparse.ArgumentParser(
        prog="run_folds",
        description=__doc__.splitlines()[0],
        epilog="All other flags pass through to the dynseg CLI.",
        allow_abbrev=False,
    )
    ap.add_argument("--folds", type=int, default=5)
    ap.add_argument("--output_path", required=True)
    args, passthrough = ap.parse_known_args(argv)
    if args.folds < 1:
        ap.error("--folds must be >= 1")
    if any(p == "--fold" or p.startswith("--fold=") for p in passthrough):
        # argparse last-wins: a leftover --fold would override the
        # driver's per-fold value, training the SAME fold N times and
        # aggregating fake cross-fold statistics (review r2, round 2).
        ap.error("--fold conflicts with the fold driver (it sets --fold "
                 "per iteration); drop it from the pass-through flags")

    from dynseg.cli import enable_compilation_cache

    enable_compilation_cache()  # folds share per-scale bucket programs

    results = []
    try:
        rc = _run_folds(args, passthrough, results)
    except BaseException:
        # A TPU outage / OOM raising out of a late fold must not lose
        # the completed folds' aggregation (review r2, round 2) — write
        # the partial summary, then re-raise.
        if results:
            print("run failed — writing partial summary", file=sys.stderr)
            _write_summary(args.output_path, results, args.folds)
        raise
    if rc is not None:  # preempted inside a fold (summary already written)
        return rc
    _write_summary(args.output_path, results, args.folds)
    return 0


def _run_folds(args, passthrough, results):
    from dynseg.cli import build_argparser, config_from_args, run_training
    from dynseg.utils.logging import MetricLogger

    for fold in range(args.folds):
        out = os.path.join(args.output_path, f"fold{fold}")
        cli_args = build_argparser().parse_args(
            ["--operation", "training", "--output_path", out,
             "--fold", str(fold)] + passthrough
        )
        cfg = config_from_args(cli_args)
        logger = MetricLogger(out)
        logger.log(f"=== fold {fold}/{args.folds} ===")
        scores = run_training(cfg, log=logger)
        logger.close()
        if scores.get("preempted"):
            # SIGTERM/SIGINT inside train_loop RETURNS (preemption-safe
            # checkpoint written); without this the aggregation crashed
            # on the missing score keys and the completed folds' summary
            # was lost (review r2). Write what finished, then stop.
            print(f"fold {fold} preempted at iteration "
                  f"{scores.get('iteration')} — writing partial summary",
                  file=sys.stderr)
            _write_summary(args.output_path, results, args.folds)
            return 1
        results.append(
            {"fold": fold, "oa": scores["oa"], "kappa": scores["kappa"],
             "mean_f1": scores["mean_f1"],
             "f1": list(map(float, scores["f1"]))}
        )
    return None


if __name__ == "__main__":
    sys.exit(main())
