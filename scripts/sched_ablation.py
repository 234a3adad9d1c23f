"""Scheduler ablation on the context-sensitive texture benchmark.

Round-1 verdict: the dynamic-scale scheduler (SURVEY.md C12, "THE core
novelty") was implemented and unit-tested but never SHOWN to do anything
— the color-synthetic benchmark saturates regardless of context. This
driver runs every distribution_type (plus single_fixed at EACH scale) on
`synthetic_texture`, where per-pixel accuracy on the coarse texture pair
genuinely depends on spatial context, and reports test OA/meanF1 per
configuration over N seeds — the committed evidence that score-driven
context selection earns its keep (or doesn't).

Each run evaluates with the full method's protocol: window voting over
the scales that config trained on (single_fixed@v votes at v alone; the
dynamic configs fuse all --values — that IS the method under test).

Usage:
    python scripts/sched_ablation.py [--niter 1500] [--seeds 3]
        [--values 25,35,45,55,65] [--out docs/sched_ablation.json]
"""

import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(args, distribution, values, seed, update_type="acc"):
    from dynseg.cli import build_argparser, config_from_args, run_training

    with tempfile.TemporaryDirectory() as tmp:
        cli = build_argparser().parse_args([
            "--operation", "training",
            "--dataset", args.dataset,
            "--dataset_path", args.dataset_path,
            "--dataset_kwargs", args.dataset_kwargs,
            "--output_path", tmp,
            "--net_type", args.net_type,
            "--distribution_type", distribution,
            "--values", ",".join(str(v) for v in values),
            "--update_type", update_type,
            "--sched_temperature", str(args.sched_temperature),
            "--niter", str(args.niter),
            "--batch_size", str(args.batch_size),
            "--learning_rate", str(args.learning_rate),
            "--seed", str(seed),
            "--eval_every", str(10 * args.niter),
            "--checkpoint_every", str(10 * args.niter),
            "--window_batch", str(args.window_batch),
            "--no_prediction_maps",
        ] + (["--rescale_batch_by_area"] if args.rescale_batch_by_area else []))
        cfg = config_from_args(cli)
        if args.width_multiplier != 1.0:
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(
                    cfg.model, width_multiplier=args.width_multiplier))
        logs = []

        def log(*msg):
            line = " ".join(str(m) for m in msg)
            logs.append(line)
            if "final scale distribution" in line:
                print(f"    {line}")

        t0 = time.time()
        scores = run_training(cfg, log=log)
        if scores.get("preempted"):
            raise KeyboardInterrupt
        return {
            "seed": seed,
            "oa": float(scores["oa"]),
            "kappa": float(scores["kappa"]),
            "mean_f1": float(scores["mean_f1"]),
            "wall_s": round(time.time() - t0, 1),
            "final_distribution": next(
                (ln for ln in logs if "final scale distribution" in ln), ""),
        }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="synthetic_texture")
    ap.add_argument("--dataset_path", default="")
    ap.add_argument("--dataset_kwargs", default="",
                    help="JSON loader kwargs (e.g. the harsh-imbalance "
                         "run: '{\"class_probs\": [0.02,0.08,0.55,0.35]}')")
    ap.add_argument("--values", default="25,35,45,55,65")
    ap.add_argument("--niter", type=int, default=1500)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--learning_rate", type=float, default=0.01)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--seed_start", type=int, default=0,
                    help="first seed (extend an earlier sweep without "
                         "re-running its seeds; merge the JSONs offline)")
    ap.add_argument("--net_type", default="dilated_icpr_rate6")
    ap.add_argument("--width_multiplier", type=float, default=1.0)
    ap.add_argument("--window_batch", type=int, default=256)
    ap.add_argument("--rescale_batch_by_area", action="store_true")
    ap.add_argument("--update_type", default="acc")
    ap.add_argument("--sched_temperature", type=float, default=1.0)
    ap.add_argument("--distributions", default="multi_fixed,uniform,multinomial",
                    help="comma list of dynamic distribution types to run")
    ap.add_argument("--tag", default="",
                    help="suffix appended to config names in the output")
    ap.add_argument("--skip_single_fixed", action="store_true",
                    help="only run the dynamic distribution types over the "
                         "full --values list (skip per-scale baselines)")
    ap.add_argument("--out", default="docs/sched_ablation.json")
    ap.add_argument("--platform", default="",
                    help="'cpu' forces XLA-CPU (axon ignores JAX_PLATFORMS)")
    args = ap.parse_args()
    if args.seeds < 1:
        # review r2 (round 2): 0 reached summarize() and died on
        # sum([])/0 after the (empty) sweep
        ap.error("--seeds must be >= 1")

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    values = [int(v) for v in args.values.split(",")]
    # Validate up front: a typo'd distribution must fail NOW, not after
    # hours of completed baseline runs (config_from_args would raise
    # mid-sweep and the partial-results writer only catches ^C).
    from dynseg.config import DISTRIBUTION_TYPES

    dists = [d.strip() for d in args.distributions.split(",") if d.strip()]
    bad = [d for d in dists if d not in DISTRIBUTION_TYPES]
    if bad:
        ap.error(f"unknown --distributions {bad}; accepted: "
                 f"{sorted(DISTRIBUTION_TYPES)}")
    configs = []
    if not args.skip_single_fixed:
        configs += [(f"single_fixed@{v}{args.tag}", "single_fixed", [v])
                    for v in values]
    configs += [(d + args.tag, d, values) for d in dists]

    from dynseg.cli import enable_compilation_cache

    enable_compilation_cache()  # configs/seeds share bucket programs

    def summarize(name, dist, vals, runs):
        oas = [r["oa"] for r in runs]
        f1s = [r["mean_f1"] for r in runs]
        return {
            "config": name, "distribution": dist, "values": vals,
            "oa_mean": round(sum(oas) / len(oas), 4),
            "oa_min": round(min(oas), 4), "oa_max": round(max(oas), 4),
            "f1_mean": round(sum(f1s) / len(f1s), 4),
            "runs": runs,
        }

    results = []
    try:
        for name, dist, vals in configs:
            runs = []
            for seed in range(args.seed_start, args.seed_start + args.seeds):
                print(f"[{name} seed={seed}] ...", flush=True)
                try:
                    r = run_one(args, dist, vals, seed,
                                update_type=args.update_type)
                except BaseException:
                    # Keep the in-flight config's COMPLETED seeds too —
                    # each is a full training run; dropping them defeated
                    # the --seed_start extension workflow (review r2).
                    # BaseException: TPU outages raise RuntimeError, not
                    # just Ctrl-C (review r2, round 2).
                    if runs:
                        results.append(summarize(
                            name + "(partial)", dist, vals, runs))
                    raise
                print(f"[{name} seed={seed}] OA={r['oa']:.4f} "
                      f"meanF1={r['mean_f1']:.4f} ({r['wall_s']}s)",
                      flush=True)
                runs.append(r)
            results.append(summarize(name, dist, vals, runs))
    except KeyboardInterrupt:
        print("interrupted — writing partial results")
    except BaseException:
        # TPU outages ("Unavailable") raise mid-sweep: hours of completed
        # training runs must not be lost with them (review r2, round 2) —
        # write partials, then re-raise for the caller/driver.
        print("run failed — writing partial results", file=sys.stderr)
        if results:
            os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
            with open(args.out, "w") as f:
                json.dump({"partial": True, "results": results}, f, indent=2)
        raise

    results.sort(key=lambda r: -r["oa_mean"])
    payload = {
        "dataset": args.dataset, "values": values, "niter": args.niter,
        "batch_size": args.batch_size, "seeds": args.seeds,
        "seed_start": args.seed_start, "net_type": args.net_type,
        "update_type": args.update_type,
        "sched_temperature": args.sched_temperature,
        "distributions": dists, "tag": args.tag,
        "rescale_batch_by_area": args.rescale_batch_by_area,
        # Provenance: the generator knobs are part of the protocol (the
        # @clean3k leg IS label_noise=0.0) — without them a JSON can't
        # be reproduced or paired against (noticed reconstructing the
        # clean3k invocation from a shell script, r3).
        "dataset_kwargs": args.dataset_kwargs,
        "results": results,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"\n{'config':<18} {'OA':>8} {'min':>8} {'max':>8} {'meanF1':>8}")
    for r in results:
        print(f"{r['config']:<18} {r['oa_mean']:>8.4f} {r['oa_min']:>8.4f} "
              f"{r['oa_max']:>8.4f} {r['f1_mean']:>8.4f}")
    print(f"-> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
