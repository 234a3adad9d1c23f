"""Diagnose the clean-horizon collapse seeds (VERDICT r3 #2).

BENCHMARKS.md findings 4-5: on 3000-iter CLEAN-label texture runs,
stochastic schedules lose to cycling by -5.6 to -7.9pp with +-10pp
paired spreads — the same low-OA "collapse" seeds appearing for both
the iid multinomial and the variance-free stratified control, so the
cause is training dynamics, not sampling variance. That claim was
asserted, never diagnosed. This driver produces the missing evidence:

1. Re-runs named (distribution, seed) cells of the clean3k sweep with
   per-iteration TRAIN trajectories (loss/acc/scale every log_every)
   and periodic VALIDATION trajectories (crop loss/acc/kappa/meanF1
   every --eval_every), all parsed from the training log.
2. Trains with --keep_best semantics and evaluates the SAME run twice:
   final checkpoint vs best-validation checkpoint — does the recovery
   that works for the memorization collapse (docs/soak10k.log) also
   recover the clean-horizon collapse?
3. Accepts hypothesis knobs (--learning_rate, --lr_decay_rate/steps,
   --no_batch_norm, --batch_size) so the collapsed cells can be
   re-run under one concrete mechanism hypothesis per invocation.
4. --ema_decay > 0 (r4) trains with the params-EMA tracker and reports
   THREE evals of the same run: raw final iterate, EMA iterate, and
   best-validation checkpoint — the selection-free mitigation measured
   head-to-head against keep_best on the exact collapse cells.

Reference context: the scheduler under test is SURVEY.md C12 ([R]
dynamic.py:≈train loop); the reference never ran clean-label ablations
— this is the new framework's own evidence base.

Usage:
    python scripts/diagnose_collapse.py \
        --runs multinomial:0,multinomial:4,multinomial_stratified:4 \
        --out docs/collapse_diag.json
"""

import argparse
import dataclasses
import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VAL_RE = re.compile(
    r"\[val @ iter (\d+)\] loss=([\d.]+) acc=([\d.]+) "
    r"kappa=([-\d.]+) meanF1=([\d.]+)")
ITER_RE = re.compile(
    r"iter (\d+)/\d+ scale=(\d+) loss=([\d.]+) acc=([\d.]+)")
# the trailing scheduler summary on each iter line: "25:p=0.19,s=0.915 ..."
SCORE_RE = re.compile(r"(\d+):p=([\d.]+),s=([-\d.]+|-)")
BEST_RE = re.compile(r"restored best checkpoint at iteration (\d+)")


def build_cli(args, distribution, seed, outdir, operation):
    from dynseg.cli import build_argparser

    argv = [
        "--operation", operation,
        "--dataset", args.dataset,
        "--dataset_path", args.dataset_path,
        "--dataset_kwargs", args.dataset_kwargs,
        "--output_path", outdir,
        "--net_type", args.net_type,
        "--distribution_type", distribution,
        "--values", args.values,
        "--update_type", args.update_type,
        "--niter", str(args.niter),
        "--batch_size", str(args.batch_size),
        "--learning_rate", str(args.learning_rate),
        "--lr_decay_rate", str(args.lr_decay_rate),
        "--lr_decay_steps", str(args.lr_decay_steps),
        "--seed", str(seed),
        "--eval_every", str(args.eval_every),
        "--checkpoint_every", str(10 * args.niter),
        "--window_batch", str(args.window_batch),
        "--no_prediction_maps",
    ]
    if args.no_batch_norm:
        argv += ["--use_batch_norm", "false"]
    if args.bn_momentum != 0.9:
        argv += ["--bn_momentum", str(args.bn_momentum)]
    if args.compute_dtype:
        argv += ["--compute_dtype", args.compute_dtype]
    if args.ema_decay > 0:
        argv += ["--ema_decay", str(args.ema_decay)]
    if operation == "training":
        argv += ["--keep_best"]
    return build_argparser().parse_args(argv)


def run_cell(args, distribution, seed):
    from dynseg.cli import config_from_args, run_testing, run_training

    outdir = os.path.join(args.workdir, f"{distribution}_s{seed}")
    shutil.rmtree(outdir, ignore_errors=True)
    os.makedirs(outdir, exist_ok=True)

    logs = []

    def log(*msg):
        logs.append(" ".join(str(m) for m in msg))

    cfg = config_from_args(build_cli(args, distribution, seed, outdir,
                                     "training"))
    if args.width_multiplier != 1.0:  # CPU pilots / smoke runs
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, width_multiplier=args.width_multiplier))
    t0 = time.time()
    final = run_training(cfg, log=log, keep_best=True)
    if final.get("preempted"):
        raise KeyboardInterrupt
    wall = time.time() - t0

    val_traj = [
        {"iter": int(m[0]), "loss": float(m[1]), "acc": float(m[2]),
         "kappa": float(m[3]), "mean_f1": float(m[4])}
        for ln in logs for m in VAL_RE.findall(ln)
    ]
    train_traj = []
    for ln in logs:
        for m in ITER_RE.findall(ln):
            row = {"iter": int(m[0]), "scale": int(m[1]),
                   "loss": float(m[2]), "acc": float(m[3])}
            scores = {int(v): (None if s == "-" else float(s))
                      for v, _p, s in SCORE_RE.findall(ln)}
            if scores:  # per-scale score table at this iteration
                row["scores"] = scores
            train_traj.append(row)

    # Second full-tile eval of the SAME run at the best-validation
    # checkpoint (run_training's final validate_test used the LAST one).
    best_logs = []
    cfg_t = config_from_args(build_cli(args, distribution, seed, outdir,
                                       "testing"))
    # With EMA on, pin the arms' semantics: best = the RAW iterate at the
    # best-validation step (keep_best scores raw — the proven mitigation);
    # the EMA arm below serves the recalibrated sidecar statistics (auto).
    best_use_ema = False if args.ema_decay > 0 else None
    if args.width_multiplier != 1.0:
        cfg_t = dataclasses.replace(cfg_t, model=dataclasses.replace(
            cfg_t.model, width_multiplier=args.width_multiplier))
    best = run_testing(cfg_t, log=lambda *m: best_logs.append(
        " ".join(str(x) for x in m)), use_best=True, use_ema=best_use_ema)
    best_iter = next(
        (int(m.group(1)) for ln in best_logs for m in [BEST_RE.search(ln)]
         if m), None)

    ema = None
    if args.ema_decay > 0:
        # With EMA on, run_training's final eval (and the best eval
        # above) already score the EMA weights — the raw final iterate
        # needs its own explicit pass for the three-way comparison.
        ema = final
        final = run_testing(cfg_t, log=lambda *m: None, use_ema=False)

    if not args.keep_checkpoints:
        shutil.rmtree(outdir, ignore_errors=True)
    return {
        "distribution": distribution,
        "seed": seed,
        "final_oa": float(final["oa"]),
        "final_mean_f1": float(final["mean_f1"]),
        "best_oa": float(best["oa"]),
        "best_mean_f1": float(best["mean_f1"]),
        "best_iter": best_iter,
        **({"ema_oa": float(ema["oa"]),
            "ema_mean_f1": float(ema["mean_f1"])} if ema else {}),
        "wall_s": round(wall, 1),
        "val_trajectory": val_traj,
        "train_trajectory": train_traj,
        "final_distribution": next(
            (ln for ln in logs if "final scale distribution" in ln), ""),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", required=True,
                    help="comma list of distribution:seed cells, e.g. "
                         "multinomial:0,multi_fixed:0")
    ap.add_argument("--dataset", default="synthetic_texture")
    ap.add_argument("--dataset_path", default="")
    ap.add_argument("--dataset_kwargs", default='{"label_noise": 0.0}')
    ap.add_argument("--values", default="25,35,45,55,65")
    ap.add_argument("--niter", type=int, default=3000)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--learning_rate", type=float, default=0.01)
    ap.add_argument("--lr_decay_rate", type=float, default=1.0)
    ap.add_argument("--lr_decay_steps", type=int, default=50000)
    ap.add_argument("--no_batch_norm", action="store_true")
    ap.add_argument("--compute_dtype", default="",
                    help="train in this activation dtype (bfloat16 = the "
                         "r5 mixed-precision-training evaluation, VERDICT "
                         "r4 #5; empty = CLI default f32)")
    ap.add_argument("--bn_momentum", type=float, default=0.9,
                    help="hypothesis knob: the oscillation is BN-coupled "
                         "(follow-up 2) — does a slower statistics track "
                         "(0.99) damp it at the source?")
    ap.add_argument("--ema_decay", type=float, default=0.0,
                    help=">0 trains with the params-EMA tracker and adds "
                         "a third eval (EMA iterate) per cell")
    ap.add_argument("--update_type", default="acc")
    ap.add_argument("--net_type", default="dilated_icpr_rate6")
    ap.add_argument("--width_multiplier", type=float, default=1.0,
                    help="narrow the model for CPU pilots/smoke runs "
                         "(sidecar records it, so the eval passes match)")
    ap.add_argument("--eval_every", type=int, default=100)
    ap.add_argument("--window_batch", type=int, default=256)
    ap.add_argument("--workdir", default="/tmp/collapse_diag")
    ap.add_argument("--keep_checkpoints", action="store_true")
    ap.add_argument("--tag", default="",
                    help="free-form label recorded in the payload (name "
                         "the hypothesis this invocation tests)")
    ap.add_argument("--out", default="docs/collapse_diag.json")
    ap.add_argument("--platform", default="")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    cells = []
    for tok in args.runs.split(","):
        dist, _, seed = tok.strip().partition(":")
        if not seed.lstrip("-").isdigit():
            ap.error(f"bad --runs cell {tok!r} (want distribution:seed)")
        cells.append((dist, int(seed)))

    from dynseg.cli import enable_compilation_cache

    enable_compilation_cache()

    results = []
    payload = {
        "tag": args.tag,
        "dataset": args.dataset,
        "dataset_kwargs": args.dataset_kwargs,
        "niter": args.niter,
        "batch_size": args.batch_size,
        "learning_rate": args.learning_rate,
        "lr_decay_rate": args.lr_decay_rate,
        "lr_decay_steps": args.lr_decay_steps,
        "no_batch_norm": args.no_batch_norm,
        "bn_momentum": args.bn_momentum,
        "compute_dtype": args.compute_dtype or "float32",
        "ema_decay": args.ema_decay,
        "width_multiplier": args.width_multiplier,
        "eval_every": args.eval_every,
        "results": results,
    }

    def write(partial):
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        payload["partial"] = partial
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=2)

    try:
        for dist, seed in cells:
            print(f"[{dist} seed={seed}] ...", flush=True)
            r = run_cell(args, dist, seed)
            extra = (f" ema OA={r['ema_oa']:.4f}" if "ema_oa" in r else "")
            print(f"[{dist} seed={seed}] final OA={r['final_oa']:.4f}"
                  f"{extra} best OA={r['best_oa']:.4f} "
                  f"(best_iter={r['best_iter']}, {r['wall_s']}s)", flush=True)
            results.append(r)
            write(partial=True)
    except BaseException:
        # TPU outages raise RuntimeError mid-sweep — keep completed
        # cells (each is a full 3000-iter training run).
        print("run failed — writing partial results", file=sys.stderr)
        if results:
            write(partial=True)
        raise
    write(partial=False)
    print(f"wrote {args.out} ({len(results)} cells)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
