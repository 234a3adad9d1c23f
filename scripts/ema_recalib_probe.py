"""Post-hoc BN-recalibration probe for EMA weights (r4 follow-up).

BENCHMARKS.md "Params EMA" measured a negative: the decay-0.999 EMA
iterate loses on healthy finals, and the trajectory analysis points at
the classic stochastic-weight-averaging caveat — the EMA params are
evaluated against the LIVE BatchNorm running statistics, which track
the raw oscillating iterate the EMA never follows. This probe measures
the fix WITHOUT shipping it blind: from a kept checkpoint (a
`diagnose_collapse.py --keep_checkpoints` cell), it

  1. restores the trained state and extracts the EMA params,
  2. recalibrates BatchNorm statistics FOR the EMA params by running N
     train-mode forward passes (mutable batch_stats, params frozen)
     over freshly sampled balanced training batches at the trained
     scales (BN momentum is 0.9 — ~50 batches fully refresh), and
  3. full-tile-evaluates three weight sets on the texture benchmark:
     raw final iterate / EMA + live stats / EMA + recalibrated stats,
     at several N.

If (3c) closes the gap to (1) or beyond, BN-stat mismatch is the
mechanism and recalibration is worth shipping; if not, the EMA average
itself is off-manifold and the feature stays a documented negative.

Usage:
    python scripts/ema_recalib_probe.py \
        --ckpt /tmp/ema999keep/multinomial_s4 --seed 4 \
        --out docs/ema_recalib_probe.json
"""

import argparse
import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="output dir of a kept diagnose_collapse cell")
    ap.add_argument("--seed", type=int, required=True,
                    help="the cell's training seed (drives the synthetic "
                         "generator too)")
    ap.add_argument("--dataset", default="synthetic_texture")
    ap.add_argument("--dataset_kwargs", default='{"label_noise": 0.0}')
    ap.add_argument("--values", default="25,35,45,55,65")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--recalib_batches", default="25,50,100,200",
                    help="comma list of N to evaluate at")
    ap.add_argument("--window_batch", type=int, default=256)
    ap.add_argument("--out", default="docs/ema_recalib_probe.json")
    ap.add_argument("--platform", default="")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    from dynseg.checkpoint import CheckpointManager
    from dynseg.cli import build_argparser, config_from_args, enable_compilation_cache
    from dynseg.data.datasets import load_dataset
    from dynseg.infer import validate_test
    from dynseg.ops.gather import gather_batch
    from dynseg.sched.scheduler import ScaleScheduler
    from dynseg.train import Trainer, ema_params

    enable_compilation_cache()

    cli = build_argparser().parse_args([
        "--operation", "testing", "--dataset", args.dataset,
        "--dataset_kwargs", args.dataset_kwargs, "--output_path", args.ckpt,
        "--values", args.values, "--batch_size", str(args.batch_size),
        "--seed", str(args.seed), "--window_batch", str(args.window_batch),
        "--no_prediction_maps",
    ])
    cfg = config_from_args(cli)

    ckpt = CheckpointManager(args.ckpt)
    stats = ckpt.load_stats()
    if stats is None or float(stats.get("ema_decay", 0.0)) <= 0.0:
        raise SystemExit(f"{args.ckpt} is not an EMA checkpoint with sidecar")
    # Adopt the checkpoint's full model config (width/BN/slope/... AND
    # ema_decay) — the Trainer-built restore template must match.
    from dynseg.cli import _adopt_checkpoint_model

    cfg = _adopt_checkpoint_model(cfg, stats)

    train_tiles, test_tiles = load_dataset(
        cfg.data.dataset, cfg.data.dataset_path, cfg.data.fold,
        seed=cfg.train.seed,
        **{k: tuple(v) if isinstance(v, list) else v
           for k, v in json.loads(cfg.data.dataset_kwargs or "{}").items()})

    trainer = Trainer(cfg, train_tiles)
    sched = ScaleScheduler(cfg.sched, seed=cfg.train.seed)
    state, step = ckpt.restore(trainer, sched)
    ema_p = ema_params(cfg, state)
    model = trainer.model
    print(f"restored step {step}; ema_decay={cfg.train.ema_decay}")

    @partial(jax.jit, static_argnames=("size",), donate_argnames=("bs",))
    def recal_step(bs, params, images, masks, mean, std, pos, aug, size):
        imgs, _ = gather_batch(images, masks, mean, std, pos, aug, size)
        _, mut = model.apply(
            {"params": params, "batch_stats": bs}, imgs, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.key(0)},
        )
        return mut["batch_stats"]

    def evaluate(tag, variables):
        s = validate_test(cfg, variables, test_tiles, log=lambda *_: None)
        row = {"oa": round(float(s["oa"]), 4),
               "mean_f1": round(float(s["mean_f1"]), 4)}
        print(f"{tag}: {row}")
        return row

    results = {
        "ckpt": args.ckpt, "step": int(step), "seed": args.seed,
        "ema_decay": cfg.train.ema_decay,
        "raw_final": evaluate(
            "raw final", {"params": state.params,
                          "batch_stats": state.batch_stats}),
        "ema_live_bn": evaluate(
            "EMA + live BN", {"params": ema_p,
                              "batch_stats": state.batch_stats}),
        "ema_recalibrated": {},
    }

    # Progressive recalibration: scales cycle through the trained list so
    # the refreshed statistics see the same context mix training did.
    targets = sorted(int(n) for n in args.recalib_batches.split(","))
    import jax.numpy as jnp

    bs = jax.tree.map(jnp.copy, state.batch_stats)  # recal_step donates bs
    n_done = 0
    for n in targets:
        while n_done < n:
            scale = trainer.scales[n_done % len(trainer.scales)]
            pos, aug = trainer.make_batch_inputs(scale)
            bs = recal_step(bs, ema_p, trainer.images, trainer.masks,
                            trainer.mean, trainer.std, pos[0], aug[0],
                            size=scale)
            n_done += 1
        results["ema_recalibrated"][str(n)] = evaluate(
            f"EMA + recalibrated BN (N={n})",
            {"params": ema_p, "batch_stats": bs})

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
