"""K4 attempt 5 benchmark: (H*W, C)-layout Pallas pool backward vs XLA
select_and_scatter (round-1 verdict #4).

Measures (on the real chip):
  1. the ISOLATED pool VJP at each training block shape
     (batch 100, 25 px, channels 64/128/256 — the rate6 stack), and
  2. the FULL train step (batch 100, 25 px, f32, full width) with
     --pool_backward xla vs pallas.

Decision rule (VERDICT r1 #4): adopt pallas only if the full step beats
the 8.0 ms/step XLA baseline; otherwise record the numbers and close K4.

Usage: python scripts/bench_pool_bwd.py [--batch 100] [--size 25]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    """Honest sync on the tunneled chip: fetch a dependent value."""
    return float(np.asarray(x).ravel()[0])


def bench_isolated(batch, size, channels, iters=30):
    import dynseg.ops.pool as pool

    out = {}
    for c in channels:
        x = jax.random.normal(jax.random.key(0), (batch, size, size, c),
                              jnp.float32)
        g = jax.random.normal(jax.random.key(1), x.shape, jnp.float32)
        y = pool.pool_forward(x)

        xla_fn = jax.jit(lambda x, g: pool._xla_pool_vjp(x, g, 3))
        pal_fn = jax.jit(lambda x, y, g: pool.pallas_pool_bwd(x, y, g))

        def timed(fn):
            sync(fn())  # warm + drain
            t0 = time.perf_counter()
            r = None
            for _ in range(iters):
                r = fn()
            sync(r)  # wait for the WHOLE chain before stopping the clock
            return (time.perf_counter() - t0) / iters

        t_xla = timed(lambda: xla_fn(x, g))
        t_pal = timed(lambda: pal_fn(x, y, g))

        # parity on-hardware (no-tie input)
        xp = jnp.asarray(np.random.default_rng(0).permutation(
            batch * size * size * c).reshape(x.shape).astype(np.float32))
        gp = jax.random.normal(jax.random.key(2), x.shape, jnp.float32)
        d_x = np.asarray(xla_fn(xp, gp))
        d_p = np.asarray(pal_fn(xp, pool.pool_forward(xp), gp))
        max_err = float(np.abs(d_x - d_p).max())
        out[c] = {"xla_ms": round(t_xla * 1e3, 3),
                  "pallas_ms": round(t_pal * 1e3, 3),
                  "max_err_no_ties": max_err}
        print(f"C={c:4d}: xla {t_xla*1e3:7.3f} ms  "
              f"pallas {t_pal*1e3:7.3f} ms  err={max_err:.2e}", flush=True)
    return out


def bench_train_step(batch, size, pool_backward, steps=30):
    from dynseg.config import (
        Config, DataConfig, ModelConfig, SchedulerConfig, TrainConfig,
    )
    from dynseg.data.datasets import load_synthetic
    from dynseg.train import Trainer
    import dataclasses

    cfg = Config(
        model=ModelConfig(net_type="dilated_icpr_rate6", num_classes=2,
                          num_input_bands=3, pool_backward=pool_backward),
        sched=SchedulerConfig(distribution_type="single_fixed", values=(size,)),
        train=TrainConfig(batch_size=batch, seed=0),
        data=DataConfig(dataset="synthetic"),
    )
    tiles, _ = load_synthetic(seed=0, num_tiles=4, size=256)
    trainer = Trainer(cfg, tiles)
    state = trainer.init_state(jax.random.key(0))
    rng = jax.random.key(1)
    for _ in range(3):
        rng, dr = jax.random.split(rng)
        state, m = trainer.train_step(state, size, dr)
    sync(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        rng, dr = jax.random.split(rng)
        state, m = trainer.train_step(state, size, dr)
    sync(jax.tree_util.tree_leaves(state.params)[0])
    dt = (time.perf_counter() - t0) / steps
    print(f"train step [{pool_backward}]: {dt*1e3:.2f} ms/step "
          f"({batch/dt:.0f} patches/s)", flush=True)
    return {"ms_per_step": round(dt * 1e3, 2),
            "patches_per_sec": round(batch / dt, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--size", type=int, default=25)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--skip_isolated", action="store_true")
    ap.add_argument("--out", default="docs/bench_pool_bwd.json")
    args = ap.parse_args()

    from dynseg.cli import enable_compilation_cache

    enable_compilation_cache()
    res = {"batch": args.batch, "size": args.size,
           "platform": jax.devices()[0].platform}
    if not args.skip_isolated:
        res["isolated"] = bench_isolated(args.batch, args.size, (64, 128, 256))
    res["train_step"] = {
        "xla": bench_train_step(args.batch, args.size, "xla", args.steps),
        "pallas": bench_train_step(args.batch, args.size, "pallas", args.steps),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res["train_step"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
