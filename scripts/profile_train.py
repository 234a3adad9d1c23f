"""Decompose the train-step time on hardware: gather+augment vs forward
vs full fwd+bwd+update, each as a K-step lax.scan launch with an honest
dependent-value fetch (docs/DESIGN.md measurement rules).

Usage: python scripts/profile_train.py [--batch 100] [--size 25] [--k 16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dynseg.cli import enable_compilation_cache
from dynseg.config import Config, DataConfig, ModelConfig, SchedulerConfig, TrainConfig
from dynseg.data.datasets import load_synthetic
from dynseg.ops.gather import gather_batch
from dynseg.train import Trainer, masked_cross_entropy


def timeit(fn, *args, reps=3):
    out = fn(*args)  # compile + warm
    fetch = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(fetch).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--size", type=int, default=25)
    ap.add_argument("--k", type=int, default=16)
    args = ap.parse_args()
    B, S, K = args.batch, args.size, args.k

    enable_compilation_cache()
    print("platform:", jax.devices()[0].platform, flush=True)
    cfg = Config(
        model=ModelConfig(net_type="dilated_icpr_rate6", num_classes=2,
                          num_input_bands=3),
        sched=SchedulerConfig(distribution_type="single_fixed", values=(S,)),
        train=TrainConfig(batch_size=B, seed=0, steps_per_call=K),
        data=DataConfig(dataset="synthetic"),
    )
    tiles, _ = load_synthetic(seed=0, num_tiles=4, size=256)
    tr = Trainer(cfg, tiles)
    state = tr.init_state(jax.random.key(0))
    pos, aug = tr.make_batch_inputs(S, k=K)
    rngs = jax.random.split(jax.random.key(1), K)

    # --- 1. gather+augment only (K-scan) --------------------------------
    @jax.jit
    def gather_only(images, masks, mean, std, positions, aug_ids):
        def body(acc, xs):
            p, a = xs
            imgs, labs = gather_batch(images, masks, mean, std, p, a, S)
            return acc + imgs.sum() + labs.sum(), None
        acc, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), (positions, aug_ids)
        )
        return acc

    dt = timeit(gather_only, tr.images, tr.masks, tr.mean, tr.std, pos, aug)
    print(f"gather+augment: {dt / K * 1e3:.2f} ms/step "
          f"({B * K / dt:.0f} patches/s)", flush=True)

    # --- 2. forward+loss only (K-scan) -----------------------------------
    @jax.jit
    def fwd_only(params, batch_stats, images, masks, mean, std, positions, aug_ids):
        def body(acc, xs):
            p, a = xs
            imgs, labs = gather_batch(images, masks, mean, std, p, a, S)
            logits = tr.model.apply(
                {"params": params, "batch_stats": batch_stats}, imgs,
                train=False)
            return acc + masked_cross_entropy(logits, labs), None
        acc, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), (positions, aug_ids)
        )
        return acc

    dt = timeit(fwd_only, state.params, state.batch_stats, tr.images,
                tr.masks, tr.mean, tr.std, pos, aug)
    print(f"gather+forward: {dt / K * 1e3:.2f} ms/step "
          f"({B * K / dt:.0f} patches/s)", flush=True)

    # --- 3. full train chunk (product path, host sampling per launch) ----
    rng = jax.random.key(2)
    st = jax.tree.map(jnp.copy, state)
    for _ in range(3):  # compile + warm
        rng, dr = jax.random.split(rng)
        st, m = tr.train_step(st, S, dr)
    float(np.asarray(m["loss"]).sum())
    t0 = time.perf_counter()
    reps = 8
    for _ in range(reps):
        rng, dr = jax.random.split(rng)
        st, m = tr.train_step(st, S, dr)
    float(jnp.asarray(jax.tree_util.tree_leaves(st.params)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / reps
    flops = B * S * S * 2.77e6 * 3  # fwd+bwd ~ 3x fwd
    print(f"full step:      {dt / K * 1e3:.2f} ms/step "
          f"({B * K / dt:.0f} patches/s, ~{flops / (dt / K) / 1e12:.0f} TF/s f32-equiv)",
          flush=True)


if __name__ == "__main__":
    main()
