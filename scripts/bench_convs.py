"""Per-layer conv + epilogue microbenchmark at the real training shapes.

Methodology matters on the remote platform: a single launch costs ~27 ms
round-trip, so each op runs R=300 times inside ONE lax.scan whose body
data-depends on the carry (stops XLA hoisting the loop-invariant op),
and an empty-scan baseline is subtracted. Dividing a handful of launches
by their count measures only the round-trip (docs/DESIGN.md).

Measured (v5e, batch 100 @ 25 px, f32): convs 86-186 TF/s (near peak;
input conv 49 TF/s at <1% of FLOPs), dilation <= 1.6x on conv2 only,
pool/leaky epilogues bandwidth-bound.

Usage: python scripts/bench_convs.py [--batch 100] [--hw 25] [--reps 300]
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

LAYERS = [  # (kernel, cin, cout, dilation) for dilated_icpr_rate6
    (5, 3, 64, 1),
    (5, 64, 64, 2),
    (4, 64, 128, 3),
    (4, 128, 128, 4),
    (3, 128, 256, 5),
    (3, 256, 256, 6),
]


def conv(x, w, d):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        rhs_dilation=(d, d), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--hw", type=int, default=25)
    ap.add_argument("--reps", type=int, default=300)
    args = ap.parse_args()
    B, S, R = args.batch, args.hw, args.reps

    enable_compilation_cache()
    print(f"platform: {jax.devices()[0].platform}  batch={B} hw={S}", flush=True)
    rng = np.random.default_rng(0)

    @jax.jit
    def empty_loop(z):
        def body(acc, _):
            return acc + jnp.sin(acc) * 1e-9, None
        return jax.lax.scan(body, z, None, length=R)[0]

    z = jnp.zeros((), jnp.float32)
    float(empty_loop(z))
    t0 = time.perf_counter()
    float(empty_loop(z))
    base = time.perf_counter() - t0
    print(f"empty {R}-step scan (baseline): {base * 1e3:.1f} ms", flush=True)

    def timed(fn, x, *rest):
        @jax.jit
        def loop(x, *rest):
            def body(acc, _):
                y = fn(x + acc * 1e-30, *rest)  # carry-dependence: no hoist
                return acc + y.sum() * 1e-9, None
            return jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                length=R)[0]
        float(loop(x, *rest))
        t0 = time.perf_counter()
        float(loop(x, *rest))
        return (time.perf_counter() - t0 - base) / R

    total = 0.0
    for k, cin, cout, d in LAYERS:
        x = jnp.asarray(rng.normal(size=(B, S, S, cin)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(k, k, cin, cout)).astype(np.float32) * 0.01)
        flops = 2 * B * S * S * k * k * cin * cout
        t_d = timed(lambda x, w: conv(x, w, d), x, w)
        total += t_d
        extra = ""
        if d > 1:
            t_1 = timed(lambda x, w: conv(x, w, 1), x, w)
            extra = f"   [d=1: {t_1 * 1e3:6.3f} ms {flops / t_1 / 1e12:5.1f} TF/s]"
        print(f"k={k} {cin:>3}->{cout:<3} d={d}: {t_d * 1e3:6.3f} ms "
              f"({flops / t_d / 1e12:5.1f} TF/s){extra}", flush=True)

    t_pool = 0.0
    for C in (64, 64, 128, 128, 256, 256):
        x = jnp.asarray(rng.normal(size=(B, S, S, C)).astype(np.float32))
        t_pool += timed(lambda x: jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"), x)
    print(f"conv total: {total * 1e3:.2f} ms   3x3 stride-1 pools total: "
          f"{t_pool * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
