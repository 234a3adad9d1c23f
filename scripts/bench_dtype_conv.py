"""Conv dtype probe: f32 vs bf16 vs int8 at training + dense-block shapes.

Question this answers (round 2): v5e's MXU has an int8 path at ~2x the
bf16 peak — does XLA lower `conv_general_dilated` on int8 operands to
it, and at OUR layer shapes? If yes, a post-training-quantized inference
path is worth building; if no, record the negative result in DESIGN.md
and stop there.

Methodology identical to bench_convs.py: R reps inside one lax.scan with
carry data-dependence, empty-scan baseline subtracted, honest scalar
fetch (docs/DESIGN.md measurement rules).

Usage: python scripts/bench_dtype_conv.py [--reps 200]
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

# (label, batch, hw): the train bucket and a dense-inference block.
SHAPES = [("train", 100, 25), ("dense", 1, 512)]


def conv(x, w, d, acc_dtype):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        rhs_dilation=(d, d), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_dtype,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=200)
    ap.add_argument("--platform", default="",
                    help="force a jax platform (cpu for logic smoke)")
    ap.add_argument("--shapes", default="",
                    help="subset of shape labels, e.g. 'train'")
    args = ap.parse_args()
    R = args.reps
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    enable_compilation_cache()
    print(f"platform: {jax.devices()[0].platform}", flush=True)
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
    print(f"empty {R}-step scan: {base * 1e3:.1f} ms", flush=True)

    def timed(fn, x, w):
        # Carry-dependence note: the obvious `x + acc * 0` trick is only
        # safe for FLOAT dtypes (XLA must preserve NaN/Inf semantics so
        # it cannot fold acc*0.0 -> 0). For INTEGER dtypes 0*acc == 0
        # exactly, the add folds away, and the conv becomes
        # loop-invariant -> hoisted out of the scan -> negative times.
        # Instead carry an int32 scalar whose next value is derived from
        # the conv OUTPUT through a float multiply (unfoldable), and add
        # it to the input each step. acc stays numerically 0, but XLA
        # cannot prove that, so the conv must re-execute every step.
        # The reduction must cover the FULL output (y.sum(), not y[0]):
        # slicing one element lets XLA's slice-into-conv rewrite shrink
        # the conv to a single output window and DCE the rest.
        @jax.jit
        def loop(x, w):
            def body(acc, _):
                xx = x + acc.astype(x.dtype)
                y = fn(xx, w)
                nxt = (y.astype(jnp.float32).sum()
                       * jnp.float32(1e-30)).astype(jnp.int32)
                return acc + nxt, None
            return jax.lax.scan(body, jnp.zeros((), jnp.int32), None,
                                length=R)[0]
        int(loop(x, w))
        t0 = time.perf_counter()
        int(loop(x, w))
        return (time.perf_counter() - t0 - base) / R

    wanted = {s for s in args.shapes.split(",") if s}
    for label, B, S in SHAPES:
        if wanted and label not in wanted:
            continue
        print(f"--- {label}: batch={B} hw={S}", flush=True)
        for k, cin, cout, d in LAYERS:
            xf = rng.normal(size=(B, S, S, cin)).astype(np.float32)
            wf = rng.normal(size=(k, k, cin, cout)).astype(np.float32) * 0.05
            flops = 2 * B * S * S * k * k * cin * cout
            row = f"k={k} {cin:>3}->{cout:<3} d={d}:"
            for name, xd, wd, acc in (
                ("f32", jnp.float32, jnp.float32, jnp.float32),
                ("bf16", jnp.bfloat16, jnp.bfloat16, jnp.float32),
                ("int8", jnp.int8, jnp.int8, jnp.int32),
            ):
                if name == "int8":
                    x = jnp.asarray(
                        np.clip(xf * 30, -127, 127).astype(np.int8))
                    w = jnp.asarray(
                        np.clip(wf * 600, -127, 127).astype(np.int8))
                else:
                    x = jnp.asarray(xf, xd)
                    w = jnp.asarray(wf, wd)
                try:
                    t = timed(lambda x, w: conv(x, w, d, acc), x, w)
                    row += f"  {name} {t * 1e3:6.3f} ms {flops / t / 1e12:5.1f} TF/s"
                except Exception as e:  # lowering may reject int8
                    row += f"  {name} UNSUPPORTED ({type(e).__name__})"
            print(row, flush=True)


if __name__ == "__main__":
    main()
