"""MFU / roofline probe (verdict r2 #4): put measured TF/s and %-of-peak
numbers behind "at XLA's ceiling".

Computes the exact forward FLOPs/px of a variant from its _ARCH table
(2*k^2*Cin*Cout per conv px, stride-1 SAME => every px), then times the
bare model forward at the shapes each production mode actually uses:

  * dense block shape  (1, B+2h, B+2h, C)  — one big image per launch
  * window batch shape (N, lambda, lambda, C) — many small images

and prints TF/s per shape. The difference between these two BARE-forward
rates isolates how much of the dense-vs-window per-forward-pixel gap is
conv/emitter shape efficiency, as opposed to the mode pipelines around
the forward (prob-map assembly, softmax/argmax, overlap-add).

Usage:
  python scripts/mfu_probe.py [--net dilated_icpr_rate6] [--reps 5]
      [--platform cpu]   # cpu for logic smoke only
Prints one JSON line per shape plus a summary line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16_TFS = 197.0  # TPU v5e (v5 lite) per-chip bf16 systolic peak
PEAK_INT8_TOPS = 394.0  # v5e int8 peak (2x bf16)


def forward_flops_per_px(net_type: str, bands: int, classes: int) -> int:
    from dynseg.models.dilated import _ARCH

    arch = _ARCH["dilated_icpr_rate6" if net_type.endswith("densely")
                  else net_type]
    fl, cin = 0, bands
    for k, cout, _dil, _pool in arch:
        if net_type.endswith("densely"):
            # dense wiring: block input is the concat of ALL previous
            # block outputs (+ the image)
            fl += 2 * k * k * cin * cout
            cin += cout
        else:
            fl += 2 * k * k * cin * cout
            cin = cout
    head_in = (cin - bands) if net_type.endswith("densely") else cin
    fl += 2 * head_in * classes
    return fl


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="dilated_icpr_rate6")
    ap.add_argument("--bands", type=int, default=3)
    ap.add_argument("--classes", type=int, default=6)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--dense_block", type=int, default=512)
    ap.add_argument("--dense_halo", type=int, default=40)
    ap.add_argument("--dense_batch", type=int, default=1,
                    help="blocks per forward (dense_block_batch); 8 "
                         "fills the v5e 8-wide sublane tiling")
    ap.add_argument("--window_scale", type=int, default=65)
    ap.add_argument("--window_batch", type=int, default=128)
    ap.add_argument("--compute_dtype", default="float32")
    ap.add_argument("--quant", default="none", choices=["none", "int8"],
                    help="probe the BARE mixed-int8 forward (verdict r3 "
                         "#5: the int8-shape emitter ceiling was missing "
                         "from the roofline table — the end-to-end int8 "
                         "leg's 29%%-of-int8-peak could not be audited as "
                         "closed-vs-headroom the way f32 legs can)")
    ap.add_argument("--quant_exit", action="store_true")
    ap.add_argument("--platform", default="")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from dynseg.cli import enable_compilation_cache
    from dynseg.config import ModelConfig
    from dynseg.models.dilated import build_model

    enable_compilation_cache()
    fpp = forward_flops_per_px(args.net, args.bands, args.classes)
    print(json.dumps({"net": args.net,
                      "forward_mflops_per_px": round(fpp / 1e6, 3),
                      "train_step_mflops_per_px": round(3 * fpp / 1e6, 3),
                      "peak_bf16_tfs": PEAK_BF16_TFS}))

    cfg = ModelConfig(net_type=args.net, num_classes=args.classes,
                      num_input_bands=args.bands,
                      compute_dtype=args.compute_dtype)
    model = build_model(cfg)
    d = args.dense_block + 2 * args.dense_halo
    shapes = {
        "dense_block": (args.dense_batch, d, d, args.bands),
        "window_batch": (args.window_batch, args.window_scale,
                         args.window_scale, args.bands),
    }
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 25, 25, args.bands)), train=False)

    apply_fn = model.apply
    mixed_peak_tfs = None
    if args.quant == "int8":
        # Mixed roofline for the int8 plan: blocks with both channel dims
        # >=128 run int8 (PEAK_INT8_TOPS), the stem/head stay f32 (the
        # f32 MXU rate == bf16 peak on v5e only for bf16 inputs; f32
        # convs run at ~1/2 — but XLA upcasts f32 convs through the bf16
        # multiplier with passes, so we bound with the bf16 peak, which
        # makes this ceiling CONSERVATIVE (the true ceiling is lower).
        # pct_mixed_roofline therefore understates closure if anything.
        from dynseg.ops import quant as quant_ops

        specs = quant_ops.block_specs(cfg, args.bands)
        plan = quant_ops.quant_plan(cfg, args.bands)
        int8_fpp = sum(2 * s["kernel"] ** 2 * s["cin"] * s["cout"]
                       for s, q in zip(specs, plan) if q)
        if args.quant_exit:
            int8_fpp += 2 * specs[-1]["cout"] * args.classes
        float_fpp = fpp - int8_fpp
        t_lb = (float_fpp / (PEAK_BF16_TFS * 1e12)
                + int8_fpp / (PEAK_INT8_TOPS * 1e12))
        mixed_peak_tfs = fpp / t_lb / 1e12
        crops = [jnp.asarray(np.random.default_rng(i).normal(
            scale=1.0, size=(128, 128, args.bands)).astype(np.float32))
            for i in range(4)]
        ranges = quant_ops.calibrate(cfg, variables, crops)
        variables = quant_ops.quantize_variables(
            cfg, variables, ranges, exit_int8=args.quant_exit)
        apply_fn = quant_ops.make_apply(cfg)
        print(json.dumps({
            "quant": "int8", "quant_exit": args.quant_exit,
            "int8_blocks": [s["name"] for s, q in zip(specs, plan) if q],
            "int8_flop_share": round(int8_fpp / fpp, 3),
            "mixed_roofline_tfs": round(mixed_peak_tfs, 1),
            "peak_int8_tops": PEAK_INT8_TOPS,
        }))

    # R forwards fused into ONE device launch (lax.scan with a scalar
    # data dependency so XLA can neither DCE nor parallelize the
    # iterations) — the axon tunnel costs ~27 ms per launch, so
    # launch-per-forward timing measures dispatch, not the chip; the
    # production modes amortize identically (scan_chunk /
    # dense_scan_chunk / steps_per_call).
    from functools import partial

    @partial(jax.jit, static_argnames=("reps",))
    def fwd_chain(v, x, reps):
        def body(carry, _):
            out = apply_fn(v, x + carry, train=False)
            return jnp.mean(out.astype(jnp.float32)) * 1e-30, ()

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return carry

    for name, shape in shapes.items():
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=shape).astype(np.float32))
        # honest sync: fetch a value that depends on the output (DESIGN.md
        # measurement rules — block_until_ready lies on the axon tunnel)
        float(np.asarray(fwd_chain(variables, x, args.reps)))  # warm
        t0 = time.perf_counter()
        float(np.asarray(fwd_chain(variables, x, args.reps)))
        dt = (time.perf_counter() - t0) / args.reps
        px = int(np.prod(shape[:3]))
        tfs = px * fpp / dt / 1e12
        row = {
            "shape": name, "dims": list(shape),
            "fwd_mpx_per_s": round(px / dt / 1e6, 2),
            "tf_per_s": round(tfs, 1),
            "pct_bf16_peak": round(100 * tfs / PEAK_BF16_TFS, 1),
            "wall_ms_per_fwd": round(1e3 * dt, 2),
        }
        if mixed_peak_tfs is not None:
            row["quant"] = "int8"
            row["pct_int8_peak"] = round(100 * tfs / PEAK_INT8_TOPS, 1)
            row["pct_mixed_roofline"] = round(100 * tfs / mixed_peak_tfs, 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
