"""Close the int8 emitter question (VERDICT r4 weak #4 / next #7).

docs/mfu_probe.json: the mixed-int8 serving forward runs at 134.8-145.4
TF/s = 34-37% of the v5e's 394 TOPS int8 peak, and r4 asserted "the
Mosaic conv emitter is the ceiling" without a kernel attempt. This
probe supplies the missing evidence, four measurements at the SAME
arithmetic as the quantized dense-512 blocks:

  A  pure int8 matmul, MXU-friendly (4096^3, K=M=N multiples of 128):
     the achievable int8 ceiling on this chip via XLA. If even this
     lands far below 394 TOPS, the "peak" is not reachable by ANY
     emitter and the % figures must be read against A, not the paper
     peak.
  A2 int8 matmul at the conv's intrinsic contraction shape
     (M=batch*H*W rows, K=256, N=256 — small-K): how much of A survives
     the shape the conv actually needs.
  B  a single int8 3x3 dil-6 256->256 conv at the serving block shape
     (8, 592, 592) via lax.conv_general_dilated int8->int32 (the
     SHIPPED path, isolated): the conv-emitter number itself.
  C  a REAL Pallas kernel attempt: shifted-matmul conv (9 taps as
     (M,256)x(256,256) int32-accumulated dots over a DMA'd row slab,
     int8 in/int8 out with a requant epilogue — the same epilogue shape
     the serving path fuses). If C beats B, the emitter leaves speed on
     the table; if C loses or Mosaic rejects it, the waiver argument is
     measured, like K1/K4's five negative experiments.

Writes docs/int8_kernel_probe.json; run on the real chip:
    python scripts/int8_kernel_probe.py --reps 20
CPU correctness check (interpret mode, tiny shapes):
    python scripts/int8_kernel_probe.py --check_only --platform cpu
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PEAK_INT8_TOPS = 394.0
PEAK_BF16_TFS = 197.0


def _time(fn, reps: int, warmup: int = 3) -> float:
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


# --------------------------------------------------------------------- #
# A / A2 / B — XLA reference points
# --------------------------------------------------------------------- #
def probe_matmul(m: int, k: int, n: int, reps: int) -> dict:
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(-127, 127, (m, k), dtype=np.int8))
    b = jnp.asarray(rng.integers(-127, 127, (k, n), dtype=np.int8))

    @jax.jit
    def run(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    dt = _time(lambda: run(a, b), reps)
    tops = 2.0 * m * k * n / dt / 1e12
    return {"m": m, "k": k, "n": n, "s": round(dt, 6),
            "tops": round(tops, 1),
            "pct_int8_peak": round(100 * tops / PEAK_INT8_TOPS, 1)}


def probe_conv(batch: int, hw: int, c: int, dil: int, reps: int) -> dict:
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 127, (batch, hw, hw, c),
                                 dtype=np.int8))
    w = jnp.asarray(rng.integers(-127, 127, (3, 3, c, c), dtype=np.int8))

    @jax.jit
    def run(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)

    dt = _time(lambda: run(x, w), reps)
    flops = 2.0 * batch * hw * hw * 9 * c * c
    tops = flops / dt / 1e12
    return {"batch": batch, "hw": hw, "c": c, "dil": dil,
            "s": round(dt, 6), "tops": round(tops, 1),
            "pct_int8_peak": round(100 * tops / PEAK_INT8_TOPS, 1)}


# --------------------------------------------------------------------- #
# C — Pallas shifted-matmul int8 conv
# --------------------------------------------------------------------- #
def _pallas_conv_kernel(x_hbm, w_ref, scale_ref, o_ref, scratch, sem,
                        *, tile_h: int, hw: int, c: int, dil: int):
    """One grid cell = `tile_h` output rows of one batch image.

    The padded input slab [row0, row0 + tile_h + 2*dil) x (hw + 2*dil)
    is DMA'd HBM->VMEM once; the 3x3 taps then run as nine statically
    shifted (tile_h*hw, c) x (c, c) dots accumulated in int32 on the
    MXU, and a single requant epilogue (f32 scale, round, clip) writes
    int8 — the same epilogue the serving path fuses into its convs."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * tile_h, tile_h + 2 * dil)], scratch, sem)
    cp.start()
    cp.wait()
    acc = jnp.zeros((tile_h * hw, c), jnp.int32)
    for tr in range(3):
        for tc in range(3):
            xs = scratch[tr * dil : tr * dil + tile_h,
                         tc * dil : tc * dil + hw, :]
            xs = xs.reshape(tile_h * hw, c)
            acc = acc + jax.lax.dot_general(
                xs, w_ref[tr * 3 + tc], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * scale_ref[0]
    y = jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)
    o_ref[0] = y.reshape(tile_h, hw, c)


def pallas_conv(x, w, scale: float, dil: int, tile_h: int,
                interpret: bool = False):
    """x: (B, H, W, C) int8 unpadded; w: (3, 3, C, C) int8. Returns the
    int8 requantized SAME conv via the shifted-matmul kernel."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, h, hw, c = x.shape
    assert h % tile_h == 0, (h, tile_h)
    # Mosaic requires HBM slice shapes aligned to the sublane tiling —
    # pad the width (dim 2 of the slab) up to a multiple of 32.
    wp = ((hw + 2 * dil + 31) // 32) * 32
    xpad = jnp.pad(x, ((0, 0), (dil, dil),
                       (dil, wp - hw - dil), (0, 0)))
    wk = w.reshape(9, c, c)  # [tr*3+tc, ci, co]
    grid = (bsz, h // tile_h)
    kernel = functools.partial(_pallas_conv_kernel, tile_h=tile_h, hw=hw,
                               c=c, dil=dil)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, c, c), lambda b, i: (0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, hw, c),
                               lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, hw, c), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * dil, wp, c), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xpad, wk, jnp.full((1,), scale, jnp.float32))


def reference_conv(x, w, scale: float, dil: int):
    import jax
    import jax.numpy as jnp

    acc = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", rhs_dilation=(dil, dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * scale
    return jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)


def check_kernel(interpret: bool) -> dict:
    """Correctness: pallas_conv == the XLA int8 conv + requant epilogue,
    on small shapes (runs in interpret mode on CPU)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    results = {}
    for (b, h, w_, c, dil, th) in [(2, 16, 16, 128, 2, 8),
                                   (1, 32, 32, 128, 6, 8)]:
        x = jnp.asarray(rng.integers(-127, 127, (b, h, w_, c),
                                     dtype=np.int8))
        w = jnp.asarray(rng.integers(-8, 8, (3, 3, c, c), dtype=np.int8))
        scale = 1.0 / 512.0
        got = np.asarray(pallas_conv(x, w, scale, dil, th,
                                     interpret=interpret))
        want = np.asarray(reference_conv(x, w, scale, dil))
        ok = np.array_equal(got, want)
        results[f"b{b}_h{h}_c{c}_d{dil}"] = bool(ok)
        if not ok:
            diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
            results[f"b{b}_h{h}_c{c}_d{dil}_maxdiff"] = int(diff.max())
    return results


def probe_pallas(batch: int, hw: int, c: int, dil: int, tile_h: int,
                 reps: int) -> dict:
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 127, (batch, hw, hw, c),
                                 dtype=np.int8))
    w = jnp.asarray(rng.integers(-8, 8, (3, 3, c, c), dtype=np.int8))
    run = jax.jit(functools.partial(pallas_conv, scale=1 / 512.0, dil=dil,
                                    tile_h=tile_h))
    dt = _time(lambda: run(x, w), reps)
    flops = 2.0 * batch * hw * hw * 9 * c * c
    tops = flops / dt / 1e12
    return {"batch": batch, "hw": hw, "c": c, "dil": dil,
            "tile_h": tile_h, "s": round(dt, 6), "tops": round(tops, 1),
            "pct_int8_peak": round(100 * tops / PEAK_INT8_TOPS, 1)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--check_only", action="store_true")
    ap.add_argument("--platform", default="")
    ap.add_argument("--tile_h", type=int, default=8)
    ap.add_argument("--hw", type=int, default=592)
    ap.add_argument("--out", default="docs/int8_kernel_probe.json")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    payload = {"date": "", "platform": jax.devices()[0].platform,
               "device": str(jax.devices()[0])}
    interpret = jax.devices()[0].platform != "tpu"
    payload["kernel_check"] = check_kernel(interpret)
    print("kernel check:", payload["kernel_check"], flush=True)
    if args.check_only:
        ok = all(v for k, v in payload["kernel_check"].items()
                 if not k.endswith("maxdiff"))
        return 0 if ok else 1

    payload["A_pure_matmul"] = probe_matmul(4096, 4096, 4096, args.reps)
    print("A ", payload["A_pure_matmul"], flush=True)
    payload["A2_convshape_matmul"] = probe_matmul(
        args.tile_h * args.hw * 74, 256, 256, args.reps)
    print("A2", payload["A2_convshape_matmul"], flush=True)
    payload["B_conv_emitter"] = probe_conv(8, args.hw, 256, 6, args.reps)
    print("B ", payload["B_conv_emitter"], flush=True)
    try:
        payload["C_pallas_conv"] = probe_pallas(
            8, args.hw, 256, 6, args.tile_h, args.reps)
        print("C ", payload["C_pallas_conv"], flush=True)
    except Exception as e:  # noqa: BLE001 — a Mosaic reject IS a result
        payload["C_pallas_conv"] = {"error": f"{type(e).__name__}: {e}"}
        print("C FAILED:", payload["C_pallas_conv"]["error"][:500],
              flush=True)
    out = os.path.join(REPO, args.out)
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"-> wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
