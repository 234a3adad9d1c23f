"""K5 — Pallas int8 block-conv kernel: the attempted (and ultimately
WAIVED) replacement for the mixed-int8 serving path's conv emitter.

Status (r5; VERDICT r4 weak #4 / next #7; full arc in DESIGN.md K5):
this kernel beats the conv-ONLY emitter 1.41x (197.8 vs 139.9 TOPS at
the 8x592^2 3x3-dil6-256ch serving block, docs/int8_kernel_probe.json)
— but the SHIPPED path fuses the epilogue into the emitter conv, and
against that configuration the kernel ties per-block at best
(0.85x/0.88x/1.03x across the three quantized blocks) and loses 1.7x
in the full net (the custom calls break XLA's surrounding fusion).
`--quant_conv` therefore defaults to xla; this module + its exact-
parity tests are the experiment's record (K1/K4 protocol). Durable
probe findings: pure XLA int8 matmul reaches 14% of the nominal int8
peak, and NO lowering on this toolchain exceeds ~the bf16 rate — the
honest int8 ceiling is ~197 TF-equiv, and this kernel runs AT it.

Formulation: a k x k dilated SAME conv is k^2 statically shifted
(M, Cin) x (Cin, Cout) matmuls accumulated in int32 on the MXU. Each
grid cell (one batch image x tile_h output rows):

  1. DMAs the padded input row slab [i*tile_h, i*tile_h + tile_h +
     (k-1)*dil) x Wp x Cin from HBM to VMEM once (Wp = width padded to
     the int8 sublane tile, 32);
  2. runs the k^2 taps as int8 dots with int32 accumulation;
  3. applies the block's WHOLE epilogue in-register before the single
     store: per-channel affine dequant+BN fold (A*acc + B), leaky-ReLU,
     and optionally the int8 requantization of the streamed-int8 chain
     (ops/quant.py _block_forward epilogue). Fusing the epilogue here
     matters: a pallas call cannot be fused into by XLA, so an
     unfused epilogue would cost an extra full feature-map round trip
     (~2.6 ms at the 592^2 block shape, ~15% of the conv).

The affine fold is exact in the integer domain (the int32 accumulation
is exact in both paths); epilogue floats run in f32 here vs the XLA
path's compute_dtype chain, so parity is near-exact, pinned by tests
at tight tolerances plus exact-label agreement (tests/test_pallas_conv).

Constraints (checked by `supported()`; callers fall back to the XLA
emitter otherwise): Cin/Cout multiples of 128 (int8 lane tiling), TPU
platform, VMEM budget at the given tile. Rows pad internally to the
tile_h multiple, width to 32 — callers pass arbitrary H/W.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024  # of ~16 MB/core
_TILE_H = 8  # measured-best (docs/int8_kernel_probe.json: 4 -> 167
#              TOPS, 8 -> 197.8, 16 -> VMEM overflow)


def _kernel(x_hbm, w_ref, a_ref, b_ref, s_ref, o_ref, scratch, sem, *,
            tile_h: int, hw: int, wp: int, cin: int, cout: int, k: int,
            dil: int, leaky: float, requant: bool):
    b = pl.program_id(0)
    i = pl.program_id(1)
    slab = tile_h + (k - 1) * dil
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * tile_h, slab)], scratch, sem)
    cp.start()
    cp.wait()
    acc = jnp.zeros((tile_h * hw, cout), jnp.int32)
    for tr in range(k):
        for tc in range(k):
            xs = scratch[tr * dil : tr * dil + tile_h,
                         tc * dil : tc * dil + hw, :]
            xs = xs.reshape(tile_h * hw, cin)
            acc = acc + jax.lax.dot_general(
                xs, w_ref[tr * k + tc], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    # Fused epilogue: per-channel affine (dequant + BN/bias fold),
    # leaky-ReLU, optional requant — all before the single store.
    y = acc.astype(jnp.float32) * a_ref[0] + b_ref[0]
    y = jnp.where(y >= 0.0, y, y * leaky)
    if requant:
        y = jnp.round(jnp.clip(y * s_ref[0], -127.0, 127.0))
        o_ref[0] = y.astype(jnp.int8).reshape(tile_h, hw, cout)
    else:
        o_ref[0] = y.astype(o_ref.dtype).reshape(tile_h, hw, cout)


def supported(hw_w: int, cin: int, cout: int, k: int, dil: int,
              tile_h: int = _TILE_H) -> bool:
    """Shape/VMEM gate for the kernel at one block's geometry."""
    if cin % 128 or cout % 128:
        return False
    wp = ((hw_w + (k - 1) * dil + 31) // 32) * 32
    slab = tile_h + (k - 1) * dil
    need = (slab * wp * cin  # int8 scratch
            + tile_h * hw_w * cout * 4  # int32 acc (f32 epilogue aliases)
            + k * k * cin * cout  # int8 weights
            + tile_h * hw_w * cout * 2)  # out tile (<= bf16)
    return need <= _VMEM_BUDGET


def int8_block_conv(x, w, affine_a, affine_b, *, dilation: int,
                    leaky_slope: float, out_scale: Optional[float] = None,
                    out_dtype=jnp.bfloat16, tile_h: int = _TILE_H,
                    interpret: bool = False):
    """The quantized block's conv + epilogue as one Pallas launch.

    x: (B, H, W, Cin) int8 (already quantized activations)
    w: (k, k, Cin, Cout) int8 (HWIO, per-output-channel quantized)
    affine_a/affine_b: (Cout,) f32 — y = A*acc + B folds the dequant
        scale (sx*sw_c) together with BN (or the conv bias) — see
        ops/quant.py _block_forward for the algebra.
    out_scale: set = requantize to int8 with this activation scale
        (1/out_scale multiplies inside; the streamed-int8 chain).
    Returns (B, H, W, Cout) int8 (requant) or out_dtype.
    """
    bsz, h, hw, cin = x.shape
    k = w.shape[0]
    cout = w.shape[-1]
    ext = (k - 1) * dilation + 1
    pad_lo = (ext - 1) // 2
    pad_hi = ext - 1 - pad_lo
    # rows pad to the tile_h multiple (extra output rows sliced off),
    # width to the int8 sublane tile for the DMA slice shape.
    hpad = (-h) % tile_h
    wp = ((hw + (k - 1) * dilation + 31) // 32) * 32
    xpad = jnp.pad(x, ((0, 0), (pad_lo, pad_hi + hpad),
                       (pad_lo, wp - hw - pad_lo), (0, 0)))
    wk = w.reshape(k * k, cin, cout)
    grid = (bsz, (h + hpad) // tile_h)
    requant = out_scale is not None
    inv_s = (jnp.reshape(1.0 / out_scale, (1,)).astype(jnp.float32)
             if requant else jnp.ones((1,), jnp.float32))
    kernel = functools.partial(
        _kernel, tile_h=tile_h, hw=hw, wp=wp, cin=cin, cout=cout, k=k,
        dil=dilation, leaky=float(leaky_slope), requant=requant)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((k * k, cin, cout), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((1, cout), lambda b, i: (0, 0)),
            pl.BlockSpec((1, cout), lambda b, i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, hw, cout),
                               lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (bsz, h + hpad, hw, cout),
            jnp.int8 if requant else jnp.dtype(out_dtype)),
        scratch_shapes=[
            pltpu.VMEM((tile_h + (k - 1) * dilation, wp, cin), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xpad, wk, affine_a.reshape(1, cout).astype(jnp.float32),
      affine_b.reshape(1, cout).astype(jnp.float32), inv_s)
    return out[:, :h] if hpad else out
