"""K2 — Pallas patch-gather kernel (SURVEY.md §2 kernel K2).

The jnp fallback (vmap of lax.dynamic_slice) lowers to XLA gathers that
measured ~25% of the whole train step for 25-65 px patches. This kernel
drives the DMA engines directly.

Mosaic DMA alignment rules shape the design: slices of (8,128)-tiled
refs need 8-aligned row offsets/heights and 128-aligned lane
offsets/widths — and a patch (s in 25..65, C=3..5) satisfies none of
them. The kernel is throughput-bound on PER-PATCH fixed costs (descriptor
issue, scalar address math, roll setup), so everything is fused into one
operation chain per patch:

  1. image channels and the label plane are interleaved host/trace-side
     into ONE row-major 2-D array (T*H, W*(C+1)) — a patch is ONE DMA,
     one roll pair, one store;
  2. per patch, DMA an ALIGNED bounding window: rows aligned down to 8
     (8 slack rows), lanes aligned down to 128 (pl.multiple_of marks the
     dynamic offsets aligned); N_BUF-deep pipelining hides DMA latency;
  3. un-shift the residual row offset (sublane roll) and lane offset
     (dynamic lane rotate) on the small window, keep the leading
     (s, s*(C+1)) block;
  4. normalization is fused into the store: mean/1-std rows are tiled
     per-pixel with (mean_c..., 0) and (1/std_c..., 1) so the label
     plane passes through unchanged.

Output is (B, s, s*(C+1)); the caller splits image/label and reshapes
(XLA relayouts). Dihedral augmentation happens outside — batched
(dynseg.ops.gather.dihedral_batch) or via pre-transformed tile copies.

VMEM is bounded by the window sizes (independent of tile width), so this
path supports production-size tiles; pallas_gather_supported() is the
budget check."""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_N_BUF = 8  # DMA pipeline depth
_VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom out of ~16 MB
_LANE = 128


def _row_tile(dtype) -> int:
    """Sublane tile height: 8 for f32, 32 for (u)int8 — DMA offsets and
    heights must be multiples of it."""
    return 32 if jnp.dtype(dtype).itemsize == 1 else 8


def _rows_for(size: int, dtype=jnp.float32) -> int:
    rt = _row_tile(dtype)
    return (size + rt - 1) // rt * rt + rt


def _lanes_for(span: int) -> int:
    """Aligned window width covering `span` lanes at any 128-residual."""
    return ((span + _LANE - 1) // _LANE + 1) * _LANE


def pallas_gather_supported(
    tile_shape: Tuple[int, int, int, int], size: int, batch: int,
    dtype=None,
) -> bool:
    """Whether scratch + outputs for this gather fit the VMEM budget.

    dtype: the HBM storage dtype of the tiles. Pass it when known —
    the old estimate mixed the uint8 worst-case ROW count (rt=32) with
    4-byte ELEMENTS, overestimating uint8 scratch 4x and spuriously
    falling back to the ~25%-of-step XLA gather for batches that fit
    (review r2, round 2). None keeps a conservative cross-dtype bound.
    """
    _, _, _, c = tile_shape
    lanes = _lanes_for(size * (c + 1))
    if dtype is None:  # worst case over the two real storage dtypes
        scratch = _N_BUF * lanes * max(
            _rows_for(size, jnp.uint8) * 1,
            _rows_for(size, jnp.float32) * 4,
        )
    else:
        scratch = (_N_BUF * lanes * _rows_for(size, dtype)
                   * jnp.dtype(dtype).itemsize)
    outputs = batch * size * size * (c + 1) * 4
    return scratch + outputs < _VMEM_BUDGET


def _gather_kernel(
    pos_ref,  # (B, 3) int32 SMEM (scalar prefetch): tile, row, col center
    comb_hbm,  # (T*H + slack, W*(C+1) + pad) float32, stays in HBM
    mean_ref,  # (1, s*(C+1)) float32 VMEM: (mean_c..., 0) per pixel
    istd_ref,  # (1, s*(C+1)) float32 VMEM: (1/std_c..., 1) per pixel
    out_ref,  # (B, s, s*(C+1)) float32 VMEM
    scr,  # (N_BUF, rows, lanes) VMEM scratch
    sem,  # (N_BUF,) DMA semaphores
    *,
    size: int,
    batch: int,
    tile_h: int,
    stride: int,  # channels + 1
    total_rows: int,
    total_lanes: int,
):
    half = size // 2
    dtype = comb_hbm.dtype
    rt = _row_tile(dtype)
    rows = _rows_for(size, dtype)
    lanes = _lanes_for(size * stride)
    # The DMA start is the ALIGNED-DOWN offset, so the raw offset is safe
    # up to (largest aligned start with the full window in bounds)
    # + (tile - 1). The aligned-start limit must itself be aligned DOWN:
    # total_rows - rows is generally NOT a multiple of rt, and clamping
    # to it + rt - 1 would let the aligned start land past it (review
    # r2: raw-HBM over-read of up to rt-1 rows). Same form for lanes
    # (there total_lanes - lanes is usually _LANE-aligned already, making
    # the floor a no-op — but by construction, not by contract).
    max_row0 = (total_rows - rows) // rt * rt + rt - 1
    max_l0 = (total_lanes - lanes) // _LANE * _LANE + _LANE - 1

    def offsets(b):
        # Clamp to the DMA-safe ranges: this kernel reads raw HBM
        # addresses, and (unlike XLA's clamping dynamic_slice) an
        # out-of-range position would crash the whole TPU backend.
        # Clamped garbage positions return garbage data, never a crash.
        row0 = pos_ref[b, 0] * tile_h + pos_ref[b, 1] - half
        row0 = jnp.clip(row0, 0, max_row0)
        row_al = pl.multiple_of(row0 // rt * rt, rt)
        l0 = (pos_ref[b, 2] - half) * stride
        l0 = jnp.clip(l0, 0, max_l0)
        l_al = pl.multiple_of(l0 // _LANE * _LANE, _LANE)
        return row_al, row0 - row_al, l_al, l0 - l_al

    def make_dma(slot, b):
        row_al, _, l_al, _ = offsets(b)
        return pltpu.make_async_copy(
            comb_hbm.at[pl.ds(row_al, rows), pl.ds(l_al, lanes)],
            scr.at[slot],
            sem.at[slot],
        )

    for warm in range(min(_N_BUF - 1, batch)):
        make_dma(warm % _N_BUF, warm).start()

    def body(b, _):
        slot = jax.lax.rem(b, _N_BUF)
        ahead = b + _N_BUF - 1

        @pl.when(ahead < batch)
        def _():
            make_dma(jax.lax.rem(ahead, _N_BUF), ahead).start()

        make_dma(slot, b).wait()

        _, row_res, _, lane_res = offsets(b)
        # Un-shift rows (sublane roll) and lanes (dynamic rotate), then
        # keep the leading (s, s*(C+1)) block; residuals never wrap past
        # the extra lane/row tile, so wrapped values are never read.
        # uint8 storage: the DMA moves bytes (4x less HBM traffic); the
        # cast to f32 happens in VMEM before the rolls. Mosaic has no
        # direct u8->f32 cast — widen to i32 first.
        band = scr[slot]
        if band.dtype == jnp.uint8:
            band = band.astype(jnp.int32)
        band = band.astype(jnp.float32)
        band = pltpu.roll(band, rows - row_res, axis=0)
        band = pltpu.roll(band, lanes - lane_res, axis=1)
        out_ref[b] = (
            band[:size, : size * stride] - mean_ref[0, :]
        ) * istd_ref[0, :]
        return ()

    jax.lax.fori_loop(0, batch, body, ())


@functools.partial(jax.jit, static_argnames=("size",))
def pallas_gather_batch(
    images: jnp.ndarray,  # (T, H, W, C) float32
    masks: jnp.ndarray,  # (T, H, W) int32
    mean: jnp.ndarray,  # (C,)
    std: jnp.ndarray,  # (C,)
    positions: jnp.ndarray,  # (B, 3) int32 patch centers (padded coords)
    size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B,s,s,C) normalized image patches + (B,s,s) label patches."""
    b = positions.shape[0]
    t, h, w, c = images.shape
    storage = images.dtype if images.dtype == jnp.uint8 else jnp.float32
    rows = _rows_for(size, storage)
    stride = c + 1
    lanes = _lanes_for(size * stride)
    # Interleave the label plane as channel C (exact: label ids and uint8
    # pixels are both representable; f32 storage is exact below 2^24).
    # Loop-invariant: XLA hoists this out of the train-step scan.
    comb = jnp.concatenate(
        [images.astype(storage), masks[..., None].astype(storage)], axis=-1
    )
    row_slack = rows - size + _row_tile(storage) - 1
    lane_slack = (w * stride // _LANE * _LANE + lanes) - w * stride
    comb2d = jnp.pad(
        comb.reshape(t * h, w * stride), ((0, row_slack), (0, lane_slack))
    )
    # Per-pixel normalization rows; label slot passes through: mean 0, scale 1.
    mean_px = jnp.concatenate([mean.astype(jnp.float32), jnp.zeros((1,))])
    istd_px = jnp.concatenate(
        [1.0 / std.astype(jnp.float32), jnp.ones((1,))]
    )
    mean_row = jnp.tile(mean_px, size).reshape(1, -1)
    istd_row = jnp.tile(istd_px, size).reshape(1, -1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # comb2d
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mean row
            pl.BlockSpec(memory_space=pltpu.VMEM),  # 1/std row
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_N_BUF, rows, lanes), storage),
            pltpu.SemaphoreType.DMA((_N_BUF,)),
        ],
    )
    kernel = functools.partial(
        _gather_kernel, size=size, batch=b, tile_h=h, stride=stride,
        total_rows=t * h + row_slack, total_lanes=w * stride + lane_slack,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, size, size * stride), jnp.float32),
    )(positions, comb2d, mean_row, istd_row)
    out = out.reshape(b, size, size, stride)
    imgs = out[..., :c]
    labs = out[..., c].astype(jnp.int32)
    return imgs, labs
