"""Stride-1 SAME max-pool with a Pallas backward — DESIGN.md K4 attempt 5.

The 3x3 stride-1 SAME max-pool's VJP (XLA select_and_scatter) is the
largest non-conv cost of the train step (~23% at batch 100 / 25 px —
DESIGN.md "K4"). Four prior alternatives all measured slower; the
post-mortem named one untried layout with a chance: flatten the spatial
dims to the SUBLANE axis, keep channels on lanes, and express the nine
window taps as static sublane-shifted slices of a VMEM-resident
(H*W, C) block — no HBM materialization per tap, no (8,128)-unaligned
2-D relayouts.

This module implements exactly that:

  * forward: `lax.reduce_window` max (XLA is already at its floor for
    the forward — 0.46 ms; we keep it)
  * backward: one Pallas kernel per (batch, channel-block) grid cell.
    Pass 1 computes per-window tie counts cnt[s] = #{taps == max};
    pass 2 scatters g/cnt back through the equality masks:
        dx[r] = sum_d  valid(r, d) * (x[r] == y[r+d]) * (g/cnt)[r+d]
    over the nine offsets d = di*W + dj. Tie handling is an equal
    SPLIT of the window gradient across all argmax positions — a valid
    subgradient (XLA's select_and_scatter routes to the first max in
    window order; on the plateau-rich outputs of stacked stride-1
    pools the split is the more principled choice). Gradient mass is
    conserved: sum(dx) == sum(g).

Enable with ModelConfig.pool_backward="pallas" (CLI --pool_backward).
Falls back to the XLA VJP off-TPU or for unsupported channel counts.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float("-inf")


def pool_forward(x: jnp.ndarray, window: int = 3) -> jnp.ndarray:
    """Stride-1 SAME max pool via XLA reduce_window (NHWC)."""
    k = window
    return jax.lax.reduce_window(
        x, _NEG_INF, jax.lax.max,
        (1, k, k, 1), (1, 1, 1, 1), "SAME",
    )


def _xla_pool_vjp(x: jnp.ndarray, g: jnp.ndarray, window: int) -> jnp.ndarray:
    _, vjp = jax.vjp(lambda v: pool_forward(v, window), x)
    return vjp(g)[0]


# --------------------------------------------------------------------- #
# Pallas backward
# --------------------------------------------------------------------- #
def _offsets(window: int):
    r = window // 2
    return [(di, dj) for di in range(-r, r + 1) for dj in range(-r, r + 1)]


def _shift_rows(a: jnp.ndarray, d: int) -> jnp.ndarray:
    """a'[r] = a[r + d], zero-filled at the ends (static sublane slice)."""
    if d == 0:
        return a
    z = jnp.zeros((abs(d), a.shape[1]), a.dtype)
    if d > 0:
        return jnp.concatenate([a[d:], z], axis=0)
    return jnp.concatenate([z, a[:d]], axis=0)


def _bwd_kernel(H: int, W: int, window: int,
                x_ref, y_ref, g_ref, dx_ref):
    HW = H * W
    x = x_ref[0]
    y = y_ref[0]
    g = g_ref[0]
    r = jax.lax.broadcasted_iota(jnp.int32, (HW, 1), 0)
    col = r % W

    def valid(di: int, dj: int) -> jnp.ndarray:
        """Neighbor (i+di, j+dj) of row r in-bounds (f32 mask, (HW,1))."""
        v = (col + dj >= 0) & (col + dj < W)
        d = di * W + dj
        if d:
            v = v & (r + d >= 0) & (r + d < HW)
        return v.astype(x.dtype)

    offs = _offsets(window)
    # Pass 1: cnt[s] = number of window taps achieving the max. The tap
    # set of window s is x[s + d] over the same symmetric offset set.
    cnt = jnp.zeros_like(y)
    for di, dj in offs:
        d = di * W + dj
        cnt += valid(di, dj) * (_shift_rows(x, d) == y).astype(x.dtype)
    # Valid windows always contain their center: cnt >= 1 everywhere real.
    gdc = g / jnp.maximum(cnt, 1.0)
    # Pass 2: windows containing r are centered at s = r + d.
    dx = jnp.zeros_like(x)
    for di, dj in offs:
        d = di * W + dj
        dx += (valid(di, dj)
               * (x == _shift_rows(y, d)).astype(x.dtype)
               * _shift_rows(gdc, d))
    dx_ref[0] = dx


def _channel_block(HW: int, C: int) -> int:
    """Largest channel block (multiple of 8, <=128, divides C) whose
    (HW, CB) f32 block stays within a ~1.4 MB VMEM budget (x, y, g, dx
    + pallas double-buffering ~ 10 concurrent blocks < 16 MB VMEM).
    Returns 0 when NO block satisfies all three constraints (review r2:
    the old halving loop could bottom out over-budget, or at a
    non-multiple-of-8 like 24 -> 12, and supported() then dispatched a
    kernel that blows VMEM instead of falling back to the XLA VJP)."""
    for cb in range(min(C, 128), 0, -8):
        if C % cb == 0 and HW * cb * 4 <= 1_400_000:
            return cb
    return 0


def pallas_pool_bwd_supported(shape: Tuple[int, ...], dtype,
                              window: int = 3) -> bool:
    # Mosaic lowering needs a TPU; everything else takes the XLA VJP.
    from dynseg.ops.gather import is_tpu_backend
    if not is_tpu_backend():
        return False
    if window % 2 != 1:
        return False  # _offsets assumes a symmetric (odd) SAME window
    if jnp.dtype(dtype) != jnp.float32 or len(shape) != 4:
        return False
    _, h, w, c = shape
    if c % 8 != 0:
        return False
    return _channel_block(h * w, c) > 0


def pallas_pool_bwd(x: jnp.ndarray, y: jnp.ndarray, g: jnp.ndarray,
                    window: int = 3, interpret: bool = False) -> jnp.ndarray:
    """dx for y = maxpool_{window,SAME,stride1}(x) given cotangent g.
    x, y, g: (B, H, W, C) float32."""
    assert window % 2 == 1, (
        f"pallas_pool_bwd: even window {window} has an asymmetric SAME "
        f"footprint the symmetric tap set cannot express; use the XLA VJP")
    b, h, w, c = x.shape
    hw = h * w
    cb = _channel_block(hw, c)
    assert cb > 0, (
        f"pallas_pool_bwd: no channel block of {c} fits the VMEM budget "
        f"for HW={hw}; gate calls on pallas_pool_bwd_supported()")
    assert c % cb == 0, (c, cb)
    x2 = x.reshape(b, hw, c)
    y2 = y.reshape(b, hw, c)
    g2 = g.reshape(b, hw, c)
    spec = pl.BlockSpec((1, hw, cb), lambda i, j: (i, 0, j))
    dx = pl.pallas_call(
        functools.partial(_bwd_kernel, h, w, window),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        grid=(b, c // cb),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(x2, y2, g2)
    return dx.reshape(b, h, w, c)


# --------------------------------------------------------------------- #
# custom-VJP pool for the model blocks
# --------------------------------------------------------------------- #
@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool_s1(x: jnp.ndarray, window: int = 3) -> jnp.ndarray:
    """Stride-1 SAME max pool whose backward runs the Pallas kernel
    (tie-SPLIT subgradient) when supported, else the XLA VJP."""
    return pool_forward(x, window)


_warned_fallbacks: set = set()


def _warn_fallback(shape, dtype, window) -> None:
    """max_pool_s1 is only reached when the user explicitly requested
    --pool_backward pallas, so a silent fallback means they believe the
    K4 kernel is active while every step pays the select_and_scatter
    cost the flag exists to remove (review r2, round 2). Trace-time, so
    it fires once per distinct bucket shape."""
    key = (tuple(shape), str(jnp.dtype(dtype)), window)
    if key not in _warned_fallbacks:
        _warned_fallbacks.add(key)
        import warnings

        warnings.warn(
            f"--pool_backward pallas requested but unsupported for shape "
            f"{tuple(shape)} dtype {jnp.dtype(dtype)} window {window} "
            f"(needs TPU, float32, odd window, C%8==0, VMEM-fitting "
            f"channel block) — falling back to the XLA VJP",
            RuntimeWarning, stacklevel=2)


def _mp_fwd(x, window):
    y = pool_forward(x, window)
    if pallas_pool_bwd_supported(x.shape, x.dtype, window):
        return y, (x, y)
    # Fallback recomputes the forward inside jax.vjp, so y would be a
    # dead activation-sized residual held across the whole backward
    # (review r2, round 2) — save only x. The branch is trace-time
    # static (shape/dtype), matching _mp_bwd's.
    _warn_fallback(x.shape, x.dtype, window)
    return y, (x, None)


def _mp_bwd(window, res, g):
    x, y = res
    if y is not None and pallas_pool_bwd_supported(x.shape, x.dtype, window):
        return (pallas_pool_bwd(x, y, g, window),)
    return (_xla_pool_vjp(x, g, window),)


max_pool_s1.defvjp(_mp_fwd, _mp_bwd)
