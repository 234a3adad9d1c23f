"""K2 — fused patch gather + normalize + dihedral augment (SURVEY.md §2 K2).

The reference extracts patches with numpy per step — its main CPU
bottleneck (SURVEY.md §3.1). Here the padded tiles are device-resident
and the batch is assembled on-device:

    positions (B,3 int32, host-sampled)  ──┐
    tiles HBM (T,H,W,C) + masks (T,H,W)  ──┼──> (B,s,s,C) normalized patches
    augment ids (B int32)                ──┘    (B,s,s)   label patches

Two interchangeable gather backends (parity-tested against each other):
  * Pallas kernel (dynseg.ops.pallas_gather): double-buffered HBM->VMEM
    DMA per patch with fused normalization — the TPU path (the XLA
    fallback's vmapped dynamic_slice gathers measured ~25% of the whole
    train step).
  * XLA fallback: vmap(lax.dynamic_slice), used on CPU (tests) and as
    the reference implementation.

Augmentation applies the 8 dihedral transforms as BATCHED masked
reverse/transpose passes — never a lax.switch, which under vmap executes
all 8 branches (measured 8x the work).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def is_tpu_backend() -> bool:
    """Single source of truth for 'can Mosaic lower here' (this box's
    tunneled chip reports the provisional 'axon' platform name) — shared
    by every Pallas dispatch decision so a platform-string change can't
    silently split them (review r2)."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


_is_tpu = is_tpu_backend


def dihedral_batch(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Apply per-sample dihedral transform k to a batch.

    x: (B, s, s) or (B, s, s, C); k: (B,) int32 in [0, 8).
    k in [0,4): rot90^k over the two spatial axes; k in [4,8): flip the
    column axis first, then rot90^(k-4)  (SURVEY.md C5 semantics).
    Identities used: rot90(m) = flip(m.T, 0); rot180 = flip(flip(m,0),1);
    rot270 = flip(m.T, 1) — all full-batch VPU passes + selects.
    """
    extra = x.ndim - 3  # trailing channel dims
    bc = lambda m: m.reshape((-1,) + (1, 1) + (1,) * extra)
    flip = bc(k >= 4)
    x = jnp.where(flip, jnp.flip(x, axis=2), x)
    r = k % 4
    t = jnp.swapaxes(x, 1, 2)
    x = jnp.where(bc((r == 1) | (r == 3)), t, x)
    x = jnp.where(bc((r == 1) | (r == 2)), jnp.flip(x, axis=1), x)
    x = jnp.where(bc((r == 2) | (r == 3)), jnp.flip(x, axis=2), x)
    return x


def _gather_one(
    images: jnp.ndarray,  # (T, H, W, C)
    masks: jnp.ndarray,  # (T, H, W)
    pos: jnp.ndarray,  # (3,) tile, row, col (patch CENTER, padded coords)
    size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    half = size // 2
    t, r, c = pos[0], pos[1], pos[2]
    r0 = r - half
    c0 = c - half
    img = jax.lax.dynamic_slice(
        images, (t, r0, c0, 0), (1, size, size, images.shape[-1])
    )[0]
    lab = jax.lax.dynamic_slice(masks, (t, r0, c0), (1, size, size))[0]
    return img, lab


@functools.partial(jax.jit, static_argnames=("size", "use_pallas"))
def gather_batch(
    images: jnp.ndarray,
    masks: jnp.ndarray,
    mean: jnp.ndarray,
    std: jnp.ndarray,
    positions: jnp.ndarray,  # (B, 3) int32
    aug_ids: jnp.ndarray,  # (B,) int32
    size: int,
    use_pallas: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Assemble a normalized, augmented (B,size,size,C) batch on device."""
    if use_pallas is None:
        from dynseg.ops.pallas_gather import pallas_gather_supported

        use_pallas = _is_tpu() and pallas_gather_supported(
            images.shape, size, positions.shape[0], images.dtype
        )
    if use_pallas:
        from dynseg.ops.pallas_gather import pallas_gather_batch

        imgs, labs = pallas_gather_batch(
            images, masks, mean, std, positions, size
        )
    else:
        imgs, labs = jax.vmap(
            lambda p: _gather_one(images, masks, p, size)
        )(positions)
        imgs = (imgs.astype(jnp.float32) - mean) / std
    imgs = dihedral_batch(imgs, aug_ids)
    labs = dihedral_batch(labs.astype(jnp.int32), aug_ids)
    return imgs, labs
