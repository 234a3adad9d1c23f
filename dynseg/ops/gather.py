"""K2 — fused patch gather + normalize + dihedral augment (SURVEY.md §2 K2).

The reference extracts patches with numpy per step — its main CPU bottleneck
(SURVEY.md §3.1). Here the padded tiles are device-resident and a jitted
gather assembles the batch on-device:

    positions (B,3 int32, host-sampled)  ──┐
    tiles HBM (T,H,W,C) + masks (T,H,W)  ──┼──> (B,s,s,C) normalized patches
    augment ids (B int32)                ──┘    (B,s,s)   label patches

Implementation notes (TPU/XLA):
  * `vmap(lax.dynamic_slice)` over the batch — static slice sizes per scale
    bucket, so each bucket compiles once (SURVEY.md C12 TPU equivalent).
  * The 8 dihedral transforms are a `lax.switch` over rot90/flip compositions
    applied identically to image and label patch (SURVEY.md C5).
  * Normalization (x-mean)/std is fused into the same jit (SURVEY.md C3).

A Pallas double-buffered HBM→VMEM gather is a planned upgrade; XLA's
dynamic-slice gather already keeps the MXU fed for these patch sizes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _dihedral(img: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Apply the k-th of 8 dihedral transforms to (s,s,...) array.
    k in [0,4): rot90^k; k in [4,8): fliplr then rot90^(k-4)."""
    branches = []
    for rot in range(4):
        branches.append(functools.partial(jnp.rot90, k=rot, axes=(0, 1)))
    for rot in range(4):
        def f(x, rot=rot):
            return jnp.rot90(jnp.flip(x, axis=1), k=rot, axes=(0, 1))
        branches.append(f)
    return jax.lax.switch(k, branches, img)


def _gather_one(
    images: jnp.ndarray,  # (T, H, W, C)
    masks: jnp.ndarray,  # (T, H, W)
    pos: jnp.ndarray,  # (3,) tile, row, col (patch CENTER, padded coords)
    aug: jnp.ndarray,  # () int32 in [0,8)
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
    img = _dihedral(img, aug)
    lab = _dihedral(lab, aug)
    return img, lab


@functools.partial(jax.jit, static_argnames=("size",))
def gather_batch(
    images: jnp.ndarray,
    masks: jnp.ndarray,
    mean: jnp.ndarray,
    std: jnp.ndarray,
    positions: jnp.ndarray,  # (B, 3) int32
    aug_ids: jnp.ndarray,  # (B,) int32
    size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Assemble a normalized, augmented (B,size,size,C) batch on device."""
    imgs, labs = jax.vmap(
        lambda p, a: _gather_one(images, masks, p, a, size)
    )(positions, aug_ids)
    imgs = (imgs - mean) / std
    return imgs, labs
