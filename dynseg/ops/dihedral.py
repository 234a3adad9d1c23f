"""The dihedral-transform convention, defined ONCE.

Used by training augmentation (ops.gather.dihedral_batch), on-device
test-time augmentation (infer._tta_device, xp=jnp), and the serving
engine's host-side TTA (serve, xp=np) — parity by sharing, not by
copies that can drift.

Convention (SURVEY.md C5): k in [0, 8); k >= 4 flips the column axis
first, then rot90^(k % 4) over the two leading spatial axes.
"""

from __future__ import annotations


def dihedral(x, k: int, xp):
    """Apply transform k to one (H, W, ...) image; xp is numpy or
    jax.numpy (k is a static Python int)."""
    if k >= 4:
        x = xp.flip(x, axis=1)
    return xp.rot90(x, k % 4, axes=(0, 1))


def dihedral_inv(x, k: int, xp):
    """Inverse of dihedral(·, k, xp)."""
    x = xp.rot90(x, -(k % 4), axes=(0, 1))
    if k >= 4:
        x = xp.flip(x, axis=1)
    return x
