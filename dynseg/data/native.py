"""ctypes bindings for the native (C++) data-layer helpers.

The reference has no in-repo native code (its native surface is vendored
TF kernels — SURVEY.md §2); this framework's host runtime is C++ where
the work is host-shaped: building per-class position tables from
production-size label rasters in one fused pass (native/position_tables.cc)
instead of num_classes numpy full scans.

Loading strategy: use native/build/libdynseg_native.so if present; else
try a one-time `make -C native` (g++ is in the image); else report
unavailable and the sampler falls back to numpy. No pybind11 in this
image, hence plain C ABI + ctypes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libdynseg_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.path.exists(os.path.join(_NATIVE_DIR, "Makefile")):
            # Run make UNCONDITIONALLY: its dependency tracking rebuilds
            # when position_tables.cc is newer than the .so and is a
            # near-free no-op otherwise. Gating on .so-missing silently
            # served stale binaries after source edits (review r2).
            # Under an inter-PROCESS flock: concurrent CLI runs (e.g.
            # two folds started together) used to race two g++ -o writes
            # into the same .so, persisting a corrupt binary that later
            # dependency checks treated as up-to-date (review r2, r2).
            try:
                os.makedirs(os.path.join(_NATIVE_DIR, "build"), exist_ok=True)
                import fcntl

                with open(os.path.join(_NATIVE_DIR, "build", ".lock"),
                          "w") as lk:
                    fcntl.flock(lk, fcntl.LOCK_EX)
                    try:
                        subprocess.run(
                            ["make", "-C", _NATIVE_DIR],
                            capture_output=True, timeout=120, check=True,
                        )
                    finally:
                        fcntl.flock(lk, fcntl.LOCK_UN)
            except Exception:
                if not os.path.exists(_SO_PATH):
                    return None  # no library at all; else use existing
        if not os.path.exists(_SO_PATH):
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        i64, i32p = ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)
        lib.count_class_pixels.argtypes = [
            i32p, i64, i64, i64, ctypes.c_int32, ctypes.POINTER(ctypes.c_int64),
        ]
        lib.fill_position_tables.argtypes = [
            i32p, i64, i64, i64, ctypes.c_int32, ctypes.POINTER(i32p),
        ]
        lib.shuffle_table.argtypes = [i32p, i64, ctypes.c_uint64]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_position_tables(
    masks: np.ndarray, num_classes: int
) -> Optional[List[np.ndarray]]:
    """Per-class (n_c, 3) int32 (tile,row,col) tables in raster order —
    same contract as the numpy fallback in sampler.py."""
    lib = _load()
    if lib is None:
        return None
    masks = np.ascontiguousarray(masks, dtype=np.int32)
    t, h, w = masks.shape
    counts = np.zeros(num_classes, dtype=np.int64)
    mp = masks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    lib.count_class_pixels(
        mp, t, h, w, num_classes,
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    tables = [np.empty((int(n), 3), dtype=np.int32) for n in counts]
    ptrs = (ctypes.POINTER(ctypes.c_int32) * num_classes)(
        *[tb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)) for tb in tables]
    )
    lib.fill_position_tables(mp, t, h, w, num_classes, ptrs)
    return tables


def shuffle_table(table: np.ndarray, seed: int) -> None:
    """In-place Fisher–Yates shuffle of an (n,3) int32 table."""
    lib = _load()
    # Explicit errors, not assert (stripped under python -O): the C
    # Fisher-Yates swaps raw memory, and a non-contiguous view's base
    # pointer would silently corrupt the parent array (review r2, r2).
    if lib is None:
        raise RuntimeError("native library unavailable — gate calls on "
                           "native.available()")
    if not (table.dtype == np.int32 and table.ndim == 2
            and table.shape[1] == 3 and table.flags["C_CONTIGUOUS"]):
        raise ValueError(
            f"shuffle_table needs a C-contiguous (n, 3) int32 array, got "
            f"{table.dtype} {table.shape} contiguous="
            f"{table.flags['C_CONTIGUOUS']}")
    lib.shuffle_table(
        table.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        table.shape[0],
        ctypes.c_uint64(seed),
    )
