"""Native host components: build-on-first-use C pixel pool + tool sources.

`pixelpool` is compiled with the system C compiler on first import (cached
next to the source); when no compiler is available everything falls back to
numpy with identical semantics.
"""
from __future__ import annotations

import ctypes
import shutil
import subprocess
import threading
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_LIB_PATH = _DIR / "_pixelpool.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cc = shutil.which("cc") or shutil.which("gcc") or shutil.which("clang")
    if cc is None:
        return False
    try:
        subprocess.run(
            [cc, "-O3", "-shared", "-fPIC", "-o", str(_LIB_PATH), str(_DIR / "pixelpool.c")],
            check=True,
            capture_output=True,
        )
        return True
    except subprocess.CalledProcessError:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB_PATH.exists() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        lib.pixelpool_gather.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.pixelpool_pack_rgba.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_void_p,
        ]
        _lib = lib
        return _lib


def gather(pool: np.ndarray, light_ok, buffer_idx: np.ndarray, pixel_idx: np.ndarray):
    """pool (B, P, 4) uint8; light_ok (B, P) bool or None; idx arrays (n,) int32
    → (rgba (n, 4) float32 in [0,1], light (n,) bool)."""
    n = buffer_idx.shape[0]
    lib = _load()
    if lib is not None and pool.flags.c_contiguous:
        out_rgba = np.empty((n, 4), dtype=np.float32)
        out_light = np.empty((n,), dtype=np.uint8)
        light_arr = None
        light_ptr = None
        if light_ok is not None:
            light_arr = np.ascontiguousarray(light_ok, dtype=np.uint8)
            light_ptr = light_arr.ctypes.data
        bidx = np.ascontiguousarray(buffer_idx, dtype=np.int32)
        pidx = np.ascontiguousarray(pixel_idx, dtype=np.int32)
        lib.pixelpool_gather(
            pool.ctypes.data, light_ptr, bidx.ctypes.data, pidx.ctypes.data,
            pool.shape[1], n, out_rgba.ctypes.data, out_light.ctypes.data,
        )
        return out_rgba, out_light.astype(bool)

    rgba = pool[buffer_idx, pixel_idx].astype(np.float32) / 255.0
    light = (
        light_ok[buffer_idx, pixel_idx] if light_ok is not None else np.ones(n, dtype=bool)
    )
    return rgba, np.asarray(light, dtype=bool)
