"""Native (C++) components.

`resize.cpp` — MATLAB-faithful bicubic resize core used by the training
data loader. Built lazily with g++ on first use; `load_resize()` returns
None when no toolchain is available and callers fall back to numpy.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libgsasr_resize.so"
_lib = None
_tried = False


def load_resize():
    """Return the ctypes lib with `resize_hwc`, building it if needed."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not _LIB_PATH.exists()
                or _LIB_PATH.stat().st_mtime
                < (_DIR / "resize.cpp").stat().st_mtime):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", str(_LIB_PATH), str(_DIR / "resize.cpp"),
                 "-lpthread"],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.resize_hwc.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_int,
            ctypes.c_int]
        lib.resize_hwc.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def resize_hwc_native(img, out_h: int, out_w: int, scale_h: float,
                      scale_w: float, antialias: bool = True,
                      nthreads: int = 4):
    """C++ bicubic resize; returns None if the native lib is unavailable."""
    import numpy as np

    lib = load_resize()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.float32)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    h, w, c = img.shape
    out = np.empty((out_h, out_w, c), np.float32)
    rc = lib.resize_hwc(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_h, out_w,
        scale_h, scale_w, int(antialias), nthreads)
    if rc != 0:
        return None
    return out[:, :, 0] if squeeze else out
