"""ctypes bindings for the native host-IO library (``native/stereo_io.cpp``).

Decodes PNG + PFM and assembles the standardized 8-channel stack in C++ with
no Python in the loop — the host input pipeline is the training bottleneck on
few-core TPU hosts. Falls back silently when the library isn't built
(``scripts/build_native.sh``).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

__all__ = ["native_available", "load_stereo_sample_native", "read_pfm_native"]

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libstereo_io.so",
)
_MAX_PIXELS = 8192 * 8192
_lib = None


def _load():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.read_pfm.restype = ctypes.c_int
        lib.read_png_rgb.restype = ctypes.c_int
        lib.load_stereo_sample.restype = ctypes.c_int
        lib.png_dims.restype = ctypes.c_int
        _lib = lib
    return _lib


def _png_dims(lib, path: str) -> tuple[int, int]:
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.png_dims(path.encode(), ctypes.byref(h), ctypes.byref(w)):
        raise IOError(f"cannot read PNG header: {path}")
    return h.value, w.value


def native_available() -> bool:
    return _load() is not None


def read_pfm_native(path: str) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (scripts/build_native.sh)")
    out = np.empty(_MAX_PIXELS, np.float32)  # PFM header has no cheap probe; cap
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.read_pfm(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(h),
        ctypes.byref(w),
        _MAX_PIXELS,
    )
    if rc != 0:
        raise IOError(f"read_pfm({path}) failed with code {rc}")
    return out[: h.value * w.value].reshape(h.value, w.value).copy()


def load_stereo_sample_native(
    left_png: str, right_png: str, disp_left_pfm: str, disp_right_pfm: str
) -> np.ndarray:
    """-> (8, H, W) standardized stack, fully assembled in C++."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (scripts/build_native.sh)")
    ph, pw = _png_dims(lib, left_png)
    n_px = ph * pw
    stack = np.empty(8 * n_px, np.float32)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.load_stereo_sample(
        left_png.encode(),
        right_png.encode(),
        disp_left_pfm.encode(),
        disp_right_pfm.encode(),
        stack.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(h),
        ctypes.byref(w),
        n_px,
    )
    if rc != 0:
        raise IOError(f"load_stereo_sample failed with code {rc}")
    n = h.value * w.value
    return stack[: 8 * n].reshape(8, h.value, w.value).copy()
