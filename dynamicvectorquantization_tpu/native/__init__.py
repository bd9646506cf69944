"""ctypes bindings for the native host input pipeline (libdqvq_host.so).

Builds the C++ extension on first import if a compiler is available; all
entry points fall back to PIL/numpy when the library can't be built, so the
framework never hard-depends on the native path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libdqvq_host.so")
_SRC = os.path.join(_HERE, "host_pipeline.cpp")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        _SRC, "-ljpeg", "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.dqvq_decode_jpeg.restype = ctypes.c_int
        lib.dqvq_decode_jpeg.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.dqvq_jpeg_dims.restype = ctypes.c_int
        lib.dqvq_jpeg_dims.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.dqvq_resize_bilinear.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ]
        lib.dqvq_crop_flip_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def decode_jpeg(data: bytes, min_side: int | None = None) -> np.ndarray | None:
    """Decode JPEG bytes -> HWC uint8 RGB. When min_side is given, uses
    libjpeg DCT-domain downscale (denom 2/4/8) as long as min(h,w) stays
    >= min_side. Returns None on failure (caller falls back to PIL)."""
    lib = get_lib()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.dqvq_jpeg_dims(data, len(data), ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    denom = 1
    if min_side:
        for d in (8, 4, 2):
            if min(h.value, w.value) // d >= min_side:
                denom = d
                break
    oh = (h.value + denom - 1) // denom
    ow = (w.value + denom - 1) // denom
    out = np.empty((oh + 1, ow + 1, 3), np.uint8)  # slack for rounding
    rh = ctypes.c_int()
    rw = ctypes.c_int()
    rc = lib.dqvq_decode_jpeg(
        data, len(data), denom, _u8ptr(out), out.nbytes,
        ctypes.byref(rh), ctypes.byref(rw),
    )
    if rc != 0:
        return None
    return np.ascontiguousarray(
        out.reshape(-1)[: rh.value * rw.value * 3].reshape(rh.value, rw.value, 3)
    )


def resize_bilinear(src: np.ndarray, dh: int, dw: int) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.uint8)
    dst = np.empty((dh, dw, 3), np.uint8)
    lib.dqvq_resize_bilinear(_u8ptr(src), src.shape[0], src.shape[1],
                             _u8ptr(dst), dh, dw)
    return dst


def crop_flip_normalize(src: np.ndarray, top: int, left: int, size: int,
                        flip: bool) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.uint8)
    dst = np.empty((size, size, 3), np.float32)
    lib.dqvq_crop_flip_normalize(
        _u8ptr(src), src.shape[0], src.shape[1], top, left, size,
        1 if flip else 0, dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return dst
