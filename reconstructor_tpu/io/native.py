"""ctypes binding to the native C++ runtime (native/reconstructor_native.cpp).

Auto-builds the shared object on first use (g++ + libjpeg are part of the
toolchain); every entry point has a pure-Python fallback, so the package
works without it — the native path is the high-throughput dataloader the
reference gets from OpenCV.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libreconstructor_native.so")


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    try:
        if not os.path.exists(_SO_PATH):
            subprocess.run(["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                           check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(_SO_PATH)
        lib.probe_jpeg.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                   ctypes.POINTER(ctypes.c_int),
                                   ctypes.POINTER(ctypes.c_int)]
        lib.probe_jpeg.restype = ctypes.c_int
        lib.decode_jpeg_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int]
        lib.decode_jpeg_batch.restype = ctypes.c_int
        lib.write_ply_ascii.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        lib.write_ply_ascii.restype = ctypes.c_int
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def decode_batch(paths: List[str], img_max_size: int = 512,
                 num_threads: int = 0) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Decode JPEGs into padded (N,H,W) gray f32 + (N,2) shapes + (N,H,W,3)
    rgb u8, all reference-resized. Returns None if unavailable or any
    non-JPEG input is present (caller falls back to PIL)."""
    lib = _load()
    if lib is None:
        return None
    if not all(p.lower().endswith((".jpg", ".jpeg")) for p in paths):
        return None
    n = len(paths)
    hs = (ctypes.c_int * 1)()
    ws = (ctypes.c_int * 1)()
    pad_h = pad_w = 0
    dims = []
    for p in paths:
        if not lib.probe_jpeg(p.encode(), img_max_size, hs, ws):
            return None
        dims.append((hs[0], ws[0]))
        pad_h = max(pad_h, hs[0])
        pad_w = max(pad_w, ws[0])

    rgb = np.zeros((n, pad_h, pad_w, 3), np.uint8)
    gray = np.zeros((n, pad_h, pad_w), np.float32)
    heights = (ctypes.c_int * n)()
    widths = (ctypes.c_int * n)()
    blob = b"\0".join(p.encode() for p in paths) + b"\0"
    ok = lib.decode_jpeg_batch(
        blob, n, img_max_size,
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        gray.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pad_h, pad_w, heights, widths, num_threads)
    if ok != n:
        return None
    shapes = np.asarray([[heights[i], widths[i]] for i in range(n)], np.int32)
    return gray, shapes, rgb


def write_ply(path: str, xyz: np.ndarray, rgb: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    xyz = np.ascontiguousarray(xyz, np.float32)
    rgb = np.ascontiguousarray(rgb, np.uint8)
    return bool(lib.write_ply_ascii(
        path.encode(), xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), xyz.shape[0]))
