"""ctypes bindings for the native host-IO library (native/stereoio.cpp).

Builds on demand with `make -C native` (g++ + libpng baked into the image)
and falls back to the PIL/numpy readers in data/io.py when unavailable.
`read_image_f32` decodes PNG (8/16-bit) and PFM straight into a float32
numpy array with no intermediate PIL objects.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SO = os.path.join(_REPO, "native", "build", "libstereoio.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO):
                subprocess.run(
                    ["make", "-C", os.path.join(_REPO, "native")],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_SO)
            lib.sio_image_info.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.sio_image_info.restype = ctypes.c_int
            lib.sio_read_image_f32.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ]
            lib.sio_read_image_f32.restype = ctypes.c_int
            lib.sio_normalize_imagenet.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
            ]
            lib.sio_normalize_imagenet.restype = None
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def image_info(path: str) -> Tuple[int, int, int, int]:
    lib = _load()
    assert lib is not None
    h = ctypes.c_int(); w = ctypes.c_int()
    c = ctypes.c_int(); depth = ctypes.c_int()
    rc = lib.sio_image_info(path.encode(), h, w, c, depth)
    if rc != 0:
        raise IOError(f"sio_image_info({path}) -> {rc}")
    return h.value, w.value, c.value, depth.value


def read_image_f32(path: str) -> np.ndarray:
    """Decode PNG/PFM to float32 (H, W) or (H, W, C). PNG 8-bit values are in
    [0, 255]; 16-bit PNGs return raw uint16 values; PFM returns floats."""
    lib = _load()
    assert lib is not None
    h, w, c, _ = image_info(path)
    out = np.empty((h, w, c) if c > 1 else (h, w), np.float32)
    rc = lib.sio_read_image_f32(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.size,
    )
    if rc != 0:
        raise IOError(f"sio_read_image_f32({path}) -> {rc}")
    return out


def normalize_imagenet(img255: np.ndarray) -> np.ndarray:
    """Native (x/255 - mean)/std for (H, W, 3) float32 images."""
    lib = _load()
    assert lib is not None
    img255 = np.ascontiguousarray(img255, np.float32)
    out = np.empty_like(img255)
    lib.sio_normalize_imagenet(
        img255.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        img255.size // 3,
    )
    return out
