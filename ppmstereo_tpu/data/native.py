"""ctypes bindings for the native stereoio library (native/stereoio.cpp).

Auto-builds on first import if a toolchain is available; every entry
point has a numpy fallback so the framework runs without the .so.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libstereoio.so"))

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception as e:  # pragma: no cover
            logging.debug(f"native build unavailable: {e}")
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.read_pfm.restype = ctypes.c_int
        lib.read_flo.restype = ctypes.c_int
        _lib = lib
    except OSError as e:  # pragma: no cover
        logging.debug(f"native load failed: {e}")
        _lib = False
    return _lib


def available() -> bool:
    return bool(_load())


def read_pfm(path: str) -> np.ndarray:
    lib = _load()
    if not lib:
        from ppmstereo_tpu.data import frame_utils

        return np.ascontiguousarray(frame_utils.read_pfm(path))
    h = ctypes.c_int()
    w = ctypes.c_int()
    ch = ctypes.c_int()
    rc = lib.read_pfm(path.encode(), None, ctypes.byref(h), ctypes.byref(w), ctypes.byref(ch))
    if rc != 0:
        raise IOError(f"read_pfm({path}) failed: {rc}")
    shape = (h.value, w.value) if ch.value == 1 else (h.value, w.value, 3)
    out = np.empty(shape, np.float32)
    rc = lib.read_pfm(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(h), ctypes.byref(w), ctypes.byref(ch),
    )
    if rc != 0:
        raise IOError(f"read_pfm({path}) failed: {rc}")
    return out


def read_flo(path: str) -> np.ndarray:
    lib = _load()
    if not lib:
        from ppmstereo_tpu.data import frame_utils

        return frame_utils.read_flow(path)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.read_flo(path.encode(), None, ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"read_flo({path}) failed: {rc}")
    out = np.empty((h.value, w.value, 2), np.float32)
    rc = lib.read_flo(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0:
        raise IOError(f"read_flo({path}) failed: {rc}")
    return out


def photometric_fused(
    img: np.ndarray, brightness: float, contrast: float, saturation: float,
    gamma: float, gain: float, order: np.ndarray,
) -> np.ndarray:
    """In-place fused jitter on (..., 3) uint8. order: 3 ints from
    {0: brightness, 1: contrast, 2: saturation} (hue handled separately)."""
    lib = _load()
    flat = np.ascontiguousarray(img.reshape(-1, 3))
    gray_mean = float(
        (flat @ np.array([0.299, 0.587, 0.114], np.float32)).mean()
    )
    if not lib:
        from ppmstereo_tpu.data.augmentor import (
            _adjust_brightness,
            _adjust_contrast,
            _adjust_gamma,
            _adjust_saturation,
        )

        out = flat.astype(np.float32)
        for op in order:
            if op == 0:
                out = _adjust_brightness(out, brightness)
            elif op == 1:
                out = _adjust_contrast(out, contrast)
            elif op == 2:
                out = _adjust_saturation(out, saturation)
        out = _adjust_gamma(out, gamma, gain)
        return out.astype(np.uint8).reshape(img.shape)

    order_arr = np.ascontiguousarray(order, np.int32)
    lib.photometric_fused(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(flat.shape[0]),
        ctypes.c_float(brightness), ctypes.c_float(contrast),
        ctypes.c_float(saturation), ctypes.c_float(gamma),
        ctypes.c_float(gain), ctypes.c_float(gray_mean),
        order_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return flat.reshape(img.shape)
