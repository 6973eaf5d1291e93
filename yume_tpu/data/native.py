"""ctypes bindings for the native host data-path library (native/yume_host.cpp),
with numpy fallbacks when the .so isn't built.

Build: ``make -C native`` (or it is built on first use if a compiler is
available).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO = os.path.join(_NATIVE_DIR, "libyume_host.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.u8_to_unit_range.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64]
        lib.center_crop_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int]
        _lib = lib
        return lib
    except OSError:
        return None


def have_native() -> bool:
    return _load() is not None


def u8_to_unit_range(frames: np.ndarray) -> np.ndarray:
    """uint8 [..., 3] → float32 in [-1, 1]."""
    lib = _load()
    frames = np.ascontiguousarray(frames, np.uint8)
    if lib is None:
        return frames.astype(np.float32) / 127.5 - 1.0
    out = np.empty(frames.shape, np.float32)
    lib.u8_to_unit_range(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(frames.size))
    return out


def center_crop_resize(frames: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """uint8 [N, H, W, 3] → float32 [N, out_h, out_w, 3] in [-1, 1]
    (center-crop to target aspect + bilinear)."""
    lib = _load()
    frames = np.ascontiguousarray(frames, np.uint8)
    n, h, w, _ = frames.shape
    if lib is None:
        import cv2

        target_ar = out_w / out_h
        crop_w, crop_h = w, h
        if w / h > target_ar:
            crop_w = round(h * target_ar)
        else:
            crop_h = round(w / target_ar)
        x0, y0 = (w - crop_w) // 2, (h - crop_h) // 2
        out = np.stack([
            cv2.resize(f[y0:y0 + crop_h, x0:x0 + crop_w], (out_w, out_h),
                       interpolation=cv2.INTER_LINEAR)
            for f in frames
        ])
        return out.astype(np.float32) / 127.5 - 1.0
    out = np.empty((n, out_h, out_w, 3), np.float32)
    lib.center_crop_resize_batch(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_h, out_w)
    return out
