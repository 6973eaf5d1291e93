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


# ---------------------------------------------------------------------------
# native video decode (native/yume_decode.cpp — ≙ the reference's decord,
# fastvideo/dataset/t2v_datasets.py)
# ---------------------------------------------------------------------------

_DECODE_SO = os.path.join(_NATIVE_DIR, "libyume_decode.so")
_decode_lib: Optional[ctypes.CDLL] = None


def _load_decode() -> Optional[ctypes.CDLL]:
    global _decode_lib
    if _decode_lib is not None:
        return _decode_lib
    if not os.path.exists(_DECODE_SO):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
    if not os.path.exists(_DECODE_SO):
        return None
    try:
        lib = ctypes.CDLL(_DECODE_SO)
        lib.yd_open.argtypes = [ctypes.c_char_p]
        lib.yd_open.restype = ctypes.c_void_p
        lib.yd_width.argtypes = [ctypes.c_void_p]
        lib.yd_height.argtypes = [ctypes.c_void_p]
        lib.yd_frame_count.argtypes = [ctypes.c_void_p]
        lib.yd_frame_count.restype = ctypes.c_int64
        lib.yd_read_frames.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
        lib.yd_close.argtypes = [ctypes.c_void_p]
        _decode_lib = lib
        return lib
    except OSError:
        return None


def have_native_decode() -> bool:
    return _load_decode() is not None


def decode_frames(path: str, indices, size=None) -> Optional[np.ndarray]:
    """Decode specific frames natively → uint8 [N, H, W, 3] RGB, or None
    when the decoder is unavailable / the file can't be opened.

    ``indices`` may repeat and be unordered (matching the cv2 reader's
    contract); ``size`` = (height, width) scales during decode (swscale
    SWS_AREA — one pass, no separate resize)."""
    lib = _load_decode()
    if lib is None:
        return None
    h = lib.yd_open(path.encode())
    if not h:
        return None
    try:
        want = sorted(set(int(i) for i in indices))
        arr = np.asarray(want, np.int64)
        out_h, out_w = (size if size is not None
                        else (lib.yd_height(h), lib.yd_width(h)))
        buf = np.empty((len(want), out_h, out_w, 3), np.uint8)
        got = lib.yd_read_frames(
            h, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(want),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_h, out_w)
        if got != len(want):
            return None
        lut = {f: i for i, f in enumerate(want)}
        return buf[[lut[int(i)] for i in indices]]
    finally:
        lib.yd_close(h)


def video_frame_count(path: str) -> Optional[int]:
    """Container-recorded frame count, or None when unavailable."""
    lib = _load_decode()
    if lib is None:
        return None
    h = lib.yd_open(path.encode())
    if not h:
        return None
    try:
        n = lib.yd_frame_count(h)
        return int(n) if n > 0 else None
    finally:
        lib.yd_close(h)
