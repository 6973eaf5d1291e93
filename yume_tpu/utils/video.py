"""Video/image export helpers (≙ reference wan/utils/utils.py:14-118
`cache_video`/`cache_image` with save-retry)."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def to_uint8(video: np.ndarray) -> np.ndarray:
    """[T, H, W, 3] in [-1, 1] → uint8."""
    v = np.clip(np.asarray(video, np.float32), -1.0, 1.0)
    return ((v + 1.0) * 127.5).astype(np.uint8)


def save_video(video: np.ndarray, path: str, fps: int = 16, retry: int = 3) -> Optional[str]:
    """Write an [T, H, W, 3] in [-1,1] array as mp4 (imageio/ffmpeg)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    frames = to_uint8(video)
    def _imageio():
        import imageio

        writer = imageio.get_writer(path, fps=fps, codec="libx264", quality=8)
        for f in frames:
            writer.append_data(f)
        writer.close()

    def _cv2():
        import cv2

        h, w = frames.shape[1:3]
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
        if not vw.isOpened():
            raise IOError("cv2.VideoWriter failed to open")
        for f in frames:
            vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        vw.release()

    last = None
    for attempt in range(retry):  # save-with-retry (reference utils.py:23-62)
        for backend in (_imageio, _cv2):
            try:
                backend()
                return path
            except Exception as e:
                last = e
    # fall back to raw npy so results are never lost
    np.save(path + ".npy", frames)
    print(f"save_video failed ({last}); wrote {path}.npy")
    return None


def save_image(img: np.ndarray, path: str) -> Optional[str]:
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(to_uint8(img[None])[0]).save(path)
    return path


def load_image(path: str, size=None) -> np.ndarray:
    """→ [H, W, 3] float32 in [-1, 1]."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if size is not None:
        img = img.resize((size[1], size[0]), Image.LANCZOS)
    return np.asarray(img, np.float32) / 127.5 - 1.0
