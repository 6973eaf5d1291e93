"""Video transforms + batch samplers.

Host-side equivalents of the reference transform/sampler utilities
(fastvideo/dataset/transform.py: CenterCropResizeVideo:324,
TemporalRandomCrop; fastvideo/utils/dataset_utils.py: LengthGroupedSampler:325,
Collate:55). All numpy, channels-last.
"""

from __future__ import annotations

import random
from typing import Dict, Iterator, List, Sequence

import numpy as np

from .native import center_crop_resize


class CenterCropResizeVideo:
    """Center-crop to the target aspect then resize (native C++ path when
    built)."""

    def __init__(self, size):
        self.h, self.w = size

    def __call__(self, video_u8: np.ndarray) -> np.ndarray:
        return center_crop_resize(video_u8, self.h, self.w)


class TemporalRandomCrop:
    """Random contiguous frame window of a given length."""

    def __init__(self, length: int, rng: random.Random | None = None):
        self.length = length
        self.rng = rng or random.Random()

    def __call__(self, total_frames: int):
        begin = self.rng.randint(0, max(total_frames - self.length, 0))
        return begin, min(begin + self.length, total_frames)


class LengthGroupedSampler:
    """Batch indices grouped by sample length so each batch has uniform
    shapes (minimising jit recompilation — the TPU-side reason the
    reference groups by length for collation)."""

    def __init__(self, lengths: Sequence[int], batch_size: int,
                 seed: int = 0, drop_last: bool = True):
        self.lengths = list(lengths)
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.rng = random.Random(seed)

    def __iter__(self) -> Iterator[List[int]]:
        idx = sorted(range(len(self.lengths)), key=lambda i: self.lengths[i])
        batches = [idx[i:i + self.batch_size]
                   for i in range(0, len(idx), self.batch_size)]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches = batches[:-1]
        self.rng.shuffle(batches)
        return iter(batches)


def collate(samples: List[Dict]) -> Dict[str, np.ndarray]:
    """Stack same-shape samples, right-padding frame counts to the batch max
    (reference Collate, dataset_utils.py:55)."""
    out: Dict[str, np.ndarray] = {}
    keys = samples[0].keys()
    for k in keys:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], np.ndarray) and vals[0].ndim >= 1:
            max_t = max(v.shape[0] for v in vals)
            padded = []
            for v in vals:
                if v.shape[0] < max_t:
                    pad = np.zeros((max_t - v.shape[0],) + v.shape[1:], v.dtype)
                    v = np.concatenate([v, pad])
                padded.append(v)
            out[k] = np.stack(padded)
        else:
            out[k] = vals
    return out
