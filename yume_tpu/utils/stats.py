"""Training-stats collector: windowed scalar aggregation across steps/hosts.

TPU-native take on the reference's StyleGAN `training_stats`
(ADD/th_utils/training_stats.py): scalars reported inside the jitted step
come back as device arrays; the collector accumulates (sum, count, min, max)
per name on the host and reduces across processes with
`jax.experimental.multihost_utils` only when asked (one small transfer per
report window, never per step).
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np


class Collector:
    def __init__(self):
        self._sum: Dict[str, float] = {}
        self._cnt: Dict[str, int] = {}
        self._min: Dict[str, float] = {}
        self._max: Dict[str, float] = {}

    def report(self, **scalars):
        """Accumulate named scalars (python floats or 0-d jax arrays)."""
        for name, v in scalars.items():
            v = float(v)
            self._sum[name] = self._sum.get(name, 0.0) + v
            self._cnt[name] = self._cnt.get(name, 0) + 1
            self._min[name] = min(self._min.get(name, v), v)
            self._max[name] = max(self._max.get(name, v), v)

    def mean(self, name: str) -> float:
        return self._sum[name] / max(self._cnt[name], 1)

    def summary(self, cross_host: bool = False) -> Dict[str, Dict[str, float]]:
        """{name: {mean, min, max, n}}; cross_host also psums over processes."""
        out = {}
        names = sorted(self._sum)
        if cross_host and jax.process_count() > 1:
            from jax.experimental import multihost_utils

            vec = np.array([[self._sum[n], self._cnt[n]] for n in names])
            vec = multihost_utils.process_allgather(vec).sum(axis=0)
            for i, n in enumerate(names):
                out[n] = {"mean": vec[i, 0] / max(vec[i, 1], 1),
                          "min": self._min[n], "max": self._max[n],
                          "n": int(vec[i, 1])}
            return out
        for n in names:
            out[n] = {"mean": self.mean(n), "min": self._min[n],
                      "max": self._max[n], "n": self._cnt[n]}
        return out

    def reset(self):
        self._sum.clear(); self._cnt.clear()
        self._min.clear(); self._max.clear()
