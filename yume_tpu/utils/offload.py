"""Host offload for parameter pytrees.

TPU equivalent of the reference's CPU⇄GPU model shuttling
(webapp_single_gpu.py:601-608, 819-852 `memory_optimization`; T5-on-CPU in
fastvideo/distill_model.py:720-731): park a model's weights in host RAM
while another model runs, restore on demand. On TPU the transfer rides the
PCIe/host link once; with the persistent compilation cache a restored model
resumes without recompiling.
"""

from __future__ import annotations

import jax
import numpy as np


def to_host(params):
    """Device pytree → host (numpy) pytree, freeing HBM."""
    return jax.tree_util.tree_map(lambda l: np.asarray(l), params)


def to_device(params, device=None, dtype=None):
    """Host pytree → device pytree (optionally casting)."""
    import jax.numpy as jnp

    device = device or jax.devices()[0]

    def put(l):
        a = jnp.asarray(l, dtype) if dtype is not None else jnp.asarray(l)
        return jax.device_put(a, device)

    return jax.tree_util.tree_map(put, params)


class OffloadSlot:
    """Keep one of several models resident at a time (e.g. T5 ↔ DiT ↔ VAE
    in the 16 GB webapp configuration)."""

    def __init__(self):
        self._host = {}
        self._device = {}

    def register(self, name: str, params):
        self._host[name] = to_host(params)

    def __contains__(self, name: str) -> bool:
        return name in self._host

    def use(self, name: str, dtype=None):
        """Return device params for ``name``, evicting all other slots."""
        for k in list(self._device):
            if k != name:
                del self._device[k]
        if name not in self._device:
            self._device[name] = to_device(self._host[name], dtype=dtype)
        return self._device[name]
