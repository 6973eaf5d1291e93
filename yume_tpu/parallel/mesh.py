"""Device mesh construction and sharding rules.

TPU-native replacement for the reference's process-group bookkeeping +
FSDP wrappers (fastvideo/utils/parallel_states.py:6-64,
fastvideo/utils/fsdp_util.py:66-157, wan/distributed/fsdp.py:10-32): one
`jax.sharding.Mesh` with named axes and `NamedSharding` rules replaces
NCCL group plumbing; XLA GSPMD inserts the collectives.

Axes:
    data — data parallel (batch; ≙ torchrun DP / DistributedSampler)
    fsdp — parameter sharding (≙ FSDP FULL_SHARD / ZeRO-3)
    sp   — sequence parallel (≙ Ulysses / context parallel chunking)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = 1,
    fsdp: int = -1,
    sp: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, fsdp, sp) mesh. ``fsdp=-1`` absorbs remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if fsdp == -1:
        assert n % (data * sp) == 0, (n, data, sp)
        fsdp = n // (data * sp)
    assert data * fsdp * sp == n, (data, fsdp, sp, n)
    arr = np.array(devices).reshape(data, fsdp, sp)
    return Mesh(arr, ("data", "fsdp", "sp"))


def make_usp_mesh(
    data: int = 1,
    fsdp: int = 1,
    sp_u: int = 2,
    sp_r: int = -1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """2D sequence-parallel mesh for USP hybrid attention (ulysses over
    ``sp_u``, ring over ``sp_r``) — ≙ the reference's xDiT USP degrees
    (ulysses_degree × ring_degree, wan/distributed/xdit_context_parallel.py).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if sp_r == -1:
        assert n % (data * fsdp * sp_u) == 0, (n, data, fsdp, sp_u)
        sp_r = n // (data * fsdp * sp_u)
    assert data * fsdp * sp_u * sp_r == n, (data, fsdp, sp_u, sp_r, n)
    arr = np.array(devices).reshape(data, fsdp, sp_u, sp_r)
    return Mesh(arr, ("data", "fsdp", "sp_u", "sp_r"))


def param_sharding_rule(path: Tuple, leaf) -> P:
    """ZeRO-3-style parameter sharding: shard the largest axis of each ≥2D
    parameter across ``fsdp`` (≙ FSDP FULL_SHARD per-block wrapping,
    fastvideo/utils/fsdp_util.py:86-95); small params replicate."""
    shape = getattr(leaf, "shape", ())
    if len(shape) < 2 or int(np.prod(shape)) < (1 << 16):
        return P()
    big = int(np.argmax(shape))
    spec = [None] * len(shape)
    spec[big] = "fsdp"
    return P(*spec)


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree on the mesh under the fsdp rule, padding-free
    axes falling back to replication when not divisible."""
    def place(path, leaf):
        spec = param_sharding_rule(path, leaf)
        # fall back to replication when the sharded axis is not divisible
        for ax, name in enumerate(spec):
            if name == "fsdp" and leaf.shape[ax] % mesh.shape["fsdp"] != 0:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def activation_sharding(mesh: Mesh, *, seq: bool = False) -> NamedSharding:
    """[B, L, ...] activation sharding: batch over data, optionally sequence
    over sp (context parallelism ≙
    wan/distributed/xdit_context_parallel.py:131-146)."""
    return NamedSharding(mesh, P("data", "sp" if seq else None))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))
