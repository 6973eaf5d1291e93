"""Tensor parallelism for the WanDiT: Megatron-style column/row sharding
expressed as GSPMD parameter annotations.

The reference has no TP (SURVEY §2.8 — its largest model trains with FSDP
only); on TPU, TP over the attention heads and FFN hidden dim is the
cheapest way to split one sequence's FLOPs across chips on the ICI:

  * q/k/v kernels  [dim, dim]      → shard OUTPUT columns (heads split)
  * o kernel       [dim, dim]      → shard INPUT rows (+ psum, inserted by XLA)
  * ffn_0 kernel   [dim, ffn_dim]  → shard columns (hidden split)
  * ffn_2 kernel   [ffn_dim, dim]  → shard rows   (+ psum)

Everything else (norms, modulation, embeddings, head) replicates over
``tp``. XLA's sharding propagation keeps the activations between q/k/v and
o sharded on the head dimension and inserts exactly one all-reduce after
each row-sharded matmul — the Megatron communication pattern — without any
hand-written collectives. Composes with the ``fsdp`` axis (ZeRO-3 over the
remaining axis of each kernel) and ``data``.

Caveat: the fused elementwise glue kernels (ops/fused_adaln.py) have no
GSPMD partitioning rule, so under TP XLA gathers their operands and runs
them replicated per chip — numerically correct, but the qk-norm/RoPE and
AdaLN passes don't shrink with tp. The matmuls and attention (the FLOPs)
shard as designed; if TP glue cost ever matters, route those samplers
through the shard_map SP trunk (parallel/sp_forward.py), where the same
kernels run per-shard on local shapes.
"""

from __future__ import annotations

import re
from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, spec) — first match wins. Paths are '/'-joined param keys.
_TP_RULES: Tuple[Tuple[str, P], ...] = (
    # attention projections (self_attn and cross_attn, incl. k_img/v_img)
    (r".*/(self_attn|cross_attn)/(q|k|v|k_img|v_img)/kernel$", P("fsdp", "tp")),
    (r".*/(self_attn|cross_attn)/(q|k|v|k_img|v_img)/bias$", P("tp")),
    (r".*/(self_attn|cross_attn)/o/kernel$", P("tp", "fsdp")),
    (r".*/(self_attn|cross_attn)/o/bias$", P()),
    # qk-norm scales act on the head-sharded feature dim
    (r".*/(self_attn|cross_attn)/norm_(q|k|k_img)/weight$", P("tp")),
    # FFN column→row split
    (r".*/ffn_0/kernel$", P("fsdp", "tp")),
    (r".*/ffn_0/bias$", P("tp")),
    (r".*/ffn_2/kernel$", P("tp", "fsdp")),
    (r".*/ffn_2/bias$", P()),
)


def tp_param_spec(path: Tuple, leaf) -> P:
    """TP+FSDP PartitionSpec for one DiT parameter."""
    key = "/".join(
        getattr(k, "key", getattr(k, "name", str(k))) for k in path)
    for pat, spec in _TP_RULES:
        if re.match(pat, key):
            return spec
    # non-TP params: fall back to the plain fsdp rule
    from .mesh import param_sharding_rule

    return param_sharding_rule(path, leaf)


def shard_params_tp(params, mesh: Mesh):
    """Place DiT params under the TP(+FSDP) rules; axes that don't divide
    the mesh fall back per-name to replication on that axis."""

    def place(path, leaf):
        spec = tp_param_spec(path, leaf)
        fixed = []
        for ax, name in enumerate(spec):
            if name is not None and ax < len(leaf.shape) and \
                    leaf.shape[ax] % mesh.shape[name] != 0:
                fixed.append(None)
            else:
                fixed.append(name)
        return jax.device_put(leaf, NamedSharding(mesh, P(*fixed)))

    return jax.tree_util.tree_map_with_path(place, params)


def make_tp_mesh(data: int = 1, fsdp: int = 1, tp: int = -1, sp: int = 1, *,
                 devices=None) -> Mesh:
    """(data, fsdp, sp, tp) mesh; ``tp=-1`` absorbs remaining devices.

    ``tp`` is the innermost axis so TP's per-layer all-reduces ride the
    fastest ICI links (nearest neighbours on a TPU slice)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp == -1:
        assert n % (data * fsdp * sp) == 0, (n, data, fsdp, sp)
        tp = n // (data * fsdp * sp)
    assert data * fsdp * sp * tp == n, (data, fsdp, sp, tp, n)
    arr = np.array(devices).reshape(data, fsdp, sp, tp)
    return Mesh(arr, ("data", "fsdp", "sp", "tp"))
