"""Expert parallelism for the dual-expert (low/high-noise) DiT MoE.

The reference's Wan2.2 i2v uses two full 14B DiT experts switched at a
noise boundary (wan/image2video.py:104-204 — ``boundary`` picks
high-noise vs low-noise model per step); on GPUs both experts sit in host
RAM and shuttle in and out. TPU-native EP instead gives the mesh an ``ep``
axis of size 2: each group *stores* one expert's trunk (halving per-chip
weight HBM vs keeping both resident) and the active expert's blocks are
streamed layer-by-layer to every chip with one masked `psum` per layer —
the stream rides ICI inside the trunk scan, overlapping the previous
layer's compute, and only one layer of the remote expert is ever live.

The noise-boundary split is static per denoise phase (the repo's
dual-model sampler splits sigmas at trace time), so ``expert`` is a static
int and XLA sees a fixed communication schedule.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.dit import DiTBlock, WanDiT


def make_ep_mesh(*, devices=None) -> Mesh:
    """2-group expert mesh (compose an 'ep' axis into a larger mesh for
    real deployments; this covers the standalone case)."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) >= 2
    return Mesh(np.array(devices[:2]).reshape(2), ("ep",))


def ep_stack_experts(params_a: Any, params_b: Any,
                     num_layers: int) -> Tuple[Tuple[Any, Any], Any]:
    """Split two experts' WanDiT params into (per-expert other, EP blocks).

    The non-trunk params (embeds, time/text, head — <5% of weights) stay
    replicated per expert; the trunk blocks stack to ``[2, N, ...]`` leaves
    whose leading axis shards over ``ep`` (`shard_expert_params`).
    """

    def stack_blocks(params):
        tree = params["params"] if "params" in params else params
        blocks = [tree[f"blocks_{i}"] for i in range(num_layers)]
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
        other = {"params": {k: v for k, v in tree.items()
                            if not k.startswith("blocks_")}}
        return other, stacked

    other_a, stacked_a = stack_blocks(params_a)
    other_b, stacked_b = stack_blocks(params_b)
    ep_blocks = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b]), stacked_a, stacked_b)
    return (other_a, other_b), ep_blocks


def shard_expert_params(ep_blocks: Any, mesh: Mesh):
    """Place stacked expert blocks so each ep group stores one expert."""
    sh = NamedSharding(mesh, P("ep"))
    return jax.tree_util.tree_map(lambda l: jax.device_put(l, sh), ep_blocks)


def ep_dit_apply(
    dit: WanDiT,
    others: Tuple[Any, Any],
    ep_blocks: Any,
    mesh: Mesh,
    expert: int,
    x: jax.Array,
    t_frame: jax.Array,
    context: jax.Array,
    *,
    latent_frame_zero: int = 8,
    clip_context: Optional[jax.Array] = None,
    attn_impl: Optional[str] = None,
    packed: bool = True,
) -> jax.Array:
    """DiT forward running expert ``expert`` (static 0/1) with trunk
    weights stored split over mesh axis ``ep`` and streamed per layer."""
    other = others[expert]
    emb = dit.apply(
        other, x, t_frame, context,
        *((latent_frame_zero, clip_context) if packed else (clip_context,)),
        method=dit.embed_packed if packed else dit.embed_unpacked)
    mod = dit.apply(other, emb["t_values"], emb["idx"],
                    method=WanDiT._time_mod)
    tokens, ctx = emb["tokens"], emb["ctx"]
    cos, sin = emb["cos"], emb["sin"]
    block = DiTBlock(dit.cfg)
    n = dit.cfg.num_layers

    def trunk_ep(tok, my_blocks):
        # my_blocks leaves: [1, N, ...] — this group's expert
        my_blocks = jax.tree_util.tree_map(lambda a: a[0], my_blocks)
        mine = (jax.lax.axis_index("ep") == expert).astype(tokens.dtype)

        def body(t_, i):
            # stream the active expert's layer i to every chip: groups not
            # owning it contribute zeros, one psum per layer over ICI
            p_ = jax.tree_util.tree_map(
                lambda a: jax.lax.psum(
                    mine * jax.lax.dynamic_index_in_dim(
                        a, i, 0, keepdims=False).astype(tokens.dtype), "ep"),
                my_blocks)
            return block.apply({"params": p_}, t_, mod, ctx, cos, sin,
                               attn_impl), None

        tok, _ = jax.lax.scan(body, tok, jnp.arange(n))
        return tok

    out = shard_map(
        trunk_ep, mesh=mesh,
        in_specs=(P(), P("ep")),
        out_specs=P(),
        check_rep=False,
    )(tokens, ep_blocks)

    out = dit.apply(other, out, mod,
                    method=lambda m_, tok, mo: m_.head(tok, mo))
    return dit._unpatchify(out[:, emb["l_hist"]:], emb["tail_grid"])


class EPParams:
    """Expert-sharded dual-model params as carried by the pipelines
    (others = per-expert non-trunk params, replicated; blocks = [2, N, ...]
    trunk sharded over ``ep``). Registered as a pytree with the mesh as
    static aux so it can be a traced jit argument."""

    def __init__(self, others: Tuple[Any, Any], blocks: Any, mesh: Mesh):
        self.others = others
        self.blocks = blocks
        self.mesh = mesh


jax.tree_util.register_pytree_node(
    EPParams,
    lambda p: ((p.others, p.blocks), p.mesh),
    lambda mesh, kids: EPParams(kids[0], kids[1], mesh))


def prepare_ep(params_high: Any, params_low: Any, num_layers: int,
               *, devices=None) -> EPParams:
    """Stack + place two experts for EP serving (expert 0 = high-noise,
    expert 1 = low-noise, matching the σ ≥ boundary convention)."""
    mesh = make_ep_mesh(devices=devices)
    others, blocks = ep_stack_experts(params_high, params_low, num_layers)
    sh_r = NamedSharding(mesh, P())
    others = jax.tree_util.tree_map(lambda l: jax.device_put(l, sh_r), others)
    blocks = shard_expert_params(blocks, mesh)
    return EPParams(others, blocks, mesh)
