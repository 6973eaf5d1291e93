"""Pipeline parallelism for the DiT trunk (beyond-reference; the torch
reference scales only via FSDP/SP, SURVEY §2.8).

TPU-native GPipe: the mesh gains a ``pp`` axis, the N transformer blocks
split into S contiguous stages whose stacked parameters live sharded over
``pp`` (each chip holds N/S blocks — 1/S of the trunk weights), and
microbatches flow through a `lax.scan` tick loop inside `shard_map`:

  * tick t, stage p computes microbatch m = t − p (validity-gated — the
    idle ticks ARE the pipeline bubble, (S−1)/(M+S−1) of the time)
  * activations hand off stage→stage with a single `lax.ppermute` per tick
    (rides ICI; no host involvement)
  * the last stage accumulates its finished microbatches; one masked
    `psum` replicates the output at the end

Differentiable end-to-end (scan/ppermute/psum all have transposes), so the
same function serves training. With batch 1 at inference the schedule
degenerates to sequential stage execution — still a memory win (weights
1/S per chip).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.dit import DiTBlock, WanDiT


def make_pp_mesh(pp: int, *, devices=None) -> Mesh:
    """1D pipeline mesh (compose with dp/fsdp axes by building your own
    Mesh with a 'pp' axis; this helper covers the common standalone case).
    """
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) % pp == 0, (len(devices), pp)
    return Mesh(np.array(devices[: pp]).reshape(pp), ("pp",))


def pp_stage_params(params: Any, num_layers: int, stages: int):
    """Split WanDiT params into (other, staged blocks).

    Staged blocks are the per-layer ``blocks_i`` subtrees stacked to
    ``[S, N/S, ...]`` leaves — shard the leading axis over ``pp``
    (`shard_stage_params`) so each chip stores only its stage.
    """
    tree = params["params"] if "params" in params else params
    assert num_layers % stages == 0, (num_layers, stages)
    blocks = [tree[f"blocks_{i}"] for i in range(num_layers)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    staged = jax.tree_util.tree_map(
        lambda l: l.reshape((stages, num_layers // stages) + l.shape[1:]),
        stacked)
    other = {"params": {k: v for k, v in tree.items()
                        if not k.startswith("blocks_")}}
    return other, staged


def shard_stage_params(staged: Any, mesh: Mesh):
    """Place staged block params so each pp group holds one stage."""
    sh = NamedSharding(mesh, P("pp"))
    return jax.tree_util.tree_map(lambda l: jax.device_put(l, sh), staged)


def pp_dit_apply(
    dit: WanDiT,
    other: Any,
    staged: Any,
    mesh: Mesh,
    x: jax.Array,
    t_frame: jax.Array,
    context: jax.Array,
    *,
    latent_frame_zero: int = 8,
    clip_context: Optional[jax.Array] = None,
    num_microbatches: Optional[int] = None,
    attn_impl: Optional[str] = None,
    packed: bool = True,
) -> jax.Array:
    """DiT forward with the trunk pipelined over mesh axis ``pp``.

    ``other``/``staged`` come from `pp_stage_params`. Embedding, timestep
    modulation, and the head run replicated (cheap vs the trunk);
    microbatching splits the batch axis (``num_microbatches`` defaults to
    the batch size).
    """
    S = mesh.shape["pp"]
    emb = dit.apply(
        other, x, t_frame, context,
        *((latent_frame_zero, clip_context) if packed else (clip_context,)),
        method=dit.embed_packed if packed else dit.embed_unpacked)
    mod = dit.apply(other, emb["t_values"], emb["idx"],
                    method=WanDiT._time_mod)
    tokens, ctx = emb["tokens"], emb["ctx"]
    cos, sin = emb["cos"], emb["sin"]
    b, l, d = tokens.shape
    M = num_microbatches or b
    assert b % M == 0, (b, M)
    mb = b // M

    def split(a):  # [B, ...] -> [M, mb, ...]
        return a.reshape((M, mb) + a.shape[1:])

    tok_mb = split(tokens)
    ctx_mb = split(ctx)
    mod_mb = jax.tree_util.tree_map(split, mod)
    block = DiTBlock(dit.cfg)

    def stage_apply(tok, mod_m, ctx_m, stage_p):
        def body(t_, p_):
            return block.apply({"params": p_}, t_, mod_m, ctx_m, cos, sin,
                               attn_impl), None

        tok, _ = jax.lax.scan(body, tok, stage_p)
        return tok

    def trunk_pp(tok_mb_, stage_p):
        stage_p = jax.tree_util.tree_map(lambda a: a[0], stage_p)
        p = jax.lax.axis_index("pp")
        act0 = jnp.zeros((mb, l, d), tokens.dtype)
        out0 = jnp.zeros((M, mb, l, d), tokens.dtype)

        def tick(carry, t):
            act, outbuf = carry
            m = t - p
            m_c = jnp.clip(m, 0, M - 1)
            valid = (m >= 0) & (m < M)
            fresh = jax.lax.dynamic_index_in_dim(tok_mb_, m_c, 0,
                                                 keepdims=False)
            act_in = jnp.where(p == 0, fresh, act)
            mod_m = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(a, m_c, 0,
                                                       keepdims=False),
                mod_mb)
            ctx_m = jax.lax.dynamic_index_in_dim(ctx_mb, m_c, 0,
                                                 keepdims=False)
            out = stage_apply(act_in, mod_m, ctx_m, stage_p)
            out = jnp.where(valid, out, act_in)
            write = valid & (p == S - 1)
            prev = jax.lax.dynamic_index_in_dim(outbuf, m_c, 0,
                                                keepdims=False)
            outbuf = jax.lax.dynamic_update_index_in_dim(
                outbuf, jnp.where(write, out, prev), m_c, 0)
            act = jax.lax.ppermute(out, "pp",
                                   [(i, (i + 1) % S) for i in range(S)])
            return (act, outbuf), None

        (_, outbuf), _ = jax.lax.scan(tick, (act0, out0),
                                      jnp.arange(M + S - 1))
        # only the last stage holds real outputs; masked psum replicates
        outbuf = jnp.where(p == S - 1, outbuf, jnp.zeros_like(outbuf))
        return jax.lax.psum(outbuf, "pp")

    out = shard_map(
        trunk_pp, mesh=mesh,
        in_specs=(P(), P("pp")),
        out_specs=P(),
        check_rep=False,
    )(tok_mb, staged)

    out = out.reshape(b, l, d)
    out = dit.apply(other, out, mod,
                    method=lambda m_, tok, mo: m_.head(tok, mo))
    return dit._unpatchify(out[:, emb["l_hist"]:], emb["tail_grid"])


class PPParams:
    """Pipeline-staged DiT params as carried by the serving pipelines
    (marker type: pipelines route their denoise through `pp_dit_apply`
    when ``dit_params`` is a PPParams). Registered as a pytree whose
    ``mesh`` travels as static aux data (Mesh is hashable), so a PPParams
    can be a traced jit argument. Deliberately NOT a tuple subclass —
    the pipelines' ``isinstance(params, tuple)`` quantized-trunk check
    must not match it."""

    def __init__(self, other: Any, staged: Any, mesh: Mesh):
        self.other = other
        self.staged = staged
        self.mesh = mesh


jax.tree_util.register_pytree_node(
    PPParams,
    lambda p: ((p.other, p.staged), p.mesh),
    lambda mesh, kids: PPParams(kids[0], kids[1], mesh))


def prepare_pp(params: Any, num_layers: int, stages: int,
               *, devices=None) -> PPParams:
    """Stage + place WanDiT params for pipeline-parallel serving."""
    mesh = make_pp_mesh(stages, devices=devices)
    other, staged = pp_stage_params(params, num_layers, stages)
    sh_r = NamedSharding(mesh, P())
    other = jax.tree_util.tree_map(lambda l: jax.device_put(l, sh_r), other)
    staged = shard_stage_params(staged, mesh)
    return PPParams(other, staged, mesh)
