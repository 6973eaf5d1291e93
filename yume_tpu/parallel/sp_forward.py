"""Sequence-parallel DiT forward: shard the token axis across the mesh's
``sp`` axis between embedding and unpatchify.

TPU-native equivalent of the reference's monkey-patched `sp_dit_forward`
(wan23/distributed/sequence_parallel.py:64-146, wan/distributed/
xdit_context_parallel.py:104-146): embedding + RoPE/timestep prep run
replicated (cheap), the 30/40-block trunk runs inside `shard_map` with
tokens sharded along L, self-attention goes through Ulysses all-to-all
(heads⇄seq), per-token modulation indices and RoPE tables are sharded with
the tokens (≙ the reference's rank-sliced RoPE), and the head output is
re-gathered for unpatchify.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.dit import WanDiT
from ..ops.flash_attention import flash_attention
from .ulysses import ring_attention, ulysses_attention


def _pad_to(x, mult: int, axis: int):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x, 0
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), pad


def sp_dit_apply(
    dit: WanDiT,
    params: Any,
    mesh: Mesh,
    x: jax.Array,
    t_frame: jax.Array,
    context: jax.Array,
    *,
    latent_frame_zero: int = 8,
    clip_context: Optional[jax.Array] = None,
    kind: str = "ulysses",
    cache_list: tuple = (),
    block_cache: Optional[jax.Array] = None,
    return_cache: bool = False,
) -> jax.Array:
    """Packed DiT forward with the trunk sequence-sharded over mesh axis
    'sp' (or, for ``kind='usp'``, the 2D (sp_u, sp_r) axes of a
    make_usp_mesh). Returns the tail-frame velocity like the packed
    forward.

    TeaCache under SP (≙ the reference running its cached model under FSDP
    sharding, fastvideo/sample/sample.py:979-985 + wan/modules/model.py:
    977-998): ``return_cache=True`` additionally returns the stacked
    block-residual cache [n_cache, B, L_pad, D] — sharded along L like the
    tokens, so it stays resident on its shards between denoise steps;
    ``block_cache`` feeds it back on cached steps."""
    if kind == "usp":
        sp_axes: tuple = ("sp_u", "sp_r")
        sp = mesh.shape["sp_u"] * mesh.shape["sp_r"]
    else:
        sp_axes = ("sp",)
        sp = mesh.shape["sp"]
    emb = dit.apply(params, x, t_frame, context, latent_frame_zero,
                    clip_context, method=dit.embed_packed)
    tokens, idx = emb["tokens"], emb["idx"]
    cos, sin = emb["cos"], emb["sin"]
    b, l_true, _ = tokens.shape

    tokens, pad = _pad_to(tokens, sp, 1)
    idx, _ = _pad_to(idx, sp, 1)
    cos, _ = _pad_to(cos, sp, 0)
    sin, _ = _pad_to(sin, sp, 0)
    kv_len = jnp.full((b,), l_true, jnp.int32)

    if kind == "ulysses":
        sp_attn = functools.partial(
            ulysses_attention, axis_name="sp", kv_len=kv_len,
            attn_fn=functools.partial(flash_attention, kv_len=kv_len)
            if jax.default_backend() == "tpu" else None,
        )
    elif kind == "usp":
        from .ulysses import usp_attention

        sp_attn = functools.partial(usp_attention, ulysses_axis="sp_u",
                                    ring_axis="sp_r", kv_len=kv_len)
    else:
        sp_attn = functools.partial(ring_attention, axis_name="sp",
                                    kv_len=kv_len)

    tok_spec = P(None, sp_axes, None)
    base_in = (tok_spec, P(None, sp_axes), P(sp_axes, None), P(sp_axes, None))
    cache_spec = P(None, None, sp_axes, None)  # [n_cache, B, L, D]

    if return_cache:
        def trunk(tok, idx_s, cos_s, sin_s):
            out, new_cache = dit.apply(
                params, tok, emb["t_values"], idx_s, emb["ctx"], cos_s,
                sin_s, sp_attn, cache_list=cache_list, return_cache=True,
                method=dit.trunk_head)
            return out, jnp.stack(new_cache)

        out, cache = shard_map(
            trunk, mesh=mesh, in_specs=base_in,
            out_specs=(tok_spec, cache_spec), check_rep=False,
        )(tokens, idx, cos, sin)
        out = out[:, : l_true]
        return dit._unpatchify(out[:, emb["l_hist"]:], emb["tail_grid"]), cache

    if block_cache is not None:
        def trunk(tok, idx_s, cos_s, sin_s, cache_s):
            cache_l = [cache_s[j] for j in range(len(cache_list))]
            return dit.apply(
                params, tok, emb["t_values"], idx_s, emb["ctx"], cos_s,
                sin_s, sp_attn, cache_list=cache_list, block_cache=cache_l,
                method=dit.trunk_head)

        out = shard_map(
            trunk, mesh=mesh, in_specs=base_in + (cache_spec,),
            out_specs=tok_spec, check_rep=False,
        )(tokens, idx, cos, sin, block_cache)
    else:
        def trunk(tok, idx_s, cos_s, sin_s):
            return dit.apply(
                params, tok, emb["t_values"], idx_s, emb["ctx"], cos_s, sin_s,
                sp_attn, method=dit.trunk_head,
            )

        out = shard_map(
            trunk, mesh=mesh, in_specs=base_in,
            out_specs=tok_spec, check_rep=False,
        )(tokens, idx, cos, sin)

    out = out[:, : l_true]
    return dit._unpatchify(out[:, emb["l_hist"]:], emb["tail_grid"])
