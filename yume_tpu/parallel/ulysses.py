"""Sequence parallelism: Ulysses all-to-all attention + ring attention.

TPU-native equivalents of the reference's three SP mechanisms:
  * DeepSpeed-Ulysses all-to-all (seq⇄heads) — reference
    fastvideo/utils/communications.py:20-140, wan23/distributed/ulysses.py:9-47
  * sequence-chunk context parallelism (shard L between embed and head) —
    reference wan23/distributed/sequence_parallel.py:64-176
  * ring attention (the xDiT "USP" ring component) — reference delegates to
    xfuser (wan/distributed/xdit_context_parallel.py:179); here a native
    `ppermute` ring with online-softmax merging.

All functions are written for use inside `shard_map` over a mesh axis; the
autograd through collectives is handled by JAX (lax collectives are
differentiable), replacing the reference's hand-written autograd.Functions
(`SeqAllToAll4D`, `_AllGather` with slice-backward).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.attention import attention


def ulysses_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    attn_fn: Optional[Callable] = None,
    impl: Optional[str] = None,
    kv_len: Optional[jax.Array] = None,
) -> jax.Array:
    """All-to-all attention: in = [B, L/sp, N, D] (sequence-sharded),
    swap to [B, L, N/sp, D] (head-sharded), full-sequence attention,
    swap back (reference ulysses.py:9-47 / communications.py:20-103).

    Must run inside shard_map with ``axis_name`` bound.

    kv_len: optional [B] global valid kv length — masks the zero-pad keys
    added when L was rounded up to a multiple of sp (sp_forward._pad_to);
    applies to the default dense fallback (a custom ``attn_fn`` must handle
    its own masking).
    """
    sp = jax.lax.psum(1, axis_name)
    if attn_fn is None:
        attn_fn = functools.partial(attention, impl=impl, kv_len=kv_len)

    def scatter_heads(x):
        # [B, Ls, N, D] -> [B, sp*Ls, N/sp, D]
        return jax.lax.all_to_all(
            x, axis_name, split_axis=2, concat_axis=1, tiled=True
        )

    def gather_heads(x):
        # [B, L, N/sp, D] -> [B, L/sp, N, D]
        return jax.lax.all_to_all(
            x, axis_name, split_axis=1, concat_axis=2, tiled=True
        )

    out = attn_fn(scatter_heads(q), scatter_heads(k), scatter_heads(v))
    return gather_heads(out)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    scale: Optional[float] = None,
    kv_len: Optional[jax.Array] = None,
    kv_pos: Optional[jax.Array] = None,
) -> jax.Array:
    """Ring attention over a sequence-sharded kv: each step attends the
    local q block against the current kv block, merging partial softmax
    statistics online, then rotates kv around the ring with `ppermute`
    (ICI neighbour exchange). Full (non-causal) attention.

    q, k, v: [B, L/sp, N, D] (same shard layout). Runs inside shard_map.
    kv_len: optional [B] global valid kv length — keys at global position
        ≥ kv_len are masked out (pad tokens from rounding L up to a
        multiple of sp, see sp_forward._pad_to).
    kv_pos: optional [Lk] global positions of the LOCAL kv block (for
        non-contiguous layouts, e.g. the USP hybrid where the Ulysses
        gather interleaves chunks); positions travel around the ring with
        their kv block. Defaults to the contiguous idx·Lk + arange(Lk).
    """
    sp = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    d = q.shape[-1]
    lk = k.shape[1]
    if scale is None:
        scale = d ** -0.5
    perm = [(i, (i + 1) % sp) for i in range(sp)]

    qf = q.astype(jnp.float32)
    if kv_pos is None:
        kv_pos = idx * lk + jnp.arange(lk)
    kv_pos = kv_pos.astype(jnp.int32)

    def partial_attn(kb, vb, pos):
        s = jnp.einsum("bqnd,bknd->bnqk", qf, kb.astype(jnp.float32)) * scale
        if kv_len is not None:
            pad = pos[None, :] >= kv_len[:, None]  # [B, Lk]
            s = jnp.where(pad[:, None, None, :], -1e30, s)
        m = jnp.max(s, axis=-1, keepdims=True)  # [B,N,Lq,1]
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.einsum("bnqk,bknd->bqnd", p, vb.astype(jnp.float32))
        return m, l, o

    def body(carry, _):
        kb, vb, pos, m, l, o = carry
        m_b, l_b, o_b = partial_attn(kb, vb, pos)
        m_new = jnp.maximum(m, m_b)
        a1 = jnp.exp(m - m_new)
        a2 = jnp.exp(m_b - m_new)
        l_new = l * a1 + l_b * a2
        # m/l are [B,N,Lq,1]; o is [B,Lq,N,D]
        tr = lambda x: jnp.moveaxis(x, 1, 2)  # [B,N,Lq,1] -> [B,Lq,N,1]
        o_new = o * tr(a1) + o_b * tr(a2)
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        pos = jax.lax.ppermute(pos, axis_name, perm)
        return (kb, vb, pos, m_new, l_new, o_new), None

    b, lq, n, _ = q.shape
    m0 = jnp.full((b, n, lq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, n, lq, 1), jnp.float32)
    o0 = jnp.zeros((b, lq, n, d), jnp.float32)
    (_, _, _, m, l, o), _ = jax.lax.scan(
        body, (k, v, kv_pos, m0, l0, o0), jnp.arange(sp)
    )
    out = o / jnp.moveaxis(l, 1, 2)
    return out.astype(q.dtype)


def usp_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    ulysses_axis: str,
    ring_axis: str,
    scale: Optional[float] = None,
    kv_len: Optional[jax.Array] = None,
) -> jax.Array:
    """USP hybrid attention = Ulysses(all-to-all) × Ring over a 2D sequence-
    parallel mesh (≙ the reference's xFuserLongContextAttention delegation,
    wan/distributed/xdit_context_parallel.py:179 — here both levels native).

    q, k, v: [B, L/(u·r), N, D], L sharded over ``(ulysses_axis, ring_axis)``
    (ulysses-major chunk order, i.e. shard_map spec
    ``P(None, (ulysses_axis, ring_axis))``). The Ulysses all-to-all trades
    heads for sequence within each ring group ([B, L/r, N/u, D], interleaved
    chunks); ring attention then covers the remaining sequence sharding,
    with chunk positions carried around the ring for kv_len masking.
    """
    u = jax.lax.psum(1, ulysses_axis)
    r = jax.lax.psum(1, ring_axis)
    i_r = jax.lax.axis_index(ring_axis)
    lc = q.shape[1]  # per-device chunk length

    def scatter_heads(x):
        return jax.lax.all_to_all(
            x, ulysses_axis, split_axis=2, concat_axis=1, tiled=True)

    def gather_heads(x):
        return jax.lax.all_to_all(
            x, ulysses_axis, split_axis=1, concat_axis=2, tiled=True)

    qs, ks, vs = scatter_heads(q), scatter_heads(k), scatter_heads(v)
    # global positions of the local (gathered) kv: chunk j_u·r + i_r for
    # each Ulysses rank j_u, concatenated in j_u order
    j_u = jnp.arange(u)[:, None]
    pos = ((j_u * r + i_r) * lc + jnp.arange(lc)[None, :]).reshape(-1)
    out = ring_attention(qs, ks, vs, axis_name=ring_axis, scale=scale,
                         kv_len=kv_len, kv_pos=pos)
    return gather_heads(out)


def sp_shard_map_attention(
    mesh: Mesh,
    kind: str = "ulysses",
    impl: Optional[str] = None,
    kv_len: Optional[jax.Array] = None,
) -> Callable:
    """Wrap an attention over [B, L, N, D] inputs sharded on mesh axis
    'sp' along L: the drop-in SP attention for the DiT
    (≙ monkey-patched sp_attn_forward, wan23/distributed/sequence_parallel.py:147-176)."""
    from jax.experimental.shard_map import shard_map

    fn = {
        "ulysses": functools.partial(ulysses_attention, axis_name="sp",
                                     impl=impl, kv_len=kv_len),
        "ring": functools.partial(ring_attention, axis_name="sp", kv_len=kv_len),
    }[kind]

    spec = P(None, "sp", None, None)
    return shard_map(
        lambda q, k, v: fn(q, k, v),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_rep=False,
    )


def usp_shard_map_attention(
    mesh: Mesh,
    kv_len: Optional[jax.Array] = None,
) -> Callable:
    """USP (ulysses×ring) attention over [B, L, N, D] sharded along L on the
    2D (sp_u, sp_r) mesh axes (see parallel.mesh.make_usp_mesh)."""
    from jax.experimental.shard_map import shard_map

    fn = functools.partial(usp_attention, ulysses_axis="sp_u",
                           ring_axis="sp_r", kv_len=kv_len)
    spec = P(None, ("sp_u", "sp_r"), None, None)
    return shard_map(
        lambda q, k, v: fn(q, k, v),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_rep=False,
    )
