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


def _merge_partials(o1, lse1, o2, lse2):
    """Merge two normalized partial-attention results via their logsumexps:
    o = (o1·e^lse1 + o2·e^lse2)/(e^lse1 + e^lse2), computed stably.
    o: [B, Lq, N, D] f32; lse: [B, N, Lq] f32."""
    m = jnp.maximum(lse1, lse2)
    w1 = jnp.exp(lse1 - m)
    w2 = jnp.exp(lse2 - m)
    den = w1 + w2
    lse = m + jnp.log(den)
    tr = lambda x: jnp.moveaxis(x, 1, 2)[..., None]  # [B,N,Lq] → [B,Lq,N,1]
    o = (o1 * tr(w1) + o2 * tr(w2)) / tr(den)
    return o, lse


def _partial_attn_xla(q, k, v, kv_len, kv_start, scale, block_kv=512):
    """Blocked dense partial attention: lax.scan over kv chunks carrying
    online-softmax (m, l, acc) — peak temp is [B, N, Lq, block_kv], never
    the full [Lq, Lk] score matrix. Differentiable (scan of einsums); the
    CPU / training-fallback twin of ``flash_attention_partial``.

    Returns (o [B, Lq, N, D] f32 normalized, lse [B, N, Lq] f32).
    kv_start: global position of k[:, 0] (an int or traced scalar) for
    kv_len masking; pad keys (from rounding Lk up to block_kv) mask via
    an effective kv_len."""
    b, lq, n, d = q.shape
    lk = k.shape[1]
    bkv = min(block_kv, lk)
    pad = (-lk) % bkv
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        if kv_len is None:
            kv_len = jnp.full((b,), lk, jnp.int32)
    nblk = k.shape[1] // bkv
    kb = jnp.moveaxis(k.reshape(b, nblk, bkv, n, d), 1, 0)
    vb = jnp.moveaxis(v.reshape(b, nblk, bkv, n, d), 1, 0)
    starts = jnp.arange(nblk) * bkv
    qf = q.astype(jnp.float32)

    def step(carry, blk):
        m, l, acc = carry
        kj, vj, st = blk
        s = jnp.einsum("bqnd,bknd->bnqk", qf, kj.astype(jnp.float32)) * scale
        if kv_len is not None:
            col = kv_start + st + jnp.arange(bkv)  # global positions
            bad = col[None, :] >= kv_len[:, None]  # [B, bkv]
            s = jnp.where(bad[:, None, None, :], -1e30, s)
        m_b = jnp.max(s, axis=-1)                  # [B, N, Lq]
        m_new = jnp.maximum(m, m_b)
        p = jnp.exp(s - m_new[..., None])
        a = jnp.exp(m - m_new)
        l_new = l * a + jnp.sum(p, axis=-1)
        tr = lambda x: jnp.moveaxis(x, 1, 2)[..., None]
        pv = jnp.einsum("bnqk,bknd->bqnd", p, vj.astype(jnp.float32))
        acc_new = acc * tr(a) + pv
        return (m_new, l_new, acc_new), None

    m0 = jnp.full((b, n, lq), -1e30, jnp.float32)
    l0 = jnp.zeros((b, n, lq), jnp.float32)
    acc0 = jnp.zeros((b, lq, n, d), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(step, (m0, l0, acc0), (kb, vb, starts))
    l_safe = jnp.maximum(l, 1e-37)
    o = acc / jnp.moveaxis(l_safe, 1, 2)[..., None]
    lse = m + jnp.log(l_safe)
    return o, lse


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    scale: Optional[float] = None,
    kv_len: Optional[jax.Array] = None,
    kv_starts: Optional[jax.Array] = None,
    impl: Optional[str] = None,
    block_q: int = 1024,
    block_kv: int = 1024,
) -> jax.Array:
    """Ring attention over a sequence-sharded kv: each hop runs *blocked*
    partial flash attention of the local q block against the current kv
    block (Pallas kernel on TPU, kv-chunked scan elsewhere — the full
    [Lq, Lk] score matrix is never materialized, so the ring runs at the
    production token counts SP exists for), merges the per-hop (o, lse)
    softmax statistics, then rotates kv around the ring with `ppermute`
    (ICI neighbour exchange). Full (non-causal) attention.
    ≙ the fused ring math the reference gets from xfuser
    (wan/distributed/xdit_context_parallel.py:179).

    q, k, v: [B, L/sp, N, D] (same shard layout). Runs inside shard_map.
    kv_len: optional [B] global valid kv length — keys at global position
        ≥ kv_len are masked out (pad tokens from rounding L up to a
        multiple of sp, see sp_forward._pad_to).
    kv_starts: optional [R] global start positions of the R equal-length
        contiguous runs composing the LOCAL kv block (for non-contiguous
        layouts, e.g. the USP hybrid where the Ulysses gather interleaves
        chunks); starts travel around the ring with their kv block.
        Defaults to one run at idx·Lk.
    impl: 'flash' (Pallas partial kernel) | 'xla' (kv-chunked scan);
        default by backend. Both are differentiable (the flash partial
        kernel has a custom VJP that folds the lse cotangent into delta).
    """
    sp = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    d = q.shape[-1]
    lk = k.shape[1]
    b, lq, n, _ = q.shape
    if scale is None:
        scale = d ** -0.5
    if impl is None:
        impl = "flash" if jax.default_backend() == "tpu" else "xla"
    perm = [(i, (i + 1) % sp) for i in range(sp)]

    if kv_starts is None:
        kv_starts = jnp.asarray(idx * lk, jnp.int32)[None]
    kv_starts = kv_starts.astype(jnp.int32)
    runs = kv_starts.shape[0]
    run_len = lk // runs
    assert runs * run_len == lk, (runs, lk)

    def partial_fn(kj, vj, klen):
        if impl == "flash":
            from ..ops.flash_attention import flash_attention_partial

            o_j, lse_j = flash_attention_partial(
                q, kj, vj, kv_len=klen, scale=scale,
                block_q=block_q, block_kv=block_kv)
            return o_j.astype(jnp.float32), lse_j
        return _partial_attn_xla(q, kj, vj, klen, 0, scale,
                                 block_kv=block_kv)

    def hop(kb, vb, starts):
        o_h = lse_h = None
        for j in range(runs):  # static unroll over contiguous runs
            kj = jax.lax.slice_in_dim(kb, j * run_len, (j + 1) * run_len, axis=1)
            vj = jax.lax.slice_in_dim(vb, j * run_len, (j + 1) * run_len, axis=1)
            klen = (None if kv_len is None else
                    jnp.clip(kv_len - starts[j], 0, run_len))
            o_j, lse_j = partial_fn(kj, vj, klen)
            if o_h is None:
                o_h, lse_h = o_j, lse_j
            else:
                o_h, lse_h = _merge_partials(o_h, lse_h, o_j, lse_j)
        return o_h, lse_h

    def body(carry, _):
        kb, vb, starts, o, lse = carry
        o_b, lse_b = hop(kb, vb, starts)
        o, lse = _merge_partials(o, lse, o_b, lse_b)
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        starts = jax.lax.ppermute(starts, axis_name, perm)
        return (kb, vb, starts, o, lse), None

    o0 = jnp.zeros((b, lq, n, d), jnp.float32)
    lse0 = jnp.full((b, n, lq), -1e30, jnp.float32)
    (_, _, _, o, _), _ = jax.lax.scan(
        body, (k, v, kv_starts, o0, lse0), jnp.arange(sp)
    )
    return o.astype(q.dtype)


def usp_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    ulysses_axis: str,
    ring_axis: str,
    scale: Optional[float] = None,
    kv_len: Optional[jax.Array] = None,
    impl: Optional[str] = None,
    block_q: int = 1024,
    block_kv: int = 1024,
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
    # the local (gathered) kv is u contiguous runs of length lc: chunk
    # j_u·r + i_r for each Ulysses rank j_u, concatenated in j_u order
    starts = (jnp.arange(u) * r + i_r) * lc
    out = ring_attention(qs, ks, vs, axis_name=ring_axis, scale=scale,
                         kv_len=kv_len, kv_starts=starts, impl=impl,
                         block_q=block_q, block_kv=block_kv)
    return gather_heads(out)


def sp_shard_map_attention(
    mesh: Mesh,
    kind: str = "ulysses",
    impl: Optional[str] = None,
    kv_len: Optional[jax.Array] = None,
    block_q: int = 1024,
    block_kv: int = 1024,
) -> Callable:
    """Wrap an attention over [B, L, N, D] inputs sharded on mesh axis
    'sp' along L: the drop-in SP attention for the DiT
    (≙ monkey-patched sp_attn_forward, wan23/distributed/sequence_parallel.py:147-176)."""
    from jax.experimental.shard_map import shard_map

    fn = {
        "ulysses": functools.partial(ulysses_attention, axis_name="sp",
                                     impl=impl, kv_len=kv_len),
        "ring": functools.partial(ring_attention, axis_name="sp",
                                  kv_len=kv_len, impl=impl,
                                  block_q=block_q, block_kv=block_kv),
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
    impl: Optional[str] = None,
    block_q: int = 1024,
    block_kv: int = 1024,
) -> Callable:
    """USP (ulysses×ring) attention over [B, L, N, D] sharded along L on the
    2D (sp_u, sp_r) mesh axes (see parallel.mesh.make_usp_mesh)."""
    from jax.experimental.shard_map import shard_map

    fn = functools.partial(usp_attention, ulysses_axis="sp_u",
                           ring_axis="sp_r", kv_len=kv_len, impl=impl,
                           block_q=block_q, block_kv=block_kv)
    spec = P(None, ("sp_u", "sp_r"), None, None)
    return shard_map(
        lambda q, k, v: fn(q, k, v),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_rep=False,
    )
