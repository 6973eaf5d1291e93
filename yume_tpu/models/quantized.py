"""Int8 weight-only quantization for the DiT trunk — 14B on one chip.

The reference runs Wan2.1-14B only under multi-GPU FSDP (SURVEY §2.8;
fastvideo/sample/sample.py:979-983); 28 GB of bf16 weights cannot fit a
single 16 GB TPU chip. Here the transformer blocks — >95% of the params —
are stored as int8 with one fp32 scale per output channel (~14 GB for 14B),
stacked across layers, and the trunk runs as a `lax.scan` whose body
dequantizes ONE block slice at a time: peak extra HBM is a single block's
bf16 kernels (~250 MB for 5B, ~700 MB for 14B) instead of the whole model.

Embedding convs, time/text embeds, and the head stay bf16 (tiny). The scan
also compiles the trunk once instead of once per layer — the same trick as
scan-over-layers param stacking.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.dit import DiTBlock, WanDiT
from ..ops.quant_matmul import Q4, Q8  # noqa: F401  (canonical home; re-exported)


def _quantize_leaf(w: jax.Array):
    """2D (or stacked 3D) kernel → Q8; small leaves pass through unchanged
    (cast params to bf16 BEFORE quantizing if serving memory matters)."""
    if w.ndim >= 2 and w.shape[-1] >= 128 and w.shape[-2] >= 128:
        a = jnp.abs(w).max(axis=-2, keepdims=True)
        scale = (a / 127.0).astype(jnp.float32)
        safe = jnp.where(scale > 0, scale, 1.0)
        q = jnp.clip(jnp.round(w / safe), -127, 127).astype(jnp.int8)
        return Q8(q=q, scale=scale)
    return w


def _quantize_leaf4(w: jax.Array, group: int = 128):
    """2D kernel → Q4 (nibble-packed, grouped scales); small leaves pass."""
    if not (w.ndim >= 2 and w.shape[-1] >= 128 and w.shape[-2] >= 128):
        return w
    *lead, din, dout = w.shape
    group = min(group, din)
    if din % group or group % 2:
        return _quantize_leaf(w)  # int8 fallback for odd shapes
    wg = w.reshape(*lead, din // group, group, dout)
    # scale is [..., G, out] with NO size-1 group axis: a trailing (1, out)
    # pair tiles to (8, out) on TPU (T(8,128) layout) — 8× padding that at
    # 14B scale (40 stacked layers) cost >1 GiB of pure pad plus 100 MB
    # remat-uncompressed HLO-temp copies per scale stack (round-5 OOM)
    a = jnp.abs(wg).max(axis=-2)
    scale = (a / 7.0).astype(jnp.float32)
    safe = jnp.where(scale > 0, scale, 1.0)[..., :, None, :]
    qi = (jnp.clip(jnp.round(wg / safe), -7, 7) + 8).astype(jnp.uint8)
    # halves packing: low nibble = group rows [0, g/2), high = [g/2, g) —
    # the W4A8 kernel (ops/quant_matmul.py::q4_dot) then unpacks with two
    # contiguous half-dots instead of a sublane interleave
    lo = qi[..., : group // 2, :]
    hi = qi[..., group // 2:, :]
    return Q4(q=lo | (hi << 4), scale=scale)


def _dequantize_leaf(leaf, dtype=jnp.bfloat16):
    if isinstance(leaf, Q8):
        return (leaf.q.astype(jnp.float32) * leaf.scale).astype(dtype)
    if isinstance(leaf, Q4):
        q, scale = leaf.q, leaf.scale
        lo = (q & 0xF).astype(jnp.int8) - 8
        hi = (q >> 4).astype(jnp.int8) - 8
        wg = jnp.concatenate([lo, hi], axis=-2)  # halves → [..., G, g, out]
        *lead, g_, grp, dout = wg.shape
        w = (wg.astype(jnp.float32)
             * scale[..., :, None, :]).reshape(*lead, g_ * grp, dout)
        return w.astype(dtype)
    return leaf


def quantize_dit_blocks(params: Any, num_layers: int, bits: int = 8):
    """Split WanDiT params into (other_bf16, stacked int8 blocks).

    ``bits``: 8 (per-channel int8), 4 (group-128 nibble-packed int4), or
    16 (no quantization — scan-over-layers param stacking only).

    ``other`` keeps the non-block params (embeddings, time/text, head) in
    their original dtype; the per-layer block subtrees are stacked on a new
    leading axis and kernel leaves are int8-quantized.
    """
    tree = params["params"] if "params" in params else params
    blocks = [tree[f"blocks_{i}"] for i in range(num_layers)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    # bits=16: stack-only (no quantization) — the scan-over-layers trunk
    # compiles once per block shape instead of once per layer
    qfn = {16: lambda w: w, 8: _quantize_leaf, 4: _quantize_leaf4}[bits]
    stacked_q = jax.tree_util.tree_map(qfn, stacked)
    other = {k: v for k, v in tree.items() if not k.startswith("blocks_")}
    return {"params": other}, stacked_q


def quantize_host_blocks(host_tree: Any, num_layers: int, bits: int = 8):
    """Host (numpy) WanDiT param tree → (other bf16 on device, stacked
    quantized blocks on device) WITHOUT ever materializing the full bf16
    trunk in HBM: one block visits the device at a time, is quantized, and
    its bf16 source is freed before the next (synced per block — async
    dispatch would otherwise queue all 40 bf16 blocks at once).

    The single-chip 14B path: a 28 GB bf16 trunk can never be resident on a
    16 GB chip, so the usual quantize_dit_blocks (full tree in, stacked out)
    cannot run; this streams host→int4 directly. Works for converted torch
    checkpoints and synthesized host trees alike.
    """
    tree = host_tree["params"] if "params" in host_tree else host_tree
    qfn = {16: lambda w: w, 8: _quantize_leaf, 4: _quantize_leaf4}[bits]

    qblocks = []
    for i in range(num_layers):
        blk = jax.tree_util.tree_map(
            lambda l: jnp.asarray(np.asarray(l), jnp.bfloat16),
            tree[f"blocks_{i}"])
        q = jax.tree_util.tree_map(qfn, blk)
        # force execution + free the bf16 sources before the next block
        # (fetch one element — on relayed PJRT block_until_ready does not
        # force execution)
        for leaf in jax.tree_util.tree_leaves(
                q, is_leaf=lambda l: isinstance(l, (Q8, Q4))):
            arrs = ([leaf.q, leaf.scale]
                    if isinstance(leaf, (Q8, Q4)) else [leaf])
            for a in arrs:
                _ = np.asarray(a.ravel()[:1])
        del blk
        qblocks.append(q)
    # stack leaf-wise, freeing each leaf's per-layer slices immediately —
    # a whole-tree jnp.stack would briefly need singles+stacked (2× the
    # quantized bytes) resident, which overflows at 14B/int4 on 16 GB
    flats = [jax.tree_util.tree_flatten(qb)[0] for qb in qblocks]
    treedef = jax.tree_util.tree_structure(qblocks[0])
    del qblocks
    stacked_leaves = []
    for li in range(len(flats[0])):
        st = jnp.stack([f[li] for f in flats])
        _ = np.asarray(st.ravel()[:1])  # force before freeing the slices
        for f in flats:
            f[li] = None
        stacked_leaves.append(st)
    stacked_q = jax.tree_util.tree_unflatten(treedef, stacked_leaves)
    other = {"params": jax.tree_util.tree_map(
        lambda l: jnp.asarray(np.asarray(l), jnp.bfloat16),
        {k: v for k, v in tree.items() if not k.startswith("blocks_")})}
    return other, stacked_q


def int8_dit_apply(
    dit: WanDiT,
    other: Any,
    stacked_q: Any,
    x: jax.Array,
    t_frame: jax.Array,
    context: jax.Array,
    *,
    latent_frame_zero: int = 8,
    clip_context: Optional[jax.Array] = None,
    attn_impl: Optional[str] = None,
    packed: bool = True,
    block_cache: Optional[jax.Array] = None,
    return_cache: bool = False,
    cache_frac: float = 0.25,
    cache_edge: Optional[int] = None,
    pipelined: bool = False,
):
    """DiT forward with the quantized trunk scanned over layers.

    Numerically ≈ the bf16 forward within weight-quantization error (int8
    per-channel keeps per-matmul relative error ≲1%).

    packed=False runs the unpacked (flag=False) path — t2v first segments
    on the quantized trunk.

    TeaCache composition (reference wan/modules/model.py:977-998 residual
    caching): because cached block residuals are only ever *added back*,
    caching the middle layers is equivalent to caching ONE tensor — the
    middle chunk's delta x_out − x_in. ``return_cache=True`` returns
    (out, delta) from a full pass; passing ``block_cache=delta`` skips the
    middle ``num_layers − 2·⌊cache_frac·n⌋`` layers entirely and adds the
    delta.

    pipelined=True software-pipelines the weight dequantization: block i's
    weights dequantize while block i−1 computes (one extra block of bf16
    weights resident; measure HBM headroom before enabling at 14B/int4).
    """
    emb = dit.apply(
        other, x, t_frame, context,
        *((latent_frame_zero, clip_context) if packed else (clip_context,)),
        method=dit.embed_packed if packed else dit.embed_unpacked)
    mod = dit.apply(other, emb["t_values"], emb["idx"],
                    method=WanDiT._time_mod)
    block = DiTBlock(dit.cfg)
    ctx, cos, sin = emb["ctx"], emb["cos"], emb["sin"]

    # W8A8/W4A8 direct path: when the block matmuls run int8 anyway, keep
    # the stored Q8/Q4 structs intact — QDense (models/dit.py) feeds them
    # to the MXU directly (q8_dot / q4_dot), skipping the per-layer
    # dequantize→requantize round-trip; weight HBM traffic drops to the
    # stored bytes (int4: ¼ of bf16).
    keep_q = bool(getattr(dit.cfg, "w8a8", False))

    def _dq(qslice):
        return jax.tree_util.tree_map(
            lambda l: l if (keep_q and isinstance(l, (Q8, Q4)))
            else _dequantize_leaf(l, dit.dtype), qslice,
            is_leaf=lambda l: isinstance(l, (Q8, Q4)))

    def gather(i):
        # per-layer dynamic gather from the FULL stack — slicing the stack
        # itself (tree_map(l[a:b])) makes XLA materialize copies of the
        # multi-GiB quantized weights (OOM observed at 14B/int4 on a 16 GB
        # chip); a dynamic index reads one layer's bytes per iteration
        return jax.tree_util.tree_map(
            lambda l: jax.lax.dynamic_index_in_dim(l, i, 0, keepdims=False),
            stacked_q)

    def apply_block(tok, w):
        return block.apply({"params": w}, tok, mod, ctx, cos, sin, attn_impl)

    # ONE lax.scan per forward, always. Multiple scans closing over the
    # same stacked weights make XLA copy the multi-GiB stacks once per
    # while-loop (observed: 8.8 G of HLO-temp `copy(...)` allocations →
    # compile-time OOM at 14B/int4); cache boundaries are instead handled
    # *inside* the single scan body with counter-gated selects.
    def run(tok, idx, capture=(), inject=None):
        """Apply blocks ``idx`` (static index vector) in one scan.

        capture: static positions j at which to snapshot the carry BEFORE
        applying block idx[j] (returned in order). inject: (j, delta) —
        add delta to the carry before applying block idx[j].
        """
        if idx.shape[0] == 0:
            return tok, []
        snaps0 = [jnp.zeros_like(tok) for _ in capture]

        if not pipelined:
            def body(carry, ji):
                tok, snaps = carry
                j, i = ji
                if inject is not None:
                    tok = tok + jnp.where(j == inject[0],
                                          inject[1].astype(tok.dtype), 0)
                snaps = [jnp.where(j == cj, tok, s)
                         for cj, s in zip(capture, snaps)]
                tok = apply_block(tok, _dq(gather(i)))
                return (tok, snaps), None

            (tok, snaps), _ = jax.lax.scan(
                body, (tok, snaps0), (jnp.arange(idx.shape[0]), idx))
            return tok, snaps

        # software pipeline: dequantize layer j+1 while computing layer j
        def body(carry, ji):
            tok, snaps, w = carry
            j, i = ji
            w_next = _dq(gather(i))
            if inject is not None:
                tok = tok + jnp.where(j == inject[0],
                                      inject[1].astype(tok.dtype), 0)
            snaps = [jnp.where(j == cj, tok, s)
                     for cj, s in zip(capture, snaps)]
            tok = apply_block(tok, w)
            return (tok, snaps, w_next), None

        k = idx.shape[0]
        (tok, snaps, w_last), _ = jax.lax.scan(
            body, (tok, snaps0, _dq(gather(idx[0]))),
            (jnp.arange(k - 1), idx[1:]))
        # the final block (j = k-1) runs after the loop with the last
        # prefetched weights; apply its inject/capture gates first
        if inject is not None:
            tok = tok + jnp.where(k - 1 == inject[0],
                                  inject[1].astype(tok.dtype), 0)
        snaps = [jnp.where(k - 1 == cj, tok, s)
                 for cj, s in zip(capture, snaps)]
        return apply_block(tok, w_last), snaps

    n = dit.cfg.num_layers
    # cache_edge (live blocks per side) overrides the fractional default —
    # exact integer edges keep the dense and quantized paths aligned
    edge = max(1, int(cache_edge) if cache_edge is not None
               else int(n * cache_frac))
    c0, c1 = edge, n - edge

    tok = emb["tokens"]
    new_cache = None
    if block_cache is None and not return_cache:
        tok, _ = run(tok, jnp.arange(n))
    elif block_cache is not None:
        # skip the middle chunk; add its cached delta just before block c1
        idx = jnp.concatenate([jnp.arange(c0), jnp.arange(c1, n)])
        tok, _ = run(tok, idx, inject=(c0, block_cache))
    else:
        # full pass, snapshotting the carry entering blocks c0 and c1
        tok, (t_in, t_out) = run(tok, jnp.arange(n), capture=(c0, c1))
        new_cache = (t_out - t_in).astype(jnp.bfloat16)

    out = dit.apply(other, tok, mod,
                    method=lambda m, tok, mo: m.head(tok, mo))
    out = dit._unpatchify(out[:, emb["l_hist"]:], emb["tail_grid"])
    return (out, new_cache) if return_cache else out


def quantized_bytes(stacked_q: Any) -> Tuple[int, int]:
    """(int8 bytes, equivalent bf16 bytes) for reporting."""
    q8 = bf16 = 0
    for leaf in jax.tree_util.tree_leaves(
            stacked_q, is_leaf=lambda l: isinstance(l, (Q8, Q4))):
        if isinstance(leaf, Q8):
            q8 += leaf.q.size + leaf.scale.size * 4
            bf16 += leaf.q.size * 2
        elif isinstance(leaf, Q4):
            q8 += leaf.q.size + leaf.scale.size * 4
            bf16 += leaf.q.size * 2 * 2
        else:
            q8 += leaf.size * 2
            bf16 += leaf.size * 2
    return q8, bf16
