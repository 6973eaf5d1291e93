"""Pallas TPU flash attention (forward + backward).

The hot kernel of the whole framework — TPU-native replacement for the
reference's external flash-attn 2/3 CUDA dependency
(reference wan/modules/attention.py:24-130). Instead of cu_seqlens varlen
semantics we support a per-(batch·head) ``kv_len`` mask, which covers every
use in the model family:

  * DiT self-attention: full dense attention (kv_len = L, i.e. no mask)
  * text / image cross-attention: kv padded to a fixed length with true
    length masking (reference pads text to 512 and masks via k_lens)

Standard flash-v2 online-softmax scheme: the kv grid axis is innermost and
iterates sequentially on-core, carrying running (m, l, acc) in VMEM scratch.
Backward is the two-kernel split (dQ; dK/dV) using the saved logsumexp.

All matmuls hit the MXU in fp32 accumulation; inputs can be bf16.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _maybe_mask(s, ki, block_kv, kv_len):
    # NOTE: measured on v5e — an unconditional masked-select is faster than
    # branching per block (lax.cond breaks the mosaic pipeline: +11ms at
    # L=12288); masking costs <1 ms total. The kernel runs at 127 TFLOP/s
    # (14.6 ms at L=12288/24h/d128, 75% of the chip's measured matmul
    # ceiling) — measured with a chained device loop; single-dispatch
    # timings on a relayed backend include ~28 ms of fetch latency.
    col = ki * block_kv + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    return jnp.where(col < kv_len, s, DEFAULT_MASK_VALUE)


def _fwd_kernel(kv_len_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, scale, block_kv, kv_blocks):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [block_q, d] — pre-scaled by the softmax scale (wrapper)
    k = k_ref[0]  # [block_kv, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [block_q, block_kv]

    kv_len = kv_len_ref[pl.program_id(0)]
    s = _maybe_mask(s, ki, block_kv, kv_len)

    m_prev = m_scr[...]           # [block_q, 1]
    l_prev = l_scr[...]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_scr[...] = m_new
    l_scr[...] = l_new
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(ki == kv_blocks - 1)
    def _finish():
        l = l_scr[...]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        lse_ref[0, 0] = (m_scr[...] + jnp.log(jnp.maximum(l, 1e-37)))[:, 0]


def _fwd(q, k, v, kv_len, scale, block_q, block_kv):
    """q: [BN, Lq, D]; k/v: [BN, Lk, D]; kv_len: [BN] int32.

    The softmax scale is folded into q once ([L, D] elements) instead of
    into every s tile ([L, L] elements) — attention here is VPU-bound.
    """
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    bn, lq, d = q.shape
    lk = k.shape[1]
    block_q = min(block_q, lq)
    block_kv = min(block_kv, lk)
    q_blocks, kv_blocks = _cdiv(lq, block_q), _cdiv(lk, block_kv)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bn, q_blocks, kv_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki, *_: (b, qi, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, qi, ki, *_: (b, ki, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, qi, ki, *_: (b, ki, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki, *_: (b, qi, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, qi, ki, *_: (b, 0, qi)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )
    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, block_kv=block_kv, kv_blocks=kv_blocks
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bn, lq, d), q.dtype),
            jax.ShapeDtypeStruct((bn, 1, lq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(kv_len, q, k, v)
    return out, lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(kv_len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, dq_scr, *, scale, block_kv, kv_blocks):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    kv_len = kv_len_ref[pl.program_id(0)]
    s = _maybe_mask(s, ki, block_kv, kv_len)
    p = jnp.exp(s - lse_ref[0, 0][:, None])

    dp = jax.lax.dot_general(
        do_ref[0].astype(jnp.float32), v_ref[0].astype(jnp.float32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0, 0][:, None]) * scale
    dq_scr[...] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == kv_blocks - 1)
    def _finish():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(kv_len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr, *, scale, block_kv, q_blocks):
    qi = pl.program_id(2)
    ki = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [block_q, block_kv]
    kv_len = kv_len_ref[pl.program_id(0)]
    s = _maybe_mask(s, ki, block_kv, kv_len)
    p = jnp.exp(s - lse_ref[0, 0][:, None])

    do = do_ref[0].astype(jnp.float32)
    dv_scr[...] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do, v_ref[0].astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0, 0][:, None]) * scale
    dk_scr[...] += jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qi == q_blocks - 1)
    def _finish():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd(scale, block_q, block_kv, res, g):
    q, k, v, o, lse, kv_len = res
    do = g
    delta = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32),
                    axis=-1)[:, None, :]  # [BN, 1, Lq]
    dq, dk, dv = _bwd_impl(scale, block_q, block_kv, q, k, v, do, lse,
                           delta, kv_len)
    return dq, dk, dv, None


def _bwd_impl(scale, block_q, block_kv, q, k, v, do, lse, delta, kv_len):
    """Shared flash backward given a precomputed ``delta`` [BN, 1, Lq].

    For the plain attention VJP delta = Σ_d o·do; for the partial-attention
    VJP (output includes lse) the lse cotangent folds in as
    delta − g_lse, since ∂lse_i/∂s_ij = p̂_ij gives
    ds = p̂ ∘ (dP − (delta − g_lse)·1ᵀ)."""
    bn, lq, d = q.shape
    lk = k.shape[1]
    bq = min(block_q, lq)
    bkv = min(block_kv, lk)
    q_blocks, kv_blocks = _cdiv(lq, bq), _cdiv(lk, bkv)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, block_kv=bkv, kv_blocks=kv_blocks),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bn, q_blocks, kv_blocks),
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda b, qi, ki, *_: (b, qi, 0)),
                pl.BlockSpec((1, bkv, d), lambda b, qi, ki, *_: (b, ki, 0)),
                pl.BlockSpec((1, bkv, d), lambda b, qi, ki, *_: (b, ki, 0)),
                pl.BlockSpec((1, bq, d), lambda b, qi, ki, *_: (b, qi, 0)),
                pl.BlockSpec((1, 1, bq), lambda b, qi, ki, *_: (b, 0, qi)),
                pl.BlockSpec((1, 1, bq), lambda b, qi, ki, *_: (b, 0, qi)),
            ],
            out_specs=pl.BlockSpec((1, bq, d), lambda b, qi, ki, *_: (b, qi, 0)),
            scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(kv_len, q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, block_kv=bkv, q_blocks=q_blocks),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bn, kv_blocks, q_blocks),
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda b, ki, qi, *_: (b, qi, 0)),
                pl.BlockSpec((1, bkv, d), lambda b, ki, qi, *_: (b, ki, 0)),
                pl.BlockSpec((1, bkv, d), lambda b, ki, qi, *_: (b, ki, 0)),
                pl.BlockSpec((1, bq, d), lambda b, ki, qi, *_: (b, qi, 0)),
                pl.BlockSpec((1, 1, bq), lambda b, ki, qi, *_: (b, 0, qi)),
                pl.BlockSpec((1, 1, bq), lambda b, ki, qi, *_: (b, 0, qi)),
            ],
            out_specs=[
                pl.BlockSpec((1, bkv, d), lambda b, ki, qi, *_: (b, ki, 0)),
                pl.BlockSpec((1, bkv, d), lambda b, ki, qi, *_: (b, ki, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((bkv, d), jnp.float32),
                pltpu.VMEM((bkv, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(kv_len, q, k, v, do, lse, delta)

    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(q, k, v, kv_len, scale, block_q, block_kv):
    out, _ = _fwd(q, k, v, kv_len, scale, block_q, block_kv)
    return out


def _flash_fwd(q, k, v, kv_len, scale, block_q, block_kv):
    out, lse = _fwd(q, k, v, kv_len, scale, block_q, block_kv)
    return out, (q, k, v, out, lse, kv_len)


_flash.defvjp(_flash_fwd, _bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    kv_len: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_q: int = 1024,
    block_kv: int = 1024,
) -> jax.Array:
    """Flash attention over [B, L, N, D] tensors (returns same layout).

    Args:
        q: [B, Lq, N, D]
        k, v: [B, Lk, N, D]
        kv_len: optional [B] int32 of true kv lengths (padding masked out).
        scale: softmax scale; defaults to D**-0.5.
    """
    b, lq, n, d = q.shape
    lk = k.shape[1]
    if scale is None:
        scale = d ** -0.5

    # [B, L, N, D] -> [B*N, L, D]
    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * x.shape[2], x.shape[1], d)

    qf, kf, vf = fold(q), fold(k), fold(v)

    # pad sequence lengths to block multiples; padded kv masked via kv_len
    bq = min(block_q, _round_up(lq, 128))
    bkv = min(block_kv, _round_up(lk, 128))
    lq_p, lk_p = _round_up(lq, bq), _round_up(lk, bkv)
    if lq_p != lq:
        qf = jnp.pad(qf, ((0, 0), (0, lq_p - lq), (0, 0)))
    if lk_p != lk:
        kf = jnp.pad(kf, ((0, 0), (0, lk_p - lk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, lk_p - lk), (0, 0)))

    if kv_len is None:
        kv_len = jnp.full((b,), lk, jnp.int32)
    kv_len_f = jnp.repeat(kv_len.astype(jnp.int32), n)

    out = _flash(qf, kf, vf, kv_len_f, float(scale), bq, bkv)
    out = out[:, :lq].reshape(b, n, lq, d).transpose(0, 2, 1, 3)
    return out


# ---------------------------------------------------------------------------
# partial attention: (output, logsumexp) for cross-device softmax merging
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_partial(q, k, v, kv_len, scale, block_q, block_kv):
    return _fwd(q, k, v, kv_len, scale, block_q, block_kv)


def _flash_partial_fwd(q, k, v, kv_len, scale, block_q, block_kv):
    out, lse = _fwd(q, k, v, kv_len, scale, block_q, block_kv)
    return (out, lse), (q, k, v, out, lse, kv_len)


def _flash_partial_bwd(scale, block_q, block_kv, res, g):
    q, k, v, o, lse, kv_len = res
    do, dlse = g
    # ds = p̂ ∘ (dP − (Σ_d o·do − g_lse)·1ᵀ): the lse cotangent folds into
    # delta, so the standard flash backward kernels apply unchanged
    delta = (jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
             [:, None, :] - dlse.astype(jnp.float32))
    dq, dk, dv = _bwd_impl(scale, block_q, block_kv, q, k, v, do, lse,
                           delta, kv_len)
    return dq, dk, dv, None


_flash_partial.defvjp(_flash_partial_fwd, _flash_partial_bwd)


def flash_attention_partial(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    kv_len: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_q: int = 1024,
    block_kv: int = 1024,
):
    """Partial flash attention over a kv *block*: returns the per-block
    normalized output [B, Lq, N, D] **and** its logsumexp [B, N, Lq] (f32),
    so callers can merge softmax statistics across kv blocks held on other
    devices (ring attention, `parallel/ulysses.py`) — the TPU-native
    equivalent of the blocked ring math the reference gets from xfuser
    (reference wan/distributed/xdit_context_parallel.py:179).

    A fully masked block (kv_len ≤ 0) yields a garbage normalized output
    with lse ≈ −2.4e38; any merge against a real block weighs it to zero.

    Differentiable: the VJP consumes cotangents for BOTH outputs (the lse
    gradient folds into the flash delta), so ring attention trains.
    """
    b, lq, n, d = q.shape
    lk = k.shape[1]
    if scale is None:
        scale = d ** -0.5

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * x.shape[2], x.shape[1], d)

    qf, kf, vf = fold(q), fold(k), fold(v)
    bq = min(block_q, _round_up(lq, 128))
    bkv = min(block_kv, _round_up(lk, 128))
    lq_p, lk_p = _round_up(lq, bq), _round_up(lk, bkv)
    if lq_p != lq:
        qf = jnp.pad(qf, ((0, 0), (0, lq_p - lq), (0, 0)))
    if lk_p != lk:
        kf = jnp.pad(kf, ((0, 0), (0, lk_p - lk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, lk_p - lk), (0, 0)))
        if kv_len is None:
            kv_len = jnp.full((b,), lk, jnp.int32)
    if kv_len is None:
        kv_len = jnp.full((b,), lk, jnp.int32)
    kv_len_f = jnp.repeat(kv_len.astype(jnp.int32), n)

    out, lse = _flash_partial(qf, kf, vf, kv_len_f, float(scale), bq, bkv)
    out = out[:, :lq].reshape(b, n, lq, d).transpose(0, 2, 1, 3)
    lse = lse[:, 0, :lq].reshape(b, n, lq)
    return out, lse
