"""Fused elementwise "glue" kernels for the DiT block (Pallas, TPU).

The 5B block spends ~10 ms/layer (≈22% of the 1.34 s headline step) in
elementwise passes XLA cannot fuse across: fp32 LayerNorm + AdaLN modulate
(with a [B,L,D] gather of per-frame modulation rows), fp32 residual adds,
qk RMSNorm, and RoPE's interleaved-pair rotation (whose stack/reshape
lowers to expensive minor-axis relayouts). The measured HBM bandwidth of
this chip is ~135 GB/s, so ONE pass over the [1,12095,3072] bf16 stream
floors at ~1.1 ms — measured chained: mod_norm 1.5 ms, residual 1.4 ms,
rms_norm 1.5 ms, rope 1.9 ms. The only lever is removing passes.

Each kernel here is one HBM pass, fp32 math in VMEM, bf16 in/out:

* :func:`adaln_norm`    — LN(x)·(gate+scale_row) + shift_row, with the
  per-token modulation row selected in-kernel via a one-hot [K,bm]×[K,D]
  matmul (K = #distinct timesteps ≤ ~40; exact select, MXU-trivial). The
  reference materialises e0 at [B,L,6,D] (wan23/modules/model.py:801-812);
  the compact-table + in-kernel-gather form never touches HBM with it.
* :func:`adaln_residual` — x + y·scale_row (same row select).
* :func:`qk_norm_rope`  — RMSNorm(q)·w_q, RMSNorm(k)·w_k and the RoPE
  rotation of both, in ONE pass over q and k (4 passes → 1,
  3.54 → 1.99 ms/layer). The adjacent-pair rotation (x[2i],x[2i+1]) runs
  relayout-free: out = x·c2 + swap(x)·s2 with lane-duplicated tables
  (c2[2i]=c2[2i+1]=cos[i], s2[2i]=−sin[i], s2[2i+1]=+sin[i]) and
  swap = select(lane parity, roll(x,∓1)) — pure lane ops.
* :func:`rms_norm`      — cross-attention q-side RMSNorm, one pass.

Every kernel has a jnp fallback with IDENTICAL fp32 math (same reduction
formulas, same rounding points) used on CPU and as the parity oracle in
tests_tpu/test_fused_adaln.py; the DiT golden tests therefore cover the
fallback path bit-for-bit and the TPU tests pin kernel≡fallback.

Autodiff: each Pallas forward carries a ``jax.custom_vjp`` whose backward
recomputes through the jnp fallback (rematerialisation — no residual
tensors besides the primal inputs), so `jax.grad` through the DiT
(training, LoRA, distillation, ADD) works on TPU with exactly the
pre-fusion backward math. Forward-only serving never pays for this.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_BM = 256


def _pick_bm(d_: int, base: int, quantum: int = 8) -> int:
    """Token-block rows for a given feature width: ``base`` is validated at
    D=3072 (5B); wider models (14B dim 5120) scale rows down so the
    fp32 temporaries stay inside the 16 MB scoped VMEM. ``quantum`` is 128
    for kernels that also block a [B, L] int32 idx input (Mosaic requires
    the lane dim of every block to be a multiple of 128)."""
    bm = int(base * 3072 / d_) // quantum * quantum
    return max(quantum, min(base, bm))


def _use_pallas(x, idx) -> bool:
    from .partitioning import auto_spmd

    if jax.default_backend() != "tpu" or auto_spmd():
        return False
    if x.ndim != 3 or x.shape[-1] % 128 != 0:
        return False
    if idx is not None and idx.ndim != 2:
        return False
    return True


def _int_zero(idx):
    return np.zeros(idx.shape, jax.dtypes.float0)


def _rows(idx2, tab):
    """[1, bm] int32 row ids + [K, D] table → [bm, D] rows via an exact
    one-hot dot (all intermediates 2-D — Mosaic has no 1-D vector layout)."""
    k = tab.shape[0]
    bm = idx2.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (k, bm), 0)
    onehot_t = (iota == idx2).astype(jnp.float32)           # [K, bm]
    return jax.lax.dot_general(onehot_t, tab, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# adaln_norm: LN(x) * (gate + scale_row) + shift_row
# ---------------------------------------------------------------------------


def _adaln_norm_kernel(x_ref, idx_ref, s_ref, b_ref, o_ref, *, eps, gate):
    xf = x_ref[0].astype(jnp.float32)                      # [bm, D]
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    n = (xf - mu) * jax.lax.rsqrt(var + eps)
    s = _rows(idx_ref[0], s_ref[0])
    b = _rows(idx_ref[0], b_ref[0])
    o_ref[0] = (n * (gate + s) + b).astype(o_ref.dtype)


def _adaln_norm_ref(x, scale_tab, shift_tab, idx, eps, gate, out_dtype):
    """jnp fallback == numerical oracle == backward recompute path."""
    if idx is None:
        s = scale_tab[:, :1]
        t = shift_tab[:, :1]
    else:
        s = jnp.take_along_axis(scale_tab, idx[:, :, None], axis=1)
        t = jnp.take_along_axis(shift_tab, idx[:, :, None], axis=1)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    n = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (n * (gate + s) + t).astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _adaln_norm_p(static, x, scale_tab, shift_tab, idx):
    eps, gate, out_dtype = static
    b, l, d_ = x.shape
    k = scale_tab.shape[1]
    bm = _pick_bm(d_, _BM, quantum=128)
    grid = (b, pl.cdiv(l, bm))
    # idx rides as [B, 1, L] so the block's trailing dims are (1, bm) against
    # array dims (1, L) — a [B, L] (1, bm) block violates Mosaic's
    # divisible-by-8-or-equal rule on the sublane dim whenever B > 1
    return pl.pallas_call(
        functools.partial(_adaln_norm_kernel, eps=eps, gate=gate),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, d_), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, 1, bm), lambda bi, i: (bi, 0, i)),
            pl.BlockSpec((1, k, d_), lambda bi, i: (bi, 0, 0)),
            pl.BlockSpec((1, k, d_), lambda bi, i: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bm, d_), lambda bi, i: (bi, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, l, d_), out_dtype),
    )(x, idx[:, None, :], scale_tab, shift_tab)


def _adaln_norm_p_fwd(static, x, scale_tab, shift_tab, idx):
    return _adaln_norm_p(static, x, scale_tab, shift_tab, idx), (
        x, scale_tab, shift_tab, idx)


def _adaln_norm_p_bwd(static, res, g):
    eps, gate, out_dtype = static
    x, scale_tab, shift_tab, idx = res
    _, vjp = jax.vjp(
        lambda xx, ss, tt: _adaln_norm_ref(xx, ss, tt, idx, eps, gate,
                                           out_dtype),
        x, scale_tab, shift_tab)
    dx, ds, dt = vjp(g)
    return dx, ds, dt, _int_zero(idx)


_adaln_norm_p.defvjp(_adaln_norm_p_fwd, _adaln_norm_p_bwd)


def adaln_norm(x, scale_tab, shift_tab, idx, *, eps=1e-6, gate=1.0,
               out_dtype=None):
    """``LayerNorm(x) * (gate + scale_tab[idx]) + shift_tab[idx]``.

    x: [B, L, D] (any float dtype); scale_tab/shift_tab: [B, K, D] fp32;
    idx: [B, L] int32 or None (None ⇒ row 0 everywhere, K may be 1).
    gate=1.0 is the AdaLN "(1 + scale)" form; gate=0.0 with a plain weight
    table gives an affine LayerNorm (LN·w + b) with exact w. ``out_dtype``
    overrides the output dtype (the Head keeps fp32 into its projection).
    """
    b, l, d_ = x.shape
    out_dtype = jnp.dtype(x.dtype if out_dtype is None else out_dtype)
    scale_tab = scale_tab.astype(jnp.float32)
    shift_tab = shift_tab.astype(jnp.float32)
    if not _use_pallas(x, idx):
        return _adaln_norm_ref(x, scale_tab, shift_tab, idx, eps, gate,
                               out_dtype)
    if idx is None:
        idx = jnp.zeros((b, l), jnp.int32)
    k = scale_tab.shape[1]
    scale_tab = jnp.broadcast_to(scale_tab, (b, k, d_))
    shift_tab = jnp.broadcast_to(shift_tab, (b, k, d_))
    return _adaln_norm_p((eps, gate, out_dtype), x, scale_tab, shift_tab,
                         idx.astype(jnp.int32))


# ---------------------------------------------------------------------------
# rms_norm: RMSNorm(x) · w over the last axis (cross-attention norm_q)
# ---------------------------------------------------------------------------


def _rms_kernel(x_ref, w_ref, o_ref, *, eps):
    xf = x_ref[0].astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    o_ref[0] = (xf * jax.lax.rsqrt(ms + eps) * w_ref[...]).astype(o_ref.dtype)


def _rms_ref(x, w, eps):
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (n * w.astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _rms_p(eps, x, w):
    b, l, d_ = x.shape
    bm = _pick_bm(d_, _BM)
    grid = (b, pl.cdiv(l, bm))
    return pl.pallas_call(
        functools.partial(_rms_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, d_), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, d_), lambda bi, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bm, d_), lambda bi, i: (bi, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, l, d_), x.dtype),
    )(x, w.astype(jnp.float32).reshape(1, d_))


def _rms_p_fwd(eps, x, w):
    return _rms_p(eps, x, w), (x, w)


def _rms_p_bwd(eps, res, g):
    x, w = res
    _, vjp = jax.vjp(lambda xx, ww: _rms_ref(xx, ww, eps), x, w)
    return vjp(g)


_rms_p.defvjp(_rms_p_fwd, _rms_p_bwd)


def rms_norm(x, w, *, eps=1e-5):
    """fp32 RMSNorm with learned scale, one HBM pass (reference WanRMSNorm,
    models/dit.py::RMSNorm math, identical formulation)."""
    from .partitioning import auto_spmd

    if (jax.default_backend() != "tpu" or auto_spmd() or x.ndim != 3
            or x.shape[-1] % 128):
        return _rms_ref(x, w, eps)
    return _rms_p(eps, x, w)


# ---------------------------------------------------------------------------
# adaln_residual: x + y * scale_row
# ---------------------------------------------------------------------------


def _adaln_residual_kernel(x_ref, y_ref, idx_ref, s_ref, o_ref):
    xf = x_ref[0].astype(jnp.float32)
    yf = y_ref[0].astype(jnp.float32)
    s = _rows(idx_ref[0], s_ref[0])
    o_ref[0] = (xf + yf * s).astype(o_ref.dtype)


def _adaln_residual_ref(x, y, scale_tab, idx):
    if idx is None:
        s = scale_tab[:, :1]
    else:
        s = jnp.take_along_axis(scale_tab, idx[:, :, None], axis=1)
    return (x.astype(jnp.float32) + y.astype(jnp.float32) * s).astype(x.dtype)


@jax.custom_vjp
def _adaln_residual_p(x, y, scale_tab, idx):
    b, l, d_ = x.shape
    k = scale_tab.shape[1]
    bm = _pick_bm(d_, 256, quantum=128)
    grid = (b, pl.cdiv(l, bm))
    # idx as [B, 1, L] — see _adaln_norm_p (sublane-dim rule at B > 1)
    return pl.pallas_call(
        _adaln_residual_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, d_), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, bm, d_), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, 1, bm), lambda bi, i: (bi, 0, i)),
            pl.BlockSpec((1, k, d_), lambda bi, i: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bm, d_), lambda bi, i: (bi, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, l, d_), x.dtype),
    )(x, y, idx[:, None, :], scale_tab)


def _adaln_residual_p_fwd(x, y, scale_tab, idx):
    return _adaln_residual_p(x, y, scale_tab, idx), (x, y, scale_tab, idx)


def _adaln_residual_p_bwd(res, g):
    x, y, scale_tab, idx = res
    _, vjp = jax.vjp(
        lambda xx, yy, ss: _adaln_residual_ref(xx, yy, ss, idx),
        x, y, scale_tab)
    dx, dy, ds = vjp(g)
    return dx, dy, ds, _int_zero(idx)


_adaln_residual_p.defvjp(_adaln_residual_p_fwd, _adaln_residual_p_bwd)


def adaln_residual(x, y, scale_tab, idx):
    """``x + y * scale_tab[idx]`` in fp32 → x.dtype (the AdaLN gated
    residual). Shapes as in :func:`adaln_norm`."""
    b, l, d_ = x.shape
    scale_tab = scale_tab.astype(jnp.float32)
    if not _use_pallas(x, idx):
        return _adaln_residual_ref(x, y, scale_tab, idx)
    if idx is None:
        idx = jnp.zeros((b, l), jnp.int32)
    k = scale_tab.shape[1]
    scale_tab = jnp.broadcast_to(scale_tab, (b, k, d_))
    return _adaln_residual_p(x, y, scale_tab, idx.astype(jnp.int32))


# ---------------------------------------------------------------------------
# qk_norm_rope: RMSNorm(q)·w_q, RMSNorm(k)·w_k + RoPE, one pass over both
# ---------------------------------------------------------------------------


def _expand_tables(cos, sin):
    """[L, d/2] cos/sin → lane-duplicated [L, d] c2/s2 with the rotation
    sign folded into s2 (even lanes −sin, odd lanes +sin)."""
    c2 = jnp.repeat(cos, 2, axis=-1)
    s = jnp.repeat(sin, 2, axis=-1)
    lane = jax.lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 1)
    s2 = jnp.where(lane % 2 == 0, -s, s)
    return c2.astype(jnp.float32), s2.astype(jnp.float32)


def _pair_swap(x):
    """swap(x)[..., 2i] = x[..., 2i+1]; swap(x)[..., 2i+1] = x[..., 2i]."""
    left = jnp.roll(x, -1, axis=-1)
    right = jnp.roll(x, 1, axis=-1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(lane % 2 == 0, left, right)


def _qk_norm_rope_kernel(q_ref, k_ref, wq_ref, wk_ref, c2_ref, s2_ref,
                         oq_ref, ok_ref, *, eps, heads):
    # tile the per-head [bm, d] tables across heads on the lane axis
    # (pairs are 128-aligned inside each head, so flat-lane rolls in
    # _pair_swap never mix heads; the wrapped lane is never selected)
    c2 = jnp.concatenate([c2_ref[...]] * heads, axis=-1)    # [bm, D]
    s2 = jnp.concatenate([s2_ref[...]] * heads, axis=-1)

    def one(x_ref, w_ref, o_ref):
        xf = x_ref[0].astype(jnp.float32)                   # [bm, D]
        ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
        n = xf * jax.lax.rsqrt(ms + eps) * w_ref[...]
        # the unfused path casts to x.dtype between RMSNorm and RoPE
        # (RMSNorm module returns x.dtype); round-trip here so the fused
        # kernel matches the fallback/golden composition
        n = n.astype(o_ref.dtype).astype(jnp.float32)
        o_ref[0] = (n * c2 + _pair_swap(n) * s2).astype(o_ref.dtype)

    one(q_ref, wq_ref, oq_ref)
    one(k_ref, wk_ref, ok_ref)


def _qk_norm_rope_ref(q, k, w_q, w_k, cos, sin, num_heads, eps):
    from . import rope as rope_lib

    b, l, dim = q.shape
    d_ = dim // num_heads

    def norm(x, w):
        xf = x.astype(jnp.float32)
        ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(ms + eps)
                * w.astype(jnp.float32)).astype(x.dtype)

    q4 = norm(q, w_q).reshape(b, l, num_heads, d_)
    k4 = norm(k, w_k).reshape(b, l, num_heads, d_)
    return (rope_lib.apply_rope(q4, cos, sin).reshape(b, l, dim),
            rope_lib.apply_rope(k4, cos, sin).reshape(b, l, dim))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _qk_norm_rope_p(static, q, k, w_q, w_k, cos, sin):
    num_heads, eps = static
    b, l, dim = q.shape
    d_ = dim // num_heads
    c2, s2 = _expand_tables(cos, sin)                       # [L, d]
    bm = _pick_bm(dim, 128)  # 2 in + 2 out + fp32 temps: half the norm rows
    grid = (b, pl.cdiv(l, bm))
    return pl.pallas_call(
        functools.partial(_qk_norm_rope_kernel, eps=eps, heads=num_heads),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, dim), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, bm, dim), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, dim), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, dim), lambda bi, i: (0, 0)),
            pl.BlockSpec((bm, d_), lambda bi, i: (i, 0)),
            pl.BlockSpec((bm, d_), lambda bi, i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bm, dim), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, bm, dim), lambda bi, i: (bi, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, l, dim), q.dtype),
            jax.ShapeDtypeStruct((b, l, dim), k.dtype),
        ],
    )(q, k, w_q.astype(jnp.float32).reshape(1, dim),
      w_k.astype(jnp.float32).reshape(1, dim), c2, s2)


def _qk_norm_rope_p_fwd(static, q, k, w_q, w_k, cos, sin):
    return (_qk_norm_rope_p(static, q, k, w_q, w_k, cos, sin),
            (q, k, w_q, w_k, cos, sin))


def _qk_norm_rope_p_bwd(static, res, g):
    num_heads, eps = static
    q, k, w_q, w_k, cos, sin = res
    _, vjp = jax.vjp(
        lambda *a: _qk_norm_rope_ref(*a, num_heads, eps),
        q, k, w_q, w_k, cos, sin)
    return vjp(g)


_qk_norm_rope_p.defvjp(_qk_norm_rope_p_fwd, _qk_norm_rope_p_bwd)


def qk_norm_rope(q, k, w_q, w_k, cos, sin, num_heads, *, eps=1e-5):
    """Fused qk RMSNorm (over the FULL model dim, reference WanRMSNorm
    semantics) + RoPE rotation for q and k — one HBM pass over both
    (replaces 2×RMSNorm + 2×apply_rope = 4 passes).

    q/k: [B, L, D] flat (projection outputs, heads packed); w_q/w_k: [D]
    fp32 learned scales; cos/sin: [L, d_head//2] fp32. Returns rotated
    flat (q, k) in the input dtype; the caller reshapes to heads. Math is
    identical to RMSNorm → apply_rope (ops/rope.py): fp32 throughout, one
    x.dtype round-trip between norm and rotation (as the module path has).
    """
    from .partitioning import auto_spmd

    b, l, dim = q.shape
    d_ = dim // num_heads
    if (jax.default_backend() != "tpu" or auto_spmd() or cos.ndim != 2
            or d_ % 128 != 0 or b != 1):
        return _qk_norm_rope_ref(q, k, w_q, w_k, cos, sin, num_heads, eps)
    return _qk_norm_rope_p((num_heads, eps), q, k, w_q, w_k, cos, sin)
