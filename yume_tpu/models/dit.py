"""Wan DiT backbone (5B ti2v / 14B i2v variants) in flax.linen.

TPU-native re-design of the reference WanModel
(wan23/modules/model.py:369-916 for 5B, wan/modules/model.py:554-1038 for
14B). Key departures from the CUDA/torch reference, chosen for XLA:

* **Compact per-frame timestep modulation.** The reference materialises the
  AdaLN modulation tensor e0 at [B, L, 6, dim] for per-token timesteps
  (wan23/modules/model.py:801-812) — ~3 GB fp32 at 720p. Timesteps are
  constant within a latent frame, so we compute e0 only for the K distinct
  values ([B, K, 6, dim], K ≤ #frames+1) and carry a per-token index map
  [B, L]; blocks gather transient [B, L, dim] slices that XLA fuses into the
  surrounding elementwise ops. Exactly equal math, O(L·dim) live memory.

* **Static FramePack plans.** The reference's 6 history-bucket regimes with
  data-dependent shapes (wan23/modules/model.py:588-741) become a host-side
  :func:`framepack_plan` producing a static chunk schedule per history
  length; one jit specialisation per bucket (the bucket is known on the host
  before each segment).

* **Channels-last [B, F, H, W, C] video layout** (TPU conv + reshape
  friendly), tokens [B, L, D].

* **fp32 islands**: normalisation, modulation and time/text embeddings run
  in fp32 regardless of the compute dtype, mirroring the reference's
  autocast(float32) blocks (wan23/modules/model.py:294-312, 784-812); the
  matmul-heavy paths run in bf16 on the MXU.

MVDT masked training (random_masking + mid-network side interpolater,
reference wan23/modules/model.py:500-545, 839-853) is supported with a
*static* keep length (host picks the ratio per step from a small discrete
set, avoiding dynamic shapes under jit).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from flax.linen import dtypes

from ..configs import DiTConfig
from ..ops import fused_adaln, quant_matmul, rope as rope_lib
from ..ops.attention import attention


# ---------------------------------------------------------------------------
# small layers
# ---------------------------------------------------------------------------


class RMSNorm(nn.Module):
    """fp32 RMS norm with learned scale (reference WanRMSNorm,
    wan23/modules/model.py:121-137)."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return (n * w).astype(x.dtype)


def _layer_norm(x, eps=1e-6):
    """Non-affine fp32 LayerNorm returning fp32 (reference WanLayerNorm,
    wan23/modules/model.py:140-150)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps)


class AffineLayerNorm(nn.Module):
    """fp32 LayerNorm with affine params (norm3 when cross_attn_norm).
    Runs as one fused HBM pass on TPU (ops/fused_adaln.py::adaln_norm with
    gate=0, K=1: LN(x)·w + b exactly)."""

    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        if x.ndim == 3:
            return fused_adaln.adaln_norm(
                x, w[None, None, :], b[None, None, :], None,
                eps=self.eps, gate=0.0)
        return (_layer_norm(x, self.eps) * w + b).astype(x.dtype)


def sinusoidal_embedding_1d(dim: int, position: jax.Array) -> jax.Array:
    """[cos | sin] sinusoidal embedding (reference
    wan23/modules/model.py:14-24; fp32 instead of fp64)."""
    half = dim // 2
    pos = position.astype(jnp.float32)
    inv = 10000.0 ** (-jnp.arange(half, dtype=jnp.float32) / half)
    ang = pos[..., None] * inv
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


# ---------------------------------------------------------------------------
# timestep modulation (compact form)
# ---------------------------------------------------------------------------


@flax.struct.dataclass
class Modulation:
    """Compact AdaLN modulation: distinct-value tables + per-token index.
    (a pytree, so it can cross remat/scan/shard_map boundaries)

    e:   [B, K, dim]      (time embedding, fp32)
    e0:  [B, K, 6, dim]   (projected 6-way modulation, fp32)
    idx: [B, L] int32 or None (None ⇒ K == 1, broadcast scalar timestep)
    """

    e: jax.Array
    e0: jax.Array
    idx: Optional[jax.Array]

    def gather6(self, j: int, L: int) -> jax.Array:
        """Per-token modulation row j as [B, L, dim] (or [B, 1, dim])."""
        tab = self.e0[:, :, j, :]
        if self.idx is None:
            return tab  # [B, 1, dim]
        return jnp.take_along_axis(tab, self.idx[:, :, None], axis=1)

    def gather_e(self) -> jax.Array:
        if self.idx is None:
            return self.e
        return jnp.take_along_axis(self.e, self.idx[:, :, None], axis=1)

    def gathered(self, keep_idx: jax.Array) -> "Modulation":
        """Restrict to kept tokens (MVDT masked branch)."""
        if self.idx is None:
            return self
        return Modulation(self.e, self.e0, jnp.take_along_axis(self.idx, keep_idx, axis=1))


# ---------------------------------------------------------------------------
# attention blocks
# ---------------------------------------------------------------------------


class QDense(nn.Module):
    """``nn.Dense`` drop-in for the block matmuls (param-compatible: same
    kernel/bias names, shapes, and inits) whose kernel may arrive as a
    :class:`~yume_tpu.ops.quant_matmul.Q8` struct from the int8-storage
    trunk (models/quantized.py) instead of a plain array.

    ========  =======  =================================================
    kernel    w8a8     path
    ========  =======  =================================================
    array     False    exact nn.Dense semantics
    array     True     dynamic W8A8 (int8_dot_general: requantize weights)
    Q8        True     stored int8 weights straight to the MXU — no
                       per-step dequantize→requantize round-trip
    Q8        False    dequantize, exact bf16 matmul (context-side k/v)
    Q4        True     W4A8 direct: nibbles unpacked in-kernel, s8×s8 MXU
                       with per-group rescale (quant_matmul.q4_dot)
    Q4        False    dequantize, exact bf16 matmul
    ========  =======  =================================================
    """

    features: int
    dtype: Optional[jnp.dtype] = None
    w8a8: bool = False

    @nn.compact
    def __call__(self, x):
        # Q4 kernels can't pass flax's param-shape check (their packed
        # first leaf is not kernel-shaped, unlike Q8's) — read the raw
        # variable directly when one is bound
        raw = (self.scope.get_variable("params", "kernel")
               if self.scope.has_variable("params", "kernel") else None)
        if isinstance(raw, quant_matmul.Q4):
            kernel = raw
        else:
            kernel = self.param(
                "kernel", nn.initializers.lecun_normal(),
                (jnp.shape(x)[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        if isinstance(kernel, quant_matmul.Q8):
            if self.w8a8:
                y = quant_matmul.q8_dot(x, kernel, self.dtype or x.dtype)
                return y + bias.astype(y.dtype)
            kernel = quant_matmul.q8_dequant(kernel, self.dtype or x.dtype)
        if isinstance(kernel, quant_matmul.Q4):
            if self.w8a8:
                y = quant_matmul.q4_dot(x, kernel, self.dtype or x.dtype)
                return y + bias.astype(y.dtype)
            kernel = quant_matmul.q4_dequant(kernel, self.dtype or x.dtype)
        x, kernel, bias = dtypes.promote_dtype(x, kernel, bias,
                                               dtype=self.dtype)
        dn = (((x.ndim - 1,), (0,)), ((), ()))
        if self.w8a8:
            return quant_matmul.int8_dot_general(x, kernel, dn) + bias
        return jax.lax.dot_general(x, kernel, dn) + bias


class ProjParams(nn.Module):
    """Parameter shell for a QDense-compatible projection: same param
    names, shapes, and inits at the same module path, but the matmul is
    executed fused with sibling projections — see :func:`fused_sibling_dense`.
    Checkpoint/converter/TP/LoRA treatments of ``{name}/kernel`` apply
    unchanged."""

    features: int

    @nn.compact
    def __call__(self, in_features):
        raw = (self.scope.get_variable("params", "kernel")
               if self.scope.has_variable("params", "kernel") else None)
        if isinstance(raw, quant_matmul.Q4):  # see QDense
            kernel = raw
        else:
            kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                (in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


def fused_sibling_dense(x, projs, w8a8=False, dtype=None):
    """One wide ``[K, ΣN_i]`` matmul for sibling projections of one input.

    Per output column the math is identical to separate QDense calls — the
    contraction never mixes columns, and the per-output-channel w8a8 scales
    concatenate — but a single wide dot keeps the MXU at its wide-N
    efficiency: at the 5B headline geometry the three separate q/k/v
    [12095,3072]×[3072,3072] dots run at 86–108 TFLOP/s while the fused
    [3072,9216] dot runs at 138–216 TFLOP/s (scripts/bench_quant_matmul.py
    --fused; ≈3 ms/layer bf16, ≈2.6 ms/layer W8A8). TP-safe: concat and
    split are along the tp-sharded output axis at shard boundaries, so both
    stay shard-local under GSPMD.

    Returns the per-projection outputs (bias added), in ``projs`` order.
    """
    kernels = [k for k, _ in projs]
    biases = [b for _, b in projs]
    splits, acc = [], 0
    for b_ in biases[:-1]:
        acc += b_.shape[-1]
        splits.append(acc)
    if w8a8 and all(isinstance(k, quant_matmul.Q8) for k in kernels):
        wq = jnp.concatenate([k.q for k in kernels], axis=-1)
        ws = jnp.concatenate([k.scale for k in kernels], axis=-1)
        y = quant_matmul.q8_dot(x, quant_matmul.Q8(q=wq, scale=ws),
                                dtype or x.dtype)
        y = y + jnp.concatenate(biases).astype(y.dtype)
        return jnp.split(y, splits, axis=-1)
    if w8a8 and all(isinstance(k, quant_matmul.Q4) for k in kernels):
        # per output column the concat is exact: group scales concatenate
        # along the output-channel axis like the Q8 case
        wq = jnp.concatenate([k.q for k in kernels], axis=-1)
        ws = jnp.concatenate([k.scale for k in kernels], axis=-1)
        y = quant_matmul.q4_dot(x, quant_matmul.Q4(q=wq, scale=ws),
                                dtype or x.dtype)
        y = y + jnp.concatenate(biases).astype(y.dtype)
        return jnp.split(y, splits, axis=-1)
    dense = [quant_matmul.q8_dequant(k, dtype or x.dtype)
             if isinstance(k, quant_matmul.Q8)
             else quant_matmul.q4_dequant(k, dtype or x.dtype)
             if isinstance(k, quant_matmul.Q4) else k for k in kernels]
    kcat = jnp.concatenate(dense, axis=-1)
    bcat = jnp.concatenate(biases)
    x, kcat, bcat = dtypes.promote_dtype(x, kcat, bcat, dtype=dtype)
    dn = (((x.ndim - 1,), (0,)), ((), ()))
    if w8a8:
        y = quant_matmul.int8_dot_general(x, kcat, dn) + bcat
    else:
        y = jax.lax.dot_general(x, kcat, dn) + bcat
    return jnp.split(y, splits, axis=-1)


class NormWeight(nn.Module):
    """Parameter shell for an RMSNorm whose math runs inside a fused kernel
    (ops/fused_adaln.py::qk_norm_rope): same ``weight`` param name/shape/init
    at the same module path as :class:`RMSNorm`."""

    dim: int

    @nn.compact
    def __call__(self):
        return self.param("weight", nn.initializers.ones, (self.dim,),
                          jnp.float32)


class SelfAttention(nn.Module):
    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, rope_cos, rope_sin, attn_impl=None):
        c = self.cfg
        b, l, _ = x.shape
        n, d = c.num_heads, c.head_dim
        projs = [ProjParams(c.dim, name=nm)(x.shape[-1])
                 for nm in ("q", "k", "v")]
        q, k, v = fused_sibling_dense(x, projs, w8a8=c.w8a8, dtype=x.dtype)
        if c.qk_norm:
            # RMSNorm(q)·w, RMSNorm(k)·w + RoPE of both in one fused HBM
            # pass (ops/fused_adaln.py; jnp fallback = the exact module
            # composition RMSNorm → apply_rope)
            w_q = NormWeight(c.dim, name="norm_q")()
            w_k = NormWeight(c.dim, name="norm_k")()
            q, k = fused_adaln.qk_norm_rope(q, k, w_q, w_k,
                                            rope_cos, rope_sin, n, eps=c.eps)
            q = q.reshape(b, l, n, d)
            k = k.reshape(b, l, n, d)
        else:
            q = rope_lib.apply_rope(q.reshape(b, l, n, d), rope_cos, rope_sin)
            k = rope_lib.apply_rope(k.reshape(b, l, n, d), rope_cos, rope_sin)
        v = v.reshape(b, l, n, d)
        o = attention(q, k, v, impl=attn_impl)
        return QDense(c.dim, name="o", dtype=x.dtype,
                      w8a8=c.w8a8)(o.reshape(b, l, c.dim))


class CrossAttention(nn.Module):
    """Text cross-attention (reference WanCrossAttention,
    wan23/modules/model.py:210-232)."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, context, attn_impl=None):
        c = self.cfg
        b, l, _ = x.shape
        n, d = c.num_heads, c.head_dim
        # context-side k/v stay exact (negligible FLOPs at 512 tokens)
        q = QDense(c.dim, name="q", dtype=x.dtype, w8a8=c.w8a8)(x)
        k = QDense(c.dim, name="k", dtype=x.dtype)(context)
        v = QDense(c.dim, name="v", dtype=x.dtype)(context)
        if c.qk_norm:
            # q is token-length-sized: one fused HBM pass (same math as the
            # RMSNorm module); k is 512 context rows — module path is fine
            q = fused_adaln.rms_norm(q, NormWeight(c.dim, name="norm_q")(),
                                     eps=c.eps)
            k = RMSNorm(c.dim, c.eps, name="norm_k")(k)
        q = q.reshape(b, l, n, d)
        k = k.reshape(b, -1, n, d)
        v = v.reshape(b, -1, n, d)
        o = attention(q, k, v, impl=attn_impl)
        return QDense(c.dim, name="o", dtype=x.dtype,
                      w8a8=c.w8a8)(o.reshape(b, l, c.dim))


class I2VCrossAttention(nn.Module):
    """14B image+text cross-attention: separate K/V projections for the 257
    CLIP tokens, results summed (reference wan/modules/model.py:336-400)."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, context, attn_impl=None):
        c = self.cfg
        b, l, _ = x.shape
        n, d = c.num_heads, c.head_dim
        ctx_img = context[:, : c.image_context_len]
        ctx_txt = context[:, c.image_context_len:]
        q = QDense(c.dim, name="q", dtype=x.dtype, w8a8=c.w8a8)(x)
        if c.qk_norm:
            q = fused_adaln.rms_norm(q, NormWeight(c.dim, name="norm_q")(),
                                     eps=c.eps)
        q = q.reshape(b, l, n, d)

        k = QDense(c.dim, name="k", dtype=x.dtype)(ctx_txt)
        v = QDense(c.dim, name="v", dtype=x.dtype)(ctx_txt)
        if c.qk_norm:
            k = RMSNorm(c.dim, c.eps, name="norm_k")(k)
        k_img = QDense(c.dim, name="k_img", dtype=x.dtype)(ctx_img)
        v_img = QDense(c.dim, name="v_img", dtype=x.dtype)(ctx_img)
        if c.qk_norm:
            k_img = RMSNorm(c.dim, c.eps, name="norm_k_img")(k_img)

        o_txt = attention(q, k.reshape(b, -1, n, d), v.reshape(b, -1, n, d), impl=attn_impl)
        o_img = attention(q, k_img.reshape(b, -1, n, d), v_img.reshape(b, -1, n, d), impl=attn_impl)
        o = (o_txt + o_img).reshape(b, l, c.dim)
        return QDense(c.dim, name="o", dtype=x.dtype, w8a8=c.w8a8)(o)


class DiTBlock(nn.Module):
    """AdaLN-modulated self-attn + cross-attn + FFN block (reference
    WanAttentionBlock, wan23/modules/model.py:235-316)."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, mod: Modulation, context, rope_cos, rope_sin,
                 attn_impl=None):
        c = self.cfg
        b, l, _ = x.shape
        m = self.param(
            "modulation",
            lambda k, s: jax.random.normal(k, s, jnp.float32) / c.dim**0.5,
            (1, 6, c.dim),
        )

        def etab(j):
            # fp32 (modulation_j + e0_j) as a compact [B, K, dim] table; the
            # per-token row select happens INSIDE the fused kernels
            # (ops/fused_adaln.py) — the [B, L, dim] gather never hits HBM
            return m[:, j][:, None, :] + mod.e0[:, :, j, :]

        # self-attention: LN + AdaLN modulate fused to one HBM pass
        h = fused_adaln.adaln_norm(x, etab(1), etab(0), mod.idx, eps=c.eps)
        y = SelfAttention(c, name="self_attn")(h, rope_cos, rope_sin, attn_impl)
        x = fused_adaln.adaln_residual(x, y, etab(2), mod.idx)

        # cross-attention (norm3 affine iff cross_attn_norm). A callable
        # attn_impl is a sequence-parallel self-attention (Ulysses/ring);
        # cross-attention runs per-shard against the replicated text kv.
        if c.cross_attn_norm:
            h = AffineLayerNorm(c.dim, c.eps, name="norm3")(x)
        else:
            h = x
        cross_impl = None if callable(attn_impl) else attn_impl
        cross_cls = I2VCrossAttention if c.image_context_len else CrossAttention
        x = x + cross_cls(c, name="cross_attn")(h, context, cross_impl)

        # FFN
        h = fused_adaln.adaln_norm(x, etab(4), etab(3), mod.idx, eps=c.eps)
        h = QDense(c.ffn_dim, name="ffn_0", dtype=x.dtype, w8a8=c.w8a8)(h)
        h = nn.gelu(h, approximate=True)
        y = QDense(c.dim, name="ffn_2", dtype=x.dtype, w8a8=c.w8a8)(h)
        x = fused_adaln.adaln_residual(x, y, etab(5), mod.idx)
        return x


class Head(nn.Module):
    """Final modulated projection to patch outputs (reference
    wan23/modules/model.py:319-348)."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, mod: Modulation):
        c = self.cfg
        out = math.prod(c.patch_size) * c.out_dim
        m = self.param(
            "modulation",
            lambda k, s: jax.random.normal(k, s, jnp.float32) / c.dim**0.5,
            (1, 2, c.dim),
        )
        e0_tab = m[:, 0][:, None, :] + mod.e   # [B, K, dim]
        e1_tab = m[:, 1][:, None, :] + mod.e
        h = fused_adaln.adaln_norm(x, e1_tab, e0_tab, mod.idx, eps=c.eps,
                                   out_dtype=jnp.float32)
        return nn.Dense(out, name="head", dtype=jnp.float32,
                        kernel_init=nn.initializers.zeros)(h)


# ---------------------------------------------------------------------------
# FramePack planning (host-side, static per history length)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PackChunk:
    start: int       # history frame range [start, stop)
    stop: int
    scale: int       # spatial compression (1,2,4,8,16 → conv stride 2s)
    double_f: bool = False  # bucket-6 extra 2x_f pre-conv (reference model.py:696-698)


def framepack_plan(f_hist: int) -> List[PackChunk]:
    """Static chunk schedule for a history of ``f_hist`` latent frames.

    Reproduces the 6 bucket regimes of reference
    wan23/modules/model.py:599-718 / wan/modules/model.py:779-898:
    progressively coarser spatial patching (1x, 2x, 4x, 8x, 16x, 16x+2x_f)
    for progressively older frames, bounding total tokens.
    """
    assert f_hist >= 1
    if f_hist <= 2 + 4:
        if f_hist <= 2:
            mid = [PackChunk(f_hist - 1, f_hist, 2)]
        else:
            mid = [PackChunk(1, f_hist - 1, 2)]
        return [PackChunk(0, 1, 1), *mid, PackChunk(f_hist - 1, f_hist, 1)]
    if f_hist <= 2 + 4 + 16:
        if f_hist <= 6:
            far = [PackChunk(f_hist - 5, f_hist - 4, 4)]
        else:
            far = [PackChunk(1, f_hist - 5, 4)]
        return [
            PackChunk(0, 1, 1), *far,
            PackChunk(f_hist - 5, f_hist - 3, 2),
            PackChunk(f_hist - 3, f_hist, 1),
        ]
    if f_hist <= 2 + 4 + 16 + 64:
        if f_hist <= 22:
            far = [PackChunk(f_hist - 21, f_hist - 20, 8)]
        else:
            far = [PackChunk(1, f_hist - 21, 8)]
        return [
            PackChunk(0, 1, 1), *far,
            PackChunk(f_hist - 21, f_hist - 5, 4),
            PackChunk(f_hist - 5, f_hist - 3, 2),
            PackChunk(f_hist - 3, f_hist, 1),
        ]
    if f_hist <= 2 + 4 + 16 + 64 + 256:
        if f_hist <= 86:
            far = [PackChunk(f_hist - 85, f_hist - 84, 16)]
        else:
            far = [PackChunk(1, f_hist - 85, 16)]
        return [
            PackChunk(0, 1, 2), *far,
            PackChunk(f_hist - 85, f_hist - 21, 8),
            PackChunk(f_hist - 21, f_hist - 5, 4),
            PackChunk(f_hist - 5, f_hist - 3, 2),
            PackChunk(f_hist - 3, f_hist, 1),
        ]
    assert f_hist <= 2 + 4 + 16 + 64 + 256 + 1024, "history exceeds FramePack budget"
    if f_hist <= 342:
        far = [PackChunk(f_hist - 341, f_hist - 340, 16, double_f=True)]
    else:
        far = [PackChunk(1, f_hist - 341, 16, double_f=True)]
    return [
        PackChunk(0, 1, 2), *far,
        PackChunk(f_hist - 341, f_hist - 85, 16),
        PackChunk(f_hist - 85, f_hist - 21, 8),
        PackChunk(f_hist - 21, f_hist - 5, 4),
        PackChunk(f_hist - 5, f_hist - 3, 2),
        PackChunk(f_hist - 3, f_hist, 1),
    ]


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def packed_grids(
    plan: Sequence[PackChunk], h_lat: int, w_lat: int, patch: Tuple[int, int, int]
) -> List[Tuple[int, int, int]]:
    """Per-chunk (F, H, W) token grids (post conv) for a FramePack plan."""
    grids = []
    for ch in plan:
        stride = patch[1] * ch.scale * (4 if ch.double_f else 1)
        grids.append((ch.stop - ch.start, _ceil_div(h_lat, stride), _ceil_div(w_lat, stride)))
    return grids


# ---------------------------------------------------------------------------
# the model
# ---------------------------------------------------------------------------


class WanDiT(nn.Module):
    """Wan diffusion transformer (both generations).

    Call modes (mirroring reference wan23/modules/model.py:547-865):
      * ``forward_unpacked`` — full-resolution tokens (flag=False path)
      * ``forward_packed``   — FramePack history compression (flag=True path)
    Both share ``_trunk``.
    """

    cfg: DiTConfig
    dtype: jnp.dtype = jnp.bfloat16
    # rematerialise each block's activations in the backward pass
    # (≙ the reference's selective FSDP activation checkpointing,
    # fastvideo/utils/fsdp_util.py:23-50)
    remat: bool = False

    def setup(self):
        c = self.cfg

        def conv(features, spatial):
            return nn.Conv(
                features,
                kernel_size=(c.patch_size[0], spatial, spatial),
                strides=(c.patch_size[0], spatial, spatial),
                padding="VALID",
                dtype=self.dtype,
            )

        p = c.patch_size[1]
        self.patch_embedding = conv(c.dim, p)
        if c.framepack:
            self.patch_embedding_2x = conv(c.dim, 2 * p)
            self.patch_embedding_4x = conv(c.dim, 4 * p)
            self.patch_embedding_8x = conv(c.dim, 8 * p)
            self.patch_embedding_16x = conv(c.dim, 16 * p)
            self.patch_embedding_2x_f = conv(c.in_dim, 2 * p)

        self.time_embedding_0 = nn.Dense(c.dim, dtype=jnp.float32)
        self.time_embedding_2 = nn.Dense(c.dim, dtype=jnp.float32)
        self.time_projection_1 = nn.Dense(6 * c.dim, dtype=jnp.float32)
        self.text_embedding_0 = nn.Dense(c.dim, dtype=self.dtype)
        self.text_embedding_2 = nn.Dense(c.dim, dtype=self.dtype)
        if c.image_context_len:
            # MLPProj (reference wan/modules/model.py:530-541):
            # LN(1280) → Linear(1280→1280) → GELU(exact) → Linear(1280→dim) → LN(dim)
            self.img_emb_norm1 = nn.LayerNorm(dtype=jnp.float32)
            self.img_emb_1 = nn.Dense(c.image_dim, dtype=self.dtype)
            self.img_emb_3 = nn.Dense(c.dim, dtype=self.dtype)
            self.img_emb_norm4 = nn.LayerNorm(dtype=jnp.float32)
        block_cls = nn.remat(DiTBlock, static_argnums=(5,)) if self.remat else DiTBlock
        self.blocks = [block_cls(c) for _ in range(c.num_layers)]
        self.head = Head(c)
        if c.mvdt:
            self.sideblock = DiTBlock(c)
            self.mask_token = self.param(
                "mask_token", nn.initializers.zeros, (1, 1, c.dim), jnp.float32
            )

    def _embed_chunk(self, x, scale: int, double_f: bool):
        """Patch-embed a chunk at a spatial compression scale.

        scale 1 → base patch conv (stride p); scale s → conv ``patch_embedding_{s}x``
        with stride p·s; double_f prepends the channel-preserving 2x_f conv
        (reference wan23/modules/model.py:486-494, 602-718). Spatial dims are
        zero-padded to stride multiples (reference `convpadd`, :918-931).
        Returns tokens [B, F·H'·W', dim] and the token grid.
        """
        c = self.cfg
        p = c.patch_size[1]
        if double_f:
            s = 4
            pad_h = (-x.shape[2]) % s
            pad_w = (-x.shape[3]) % s
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            x = self.patch_embedding_2x_f(x)
        stride = p * scale
        pad_h = (-x.shape[2]) % stride
        pad_w = (-x.shape[3]) % stride
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        convs = {1: self.patch_embedding}
        if c.framepack:
            convs.update({2: self.patch_embedding_2x, 4: self.patch_embedding_4x,
                          8: self.patch_embedding_8x, 16: self.patch_embedding_16x})
        x = convs[scale](x)
        b, f, h, w, d = x.shape
        return x.reshape(b, f * h * w, d), (f, h, w)

    def _time_mod(self, t_values: jax.Array, idx: Optional[jax.Array]) -> Modulation:
        """Compact modulation tables from distinct timestep values [B, K]."""
        c = self.cfg
        emb = sinusoidal_embedding_1d(c.freq_dim, t_values)  # fp32 [B,K,freq]
        e = self.time_embedding_0(emb)
        e = nn.silu(e)
        e = self.time_embedding_2(e)
        e0 = self.time_projection_1(nn.silu(e))
        b, k = t_values.shape
        return Modulation(e=e, e0=e0.reshape(b, k, 6, c.dim), idx=idx)

    def _text_embed(self, context: jax.Array) -> jax.Array:
        c = self.cfg
        h = self.text_embedding_0(context.astype(self.dtype))
        h = nn.gelu(h, approximate=True)
        return self.text_embedding_2(h)

    def _img_embed(self, clip_ctx: jax.Array) -> jax.Array:
        """14B MLPProj for 257 CLIP tokens (reference
        wan/modules/model.py:530-541): LN → Linear(clip_dim→clip_dim) →
        exact GELU → Linear(→dim) → LN."""
        h = self.img_emb_norm1(clip_ctx.astype(jnp.float32))
        h = self.img_emb_1(h.astype(self.dtype))
        h = nn.gelu(h, approximate=False)
        h = self.img_emb_3(h)
        return self.img_emb_norm4(h.astype(jnp.float32)).astype(self.dtype)

    def _context(self, context: jax.Array, clip_ctx: Optional[jax.Array]) -> jax.Array:
        ctx = self._text_embed(context)
        if self.cfg.image_context_len:
            assert clip_ctx is not None, "i2v model needs CLIP context"
            ctx = jnp.concatenate([self._img_embed(clip_ctx), ctx], axis=1)
        return ctx

    def _trunk(self, x, mod: Modulation, context, rope_cos, rope_sin, attn_impl,
               mvdt: Optional[dict] = None, block_cache=None,
               cache_list: Tuple[int, ...] = (), return_cache: bool = False):
        """Run all blocks (+ optional MVDT side interpolation at midpoint).

        TeaCache-style residual caching (reference wan/modules/model.py:
        977-998): blocks listed in ``cache_list`` either store their residual
        (x_out − x_in) when ``return_cache`` or are skipped entirely with the
        cached residual added back (``block_cache`` given).
        """
        c = self.cfg
        mid = (c.num_layers + 1) // 2
        new_cache = []
        for i in range(c.num_layers):
            if mvdt is not None and i == mid - 1:
                x = self._side_interpolate(x, mvdt, context, rope_cos, rope_sin, attn_impl)
                mod = mvdt["mod_full"]
                rope_cos, rope_sin = mvdt["rope_full"]
            if block_cache is not None and not return_cache and i in cache_list:
                x = x + block_cache[cache_list.index(i)].astype(x.dtype)
                continue
            x_in = x
            x = self.blocks[i](x, mod, context, rope_cos, rope_sin, attn_impl)
            if return_cache and i in cache_list:
                new_cache.append((x - x_in).astype(jnp.bfloat16))
        return x, mod, new_cache

    def _side_interpolate(self, x, mvdt, context, rope_cos, rope_sin, attn_impl):
        """MVDT mid-network side interpolater (reference
        wan23/modules/model.py:531-545): unshuffle kept tokens + mask tokens
        to full length, run the side block, masked shortcut."""
        c = self.cfg
        mask_token = self.mask_token
        ids_restore = mvdt["ids_restore"]  # [B, L_full]
        mask = mvdt["mask"]  # [B, L_full] 1=removed
        b, lk, d = x.shape
        l_full = ids_restore.shape[1]
        pad = jnp.broadcast_to(mask_token.astype(x.dtype), (b, l_full - lk, d))
        x_ = jnp.concatenate([x, pad], axis=1)
        x_full = jnp.take_along_axis(x_, ids_restore[:, :, None], axis=1)
        x_before = x_full
        y = self.sideblock(
            x_full, mvdt["mod_full"], context, *mvdt["rope_full"], attn_impl
        )
        m = mask[:, :, None].astype(y.dtype)
        return y * m + x_before * (1.0 - m)

    # -- public call modes ---------------------------------------------------

    def __call__(
        self,
        x: jax.Array,
        t_frame: jax.Array,
        context: jax.Array,
        *,
        packed: bool = False,
        latent_frame_zero: int = 8,
        clip_context: Optional[jax.Array] = None,
        attn_impl: Optional[str] = None,
        mvdt_rng: Optional[jax.Array] = None,
        mvdt_keep: Optional[int] = None,
        block_cache=None,
        cache_list: Tuple[int, ...] = (),
        return_cache: bool = False,
    ) -> jax.Array:
        """Denoise one batch of latent videos.

        Args:
            x: [B, F, H, W, C_in] latent video (channels-last).
            t_frame: [B, F] per-latent-frame timesteps in model units
                (0..1000); a scalar timestep is ``jnp.full((B, F), t)``.
            context: [B, text_len, text_dim] T5 features.
            packed: FramePack the history (all but the trailing
                ``latent_frame_zero`` frames). flag=True path of the
                reference; False = unpacked full-res tokens.
            clip_context: [B, 257, 1280] CLIP features (i2v-14B only).
            mvdt_rng/mvdt_keep: enable MVDT masked training with a static
                number of kept tokens.

        Returns:
            [B, F_out, H, W, C_out] velocity prediction — only the trailing
            ``latent_frame_zero`` frames when packed (the reference likewise
            unpatchifies only tail tokens, wan23/modules/model.py:858-863).
        """
        if self.is_initializing():
            self._touch_unused_params(x, context)
        if packed:
            return self._forward_packed(
                x, t_frame, context, latent_frame_zero, clip_context, attn_impl,
                mvdt_rng, mvdt_keep, block_cache, cache_list, return_cache,
            )
        return self._forward_unpacked(
            x, t_frame, context, clip_context, attn_impl, mvdt_rng, mvdt_keep,
            block_cache, cache_list, return_cache,
        )

    def _touch_unused_params(self, x, context):
        """Materialise params of conditionally-used submodules at init time
        (flax only creates params for modules actually called): the FramePack
        conv set varies per history bucket, and the MVDT sideblock only runs
        under masking."""
        c = self.cfg
        if c.framepack:
            p = c.patch_size[1]
            dummy = jnp.zeros((1, c.patch_size[0], 16 * p, 16 * p, c.in_dim),
                              self.dtype)
            for conv in (self.patch_embedding_2x, self.patch_embedding_4x,
                         self.patch_embedding_8x, self.patch_embedding_16x,
                         self.patch_embedding_2x_f):
                conv(dummy)
        if c.mvdt:
            l = 4
            h = jnp.zeros((1, l, c.dim), self.dtype)
            mod = self._time_mod(jnp.zeros((1, 1)), None)
            cos = jnp.ones((l, c.head_dim // 2), jnp.float32)
            ctx = self._context(context, None) if not c.image_context_len else None
            if ctx is None:
                ctx = jnp.zeros((1, 4, c.dim), self.dtype)
            self.sideblock(h, mod, ctx, cos, jnp.zeros_like(cos), "xla")

    def _forward_unpacked(self, x, t_frame, context, clip_context, attn_impl,
                          mvdt_rng=None, mvdt_keep=None, block_cache=None,
                          cache_list=(), return_cache=False):
        c = self.cfg
        b, f, h, w, _ = x.shape
        tokens, (gf, gh, gw) = self._embed_chunk(x.astype(self.dtype), 1, False)
        l = tokens.shape[1]
        tokens_per_frame = gh * gw
        idx = jnp.reshape(jnp.tile(jnp.arange(f)[:, None], (1, tokens_per_frame)), (1, l))
        idx = jnp.broadcast_to(idx, (b, l)).astype(jnp.int32)
        mod = self._time_mod(t_frame, idx)

        cos, sin = rope_lib.grid_rope(gf, gh, gw, c.head_dim, max_len=c.rope_max_len,
                                      theta=c.rope_theta)
        cos, sin = jnp.asarray(cos), jnp.asarray(sin)
        ctx = self._context(context, clip_context)

        tokens, mod, mvdt, cos_k, sin_k = self._maybe_mask(
            tokens, mod, cos, sin, mvdt_rng, mvdt_keep
        )
        out, mod_out, new_cache = self._trunk(
            tokens, mod, ctx, cos_k, sin_k, attn_impl, mvdt,
            block_cache, cache_list, return_cache)
        out = self.head(out, mod_out)
        out = self._unpatchify(out, (gf, gh, gw))
        return (out, new_cache) if return_cache else out

    def _forward_packed(self, x, t_frame, context, latent_frame_zero,
                        clip_context, attn_impl, mvdt_rng=None, mvdt_keep=None,
                        block_cache=None, cache_list=(), return_cache=False):
        c = self.cfg
        b, f, h_lat, w_lat, _ = x.shape
        f_hist = f - latent_frame_zero
        assert f_hist >= 1, "packed mode requires at least one history frame"
        plan = framepack_plan(f_hist)
        xc = x.astype(self.dtype)

        tok_parts, grids = [], []
        for ch in plan:
            toks, grid = self._embed_chunk(xc[:, ch.start:ch.stop], ch.scale, ch.double_f)
            tok_parts.append(toks)
            grids.append(grid)
        # tail at full resolution
        tail_toks, tail_grid = self._embed_chunk(xc[:, f_hist:], 1, False)
        tok_parts.append(tail_toks)
        grids.append(tail_grid)
        tokens = jnp.concatenate(tok_parts, axis=1)
        l_hist = tokens.shape[1] - tail_toks.shape[1]
        l = tokens.shape[1]

        # multi-resolution RoPE with cumulative compressed-frame offsets
        cos, sin = rope_lib.framepack_rope(grids, c.head_dim, max_len=c.rope_max_len,
                                           theta=c.rope_theta)
        cos, sin = jnp.asarray(cos), jnp.asarray(sin)

        # two distinct timesteps: history (t of frame 0) and tail (t of last
        # frame) — reference wan23/modules/model.py:730-737
        t_vals = jnp.stack([t_frame[:, 0], t_frame[:, -1]], axis=1)  # [B, 2]
        idx = (jnp.arange(l) >= l_hist).astype(jnp.int32)[None, :]
        idx = jnp.broadcast_to(idx, (b, l))
        mod = self._time_mod(t_vals, idx)

        ctx = self._context(context, clip_context)
        tokens, mod, mvdt, cos_k, sin_k = self._maybe_mask(
            tokens, mod, cos, sin, mvdt_rng, mvdt_keep
        )
        out, mod_out, new_cache = self._trunk(
            tokens, mod, ctx, cos_k, sin_k, attn_impl, mvdt,
            block_cache, cache_list, return_cache)
        out = self.head(out, mod_out)
        out = self._unpatchify(out[:, l_hist:], tail_grid)
        return (out, new_cache) if return_cache else out

    def _maybe_mask(self, tokens, mod, cos, sin, mvdt_rng, mvdt_keep):
        """MVDT random masking with static keep count (reference
        random_masking, wan23/modules/model.py:500-528)."""
        if mvdt_rng is None:
            return tokens, mod, None, cos, sin
        assert self.cfg.mvdt and mvdt_keep is not None
        b, l, d = tokens.shape
        # mvdt_rng: PRNGKey, or a precomputed [B, L] noise array (tests use
        # this to pin per-sample shuffles across batch compositions)
        if getattr(mvdt_rng, "ndim", 0) == 2:
            noise = mvdt_rng
        else:
            noise = jax.random.uniform(mvdt_rng, (b, l))
        ids_shuffle = jnp.argsort(noise, axis=1)
        ids_restore = jnp.argsort(ids_shuffle, axis=1).astype(jnp.int32)
        ids_keep = ids_shuffle[:, :mvdt_keep].astype(jnp.int32)
        x_masked = jnp.take_along_axis(tokens, ids_keep[:, :, None], axis=1)
        mask = jnp.ones((b, l), jnp.float32)
        mask = mask.at[:, :mvdt_keep].set(0.0)
        mask = jnp.take_along_axis(mask, ids_restore, axis=1)
        # rope tables gathered at each sample's kept positions — [B, keep,
        # D/2], consumed batched by apply_rope (equivalent to the reference's
        # unshuffle→rope→regather dance; the keep-shuffle is drawn per sample
        # so the tables must be too)
        if cos.ndim == 2:
            cos_k = jnp.take(cos, ids_keep, axis=0)
            sin_k = jnp.take(sin, ids_keep, axis=0)
        else:
            cos_k = jnp.take_along_axis(cos, ids_keep[:, :, None], axis=1)
            sin_k = jnp.take_along_axis(sin, ids_keep[:, :, None], axis=1)
        mvdt = dict(
            ids_restore=ids_restore,
            ids_keep=ids_keep,
            mask=mask,
            mod_full=mod,
            rope_full=(cos, sin),
        )
        return x_masked, mod.gathered(ids_keep), mvdt, cos_k, sin_k

    def _unpatchify(self, x, grid):
        """Tokens → video (reference wan23/modules/model.py:867-890)."""
        c = self.cfg
        f, h, w = grid
        pt, ph, pw = c.patch_size
        b = x.shape[0]
        x = x.reshape(b, f, h, w, pt, ph, pw, c.out_dim)
        x = jnp.einsum("bfhwpqrc->bfphqwrc", x)
        return x.reshape(b, f * pt, h * ph, w * pw, c.out_dim)

    # -- token-level entry points for sequence parallelism --------------------

    def embed_packed(self, x, t_frame, context, latent_frame_zero,
                     clip_context=None):
        """Embedding + conditioning prep only (no transformer blocks):
        returns a dict of per-token tensors for an external trunk runner
        (the SP driver shard-maps the trunk over the token axis, ≙ reference
        sp_dit_forward chunking between embed and head,
        wan23/distributed/sequence_parallel.py:64-146)."""
        c = self.cfg
        b, f, h_lat, w_lat, _ = x.shape
        f_hist = f - latent_frame_zero
        plan = framepack_plan(f_hist)
        xc = x.astype(self.dtype)
        tok_parts, grids = [], []
        for ch in plan:
            toks, grid = self._embed_chunk(xc[:, ch.start:ch.stop], ch.scale, ch.double_f)
            tok_parts.append(toks)
            grids.append(grid)
        tail_toks, tail_grid = self._embed_chunk(xc[:, f_hist:], 1, False)
        tok_parts.append(tail_toks)
        grids.append(tail_grid)
        tokens = jnp.concatenate(tok_parts, axis=1)
        l_hist = tokens.shape[1] - tail_toks.shape[1]
        l = tokens.shape[1]
        cos, sin = rope_lib.framepack_rope(grids, c.head_dim, max_len=c.rope_max_len,
                                           theta=c.rope_theta)
        t_vals = jnp.stack([t_frame[:, 0], t_frame[:, -1]], axis=1)
        idx = jnp.broadcast_to(
            (jnp.arange(l) >= l_hist).astype(jnp.int32)[None, :], (b, l))
        ctx = self._context(context, clip_context)
        return dict(tokens=tokens, t_values=t_vals, idx=idx, ctx=ctx,
                    cos=jnp.asarray(cos), sin=jnp.asarray(sin),
                    l_hist=l_hist, tail_grid=tail_grid)

    def embed_unpacked(self, x, t_frame, context, clip_context=None):
        """Unpacked (flag=False) analogue of :meth:`embed_packed`: full-res
        tokens, per-frame timestep indices, grid RoPE — for external trunk
        runners (quantized scan, SP)."""
        c = self.cfg
        b, f, h, w, _ = x.shape
        tokens, (gf, gh, gw) = self._embed_chunk(x.astype(self.dtype), 1, False)
        l = tokens.shape[1]
        tokens_per_frame = gh * gw
        idx = jnp.reshape(
            jnp.tile(jnp.arange(f)[:, None], (1, tokens_per_frame)), (1, l))
        idx = jnp.broadcast_to(idx, (b, l)).astype(jnp.int32)
        cos, sin = rope_lib.grid_rope(gf, gh, gw, c.head_dim,
                                      max_len=c.rope_max_len, theta=c.rope_theta)
        ctx = self._context(context, clip_context)
        return dict(tokens=tokens, t_values=t_frame, idx=idx, ctx=ctx,
                    cos=jnp.asarray(cos), sin=jnp.asarray(sin),
                    l_hist=0, tail_grid=(gf, gh, gw))

    def trunk_head(self, tokens, t_values, idx, ctx, cos, sin,
                   attn_impl=None, block_cache=None,
                   cache_list: Tuple[int, ...] = (),
                   return_cache: bool = False):
        """Blocks + head over pre-embedded tokens (per-token compute only —
        safe to shard along the token axis inside shard_map).

        TeaCache composition under SP: block residuals are per-token, so a
        cache captured inside shard_map stays sharded along the token axis
        between denoise steps — cached steps never re-gather it
        (``block_cache``/``cache_list``/``return_cache`` have the same
        semantics as :meth:`__call__`)."""
        mod = self._time_mod(t_values, idx)
        out, mod_out, new_cache = self._trunk(
            tokens, mod, ctx, cos, sin, attn_impl, None,
            block_cache=block_cache, cache_list=cache_list,
            return_cache=return_cache)
        head = self.head(out, mod_out)
        if return_cache:
            return head, new_cache
        return head
