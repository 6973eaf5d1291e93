"""Int8×int8 MXU matmul (W8A8) as a drop-in `dot_general` for nn.Dense.

TPU v5e's MXU runs s8×s8→s32 at 2× its bf16 FLOP rate (394 vs 197 TOPS),
so for the compute-bound quantized 14B trunk, dynamic activation
quantization + int8 weights beats weight-only dequant-to-bf16. Scheme:

  * activations: per-row (per-token) absmax → symmetric int8
  * weights:     per-column (per-output-channel) absmax → symmetric int8
  * accumulate int32 on the MXU, rescale by a_scale·w_scale in fp32

Weight quantization happens inside the jitted step on the already-dequantized
bf16 layer (it fuses into the surrounding ops and is O(K·N) vs the dot's
O(M·K·N)), so W8A8 composes with the int4/int8 *storage* trunk
(models/quantized.py) without a second packed format.

The reference has no quantized path at all (wan/modules/model.py runs pure
bf16/fp16); this is a beyond-reference TPU capability, gated off by default.
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@flax.struct.dataclass
class Q8:
    """Per-output-channel int8 weight: w ≈ q.astype(f32) * scale."""
    q: jax.Array       # int8 [..., in, out]
    scale: jax.Array   # fp32 [..., 1, out]


@flax.struct.dataclass
class Q4:
    """Group-wise int4 weight (AWQ-style, two nibbles per byte packed along
    the input dim): w ≈ (unpack(q) - 8) * scale, one fp32 scale per
    (input-group × output-channel)."""
    q: jax.Array       # uint8 [..., in/group, group/2, out]
    scale: jax.Array   # fp32 [..., in/group, out] (no size-1 axis: a
    #                    trailing (1, out) pair pads 8× under TPU tiling)


def _fused_kernel(x_ref, ascale_ref, qw_ref, wscale_ref, o_ref, acc_ref, *,
                  nk):
    """Pallas body: quantize the x block in VMEM against its precomputed
    per-row scale and feed the MXU s8×s8→s32; rescale on the last k step."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    s = ascale_ref[...].astype(jnp.float32)  # [bm, 1]
    xq = jnp.clip(jnp.round(x_ref[...].astype(jnp.float32) / s),
                  -127, 127).astype(jnp.int8)
    acc_ref[...] += jax.lax.dot_general(
        xq, qw_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == nk - 1)
    def _done():
        out = acc_ref[...].astype(jnp.float32) * s * wscale_ref[...]
        o_ref[...] = out.astype(o_ref.dtype)


# measured sweet spot on v5e at [12095,14336]×[14336,3072]
# (scripts/bench_quant_matmul.py --fused sweep): 6.01 ms vs 6.52 XLA preq
_FUSED_BM, _FUSED_BN, _FUSED_BK = 512, 1024, 1024
# below this contraction depth the kernel re-quantizing x per n-block loses
# to XLA's (quantize once) + dot — only the ffn down-projection qualifies
_FUSED_MIN_K = 8192


def _fused_bk(k_dim: int):
    """Largest supported k-block dividing the contraction: the 14B ffn
    (13824 = 27·512) doesn't divide the 5B-tuned 1024, so the block adapts
    rather than falling back to the slower XLA round-trip path."""
    for bk in (_FUSED_BK, 512, 256):
        if k_dim % bk == 0:
            return bk
    return 0


def _fused_q8_matmul_2d(x2, a_scale, qw, w_scale, out_dtype):
    m, k = x2.shape
    _, n = qw.shape
    bk = _fused_bk(k)
    nk = k // bk
    grid = (pl.cdiv(m, _FUSED_BM), pl.cdiv(n, _FUSED_BN), nk)
    return pl.pallas_call(
        functools.partial(_fused_kernel, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_FUSED_BM, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((_FUSED_BM, 1), lambda i, j, kk: (i, 0)),
            pl.BlockSpec((bk, _FUSED_BN), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, _FUSED_BN), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((_FUSED_BM, _FUSED_BN),
                               lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((_FUSED_BM, _FUSED_BN), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x2, a_scale, qw, w_scale)


def q8_dot(x, w: Q8, dtype=None):
    """``x @ dequant(w)`` with the STORED int8 weights going straight to the
    MXU (W8A8 direct path for the int8-storage trunk).

    The storage scheme of :class:`Q8` (symmetric per-output-channel absmax,
    models/quantized.py::_quantize_leaf) is exactly the weight scheme
    :func:`int8_dot_general` would re-derive — so instead of dequantizing to
    bf16 in the scan body and re-quantizing inside the matmul (three extra
    weight-sized HBM round-trips per layer per step), quantize only the
    activations and rescale the s32 accumulator by a_scale · stored_scale.
    Strictly more accurate than the round-trip (no second rounding).

    Deep contractions (K ≥ 8192, i.e. the ffn down-projection) route
    through a fused Pallas kernel on TPU that quantizes the activation
    block in VMEM and feeds the MXU directly — the int8 activation tensor
    never round-trips HBM (−8% at the 5B fc2 geometry). Same math
    (identical rounding, exact s32 accumulation), so the XLA composition
    below stays the numerical oracle on every backend.
    """
    a = x.astype(jnp.float32)
    a_scale = jnp.maximum(jnp.max(jnp.abs(a), axis=-1, keepdims=True),
                          1e-8) / 127.0
    k_dim, n_dim = w.q.shape[-2], w.q.shape[-1]
    if (jax.default_backend() == "tpu" and w.q.ndim == 2
            and k_dim >= _FUSED_MIN_K and _fused_bk(k_dim)
            and n_dim % 128 == 0):
        x2 = x.reshape(-1, k_dim)
        out = _fused_q8_matmul_2d(
            x2, a_scale.reshape(-1, 1).astype(jnp.float32), w.q,
            w.scale.reshape(1, n_dim).astype(jnp.float32),
            dtype if dtype is not None else x.dtype)
        return out.reshape(*x.shape[:-1], n_dim)
    qa = jnp.clip(jnp.round(a / a_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        qa, w.q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * a_scale * w.scale
    return out.astype(dtype if dtype is not None else x.dtype)


def q4_to_q8(w: Q4) -> Q8:
    """Relay the group-wise int4 storage onto the per-channel int8 grid.

    The per-channel scale comes from the group scales ALONE (no weight
    pass): dequantized values are ``(q−8)·scale_g`` with ``|q−8| ≤ 8``, so
    the channel absmax is bounded by ``8·max_g scale_g``. Requantizing the
    int4 grid onto that 127-step grid adds noise ≤ ``4·max_g scale/127``
    per weight — ~25 dB below the int4 quantization step itself (pinned by
    tests/test_quantized.py), invisible next to the trunk's int4 noise.

    Why a relay instead of a bespoke W4A8 kernel: the per-(group×channel)
    scales force either K=64 half-dots (measured 97–110 TF/s — shallow-K
    MXU passes) or this one-time regrid; after the regrid the matmul is a
    plain per-channel s8×s8 dot that runs at the stored-Q8 path's measured
    129–163 TF/s end-to-end (scripts/bench_w4a8.py), and K ≥ 8192 shapes
    keep the fused Pallas activation-quantize path for free. XLA fuses the
    unpack+regrid into the scan body; weight HBM traffic per layer is the
    int4 bytes in + int8 bytes out (⅜ of a bf16 dequant round-trip).
    """
    # bit math in i32: Mosaic/XLA-TPU have no i8/u8 subi or shrui lowering
    qi = w.q.astype(jnp.int32)
    lo = (qi & 0xF) - 8
    hi = (qi >> 4) - 8
    wg = jnp.concatenate([lo, hi], axis=-2).astype(jnp.float32)  # [G, g, N]
    s_chan = jnp.max(w.scale * 8.0, axis=-2, keepdims=True) / 127.0  # [1,N]
    wq = jnp.clip(
        jnp.round(wg * (w.scale[..., :, None, :] / s_chan[..., None, :])),
        -127, 127).astype(jnp.int8)
    *lead, g_, grp, n_dim = wq.shape
    return Q8(q=wq.reshape(*lead, g_ * grp, n_dim), scale=s_chan)


def q4_dot(x, w: Q4, dtype=None):
    """``x @ dequant(w)`` from STORED int4 weights via the Q4→Q8 relay
    (the W4A8 path for the int4-storage 14B trunk).

    Weights regrid group-int4 → per-channel int8 (:func:`q4_to_q8`, noise
    ~25 dB under the int4 floor), activations quantize per-row, and the
    matmul runs s8×s8 on the MXU through :func:`q8_dot` — identical math
    on every backend (the TPU fused path is pinned against the jnp
    composition by tests_tpu/test_quant_fused.py).
    """
    q8 = q4_to_q8(w)
    if w.q.ndim == 3:  # unstacked [G, g/2, N] kernel → 2D relay
        return q8_dot(x, q8, dtype)
    # stacked/leading dims: per-row activation quant + broadcast matmul
    a = x.astype(jnp.float32)
    a_scale = jnp.maximum(jnp.max(jnp.abs(a), axis=-1, keepdims=True),
                          1e-8) / 127.0
    qa = jnp.clip(jnp.round(a / a_scale), -127, 127)
    acc = qa @ q8.q.astype(jnp.float32)
    out = acc * a_scale * q8.scale
    return out.astype(dtype if dtype is not None else x.dtype)


def q8_dequant(w: Q8, dtype=jnp.bfloat16):
    """Q8 → dense weight (the exact-path fallback for Q8 kernels consumed by
    projections that should stay bf16-exact, e.g. context-side k/v)."""
    return (w.q.astype(jnp.float32) * w.scale).astype(dtype)


def q4_dequant(w: Q4, dtype=jnp.bfloat16):
    """Q4 (halves-packed) → dense weight."""
    lo = (w.q & 0xF).astype(jnp.int8) - 8
    hi = (w.q >> 4).astype(jnp.int8) - 8
    wg = jnp.concatenate([lo, hi], axis=-2)      # [..., G, g, N]
    *lead, g_, grp, n = wg.shape
    out = (wg.astype(jnp.float32)
           * w.scale[..., :, None, :]).reshape(*lead, g_ * grp, n)
    return out.astype(dtype)


def int8_dot_general(lhs, rhs, dimension_numbers, precision=None,
                     preferred_element_type=None):
    """`lax.dot_general` substitute for the Dense contraction pattern
    (((lhs.ndim-1,), (0,)), ((), ()))."""
    (lc, rc), (lb, rb) = dimension_numbers
    if (tuple(lc), tuple(rc)) != ((lhs.ndim - 1,), (0,)) or lb or rb:
        # not the Dense pattern — fall back to the exact dot
        return jax.lax.dot_general(lhs, rhs, dimension_numbers,
                                   precision=precision,
                                   preferred_element_type=preferred_element_type)

    out_dtype = jnp.promote_types(lhs.dtype, rhs.dtype)
    a = lhs.astype(jnp.float32)
    w = rhs.astype(jnp.float32)
    a_scale = jnp.maximum(jnp.max(jnp.abs(a), axis=-1, keepdims=True),
                          1e-8) / 127.0
    w_scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True),
                          1e-8) / 127.0
    qw = jnp.clip(jnp.round(w / w_scale), -127, 127).astype(jnp.int8)
    k_dim, n_dim = qw.shape
    if (jax.default_backend() == "tpu" and k_dim >= _FUSED_MIN_K
            and _fused_bk(k_dim) and n_dim % 128 == 0):
        out = _fused_q8_matmul_2d(
            lhs.reshape(-1, k_dim), a_scale.reshape(-1, 1), qw,
            w_scale.reshape(1, n_dim), out_dtype)
        return out.reshape(*lhs.shape[:-1], n_dim)
    qa = jnp.clip(jnp.round(a / a_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(qa, qw, dimension_numbers,
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * a_scale * w_scale).astype(out_dtype)
