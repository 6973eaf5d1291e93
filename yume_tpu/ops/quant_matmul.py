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

import flax.struct
import jax
import jax.numpy as jnp


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
    scale: jax.Array   # fp32 [..., in/group, 1, out]


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
    """
    a = x.astype(jnp.float32)
    a_scale = jnp.maximum(jnp.max(jnp.abs(a), axis=-1, keepdims=True),
                          1e-8) / 127.0
    qa = jnp.clip(jnp.round(a / a_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        qa, w.q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * a_scale * w.scale
    return out.astype(dtype if dtype is not None else x.dtype)


def q8_dequant(w: Q8, dtype=jnp.bfloat16):
    """Q8 → dense weight (the exact-path fallback for Q8 kernels consumed by
    projections that should stay bf16-exact, e.g. context-side k/v)."""
    return (w.q.astype(jnp.float32) * w.scale).astype(dtype)


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
    qa = jnp.clip(jnp.round(a / a_scale), -127, 127).astype(jnp.int8)
    qw = jnp.clip(jnp.round(w / w_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(qa, qw, dimension_numbers,
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * a_scale * w_scale).astype(out_dtype)
