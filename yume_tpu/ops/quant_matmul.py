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

import jax
import jax.numpy as jnp


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
