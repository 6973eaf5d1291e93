"""8-bit-state Adam: blockwise-quantized moments as an optax transform.

TPU-native equivalent of the reference's bitsandbytes ``Adam8bit``
(fastvideo/distill_model.py:598-616): the optimizer states m and v are
stored in int8 with one fp32 scale per 256-element block, cutting optimizer
HBM from 8 bytes/param to ~2.06 bytes/param — the difference between a 14B
AdamW run fitting a v5p slice or not. Updates dequantize → fp32 Adam math →
requantize, all inside the jitted update (no host round-trips, XLA fuses the
(de)quantization into the elementwise update).

Unlike bitsandbytes' dynamic-tree quantization we use symmetric linear
int8 per block for m (signed) and asymmetric-positive for v (always ≥ 0
via int8 codes 0..127 of sqrt(v)). sqrt-compression gives v an effective
dynamic range of ~4.8 decades per block, which matches the tree code's
useful range in practice while staying a pure vectorizable op on the VPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

BLOCK = 256


def _pad_len(n: int) -> int:
    return (n + BLOCK - 1) // BLOCK * BLOCK


def _quantize_signed(x: jax.Array):
    """fp32 [N] → (int8 codes [N], fp32 scales [N/BLOCK]); symmetric linear."""
    xb = x.reshape(-1, BLOCK)
    scale = jnp.max(jnp.abs(xb), axis=1) / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(xb / safe[:, None]), -127, 127).astype(jnp.int8)
    return q.reshape(-1), scale


def _dequantize_signed(q: jax.Array, scale: jax.Array) -> jax.Array:
    return (q.reshape(-1, BLOCK).astype(jnp.float32) * scale[:, None]).reshape(-1)


def _quantize_sqrt(x: jax.Array):
    """Non-negative fp32 [N] → int8 codes of sqrt(x) (linear in sqrt-space)."""
    r = jnp.sqrt(jnp.maximum(x, 0.0)).reshape(-1, BLOCK)
    scale = jnp.max(r, axis=1) / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(r / safe[:, None]), 0, 127).astype(jnp.int8)
    return q.reshape(-1), scale


def _dequantize_sqrt(q: jax.Array, scale: jax.Array) -> jax.Array:
    r = q.reshape(-1, BLOCK).astype(jnp.float32) * scale[:, None]
    return (r * r).reshape(-1)


class _Leaf(NamedTuple):
    m_q: jax.Array      # int8 [padded N]
    m_scale: jax.Array  # fp32 [padded N / BLOCK]
    v_q: jax.Array      # int8 [padded N]
    v_scale: jax.Array  # fp32 [padded N / BLOCK]


class _Out(NamedTuple):
    upd: jax.Array
    leaf: _Leaf


class Adam8bitState(NamedTuple):
    count: jax.Array
    leaves: object  # pytree of _Leaf, mirroring params


def scale_by_adam8bit(b1: float = 0.9, b2: float = 0.999,
                      eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam moment tracking with int8 blockwise-quantized m and v."""

    def init_leaf(p):
        n = _pad_len(p.size)
        zeros_q = jnp.zeros((n,), jnp.int8)
        zeros_s = jnp.zeros((n // BLOCK,), jnp.float32)
        return _Leaf(zeros_q, zeros_s, zeros_q, zeros_s)

    def init_fn(params):
        return Adam8bitState(
            count=jnp.zeros([], jnp.int32),
            leaves=jax.tree_util.tree_map(init_leaf, params),
        )

    def update_leaf(g, leaf, count):
        shape = g.shape
        n = _pad_len(g.size)
        gf = jnp.pad(g.reshape(-1).astype(jnp.float32), (0, n - g.size))
        m = _dequantize_signed(leaf.m_q, leaf.m_scale)
        v = _dequantize_sqrt(leaf.v_q, leaf.v_scale)
        m = b1 * m + (1.0 - b1) * gf
        v = b2 * v + (1.0 - b2) * gf * gf
        m_hat = m / (1.0 - b1 ** count)
        v_hat = v / (1.0 - b2 ** count)
        upd = (m_hat / (jnp.sqrt(v_hat) + eps))[: g.size].reshape(shape)
        m_q, m_s = _quantize_signed(m)
        v_q, v_s = _quantize_sqrt(v)
        return _Out(upd.astype(g.dtype), _Leaf(m_q, m_s, v_q, v_s))

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        out = jax.tree_util.tree_map(
            lambda g, l: update_leaf(g, l, count.astype(jnp.float32)),
            updates, state.leaves,
        )
        is_out = lambda x: isinstance(x, _Out)  # noqa: E731
        new_updates = jax.tree_util.tree_map(
            lambda t: t.upd, out, is_leaf=is_out)
        new_leaves = jax.tree_util.tree_map(
            lambda t: t.leaf, out, is_leaf=is_out)
        return new_updates, Adam8bitState(count=count, leaves=new_leaves)

    return optax.GradientTransformation(init_fn, update_fn)


def adam8bit(learning_rate, b1: float = 0.9, b2: float = 0.999,
             eps: float = 1e-8, weight_decay: float = 0.0,
             ) -> optax.GradientTransformation:
    """Drop-in AdamW with 8-bit moments (≈2 bytes/param optimizer state)."""
    txs = [scale_by_adam8bit(b1, b2, eps)]
    if weight_decay:
        txs.append(optax.add_decayed_weights(weight_decay))
    txs.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*txs)
