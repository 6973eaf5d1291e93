"""umT5-XXL text encoder in flax.linen.

Re-implementation of the reference's from-scratch torch umT5 encoder
(wan/modules/t5.py:46-513): T5-style RMS LayerNorm, unscaled attention with
additive relative-position bias (per-layer, bidirectional, 32 buckets,
max_dist 128 — umT5 uses shared_pos=False, t5.py:455-467), gated-GELU
feed-forward, and a final norm. Encoder-only.

The reference runs this on CPU in bf16 and copies embeddings to device
(fastvideo/distill_model.py:720-737); on TPU we keep it on-device — HBM has
the headroom and it removes a host↔device copy from the conditioning path.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..configs import T5Config


def relative_position_bucket(rel_pos: np.ndarray, num_buckets: int = 32,
                             max_dist: int = 128) -> np.ndarray:
    """Bidirectional T5 relative position buckets (reference
    wan/modules/t5.py:245-265)."""
    nb = num_buckets // 2
    rel_buckets = (rel_pos > 0).astype(np.int64) * nb
    rel_pos = np.abs(rel_pos)
    max_exact = nb // 2
    large = max_exact + (
        np.log(np.maximum(rel_pos, 1) / max_exact)
        / np.log(max_dist / max_exact) * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    rel_buckets += np.where(rel_pos < max_exact, rel_pos, large)
    return rel_buckets


class T5LayerNorm(nn.Module):
    """RMS norm without mean subtraction (reference t5.py:53-66)."""

    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return (n * w).astype(x.dtype)


class T5Attention(nn.Module):
    """Unscaled multi-head attention with additive bias (reference t5.py:69-121)."""

    cfg: T5Config

    @nn.compact
    def __call__(self, x, mask=None, pos_bias=None):
        c = self.cfg
        b, l, _ = x.shape
        n = c.num_heads
        d = c.dim_attn // n
        q = nn.Dense(c.dim_attn, use_bias=False, name="q", dtype=x.dtype)(x)
        k = nn.Dense(c.dim_attn, use_bias=False, name="k", dtype=x.dtype)(x)
        v = nn.Dense(c.dim_attn, use_bias=False, name="v", dtype=x.dtype)(x)
        q = q.reshape(b, l, n, d)
        k = k.reshape(b, l, n, d)
        v = v.reshape(b, l, n, d)
        s = jnp.einsum("binc,bjnc->bnij", q.astype(jnp.float32), k.astype(jnp.float32))
        if pos_bias is not None:
            s = s + pos_bias
        if mask is not None:
            s = jnp.where(mask[:, None, None, :] > 0, s, jnp.finfo(jnp.float32).min)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bnij,bjnc->binc", p, v.astype(jnp.float32)).astype(x.dtype)
        return nn.Dense(c.dim, use_bias=False, name="o", dtype=x.dtype)(o.reshape(b, l, c.dim_attn))


class T5FeedForward(nn.Module):
    """Gated-GELU FFN (reference t5.py:123-141)."""

    cfg: T5Config

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        gate = nn.gelu(
            nn.Dense(c.dim_ffn, use_bias=False, name="gate", dtype=x.dtype)(x),
            approximate=True,
        )
        h = nn.Dense(c.dim_ffn, use_bias=False, name="fc1", dtype=x.dtype)(x) * gate
        return nn.Dense(c.dim, use_bias=False, name="fc2", dtype=x.dtype)(h)


class T5SelfAttentionBlock(nn.Module):
    """Pre-norm self-attention block with its own relative embedding
    (umT5: shared_pos=False; reference t5.py:144-176)."""

    cfg: T5Config

    @nn.compact
    def __call__(self, x, mask=None):
        c = self.cfg
        l = x.shape[1]
        emb = self.param(
            "pos_embedding",
            nn.initializers.normal((2 * c.num_buckets * c.num_heads) ** -0.5),
            (c.num_buckets, c.num_heads),
            jnp.float32,
        )
        rel = np.arange(l)[None, :] - np.arange(l)[:, None]
        buckets = jnp.asarray(
            relative_position_bucket(rel, c.num_buckets, c.max_distance)
        )
        pos_bias = emb[buckets].transpose(2, 0, 1)[None]  # [1, N, L, L]
        x = x + T5Attention(c, name="attn")(
            T5LayerNorm(c.dim, name="norm1")(x), mask=mask, pos_bias=pos_bias
        )
        x = x + T5FeedForward(c, name="ffn")(T5LayerNorm(c.dim, name="norm2")(x))
        return x


class T5Encoder(nn.Module):
    """umT5 encoder (reference T5Encoder, t5.py:267-313)."""

    cfg: T5Config
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, ids: jax.Array, mask: jax.Array | None = None) -> jax.Array:
        c = self.cfg
        x = nn.Embed(c.vocab_size, c.dim, name="token_embedding",
                     dtype=self.dtype)(ids)
        for i in range(c.num_layers):
            x = T5SelfAttentionBlock(c, name=f"blocks_{i}")(x, mask)
        return T5LayerNorm(c.dim, name="norm")(x)


def encode_text(model: T5Encoder, params, ids, mask) -> jax.Array:
    """Padded [B, text_len, dim] embeddings with padding zeroed — the dense
    equivalent of the reference's per-sample unpadded list output
    (t5.py:508-513; the DiT re-pads to text_len anyway,
    wan23/modules/model.py:816-821)."""
    ctx = model.apply(params, ids, mask)
    return ctx * mask[:, :, None].astype(ctx.dtype)
