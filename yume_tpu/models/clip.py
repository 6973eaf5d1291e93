"""CLIP XLM-RoBERTa ViT-H/14 visual encoder in flax.linen.

Re-implementation of the reference's open_clip-style vision tower
(wan/modules/clip.py:41-302, 434-541). Only the visual path is live in the
14B pipeline: `CLIPModel.visual(videos)` with ``use_31_block=True`` returns
the 257 tokens (cls + 16×16 patches) after 31 of 32 blocks
(clip.py:279-301), which feed the DiT's image cross-attention branch.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..configs import CLIPConfig

# OpenAI CLIP normalisation (reference clip.py:446-448)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _layer_norm(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * scale + bias).astype(x.dtype)


class LayerNorm(nn.Module):
    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return _layer_norm(x, scale, bias, self.eps)


class VitBlock(nn.Module):
    """Pre-norm attention block with GELU MLP (reference clip.py:112-154)."""

    cfg: CLIPConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        n = c.num_heads
        d = c.dim // n
        b, l, _ = x.shape

        h = LayerNorm(c.dim, name="norm1")(x)
        qkv = nn.Dense(3 * c.dim, name="to_qkv", dtype=x.dtype)(h)
        q, k, v = jnp.split(qkv.reshape(b, l, 3, n, d), 3, axis=2)
        s = jnp.einsum("bqnd,bknd->bnqk",
                       q[:, :, 0].astype(jnp.float32),
                       k[:, :, 0].astype(jnp.float32)) * (d ** -0.5)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bnqk,bknd->bqnd", p, v[:, :, 0].astype(jnp.float32))
        o = o.astype(x.dtype).reshape(b, l, c.dim)
        x = x + nn.Dense(c.dim, name="proj", dtype=x.dtype)(o)

        h = LayerNorm(c.dim, name="norm2")(x)
        h = nn.Dense(int(c.dim * c.mlp_ratio), name="mlp_0", dtype=x.dtype)(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.dim, name="mlp_2", dtype=x.dtype)(h)
        return x + h


class CLIPVisual(nn.Module):
    """ViT-H/14 visual tower, `use_31_block` output (reference
    VisionTransformer, clip.py:209-301)."""

    cfg: CLIPConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """images: [B, H, W, 3], CLIP-normalised. Returns [B, 257, dim]."""
        c = self.cfg
        b = images.shape[0]
        x = nn.Conv(c.dim, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    use_bias=False, name="patch_embedding",
                    dtype=self.dtype)(images.astype(self.dtype))
        x = x.reshape(b, -1, c.dim)
        gain = 1.0 / np.sqrt(c.dim)
        cls = self.param("cls_embedding", nn.initializers.normal(gain),
                         (1, 1, c.dim), jnp.float32)
        n_tok = (c.image_size // c.patch_size) ** 2 + 1
        pos = self.param("pos_embedding", nn.initializers.normal(gain),
                         (1, n_tok, c.dim), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(x.dtype), (b, 1, c.dim)), x],
                            axis=1)
        x = x + pos.astype(x.dtype)
        x = LayerNorm(c.dim, name="pre_norm")(x)
        for i in range(c.num_layers - 1):  # use_31_block: stop before last
            x = VitBlock(c, name=f"blocks_{i}")(x)
        return x


class XLMRobertaText(nn.Module):
    """XLM-RoBERTa-large text tower with CLIP projection head
    (reference wan/modules/xlm_roberta.py:76-146 + clip.py:303-326
    XLMRobertaWithHead): post-norm blocks, position ids from the cumulative
    non-pad mask, masked mean-pool + 2-layer GELU head to the shared
    embedding space."""

    vocab_size: int = 250002
    max_seq_len: int = 514
    pad_id: int = 1
    dim: int = 1024
    num_heads: int = 16
    num_layers: int = 24
    out_dim: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        b, s = ids.shape
        mask = (ids != self.pad_id).astype(jnp.int32)
        pos_ids = self.pad_id + jnp.cumsum(mask, axis=1) * mask
        x = nn.Embed(self.vocab_size, self.dim, name="token_embedding",
                     dtype=self.dtype)(ids)
        x = x + nn.Embed(1, self.dim, name="type_embedding",
                         dtype=self.dtype)(jnp.zeros_like(ids))
        x = x + nn.Embed(self.max_seq_len, self.dim, name="pos_embedding",
                         dtype=self.dtype)(pos_ids)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)  # post_norm=True

        n, d = self.num_heads, self.dim // self.num_heads
        attn_mask = jnp.where(mask[:, None, None, :] > 0, 0.0,
                              jnp.finfo(jnp.float32).min)
        for i in range(self.num_layers):
            name = f"blocks_{i}"
            h = x
            q = nn.Dense(self.dim, name=f"{name}_q", dtype=self.dtype)(h)
            k = nn.Dense(self.dim, name=f"{name}_k", dtype=self.dtype)(h)
            v = nn.Dense(self.dim, name=f"{name}_v", dtype=self.dtype)(h)
            q = q.reshape(b, s, n, d)
            k = k.reshape(b, s, n, d)
            v = v.reshape(b, s, n, d)
            sc = jnp.einsum("bqnd,bknd->bnqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * (d ** -0.5) + attn_mask
            p = jax.nn.softmax(sc, axis=-1)
            o = jnp.einsum("bnqk,bknd->bqnd", p, v.astype(jnp.float32))
            o = nn.Dense(self.dim, name=f"{name}_o",
                         dtype=self.dtype)(o.astype(x.dtype).reshape(b, s, self.dim))
            x = nn.LayerNorm(epsilon=1e-5, name=f"{name}_norm1")(x + o)
            f = nn.Dense(4 * self.dim, name=f"{name}_ffn0", dtype=self.dtype)(x)
            f = nn.gelu(f, approximate=False)
            f = nn.Dense(self.dim, name=f"{name}_ffn2", dtype=self.dtype)(f)
            x = nn.LayerNorm(epsilon=1e-5, name=f"{name}_norm2")(x + f)

        # masked mean pool + projection head
        m = mask[:, :, None].astype(x.dtype)
        pooled = (x * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1e-6)
        mid = (self.dim + self.out_dim) // 2
        h = nn.Dense(mid, use_bias=False, name="head_0", dtype=self.dtype)(pooled)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.out_dim, use_bias=False, name="head_2",
                        dtype=self.dtype)(h)


def preprocess_frames(frames: jax.Array, image_size: int = 224) -> jax.Array:
    """[-1,1] [B, H, W, 3] frames → CLIP-normalised [B, S, S, 3] via bilinear
    resize (reference uses bicubic; clip.py:494-520 — difference is
    sub-tolerance for conditioning features)."""
    x = jax.image.resize(frames, (frames.shape[0], image_size, image_size, 3),
                         method="bicubic")
    x = x * 0.5 + 0.5
    return (x - CLIP_MEAN) / CLIP_STD
