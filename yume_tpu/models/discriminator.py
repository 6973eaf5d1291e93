"""ADD projected discriminator: PixelShuffle upsampler → frozen DINO ViT-S/16
→ spectral-norm conv heads.

TPU-native re-implementation of reference ADD/models/discriminator.py:
  * SubPixelConvLayer (:165-176): 3×3 conv + 4× pixel shuffle from 16-ch
    latents to RGB.
  * DINO (:136-158): timm vit_small_patch16_224_dino with forward hooks at
    blocks 2,5,8,11 + the embedded patch tokens; features are
    AddReadout(cls)+transpose → [B, 384, 196] (vit_utils.py:36-63).
  * DiscHead / DiscHead_f (:79-133): SpectralConv1d+GroupNorm+LeakyReLU
    stacks over the token axis (and, for the _f heads, over the feature
    axis with tokens as batch).

Spectral norm keeps its power-iteration vector in a mutable 'spectral'
variable collection (1 iteration per call, like torch SpectralNorm).
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


# ---------------------------------------------------------------------------
# DINO ViT-S/16
# ---------------------------------------------------------------------------


class DinoBlock(nn.Module):
    dim: int = 384
    heads: int = 6

    @nn.compact
    def __call__(self, x):
        b, l, c = x.shape
        n, d = self.heads, self.dim // self.heads
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(3 * c, name="qkv")(h).reshape(b, l, 3, n, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        s = jnp.einsum("bqnd,bknd->bnqk", q, k) * (d ** -0.5)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bnqk,bknd->bqnd", p, v).reshape(b, l, c)
        x = x + nn.Dense(c, name="proj")(o)
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(4 * c, name="mlp_0")(h)
        h = nn.gelu(h, approximate=False)
        x = x + nn.Dense(c, name="mlp_2")(h)
        return x


class DinoViT(nn.Module):
    """ViT-S/16 returning hook activations (tokens incl. cls) at the given
    block indices plus the embedded tokens ('hook_patch')."""

    dim: int = 384
    depth: int = 12
    heads: int = 6
    patch: int = 16
    img_size: int = 224
    hooks: Tuple[int, ...] = (2, 5, 8, 11)

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        b = x.shape[0]
        h = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), padding="VALID",
                    name="patch_embed")(x)
        h = h.reshape(b, -1, self.dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, (self.img_size // self.patch) ** 2 + 1, self.dim))
        h = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)), h], axis=1)
        h = h + pos
        feats = [h]  # 'hook_patch': post pos_drop embedding
        for i in range(self.depth):
            h = DinoBlock(self.dim, self.heads, name=f"blocks_{i}")(h)
            if i in self.hooks:
                feats.append(h)
        # reference ordering: hooks 0..3 then the patch hook last ('4')
        return feats[1:] + feats[:1]


def dino_preprocess(x: jax.Array, img_size: int = 224) -> jax.Array:
    """[B, H, W, 3] in [0, 1] → resized (≈area) + ImageNet-normalised."""
    y = jax.image.resize(x, (x.shape[0], img_size, img_size, 3),
                         method="linear", antialias=True)
    return (y - IMAGENET_MEAN) / IMAGENET_STD


def add_readout(tokens: jax.Array) -> jax.Array:
    """cls-token readout added to every patch token, cls dropped
    (reference vit_utils.py:36-46): [B, 197, C] → [B, 196, C]."""
    return tokens[:, 1:] + tokens[:, :1]


# ---------------------------------------------------------------------------
# spectral-norm conv1d heads
# ---------------------------------------------------------------------------


class SpectralConv1d(nn.Module):
    """Conv1d (circular padding) with spectral weight normalisation
    (reference discriminator.py:29-32; torch SpectralNorm dim=0)."""

    features: int
    kernel: int
    circular: bool = True

    @nn.compact
    def __call__(self, x):
        # x: [B, L, C_in] channels-last
        cin = x.shape[-1]
        w = self.param("kernel", nn.initializers.he_normal(),
                       (self.kernel, cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        u = self.variable("spectral", "u", lambda: jnp.ones((self.features,)) /
                          np.sqrt(self.features))
        w2 = w.transpose(2, 0, 1).reshape(self.features, -1)  # [out, in*k]
        # one power iteration
        v = w2.T @ u.value
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u_new = w2 @ v
        u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
        if not self.is_initializing():
            u.value = jax.lax.stop_gradient(u_new)
        sigma = jnp.einsum("o,oi,i->", jax.lax.stop_gradient(u_new), w2,
                           jax.lax.stop_gradient(v))
        w_sn = w / sigma
        if self.circular and self.kernel > 1:
            p = self.kernel // 2
            l = x.shape[1]
            idx = jnp.mod(jnp.arange(-p, l + p), l)
            x = jnp.take(x, idx, axis=1)
            pad = "VALID"
        else:
            pad = "SAME" if self.kernel > 1 else "VALID"
        return jax.lax.conv_general_dilated(
            x, w_sn, (1,), pad,
            dimension_numbers=("NHC", "HIO", "NHC"),
        ) + b


class BatchNormLocal(nn.Module):
    """Virtual-batch norm over (group, length) per channel (reference
    discriminator.py:35-62)."""

    features: int
    virtual_bs: int = 3
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        # x: [B, L, C]
        w = self.param("weight", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        n = x.shape[0]
        g = -(-n // self.virtual_bs)
        xg = x.reshape(g, -1, x.shape[1], x.shape[2])
        mean = xg.mean(axis=(1, 2), keepdims=True)
        var = xg.var(axis=(1, 2), keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + self.eps)
        return xg.reshape(x.shape) * w + b


class ConvBlock(nn.Module):
    """SpectralConv1d → GroupNorm(4) → LeakyReLU(0.2) (reference
    make_block, discriminator.py:64-75)."""

    features: int
    kernel: int

    @nn.compact
    def __call__(self, x):
        x = SpectralConv1d(self.features, self.kernel, name="conv")(x)
        x = nn.GroupNorm(num_groups=4, name="norm")(x)
        return nn.leaky_relu(x, 0.2)


class DiscHead(nn.Module):
    """Token-axis head (reference discriminator.py:108-133)."""

    channels: int = 384

    @nn.compact
    def __call__(self, x):
        # x: [B, L, C]
        h = ConvBlock(self.channels, 1, name="block0")(x)
        r = ConvBlock(self.channels, 9, name="block1")(h)
        h = (h + r) / np.sqrt(2)  # ResidualBlock (ADD/models/shared.py)
        return SpectralConv1d(1, 1, name="cls")(h)  # [B, L, 1]


class DiscHeadF(nn.Module):
    """Feature-axis head: tokens as batch, batch as length (reference
    DiscHead_f, discriminator.py:79-106: x.permute(2,1,0))."""

    channels: int = 384

    @nn.compact
    def __call__(self, x):
        # x: [B, L, C] → [L, B, C]... reference permutes [B,C,N]→[N,C,B]:
        # conv over the batch axis with C channels
        y = x.transpose(1, 0, 2)  # [L, B, C]
        h = ConvBlock(self.channels, 7, name="block0")(y)
        r = ConvBlock(self.channels, 7, name="block1")(h)
        h = (h + r) / np.sqrt(2)
        out = SpectralConv1d(1, 7, circular=False, name="cls")(h)  # [L, B, 1]
        return out


class ProjectedDiscriminator(nn.Module):
    """(reference discriminator.py:176-225). Input latent frames
    [B, H, W, 16] (batch = frames); returns (logits [B, L_total],
    logits_f [N_tokens, B_total])."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, jax.Array]:
        b, h, w, c = x.shape
        # SubPixelConvLayer: conv to 3*16 channels + 4x pixel shuffle
        r = 4
        y = nn.Conv(3 * r * r, (3, 3), padding="SAME", name="up_conv")(x)
        # torch PixelShuffle channel order: (C, r, r)
        y = y.reshape(b, h, w, 3, r, r)
        y = y.transpose(0, 1, 4, 2, 5, 3)  # b, h, r, w, r, 3
        y = y.reshape(b, h * r, w * r, 3)

        # The DINO projector is frozen in the *parameter* sense (reference
        # requires_grad=False, discriminator.py:150): its params get no
        # optimizer updates (optax.masked in the driver), but gradients DO
        # flow through its activations — that's how the generator receives
        # the GAN signal. Do not stop_gradient here.
        feats = DinoViT(name="dino")(dino_preprocess(y))

        logits, logits_f = [], []
        for i, f in enumerate(feats):
            t = add_readout(f)  # [B, 196, 384]
            logits.append(DiscHead(name=f"head_{i}")(t)[:, :, 0])
            logits_f.append(DiscHeadF(name=f"head_f_{i}")(t)[:, :, 0])
        return jnp.concatenate(logits, axis=1), jnp.concatenate(logits_f, axis=1)
