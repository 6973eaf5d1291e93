"""Wan2.2 causal 3D video VAE (encoder + decoder) in flax.linen.

TPU-native re-implementation of reference wan23/modules/vae2_2.py. The
reference streams chunks (1+4k pixel frames through the encoder, one latent
frame at a time through the decoder) with per-conv feature caches; the
*cached* path is the only one the reference ever uses for real work — the
uncached path even skips the temporal resampling convs entirely
(vae2_2.py:114-171). We therefore implement the **full-clip equivalents of
the cached semantics** as single fused ops (better XLA fusion, no Python
chunk loop), derived as:

* ``CausalConv3d``: streaming with a 2-frame cache ≡ full-clip conv with 2
  zero-padded leading frames (vae2_2.py:17-44, 216-239).
* encoder ``downsample3d`` time conv (vae2_2.py:159-170): the first frame
  passes through unchanged; the remaining output frames are a valid
  stride-2 k3 conv whose windows start at frame 0:
  out = [x₀, conv(x₀x₁x₂), conv(x₂x₃x₄), ...].
* decoder ``upsample3d`` time conv (vae2_2.py:116-153): frame 0 passes
  through un-doubled; frames t ≥ 1 are causally convolved over the sequence
  with frame 0 **replaced by zero** (the reference's "Rep" cache marker
  zero-pads instead of using frame 0), then channel-split into 2× frames:
  out = [u₀] ++ interleave(split2(conv_causal([0, u₁, u₂, ...])[1:])).

A chunked/tiled streaming decode for long videos is provided separately in
pipelines (same math by construction).

Layout: channels-last [B, T, H, W, C].
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..configs import VAEConfig

# Wan2.2 48-channel latent normalisation (reference wan23/modules/vae2_2.py:925-1033)
WAN22_LATENT_MEAN = np.array([
    -0.2289, -0.0052, -0.1323, -0.2339, -0.2799, 0.0174, 0.1838, 0.1557,
    -0.1382, 0.0542, 0.2813, 0.0891, 0.1570, -0.0098, 0.0375, -0.1825,
    -0.2246, -0.1207, -0.0698, 0.5109, 0.2665, -0.2108, -0.2158, 0.2502,
    -0.2055, -0.0322, 0.1109, 0.1567, -0.0729, 0.0899, -0.2799, -0.1230,
    -0.0313, -0.1649, 0.0117, 0.0723, -0.2839, -0.2083, -0.0520, 0.3748,
    0.0152, 0.1957, 0.1433, -0.2944, 0.3573, -0.0548, -0.1681, -0.0667,
], np.float32)
WAN22_LATENT_STD = np.array([
    0.4765, 1.0364, 0.4514, 1.1677, 0.5313, 0.4990, 0.4818, 0.5013,
    0.8158, 1.0344, 0.5894, 1.0901, 0.6885, 0.6165, 0.8454, 0.4978,
    0.5759, 0.3523, 0.7135, 0.6804, 0.5833, 1.4146, 0.8986, 0.5659,
    0.7069, 0.5338, 0.4889, 0.4917, 0.4069, 0.4999, 0.6866, 0.4093,
    0.5709, 0.6065, 0.6415, 0.4944, 0.5726, 1.2042, 0.5458, 1.6887,
    0.3971, 1.0600, 0.3943, 0.5537, 0.5444, 0.4089, 0.7468, 0.7744,
], np.float32)


class CacheIO:
    """Streaming feature-cache threading (≙ the reference's feat_cache list +
    feat_idx counter, vae2_2.py:874-881): modules consume caches in call
    order via get() and emit updated ones via put(). caches_in=None marks
    the first chunk (every conv zero-pads and seeds its cache)."""

    def __init__(self, caches_in=None):
        self.caches_in = caches_in
        self.idx = 0
        self.out = []

    def get(self):
        if self.caches_in is None:
            return None
        c = self.caches_in[self.idx]
        self.idx += 1
        return c

    def put(self, c):
        self.out.append(c)


class CausalConv3d(nn.Module):
    """3D conv, causal in time (2·pad_t zeros prepended), SAME in space.

    With ``io`` given, runs in streaming mode: the time padding is replaced
    by the cached trailing ``tp`` frames of the previous chunk's input
    (zero-seeded on the first chunk) — exactly the reference's cached
    CausalConv3d semantics (vae2_2.py:17-44)."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    time_pad: int | None = None  # default: 2 * (kt // 2)

    @nn.compact
    def __call__(self, x, io: "CacheIO | None" = None):
        kt, kh, kw = self.kernel
        tp = 2 * (kt // 2) if self.time_pad is None else self.time_pad
        if tp > 0:
            if io is not None:
                cache = io.get()
                if cache is None:
                    cache = jnp.zeros(
                        (x.shape[0], tp) + x.shape[2:], x.dtype)
                x = jnp.concatenate([cache, x], axis=1)
                io.put(x[:, -tp:])
            else:
                x = jnp.pad(x, ((0, 0), (tp, 0), (0, 0), (0, 0), (0, 0)))
        return nn.Conv(
            self.features, self.kernel, strides=self.strides,
            padding=[(0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)],
            name="conv", dtype=x.dtype,
        )(x)


class ChannelRMSNorm(nn.Module):
    """L2-normalise over channels, scale by sqrt(C)·gamma (reference
    RMS_norm, vae2_2.py:47-61; images=False has per-channel gamma)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        g = self.param("gamma", nn.initializers.ones, (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        n = xf * jax.lax.rsqrt(jnp.sum(xf * xf, axis=-1, keepdims=True) + 1e-12)
        return (n * (self.dim ** 0.5) * g).astype(x.dtype)


class ResBlock(nn.Module):
    """RMSNorm → SiLU → causal conv ×2 with conv shortcut (reference
    ResidualBlock, vae2_2.py:195-239)."""

    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x, io: CacheIO | None = None):
        h = ChannelRMSNorm(self.in_dim, name="norm1")(x)
        h = nn.silu(h)
        h = CausalConv3d(self.out_dim, name="conv1")(h, io)
        h = ChannelRMSNorm(self.out_dim, name="norm2")(h)
        h = nn.silu(h)
        h = CausalConv3d(self.out_dim, name="conv2")(h, io)
        if self.in_dim != self.out_dim:
            x = CausalConv3d(self.out_dim, kernel=(1, 1, 1), name="shortcut")(x)
        return x + h


class SpatialAttention(nn.Module):
    """Single-head per-frame self-attention (reference AttentionBlock,
    vae2_2.py:242-283)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        idty = x
        y = ChannelRMSNorm(self.dim, name="norm")(x)
        qkv = nn.Dense(3 * c, name="to_qkv", dtype=x.dtype)(y)
        q, k, v = jnp.split(qkv.reshape(b * t, h * w, 3 * c), 3, axis=-1)
        att = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q.astype(jnp.float32), k.astype(jnp.float32))
            * (c ** -0.5),
            axis=-1,
        )
        y = jnp.einsum("bqk,bkc->bqc", att, v.astype(jnp.float32)).astype(x.dtype)
        y = nn.Dense(c, name="proj", dtype=x.dtype,
                     kernel_init=nn.initializers.zeros)(y)
        return idty + y.reshape(b, t, h, w, c)


def patchify(x: jax.Array, p: int) -> jax.Array:
    """Spatial p×p pixel-unshuffle into channels, channel order matching the
    reference einops pattern 'b c (h q) (w r) -> b (c r q) h w'
    (vae2_2.py:286-302) translated to channels-last."""
    if p == 1:
        return x
    b, t, h, w, c = x.shape
    x = x.reshape(b, t, h // p, p, w // p, p, c)
    # target channel index = c*(p*p) ordered as (c, r, q): c-major, then r (w), then q (h)
    x = x.transpose(0, 1, 2, 4, 6, 5, 3)  # b t h' w' c r q
    return x.reshape(b, t, h // p, w // p, c * p * p)


def unpatchify(x: jax.Array, p: int) -> jax.Array:
    if p == 1:
        return x
    b, t, h, w, cpp = x.shape
    c = cpp // (p * p)
    x = x.reshape(b, t, h, w, c, p, p)  # c r q
    x = x.transpose(0, 1, 2, 6, 3, 5, 4)  # b t h q w r c
    return x.reshape(b, t, h * p, w * p, c)


def avg_down3d(x, out_ch: int, ft: int, fs: int):
    """Space-time average-pool shortcut (reference AvgDown3D,
    vae2_2.py:322-373): front-pad T to a multiple of ft, fold
    (ft, fs, fs) into channels, group-mean down to out_ch."""
    b, t, h, w, c = x.shape
    pad_t = (-t) % ft
    if pad_t:
        x = jnp.pad(x, ((0, 0), (pad_t, 0), (0, 0), (0, 0), (0, 0)))
        t += pad_t
    x = x.reshape(b, t // ft, ft, h // fs, fs, w // fs, fs, c)
    # channel order (c, ft, fs_h, fs_w) matching torch permute(0,1,3,5,7,2,4,6)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    x = x.reshape(b, t // ft, h // fs, w // fs, c * ft * fs * fs)
    group = c * ft * fs * fs // out_ch
    x = x.reshape(*x.shape[:4], out_ch, group)
    return jnp.mean(x, axis=-1)


def dup_up3d(x, out_ch: int, ft: int, fs: int, first_chunk: bool):
    """Repeat-upsample shortcut (reference DupUp3D, vae2_2.py:376-418)."""
    b, t, h, w, c = x.shape
    repeats = out_ch * ft * fs * fs // c
    x = jnp.repeat(x, repeats, axis=-1)  # channel-major repeat_interleave
    x = x.reshape(b, t, h, w, out_ch, ft, fs, fs)
    # torch: view(B, out, ft, fs, fs, T, H, W) permute(0,1,5,2,6,3,7,4)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)  # b t ft h fs w fs out
    x = x.reshape(b, t * ft, h * fs, w * fs, out_ch)
    if first_chunk and ft > 1:
        x = x[:, ft - 1:]
    return x


# Wan2.1 16-channel latent normalisation (reference wan/modules/vae.py:629-639)
WAN21_LATENT_MEAN = np.array([
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
], np.float32)
WAN21_LATENT_STD = np.array([
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
], np.float32)


class Downsample(nn.Module):
    """Spatial (and optionally temporal) downsample (reference Resample
    'downsample2d'/'downsample3d', vae2_2.py:101-170)."""

    dim: int
    temporal: bool

    @nn.compact
    def __call__(self, x, io: CacheIO | None = None):
        b, t, h, w, c = x.shape
        # ZeroPad2d((0,1,0,1)) + 3x3 stride-2 conv, per frame
        y = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
        y = nn.Conv(self.dim, (1, 3, 3), strides=(1, 2, 2), padding="VALID",
                    name="conv_spatial", dtype=x.dtype)(y)
        if self.temporal:
            # cached-path equivalent: first frame identity + stride-2 valid
            # conv with windows anchored at frame 0 (vae2_2.py:159-170)
            conv = nn.Conv(self.dim, (3, 1, 1), strides=(2, 1, 1),
                           padding="VALID", name="time_conv", dtype=x.dtype)
            if io is not None:
                cache = io.get()
                io.put(y[:, -1:])
                if cache is None:
                    return y  # first chunk: passthrough, no temporal conv
                return conv(jnp.concatenate([cache, y], axis=1))
            rest = conv(y)
            y = jnp.concatenate([y[:, :1], rest], axis=1)
        return y


class Upsample(nn.Module):
    """Spatial (and optionally temporal) upsample (reference Resample
    'upsample2d'/'upsample3d', vae2_2.py:88-157). ``out_dim`` supports the
    Wan2.1 variant whose spatial conv halves channels
    (reference wan/modules/vae.py:77-85)."""

    dim: int
    temporal: bool
    out_dim: int | None = None

    @nn.compact
    def __call__(self, x, first_chunk: bool = True,
                 io: CacheIO | None = None):
        if self.temporal:
            b, t, h, w, c = x.shape
            # causal conv over [0, u1, ..., u_{T-1}] (frame 0 zeroed per the
            # reference "Rep" semantics, vae2_2.py:116-153), drop output 0,
            # split channels 2x. VALID conv; padding supplied by the caller
            # (zeros at the stream start, the 2-frame cache afterwards).
            conv = nn.Conv(2 * self.dim, (3, 1, 1), padding="VALID",
                           name="time_conv", dtype=x.dtype)

            def double(y, frames):
                y = y.reshape(b, frames, h, w, 2, c)
                return y.transpose(0, 1, 4, 2, 3, 5).reshape(
                    b, 2 * frames, h, w, c)

            if io is not None:
                cache = io.get()
                if cache is None:
                    # first chunk: passthrough un-doubled; cache seeds with
                    # zeros — the "Rep" marker (frame 0 never enters the conv)
                    io.put(jnp.zeros((b, 2, h, w, c), x.dtype))
                else:
                    x_in = jnp.concatenate([cache, x], axis=1)
                    io.put(x_in[:, -2:])
                    x = double(conv(x_in), t)
            elif first_chunk:
                v = jnp.concatenate([
                    jnp.zeros((b, 2, h, w, c), x.dtype),
                    jnp.zeros_like(x[:, :1]), x[:, 1:]], axis=1)
                y = conv(v)[:, 1:]  # [B, T-1, H, W, 2C]
                x = jnp.concatenate([x[:, :1], double(y, t - 1)], axis=1)
            else:
                v = jnp.pad(x, ((0, 0), (2, 0), (0, 0), (0, 0), (0, 0)))
                x = double(conv(v), t)
        b, t, h, w, c = x.shape
        # nearest-exact 2x then 3x3 conv, per frame
        y = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        feats = self.dim if self.out_dim is None else self.out_dim
        y = nn.Conv(feats, (1, 3, 3), padding=[(0, 0), (1, 1), (1, 1)],
                    name="conv_spatial", dtype=x.dtype)(y)
        return y


class Wan21Encoder3d(nn.Module):
    """Wan2.1 encoder: plain residual stages without the AvgDown3D shortcuts
    (reference wan/modules/vae.py:265-366)."""

    cfg: VAEConfig

    @nn.compact
    def __call__(self, x, io: CacheIO | None = None):
        c = self.cfg
        dims = [c.base_dim * m for m in (1,) + tuple(c.dim_mult)]
        x = CausalConv3d(dims[0], name="conv1")(x, io)
        blk = 0
        for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
            d = din
            for _ in range(c.num_res_blocks):
                x = ResBlock(d, dout, name=f"block_{blk}")(x, io)
                d = dout
                blk += 1
            if i != len(c.dim_mult) - 1:
                t_down = c.temporal_downsample[i] if i < len(c.temporal_downsample) else False
                x = Downsample(dout, t_down, name=f"downsample_{i}")(x, io)
        x = ResBlock(dims[-1], dims[-1], name="mid_block_1")(x, io)
        x = SpatialAttention(dims[-1], name="mid_attn")(x)
        x = ResBlock(dims[-1], dims[-1], name="mid_block_2")(x, io)
        x = ChannelRMSNorm(dims[-1], name="head_norm")(x)
        x = nn.silu(x)
        return CausalConv3d(2 * c.z_dim, name="head_conv")(x, io)


class Wan21Decoder3d(nn.Module):
    """Wan2.1 decoder: upsampling halves channels, stage inputs halved
    accordingly (reference wan/modules/vae.py:369-460)."""

    cfg: VAEConfig

    @nn.compact
    def __call__(self, z, first_chunk: bool = True, io: CacheIO | None = None):
        c = self.cfg
        mults = tuple(c.dim_mult)
        dims = [c.base_dim * m for m in (mults[-1],) + mults[::-1]]
        t_up = tuple(reversed(c.temporal_downsample))
        x = CausalConv3d(dims[0], name="conv1")(z, io)
        x = ResBlock(dims[0], dims[0], name="mid_block_1")(x, io)
        x = SpatialAttention(dims[0], name="mid_attn")(x)
        x = ResBlock(dims[0], dims[0], name="mid_block_2")(x, io)
        blk = 0
        for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
            d = din // 2 if i in (1, 2, 3) else din
            for _ in range(c.num_res_blocks + 1):
                x = ResBlock(d, dout, name=f"block_{blk}")(x, io)
                d = dout
                blk += 1
            if i != len(mults) - 1:
                temporal = t_up[i] if i < len(t_up) else False
                x = Upsample(dout, temporal, out_dim=dout // 2,
                             name=f"upsample_{i}")(x, first_chunk, io)
        x = ChannelRMSNorm(dims[-1], name="head_norm")(x)
        x = nn.silu(x)
        return CausalConv3d(3, name="head_conv")(x, io)


class DownStage(nn.Module):
    """Residual blocks + downsample with avg shortcut (reference
    Down_ResidualBlock, vae2_2.py:421-458)."""

    in_dim: int
    out_dim: int
    num_blocks: int
    temporal: bool
    down: bool

    @nn.compact
    def __call__(self, x, io: CacheIO | None = None):
        shortcut = avg_down3d(
            x, self.out_dim, 2 if self.temporal else 1, 2 if self.down else 1
        )
        h = x
        d = self.in_dim
        for i in range(self.num_blocks):
            h = ResBlock(d, self.out_dim, name=f"block_{i}")(h, io)
            d = self.out_dim
        if self.down:
            h = Downsample(self.out_dim, self.temporal, name="downsample")(h, io)
        return h + shortcut


class UpStage(nn.Module):
    """Residual blocks + upsample with dup shortcut (reference
    Up_ResidualBlock, vae2_2.py:461-503)."""

    in_dim: int
    out_dim: int
    num_blocks: int
    temporal: bool
    up: bool

    @nn.compact
    def __call__(self, x, first_chunk: bool = True, io: CacheIO | None = None):
        h = x
        d = self.in_dim
        for i in range(self.num_blocks):
            h = ResBlock(d, self.out_dim, name=f"block_{i}")(h, io)
            d = self.out_dim
        if self.up:
            h = Upsample(self.out_dim, self.temporal, name="upsample")(h, first_chunk, io)
            shortcut = dup_up3d(
                x, self.out_dim, 2 if self.temporal else 1, 2, first_chunk
            )
            return h + shortcut
        return h


class Encoder3d(nn.Module):
    """(reference Encoder3d, vae2_2.py:506-622)"""

    cfg: VAEConfig

    @nn.compact
    def __call__(self, x, io: CacheIO | None = None):
        c = self.cfg
        dims = [c.base_dim * m for m in (1,) + tuple(c.dim_mult)]
        x = CausalConv3d(dims[0], name="conv1")(x, io)
        for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
            t_down = c.temporal_downsample[i] if i < len(c.temporal_downsample) else False
            x = DownStage(din, dout, c.num_res_blocks, t_down,
                          down=i != len(c.dim_mult) - 1, name=f"down_{i}")(x, io)
        x = ResBlock(dims[-1], dims[-1], name="mid_block_1")(x, io)
        x = SpatialAttention(dims[-1], name="mid_attn")(x)
        x = ResBlock(dims[-1], dims[-1], name="mid_block_2")(x, io)
        x = ChannelRMSNorm(dims[-1], name="head_norm")(x)
        x = nn.silu(x)
        return CausalConv3d(2 * c.z_dim, name="head_conv")(x, io)


class Decoder3d(nn.Module):
    """(reference Decoder3d, vae2_2.py:625-737). dec base dim is
    256/160·base_dim in Wan2.2 (reference WanVAE_ dec_dim=256)."""

    cfg: VAEConfig
    dec_dim: int = 256

    @nn.compact
    def __call__(self, z, first_chunk: bool = True, io: CacheIO | None = None):
        c = self.cfg
        mults = tuple(c.dim_mult)
        dims = [self.dec_dim * m for m in (mults[-1],) + mults[::-1]]
        t_up = tuple(reversed(c.temporal_downsample))
        x = CausalConv3d(dims[0], name="conv1")(z, io)
        x = ResBlock(dims[0], dims[0], name="mid_block_1")(x, io)
        x = SpatialAttention(dims[0], name="mid_attn")(x)
        x = ResBlock(dims[0], dims[0], name="mid_block_2")(x, io)
        for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
            temporal = t_up[i] if i < len(t_up) else False
            x = UpStage(din, dout, c.num_res_blocks + 1, temporal,
                        up=i != len(mults) - 1, name=f"up_{i}")(x, first_chunk, io)
        x = ChannelRMSNorm(dims[-1], name="head_norm")(x)
        x = nn.silu(x)
        out_ch = 3 * c.patchify * c.patchify
        return CausalConv3d(out_ch, name="head_conv")(x, io)


class WanVAE(nn.Module):
    """Full VAE with latent normalisation (reference Wan2_2_VAE,
    vae2_2.py:909-1071 + WanVAE_, :748-881)."""

    cfg: VAEConfig
    dec_dim: int = 256

    def setup(self):
        if self.cfg.arch == "wan21":
            self.encoder = Wan21Encoder3d(self.cfg)
            self.decoder = Wan21Decoder3d(self.cfg)
        else:
            self.encoder = Encoder3d(self.cfg)
            self.decoder = Decoder3d(self.cfg, self.dec_dim)
        self.conv1 = CausalConv3d(2 * self.cfg.z_dim, kernel=(1, 1, 1), name="conv1")
        self.conv2 = CausalConv3d(self.cfg.z_dim, kernel=(1, 1, 1), name="conv2")

    def _scale(self):
        if self.cfg.z_dim == len(WAN22_LATENT_MEAN):
            return jnp.asarray(WAN22_LATENT_MEAN), jnp.asarray(WAN22_LATENT_STD)
        if self.cfg.z_dim == len(WAN21_LATENT_MEAN):
            return jnp.asarray(WAN21_LATENT_MEAN), jnp.asarray(WAN21_LATENT_STD)
        return (jnp.zeros((self.cfg.z_dim,), jnp.float32),
                jnp.ones((self.cfg.z_dim,), jnp.float32))

    def encode(self, video: jax.Array) -> jax.Array:
        """[B, T, H, W, 3] in [-1, 1] → normalised latent
        [B, 1+(T-1)/4, H/16, W/16, z]."""
        x = patchify(video, self.cfg.patchify)
        out = self.encoder(x)
        mu, _log_var = jnp.split(self.conv1(out), 2, axis=-1)
        mean, std = self._scale()
        return (mu - mean) / std

    def decode(self, z: jax.Array) -> jax.Array:
        """Normalised latent → video [B, 1+(Tz-1)*4, H*16, W*16, 3] in [-1,1]."""
        mean, std = self._scale()
        z = z * std + mean
        x = self.conv2(z)
        out = self.decoder(x, first_chunk=True)
        return jnp.clip(unpatchify(out, self.cfg.patchify), -1.0, 1.0)

    def __call__(self, video):
        z = self.encode(video)
        return self.decode(z), z

    # -- streaming (chunked, cache-carried) API ---------------------------
    # Exact reproduction of the reference's chunked processing with bounded
    # memory: encode in 1+4k pixel-frame chunks (vae2_2.py:797-829), decode
    # one latent frame at a time (vae2_2.py:831-860). Caches are a flat
    # pytree of per-conv trailing frames (CacheIO).

    def encode_chunk(self, chunk, caches):
        """chunk: [B, Tc, H, W, 3]; caches: list | None (first chunk)."""
        io = CacheIO(caches)
        out = self.encoder(patchify(chunk, self.cfg.patchify), io)
        mu, _ = jnp.split(self.conv1(out), 2, axis=-1)
        mean, std = self._scale()
        return (mu - mean) / std, io.out

    def decode_chunk(self, z_chunk, caches):
        """z_chunk: [B, Tz, h, w, z] (normalised); caches: list | None."""
        mean, std = self._scale()
        z = z_chunk * std + mean
        x = self.conv2(z)
        first = caches is None
        io = CacheIO(caches)
        out = self.decoder(x, first, io)
        return jnp.clip(unpatchify(out, self.cfg.patchify), -1.0, 1.0), io.out


import functools as _functools


@_functools.lru_cache(maxsize=8)
def _jit_encode_chunk(vae: "WanVAE"):
    return jax.jit(lambda p, x, c: vae.apply(p, x, c, method=vae.encode_chunk))


@_functools.lru_cache(maxsize=8)
def _jit_decode_chunk(vae: "WanVAE"):
    return jax.jit(lambda p, z, c: vae.apply(p, z, c, method=vae.decode_chunk))


def streaming_encode(vae: WanVAE, params, video: jax.Array) -> jax.Array:
    """Chunked encode with carried caches — bit-identical to `encode` but
    with bounded activation memory (the reference's production encode path,
    vae2_2.py:797-829: chunks of 1 then 4 pixel frames). Chunk steps are
    jitted (two compilations: first + steady-state)."""
    fn = _jit_encode_chunk(vae)
    t = video.shape[1]
    mu, caches = fn(params, video[:, :1], None)
    outs = [mu]
    for s in range(1, t, 4):
        mu, caches = fn(params, video[:, s:s + 4], caches)
        outs.append(mu)
    return jnp.concatenate(outs, axis=1)


def streaming_decode(vae: WanVAE, params, z: jax.Array,
                     chunk_latent_frames: int = 1) -> jax.Array:
    """Chunked decode with carried caches — bit-identical to `decode` with
    bounded memory (reference vae2_2.py:831-860 decodes one latent frame per
    chunk; the cache semantics are chunk-length agnostic, so
    ``chunk_latent_frames > 1`` trades peak activation memory for fewer,
    larger XLA programs — measured −13% 720p tail-decode time at
    tiles=2/chunk=2 vs the old tiles=4/chunk=1; larger chunks OOM a 16 GB
    chip. scripts/bench_vae_decode.py, docs/PERF.md)."""
    fn = _jit_decode_chunk(vae)
    tz = z.shape[1]
    out, caches = fn(params, z[:, :1], None)
    outs = [out]
    for s in range(1, tz, chunk_latent_frames):
        out, caches = fn(params, z[:, s:s + chunk_latent_frames], caches)
        outs.append(out)
    return jnp.concatenate(outs, axis=1)
