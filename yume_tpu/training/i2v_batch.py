"""14B i2v/v2v training-batch construction.

TPU-native equivalent of the reference's per-step conditioning build
(fastvideo/distill_model.py:249-287 + wan/image2video.py:211-402): the host
draws ``rand_num_img`` and picks the i2v branch (first frame repeated 16×
ahead of a 33-frame tail) or the v2v branch (real pixel history), then the
VAE encodes history and tail separately into the regression target, encodes
``cat(history, zeros)`` once for the 20-channel ``y`` conditioning, and CLIP
embeds the last history frame. Both branches produce STATIC shapes (i2v is
always 16+33 pixel frames; v2v is the dataset's fixed window), so the jitted
train step compiles at most twice.

All frame arithmetic is expressed in units of the VAE temporal stride s0
(4 for Wan2.1 — giving the reference's literal 16/33/4n+1 numbers) so
smoke-scale configs with a different stride train through the same code.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def trim_s0n1(f: int, s0: int = 4) -> int:
    """Largest s0·n+1 ≤ f (reference distill_model.py:247-251 for s0=4)."""
    t = (f // s0) * s0 + 1
    return t - s0 if t > f else t


def build_i2v_train_batch(
    pipe,
    video: jax.Array,
    ctx: jax.Array,
    *,
    rand_num_img: float,
    frame_zero: Optional[int] = None,
    first_frame_repeat: Optional[int] = None,
) -> dict:
    """One 14B training batch from pixel frames.

    Args:
        pipe: I2VPipeline (VAE + CLIP loaded; T5 context passed in as
            ``ctx``).
        video: [B, F_px, H, W, 3] pixel frames in [-1, 1]; trimmed to s0·n+1.
        ctx: [B, text_len, text_dim] T5 features of the caption.
        rand_num_img: host uniform draw — <0.4 selects the i2v branch
            (reference distill_model.py:262-272; forced to 0.3 when the clip
            is too short for a v2v split).
        frame_zero: denoised tail in pixel frames; defaults to
            (latent_frame_zero−1)·s0+1 = the reference's 33.
        first_frame_repeat: pseudo-history length for the i2v branch;
            defaults to 4·s0 = the reference's 16.

    Returns a batch dict for training.train_step.make_train_step:
        latents [B, F_lat, h, w, z]  — regression target, split-encoded
            exactly like the reference (history and tail through fresh VAE
            caches, wan/image2video.py:287-289);
        y       [B, F_lat, h, w, s0+z] — msk channels + VAE(history‖zeros);
        context, clip_context.
    """
    s0 = pipe.config.vae.stride[0]
    if frame_zero is None:
        frame_zero = (pipe.config.latent_frame_zero - 1) * s0 + 1
    if first_frame_repeat is None:
        first_frame_repeat = 4 * s0

    b, f_px = video.shape[:2]
    video = video[:, : trim_s0n1(f_px, s0)]
    f_px = video.shape[1]
    if f_px < frame_zero:
        # the i2v tail must be exactly frame_zero frames and no branch can
        # produce the static shape from fewer — fail with the actual minimum
        # instead of slicing an empty history (VAE crash downstream)
        raise ValueError(
            f"clip too short for i2v-14B training: {f_px} frames after the "
            f"s0·n+1 trim < frame_zero={frame_zero}; provide clips with at "
            f"least {frame_zero} pixel frames")
    if f_px == frame_zero:
        # no history to split off — force the i2v branch (the reference
        # forces rand_num_img<0.4 for short clips, distill_model.py:262-267)
        rand_num_img = 0.3
    if rand_num_img < 0.4:
        # i2v: keep the trailing 33 frames, prepend the FIRST of them
        # repeated 16× as pseudo-history (reference distill_model.py:268-272)
        tail = video[:, -frame_zero:]
        video = jnp.concatenate(
            [jnp.repeat(tail[:, :1], first_frame_repeat, axis=1), tail],
            axis=1)
        f_px = video.shape[1]

    hist_px = video[:, :-frame_zero]   # s0·m frames (16 in the i2v branch)
    tail_px = video[:, -frame_zero:]   # s0·k+1 frames (33)
    mh = hist_px.shape[1]
    assert mh % s0 == 0 and tail_px.shape[1] % s0 == 1, (mh, tail_px.shape)

    # regression target: history and tail encoded separately with fresh
    # feat-caches (reference torch.cat([vae.encode(hist), vae.encode(tail)]),
    # wan/image2video.py:287-289). The reference's chunked encoder consumes
    # only the first 4(m−1)+1 of 4m history frames (chunks [:1],[1:5],…) —
    # encode exactly those so latent counts and values match.
    z_hist = pipe._encode(hist_px[:, : mh - (s0 - 1)])
    z_tail = pipe._encode(tail_px)
    latents = jnp.concatenate([z_hist, z_tail], axis=1)

    # 20-ch conditioning y = [msk, VAE(history ‖ zeros)] over the FULL
    # duration in one causal encode (wan/image2video.py:300-369);
    # make_conditioning's non-s0n+1 fallback does the padded full encode
    pipe._cond_cache = None  # never resume a sampling-time streaming cache
    y = pipe.make_conditioning(hist_px, f_px, history_mode=True)

    batch = {"latents": latents, "y": y, "context": ctx}
    if pipe.clip is not None:
        # CLIP on the last history frame (wan/image2video.py:341-344)
        batch["clip_context"] = pipe.clip_features(hist_px[:, -1])
    return batch


def synthetic_i2v_batch(
    rng: jax.Array,
    *,
    b: int,
    f: int,
    h: int,
    w: int,
    z_dim: int,
    mask_ch: int,
    text_len: int,
    text_dim: int,
    image_context_len: int = 0,
    image_dim: int = 1280,
) -> dict:
    """Random batch with the i2v structure (driver synthetic mode/tests)."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    batch = {
        "latents": jax.random.normal(k1, (b, f, h, w, z_dim)),
        "y": jax.random.normal(k2, (b, f, h, w, mask_ch + z_dim)),
        "context": jax.random.normal(k3, (b, text_len, text_dim)) * 0.02,
    }
    if image_context_len:
        batch["clip_context"] = jax.random.normal(
            k4, (b, image_context_len, image_dim)) * 0.02
    return batch
