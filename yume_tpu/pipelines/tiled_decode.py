"""Memory-bounded VAE decoding: width-tiled decode with blended overlaps,
and temporally chunked decode for long sequences.

TPU-native equivalent of the reference webapp's `tiled_decode_overlap`
(webapp_single_gpu.py:370-551): the latent is split into ``n_tiles`` width
tiles with a small latent-space overlap; each tile decodes independently
(bounded peak activation memory) and overlapping pixel regions are linearly
cross-faded.
"""

from __future__ import annotations

from typing import Callable, List

import jax.numpy as jnp
import numpy as np


def _tile_bounds(latents_w: int, n_tiles: int, latent_overlap: int):
    base = latents_w // n_tiles
    rem = latents_w % n_tiles
    widths = [base + 1 if i < rem else base for i in range(n_tiles)]
    starts, ends, cores = [], [], []
    cur = 0
    for i in range(n_tiles):
        s, e = cur, cur + widths[i]
        cores.append((s, e))
        if i > 0:
            s -= latent_overlap
        if i < n_tiles - 1:
            e += latent_overlap
        starts.append(max(s, 0))
        ends.append(min(e, latents_w))
        cur += widths[i]
    return starts, ends, cores


def tiled_decode(
    decode_fn: Callable,
    latents,
    *,
    n_tiles: int = 5,
    image_overlap_size: int = 32,
    scale_factor: int = 16,
):
    """decode_fn([B,F,H,Wt,C] latent tile) → [B,T,H',Wt*sf,3] pixels.

    latents: [B, F, H, W, C]. Returns [B, T, H*sf-ish, W*sf, 3].
    """
    b, f, h, w, c = latents.shape
    lat_overlap = max(1, image_overlap_size // scale_factor)
    if w < n_tiles * 2:
        return decode_fn(latents)
    starts, ends, cores = _tile_bounds(w, n_tiles, lat_overlap)

    decoded: List = [decode_fn(latents[:, :, :, s:e]) for s, e in zip(starts, ends)]
    out_w = w * scale_factor
    t_out = decoded[0].shape[1]
    h_out = decoded[0].shape[2]
    out = jnp.zeros((b, t_out, h_out, out_w, 3), decoded[0].dtype)
    weight = jnp.zeros((out_w,), jnp.float32)

    for tile, s, e in zip(decoded, starts, ends):
        ps, pe = s * scale_factor, e * scale_factor
        tw = pe - ps
        # linear cross-fade ramps on the overlapped edges
        ramp = np.ones((tw,), np.float32)
        ov = lat_overlap * scale_factor
        if s > 0:
            ramp[:ov] = np.linspace(0.0, 1.0, ov, endpoint=False)
        if e < w:
            ramp[-ov:] = np.linspace(1.0, 0.0, ov, endpoint=False)
        r = jnp.asarray(ramp)
        out = out.at[:, :, :, ps:pe].add(tile[:, :, :, :tw] * r[None, None, None, :, None])
        weight = weight.at[ps:pe].add(r)

    return out / jnp.maximum(weight[None, None, None, :, None], 1e-6)


def chunked_decode_time(
    decode_fn: Callable,
    latents,
    *,
    chunk_latent_frames: int = 8,
):
    """Decode long latent sequences in temporal chunks. NOTE: chunks decode
    independently (each chunk re-anchors its causal state), matching the
    reference drivers which decode each segment's tail separately
    (fastvideo/sample/sample_5b.py:1052: `scale(vae, model_input[:, -lfz:])`).
    """
    b, f, h, w, c = latents.shape
    outs = []
    for s in range(0, f, chunk_latent_frames):
        outs.append(decode_fn(latents[:, s:s + chunk_latent_frames]))
    return jnp.concatenate(outs, axis=1)
