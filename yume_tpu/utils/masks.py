"""History/conditioning masks and output-size helpers.

JAX equivalents of reference wan23/utils/utils.py:106-159 (`masks_like`,
`best_output_size`) and the 14B first-frame mask construction
(reference wan/image2video.py:300-369).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def masks_like(
    shape: Tuple[int, ...],
    *,
    zero: bool = False,
    rng: jax.Array | None = None,
    p: float = 0.2,
    latent_frame_zero: int = 8,
    frame_axis: int = 1,
    dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """(mask1, mask2) over a latent of ``shape`` (batched, frame axis given).

    mask2 zeroes the history frames (all but the trailing
    ``latent_frame_zero``); mask1 does too, except during training (rng
    given) where with probability ``p`` the history region of mask1 is
    instead filled with exp(N(-3.5, 0.5)) — a small positive pseudo-sigma
    that trains robustness to slightly-noisy history (reference
    wan23/utils/utils.py:106-133).

    Returns masks of the requested full shape.
    """
    f = shape[frame_axis]
    ones = jnp.ones(shape, dtype)
    frame_idx = jnp.arange(f)
    is_tail = (frame_idx >= f - latent_frame_zero).astype(dtype)
    bshape = [1] * len(shape)
    bshape[frame_axis] = f
    tail = is_tail.reshape(bshape)

    if not zero:
        return ones, ones

    mask2 = ones * tail
    if rng is None:
        return mask2, mask2

    r_rng, n_rng = jax.random.split(rng)
    use_noise = jax.random.uniform(r_rng, ()) < p
    sigma = jnp.exp(-3.5 + 0.5 * jax.random.normal(n_rng, ()))
    hist_val = jnp.where(use_noise, sigma, 0.0).astype(dtype)
    mask1 = ones * tail + hist_val * (1.0 - tail)
    return mask1, mask2


def best_output_size(w: int, h: int, dw: int, dh: int, expected_area: int) -> Tuple[int, int]:
    """Largest (ow, oh) ≤ expected_area with ow%dw==0, oh%dh==0 closest to
    the input aspect ratio (reference wan23/utils/utils.py:136-159)."""
    ratio = w / h
    ow = (expected_area * ratio) ** 0.5
    oh = expected_area / ow

    ow1 = int(ow // dw * dw)
    oh1 = int(expected_area / ow1 // dh * dh)
    ratio1 = ow1 / oh1

    oh2 = int(oh // dh * dh)
    ow2 = int(expected_area / oh2 // dw * dw)
    ratio2 = ow2 / oh2

    if max(ratio / ratio1, ratio1 / ratio) < max(ratio / ratio2, ratio2 / ratio):
        return ow1, oh1
    return ow2, oh2


def per_frame_timesteps(
    mask2_frame: jax.Array,
    t: jax.Array,
    latent_frame_zero: int,
) -> jax.Array:
    """Per-latent-frame timestep vector for the 5B diffusion-forcing path.

    The reference expands timesteps to a full per-token vector
    (mask2[0][0][:, ::2, ::2].flatten() with the tail set to t; reference
    fastvideo/sample/sample_5b.py:963-972, transport.py:234-244). Because t
    is constant within a latent frame, we keep the compact per-frame form
    [B, F] — the DiT broadcasts it to tokens internally (a TPU-first memory
    optimisation; see models/dit.py).

    Args:
        mask2_frame: [B, F] per-frame mask values (0 for history at
            inference; pseudo-sigma values during training).
        t: [B] scalar timestep in [0, 1] for the trailing frames.
    """
    b, f = mask2_frame.shape
    frame_idx = jnp.arange(f)
    is_tail = frame_idx >= f - latent_frame_zero
    return jnp.where(is_tail[None, :], t[:, None], mask2_frame)
