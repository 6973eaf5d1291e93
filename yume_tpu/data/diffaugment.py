"""Differentiable augmentation for GAN training (DiffAugment).

JAX re-implementation of the policy set the reference vendors at
ADD/models/DiffAugment.py:35-121 (color / translation / cutout). Functional:
takes an explicit PRNG key instead of global torch RNG, and is shape-static
(translation and cutout use fixed pad + dynamic gather) so it jits cleanly
inside the discriminator step. Images are channels-last [B, H, W, C].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _rand_brightness(rng, x):
    b = jax.random.uniform(rng, (x.shape[0], 1, 1, 1), x.dtype) - 0.5
    return x + b


def _rand_saturation(rng, x):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    s = jax.random.uniform(rng, (x.shape[0], 1, 1, 1), x.dtype) * 2.0
    return (x - mean) * s + mean


def _rand_contrast(rng, x):
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    c = jax.random.uniform(rng, (x.shape[0], 1, 1, 1), x.dtype) + 0.5
    return (x - mean) * c + mean


def _rand_translation(rng, x, ratio: float = 0.125):
    b, h, w, _ = x.shape
    sh = int(h * ratio + 0.5)
    sw = int(w * ratio + 0.5)
    rh, rw = jax.random.split(rng)
    tx = jax.random.randint(rh, (b,), -sh, sh + 1)
    ty = jax.random.randint(rw, (b,), -sw, sw + 1)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))  # zero border
    gi = jnp.clip(jnp.arange(h)[None, :] + tx[:, None] + 1, 0, h + 1)  # [B,H]
    gj = jnp.clip(jnp.arange(w)[None, :] + ty[:, None] + 1, 0, w + 1)  # [B,W]

    def gather(img, i, j):  # img [H+2, W+2, C]
        return img[i][:, j]

    return jax.vmap(gather)(xp, gi, gj)


def _rand_cutout(rng, x, ratio: float = 0.5):
    b, h, w, _ = x.shape
    ch = int(h * ratio + 0.5)
    cw = int(w * ratio + 0.5)
    rh, rw = jax.random.split(rng)
    oy = jax.random.randint(rh, (b, 1, 1), 0, h + (1 - ch % 2))
    ox = jax.random.randint(rw, (b, 1, 1), 0, w + (1 - cw % 2))
    gy = jnp.arange(h)[None, :, None]  # [1,H,1]
    gx = jnp.arange(w)[None, None, :]  # [1,1,W]
    inside = ((gy >= oy - ch // 2) & (gy < oy + (ch + 1) // 2)
              & (gx >= ox - cw // 2) & (gx < ox + (cw + 1) // 2))
    return x * (1.0 - inside[..., None].astype(x.dtype))


_POLICIES = {
    "color": (_rand_brightness, _rand_saturation, _rand_contrast),
    "translation": (_rand_translation,),
    "cutout": (_rand_cutout,),
}


def diff_augment(rng: jax.Array, x: jax.Array,
                 policy: str = "color,translation,cutout") -> jax.Array:
    """Apply the comma-separated augmentation policy to [B, H, W, C] images."""
    if not policy:
        return x
    for p in policy.split(","):
        for fn in _POLICIES[p.strip()]:
            rng, sub = jax.random.split(rng)
            x = fn(sub, x)
    return x
