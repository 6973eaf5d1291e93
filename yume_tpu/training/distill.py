"""Adversarial distillation (ADD/OSV-style) training step.

TPU-native equivalent of the reference's GAN branch in `distill_one_step`
(fastvideo/distill_model.py:320-354): hinge loss on the projected
discriminator over the denoised tail latents vs the real tail latents, plus
a 0.01-weighted generator GAN term added to the flow-matching loss.

The denoised sample is the one-step x0 estimate
x̂₁ = x_t − t·v̂ (reference :321 `model_denoing = xt - t*model_output`).
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models.discriminator import ProjectedDiscriminator


class DiscState(flax.struct.PyTreeNode):
    params: Any
    spectral: Any
    opt_state: Any


def init_disc_state(
    rng: jax.Array, optimizer: optax.GradientTransformation,
    latent_hw: Tuple[int, int] = (16, 16), z_dim: int = 16,
) -> Tuple[ProjectedDiscriminator, DiscState]:
    disc = ProjectedDiscriminator()
    variables = disc.init(rng, jnp.zeros((1, latent_hw[0], latent_hw[1], z_dim)))
    params = variables["params"]
    spectral = variables.get("spectral", {})
    return disc, DiscState(params=params, spectral=spectral,
                           opt_state=optimizer.init(params))


def hinge_d_loss(pred_real, pred_real_f, pred_fake, pred_fake_f) -> jax.Array:
    """(reference distill_model.py:339-343)"""
    loss_real = jnp.mean(jax.nn.relu(1.0 - pred_real)) + \
        jnp.mean(jax.nn.relu(1.0 - pred_real_f))
    loss_fake = jnp.mean(jax.nn.relu(1.0 + pred_fake)) + \
        jnp.mean(jax.nn.relu(1.0 + pred_fake_f))
    return (loss_real + loss_fake) / 2.0


def gan_g_loss(pred_fake, pred_fake_f) -> jax.Array:
    """(reference distill_model.py:349-354)"""
    return -jnp.mean(pred_fake) - jnp.mean(pred_fake_f)


def make_disc_step(
    disc: ProjectedDiscriminator,
    optimizer: optax.GradientTransformation,
    grad_clip: float = 1.0,
) -> Callable:
    """Discriminator update on (real_tail, fake_tail) latent frames, each
    [F, H, W, C] (frames as batch, reference distill_model.py:329-331)."""

    def loss_fn(params, spectral, real, fake):
        vars_in = {"params": params, "spectral": spectral}
        (pr, prf), mut = disc.apply(vars_in, real, mutable=["spectral"])
        vars_in = {"params": params, "spectral": mut["spectral"]}
        (pf, pff), mut = disc.apply(vars_in, fake, mutable=["spectral"])
        return hinge_d_loss(pr, prf, pf, pff), mut["spectral"]

    def step(state: DiscState, real, fake):
        (loss, spectral), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.spectral,
            jax.lax.stop_gradient(real), jax.lax.stop_gradient(fake),
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return DiscState(params, spectral, opt_state), loss

    return step


def generator_gan_term(
    disc: ProjectedDiscriminator, disc_state: DiscState, fake_tail: jax.Array,
    weight: float = 0.01,
) -> jax.Array:
    """0.01-weighted generator GAN loss (discriminator frozen)."""
    pf, pff = disc.apply(
        {"params": jax.lax.stop_gradient(disc_state.params),
         "spectral": disc_state.spectral},
        fake_tail,
    )
    return weight * gan_g_loss(pf, pff)
