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
    dino_path: str | None = None,
) -> Tuple[ProjectedDiscriminator, DiscState]:
    """``dino_path``: DINO ViT-S/16 pretrained weights
    (dino_deitsmall16_pretrain.pth) grafted into the frozen projector —
    reference ADD/models/discriminator.py:145."""
    disc = ProjectedDiscriminator()
    variables = disc.init(rng, jnp.zeros((1, latent_hw[0], latent_hw[1], z_dim)))
    params = variables["params"]
    if dino_path:
        from ..utils.checkpoint import (convert_dino_state_dict,
                                        load_torch_state_dict)

        params = dict(params)
        params["dino"] = jax.tree_util.tree_map(
            jnp.asarray, convert_dino_state_dict(load_torch_state_dict(dino_path)))
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


def _disc_hinge_update(disc, optimizer, state: DiscState, real, fake):
    """One hinge-loss discriminator update on detached (real, fake) frame
    batches [N, H, W, C] (reference distill_model.py:329-343)."""

    def loss_fn(params, spectral, real, fake):
        vars_in = {"params": params, "spectral": spectral}
        (pr, prf), mut = disc.apply(vars_in, real, mutable=["spectral"])
        vars_in = {"params": params, "spectral": mut["spectral"]}
        (pf, pff), mut = disc.apply(vars_in, fake, mutable=["spectral"])
        return hinge_d_loss(pr, prf, pf, pff), mut["spectral"]

    (loss, spectral), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, state.spectral,
        jax.lax.stop_gradient(real), jax.lax.stop_gradient(fake),
    )
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return DiscState(params, spectral, opt_state), loss


def make_disc_step(
    disc: ProjectedDiscriminator,
    optimizer: optax.GradientTransformation,
    grad_clip: float = 1.0,
) -> Callable:
    """Discriminator update on (real_tail, fake_tail) latent frames, each
    [F, H, W, C] (frames as batch, reference distill_model.py:329-331)."""

    def step(state: DiscState, real, fake):
        return _disc_hinge_update(disc, optimizer, state, real, fake)

    return step


def make_distill_train_step(
    dit_apply: Callable,
    cfg,
    disc: ProjectedDiscriminator,
    disc_optimizer: optax.GradientTransformation,
    *,
    packed: bool = True,
    mvdt_keep=None,
    gan_weight: float = 0.01,
) -> Callable:
    """Full ADD distillation step ≙ reference distill_one_step's GAN branch
    (fastvideo/distill_model.py:306-366), as ONE jittable function:

    1. generator forward — flow loss (+MVDT pass) and the one-step denoised
       tail x̂₁ = x_t − t·v̂, with a vjp retained through both;
    2. discriminator hinge update on (real tail, detached x̂₁)  [:329-343];
    3. generator GAN term 0.01·(−D(x̂₁)) through the *updated* discriminator
       [:349-354], whose gradient flows back into the DiT via the retained
       vjp — exactly the reference's retained autograd graph, without a
       second DiT forward;
    4. AdamW update + EMA on the generator.

    step(state, disc_state, batch, rng) -> (state, disc_state, metrics).
    """
    import optax as _optax

    from .train_step import TrainState, make_loss_fn, make_optimizer

    optimizer = make_optimizer(cfg)
    loss_fn = make_loss_fn(dit_apply, cfg, packed=packed, mvdt_keep=mvdt_keep)
    lfz = cfg.latent_frame_zero

    def _frames(x):
        b, f = x.shape[:2]
        return x.reshape((b * f,) + x.shape[2:])

    def step(state: TrainState, disc_state: DiscState, batch, rng):
        (loss, denoised), vjp_fn = jax.vjp(
            lambda p: loss_fn(p, batch, rng), state.params)
        real = batch["latents"][:, -lfz:].astype(jnp.float32)

        disc_state, d_loss = _disc_hinge_update(
            disc, disc_optimizer, disc_state, _frames(real), _frames(denoised))

        def g_gan(dt):
            (pf, pff), _ = disc.apply(
                {"params": disc_state.params, "spectral": disc_state.spectral},
                _frames(dt), mutable=["spectral"])
            return gan_weight * gan_g_loss(pf, pff)

        gan_loss, g_dt = jax.value_and_grad(g_gan)(denoised)
        (grads,) = vjp_fn((jnp.ones((), jnp.float32), g_dt))

        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = _optax.apply_updates(state.params, updates)
        d = cfg.ema_decay
        ema = jax.tree_util.tree_map(
            lambda e, p: e * d + p * (1.0 - d), state.ema_params, params)
        metrics = {
            "loss": loss + gan_loss,
            "flow_loss": loss,
            "gan_loss": gan_loss,
            "d_loss": d_loss,
            "grad_norm": _optax.global_norm(grads),
        }
        return (
            TrainState(step=state.step + 1, params=params,
                       opt_state=opt_state, ema_params=ema),
            disc_state,
            metrics,
        )

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


def teacher_rollout(
    pipe,
    ctx: jax.Array,
    teacher_params: Any,
    *,
    size: Tuple[int, int] = (1280, 704),
    frame_num: int = 81,
    steps: int = 8,
    shift: float = 5.0,
    solver: str = "unipc",
    seed: int = 0,
) -> jax.Array:
    """Teacher-latent targets for distillation: a cond-only multistep
    rollout on the frozen teacher trunk (reference `t2v_dmd` with
    ``teacher_transformer``, wan23/textimage2video.py:519-653). The student
    trains against these latents (DMD-style regression / ADD real branch)
    instead of dataset latents."""
    return pipe.generate_t2v_dmd(
        ctx, teacher_params=teacher_params, size=size, frame_num=frame_num,
        steps=steps, shift=shift, solver=solver, seed=seed,
        return_latents=True)
