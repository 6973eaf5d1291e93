"""Training step: flow-matching (+ optional MVDT masked pass) with optax.

TPU-native equivalent of the reference training driver's per-step work
(`distill_one_step`, fastvideo/distill_model.py:196-447, minus the GAN terms
which live in training/distill.py): conditioning-masked noising
(training_losses_i2v_pack, hyvideo/diffusion/flow/transport.py:208-271),
per-frame timesteps, tail-frame loss, grad clipping, EMA. Pure functions
over an explicit TrainState so the whole step jits and shards (GSPMD
replaces FSDP wrapping; grads all-reduce via the mesh's data axis
automatically under jit).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..diffusion.transport import Transport
from ..utils.masks import masks_like


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-5
    weight_decay: float = 1e-4
    grad_clip: float = 1.0
    ema_decay: float = 0.995
    shift: float = 3.0
    latent_frame_zero: int = 8
    mvdt: bool = False
    mask_history_p: float = 0.2  # masks_like noisy-history prob (utils.py:117)
    optimizer: str = "adamw"  # 'adamw' | 'adam8bit' (int8 moments, optim.py)
    lr_warmup_steps: int = 0   # linear warmup then constant (≙ diffusers
    #   get_scheduler('constant_with_warmup'), distill_model.py:623-631)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """AdamW + global-norm clipping (≙ Adam8bit + clip_grad_norm_,
    fastvideo/distill_model.py:598-616, 363). ``optimizer='adam8bit'``
    stores the moments int8-quantized like the reference's bitsandbytes
    optimizer (2 bytes/param of state instead of 8)."""
    lr = cfg.learning_rate
    if cfg.lr_warmup_steps:
        lr = optax.schedules.join_schedules(
            [optax.schedules.linear_schedule(0.0, cfg.learning_rate,
                                             cfg.lr_warmup_steps),
             optax.schedules.constant_schedule(cfg.learning_rate)],
            [cfg.lr_warmup_steps])
    if cfg.optimizer == "adam8bit":
        from .optim import adam8bit

        return optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            adam8bit(lr, weight_decay=cfg.weight_decay),
        )
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(lr, b1=0.9, b2=0.999,
                    weight_decay=cfg.weight_decay),
    )


def init_train_state(params, cfg: TrainConfig) -> TrainState:
    opt = make_optimizer(cfg)
    # EMA starts equal to params but must be a DISTINCT buffer tree: the
    # train drivers donate the state (train.py), and donating the same
    # buffer via two tree positions is an XLA error
    ema = jax.tree_util.tree_map(lambda p: p + jnp.zeros((), p.dtype), params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt.init(params),
        ema_params=ema,
    )


def make_loss_fn(
    dit_apply: Callable,
    cfg: TrainConfig,
    *,
    packed: bool = True,
    mvdt_keep: Optional[int] = None,
) -> Callable:
    """Loss over one batch: ``loss_fn(params, batch, rng) -> (loss,
    denoised_tail)``. Shared between the plain train step and the ADD
    distillation step (training/distill.py), which needs the denoised tail
    and a vjp through it."""
    transport = Transport(shift=cfg.shift)
    lfz = cfg.latent_frame_zero

    def flow_pass_i2v(params, batch, rng, *, masked: bool):
        """The 14B i2v/v2v training pass (reference Transport.training_losses,
        hyvideo/diffusion/flow/transport.py:164-205 + distill_model.py:275-318):
        the WHOLE latent (history + tail) is noised at one scalar t, the
        clean conditioning rides in the 20-channel ``y`` (msk + VAE(history),
        wan/image2video.py:300-369) concatenated to the 16-ch x_t for the
        36-ch DiT input, CLIP features feed the i2v cross-attention branch,
        and the velocity loss covers only the trailing ``latent_frame_zero``
        (=9) frames of the 16-ch output."""
        x1 = batch["latents"]                      # [B, F, h, w, 16] target
        y = batch["y"]                             # [B, F, h, w, 4+16]
        ctx = batch["context"]
        clip_ctx = batch.get("clip_context")
        b, f = x1.shape[:2]
        t_rng, n_rng, mv_rng = jax.random.split(rng, 3)

        t = transport.sample_t(t_rng, b)
        x0 = jax.random.normal(n_rng, x1.shape, x1.dtype)
        xt, ut = transport.plan(t, x0, x1)
        # scalar t broadcast per frame (the reference passes t*1000 as a
        # scalar; history is noised like the tail — conditioning is y-only)
        t_frame = jnp.broadcast_to(t[:, None], (b, f)) * 1000.0

        kw = {}
        if clip_ctx is not None:
            kw["clip_context"] = clip_ctx
        if masked:
            kw.update(mvdt_rng=mv_rng, mvdt_keep=mvdt_keep)
        x_in = jnp.concatenate([xt, y.astype(xt.dtype)], axis=-1)
        v = dit_apply(params, x_in, t_frame, ctx, packed=packed,
                      latent_frame_zero=lfz, **kw)
        v_tail = v[:, -lfz:].astype(jnp.float32)
        ut_tail = ut[:, -lfz:].astype(jnp.float32)
        loss = jnp.mean((v_tail - ut_tail) ** 2)
        denoised_tail = (
            xt[:, -lfz:].astype(jnp.float32) - t[:, None, None, None, None] * v_tail
        )
        return loss, denoised_tail

    def flow_pass(params, batch, rng, *, masked: bool):
        """One Transport flow-matching pass. Returns (loss, denoised_tail):
        the one-step x0 estimate x̂₁ = x_t − t·v̂ on the tail frames
        (reference distill_model.py:321 `model_denoing = xt - t*model_output`;
        consumed by the ADD GAN branch)."""
        if "y" in batch:
            return flow_pass_i2v(params, batch, rng, masked=masked)
        x1 = batch["latents"]
        ctx = batch["context"]
        b, f = x1.shape[:2]
        t_rng, n_rng, m_rng, mv_rng = jax.random.split(rng, 4)

        t = transport.sample_t(t_rng, b)
        x0 = jax.random.normal(n_rng, x1.shape, x1.dtype)
        xt, ut = transport.plan(t, x0, x1)

        # conditioning-mask the history: clean (or pseudo-noised) history
        # frames, diffused tail (reference transport.py:246, masks_like)
        mask1, mask2 = masks_like(
            x1.shape, zero=True, rng=m_rng, p=cfg.mask_history_p,
            latent_frame_zero=lfz,
        )
        xt = (1.0 - mask2) * x1 + mask2 * xt
        # per-frame timesteps: history at its mask1 pseudo-sigma (0 when
        # clean), tail at t (reference transport.py:234-244)
        m1_frame = mask1[:, :, 0, 0, 0]
        hist_t = m1_frame[:, : f - lfz]
        t_frame = jnp.concatenate(
            [hist_t, jnp.broadcast_to(t[:, None], (b, lfz))], axis=1
        ) * 1000.0

        kw = {}
        if masked:
            kw = dict(mvdt_rng=mv_rng, mvdt_keep=mvdt_keep)
        v = dit_apply(params, xt, t_frame, ctx, packed=packed,
                      latent_frame_zero=lfz, **kw)
        v_tail = v[:, -lfz:].astype(jnp.float32)
        ut_tail = ut[:, -lfz:].astype(jnp.float32)
        loss = jnp.mean((v_tail - ut_tail) ** 2)
        denoised_tail = (
            xt[:, -lfz:].astype(jnp.float32) - t[:, None, None, None, None] * v_tail
        )
        return loss, denoised_tail

    def loss_fn(params, batch, rng):
        """Flow loss (+ the MVDT masked pass as a *separate* forward whose
        loss adds to the total ≙ the reference's two sequential backwards,
        distill_model.py:289-318). Returns the unmasked pass's denoised tail
        as aux."""
        flow_rng, mask_rng = jax.random.split(rng)
        loss, denoised_tail = flow_pass(params, batch, flow_rng, masked=False)
        if cfg.mvdt and mvdt_keep is not None:
            mask_loss, _ = flow_pass(params, batch, mask_rng, masked=True)
            loss = loss + mask_loss
        return loss, denoised_tail

    return loss_fn


def make_train_step(
    dit_apply: Callable,
    cfg: TrainConfig,
    *,
    packed: bool = True,
    mvdt_keep: Optional[int] = None,
) -> Callable:
    """Build the jittable train step.

    dit_apply(params, x, t_frame, context, **kw) -> velocity (tail frames
    when packed).

    Batch dict: ``latents`` [B, F, H, W, C] clean latents (history+tail),
    ``context`` [B, text_len, text_dim].
    """
    optimizer = make_optimizer(cfg)
    loss_fn = make_loss_fn(dit_apply, cfg, packed=packed, mvdt_keep=mvdt_keep)

    def train_step(state: TrainState, batch, rng) -> Tuple[TrainState, dict]:
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        d = cfg.ema_decay
        ema = jax.tree_util.tree_map(
            lambda e, p: e * d + p * (1.0 - d), state.ema_params, params
        )
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return (
            TrainState(step=state.step + 1, params=params,
                       opt_state=opt_state, ema_params=ema),
            metrics,
        )

    return train_step
