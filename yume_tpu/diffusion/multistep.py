"""Multistep flow-matching solvers: DPM-Solver++(2M) and UniPC (bh2).

TPU-native equivalents of the reference's diffusers-derived schedulers
(`FlowDPMSolverMultistepScheduler`, wan/utils/fm_solvers.py;
`FlowUniPCMultistepScheduler`, wan/utils/fm_solvers_unipc.py — both are the
stock Wan samplers selected via ``sample_solver`` in
wan23/textimage2video.py:583-610). Re-derived for the reverse linear flow
path and written as pure scan-friendly step functions instead of stateful
scheduler objects.

Math: with x_σ = (1−σ)·x1 + σ·x0 (x1 data, x0 noise) and velocity
v = x0 − x1, the data prediction is x1_hat = x − σ·v and the half-log-SNR
is λ(σ) = log(1−σ) − log(σ). DPM-Solver++ in data-prediction form:

    x_{σ_next} = (σ_next/σ)·x − α_next·expm1(−h)·D,   h = λ_next − λ,

where α = 1−σ and D is the (extrapolated) data prediction: first order
D = x1_hat_i; second order D = x1_hat_i + (1/(2 r)) (x1_hat_i − x1_hat_{i−1})
with r = h_{i−1}/h_i. UniPC's bh2 corrector additionally reuses the *new*
model output at σ_next to correct the step (predictor–corrector).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def _lam(sigma):
    sigma = jnp.clip(sigma, 1e-6, 1 - 1e-6)
    return jnp.log(1 - sigma) - jnp.log(sigma)


class MultistepCarry(NamedTuple):
    x: jax.Array
    prev_x0: jax.Array       # previous data prediction
    have_prev: jax.Array     # bool scalar


def _data_pred(x, v, sigma):
    return x - sigma * v


def dpm_solver_step(x, x0_pred, prev_x0, have_prev, sigma, sigma_next, sigma_prev):
    """One DPM-Solver++(2M) update in data-prediction space."""
    lam, lam_n = _lam(sigma), _lam(sigma_next)
    h = lam_n - lam
    alpha_n = 1.0 - sigma_next

    def second_order():
        h_prev = lam - _lam(sigma_prev)
        r = h_prev / h
        return x0_pred + (x0_pred - prev_x0) / (2.0 * r)

    d = jnp.where(have_prev, second_order(), x0_pred)
    ratio = jnp.where(sigma > 0, sigma_next / sigma, 0.0)
    x_next = ratio * x + alpha_n * (-jnp.expm1(-h)) * d
    # terminal step: return the clean prediction
    x_next = jnp.where(sigma_next <= 1e-6, d, x_next)
    return x_next


def sample_dpmpp_2m(
    denoise_fn: Callable[[jax.Array, jax.Array], jax.Array],
    noise: jax.Array,
    sigmas: np.ndarray,
) -> jax.Array:
    """Full DPM-Solver++(2M) trajectory over a descending sigma ladder
    (last entry 0). ``denoise_fn(x, sigma[B]) -> velocity``."""
    b = noise.shape[0]
    sig = jnp.asarray(sigmas, jnp.float32)
    trips = jnp.stack([sig[:-1], sig[1:],
                       jnp.concatenate([sig[:1], sig[:-2]])], axis=1)

    def step(carry: MultistepCarry, tr):
        s_i, s_n, s_p = tr[0], tr[1], tr[2]
        v = denoise_fn(carry.x, jnp.full((b,), s_i))
        x0 = _data_pred(carry.x, v, s_i)
        x_next = dpm_solver_step(
            carry.x, x0, carry.prev_x0, carry.have_prev, s_i, s_n, s_p
        )
        return MultistepCarry(x_next, x0, jnp.array(True)), None

    init = MultistepCarry(noise, jnp.zeros_like(noise), jnp.array(False))
    out, _ = jax.lax.scan(step, init, trips)
    return out.x


def sample_unipc(
    denoise_fn: Callable[[jax.Array, jax.Array], jax.Array],
    noise: jax.Array,
    sigmas: np.ndarray,
) -> jax.Array:
    """UniPC (order 2, bh2) predictor–corrector sampling: after the
    DPM-style predictor reaches σ_next, evaluate the model there and apply a
    bh2 correction (reference FlowUniPCMultistepScheduler behaviour at
    order 2; one extra model call per step like the reference's
    corrector)."""
    b = noise.shape[0]
    sig = jnp.asarray(sigmas, jnp.float32)
    trips = jnp.stack([sig[:-1], sig[1:],
                       jnp.concatenate([sig[:1], sig[:-2]])], axis=1)

    def step(carry: MultistepCarry, tr):
        s_i, s_n, s_p = tr[0], tr[1], tr[2]
        v = denoise_fn(carry.x, jnp.full((b,), s_i))
        x0 = _data_pred(carry.x, v, s_i)
        # predictor
        x_pred = dpm_solver_step(
            carry.x, x0, carry.prev_x0, carry.have_prev, s_i, s_n, s_p
        )
        # corrector: evaluate at σ_next, average data predictions (bh2)
        def corrected():
            v_n = denoise_fn(x_pred, jnp.full((b,), s_n))
            x0_n = _data_pred(x_pred, v_n, s_n)
            lam, lam_n = _lam(s_i), _lam(s_n)
            h = lam_n - lam
            alpha_n = 1.0 - s_n
            d = 0.5 * (x0 + x0_n)
            ratio = jnp.where(s_i > 0, s_n / s_i, 0.0)
            return ratio * carry.x + alpha_n * (-jnp.expm1(-h)) * d

        x_next = jnp.where(s_n <= 1e-6, x0, corrected())
        return MultistepCarry(x_next, x0, jnp.array(True)), None

    init = MultistepCarry(noise, jnp.zeros_like(noise), jnp.array(False))
    out, _ = jax.lax.scan(step, init, trips)
    return out.x
