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
    *,
    denoise_fn_low: Callable[[jax.Array, jax.Array], jax.Array] | None = None,
    boundary: float | None = None,
) -> jax.Array:
    """Full DPM-Solver++(2M) trajectory over a descending sigma ladder
    (last entry 0). ``denoise_fn(x, sigma[B]) -> velocity``.

    Dual-expert mode (stock Wan2.2 I2V MoE, reference
    wan23/image2video.py:172-204, 388-391): with ``denoise_fn_low`` +
    ``boundary`` set, steps whose sigma·1000 ≥ boundary·1000 use
    ``denoise_fn`` (the high-noise expert) and the rest ``denoise_fn_low``
    — the sigma ladder is static so the split is trace-time, and the 2M
    history carry crosses the boundary exactly like the reference's
    scheduler state survives its model swap."""
    b = noise.shape[0]
    sig_np = np.asarray(sigmas, np.float32)
    sig = jnp.asarray(sig_np)
    trips = jnp.stack([sig[:-1], sig[1:],
                       jnp.concatenate([sig[:1], sig[:-2]])], axis=1)

    def mk_step(fn):
        def step(carry: MultistepCarry, tr):
            s_i, s_n, s_p = tr[0], tr[1], tr[2]
            v = fn(carry.x, jnp.full((b,), s_i))
            x0 = _data_pred(carry.x, v, s_i)
            x_next = dpm_solver_step(
                carry.x, x0, carry.prev_x0, carry.have_prev, s_i, s_n, s_p
            )
            return MultistepCarry(x_next, x0, jnp.array(True)), None
        return step

    carry = MultistepCarry(noise, jnp.zeros_like(noise), jnp.array(False))
    if denoise_fn_low is None:
        carry, _ = jax.lax.scan(mk_step(denoise_fn), carry, trips)
        return carry.x
    if boundary is None:
        raise ValueError("denoise_fn_low requires an explicit boundary "
                         "(the expert-switch sigma)")
    if np.any(np.diff(sig_np) > 0):
        raise ValueError("dual-expert prefix split assumes a descending "
                         "sigma ladder")
    split = int(np.sum(sig_np[:-1] >= boundary))
    if split:
        carry, _ = jax.lax.scan(mk_step(denoise_fn), carry, trips[:split])
    if split < len(sig_np) - 1:
        carry, _ = jax.lax.scan(mk_step(denoise_fn_low), carry, trips[split:])
    return carry.x


def _np_lam(s: float) -> float:
    with np.errstate(divide="ignore"):
        return float(np.log(1.0 - s) - np.log(s))


def _unipc_coeffs(s0: float, st: float, hist_sigmas, order: int,
                  solver_type: str):
    """B(h)-series coefficients for one UniP/UniC update, float64 numpy
    (the sigma ladder is static, so these are trace-time constants).
    Mirrors fm_solvers_unipc.py:416-452/575-599 with predict_x0=True."""
    h = _np_lam(st) - _np_lam(s0)
    hh = -h
    h_phi_1 = np.expm1(hh)
    B_h = np.expm1(hh) if solver_type == "bh2" else hh
    rks = [(_np_lam(si) - _np_lam(s0)) / h for si in hist_sigmas] + [1.0]
    rks = np.asarray(rks, np.float64)
    R, b = [], []
    h_phi_k = h_phi_1 / hh - 1.0
    fact = 1.0
    for i in range(1, order + 1):
        R.append(np.power(rks, i - 1))
        b.append(h_phi_k * fact / B_h)
        fact *= i + 1
        h_phi_k = h_phi_k / hh - 1.0 / fact
    return float(h_phi_1), float(B_h), rks, np.stack(R), np.asarray(b)


def sample_unipc(
    denoise_fn: Callable[[jax.Array, jax.Array], jax.Array],
    noise: jax.Array,
    sigmas: np.ndarray,
    *,
    order: int = 2,
    solver_type: str = "bh2",
    lower_order_final: bool = True,
    use_corrector: bool = True,
    denoise_fn_low: Callable[[jax.Array, jax.Array], jax.Array] | None = None,
    boundary: float | None = None,
) -> jax.Array:
    """UniPC multistep sampling at any order with the UniC corrector —
    faithful to the reference FlowUniPCMultistepScheduler
    (wan/utils/fm_solvers_unipc.py:350-739, predict_x0=True,
    prediction_type='flow_prediction'): ONE model call per sigma; each new
    model output first *corrects* the previous predictor step (UniC-p),
    then predicts the next sample (UniP-p), with order warmup and
    lower-order-final. All B(h) linear solves happen in float64 numpy at
    trace time.

    ``denoise_fn(x, sigma[B]) -> velocity``; ``sigmas`` descending, last
    entry 0 (terminal step lands on the data prediction exactly).
    """
    sig = [float(s) for s in np.asarray(sigmas, np.float64)]
    if denoise_fn_low is not None and boundary is None:
        raise ValueError("denoise_fn_low requires an explicit boundary "
                         "(the expert-switch sigma)")
    n_steps = len(sig) - 1
    b = noise.shape[0]
    x = noise
    model_outputs: list = []   # converted x0 predictions, most recent last
    out_sigmas: list = []      # their sigmas
    last_sample = None
    prev_order = 0
    lower_order_nums = 0

    for i in range(n_steps):
        s0 = sig[i]
        # dual-expert boundary switch (trace-time: the ladder is static;
        # ≙ reference _prepare_model_for_timestep, wan23/image2video.py:
        # 172-204 — t.item() >= boundary·1000 picks the high-noise expert)
        fn = denoise_fn
        if denoise_fn_low is not None and s0 < boundary:
            fn = denoise_fn_low
        v = fn(x, jnp.full((b,), s0, noise.dtype))
        m = x - s0 * v  # flow velocity → data prediction (:306-312)

        if use_corrector and i > 0 and last_sample is not None:
            oc = prev_order
            st, ss0 = sig[i], sig[i - 1]
            hist = [out_sigmas[-(j + 1)] for j in range(1, oc)]
            h_phi_1, B_h, rks, R, bvec = _unipc_coeffs(
                ss0, st, hist, oc, solver_type)
            rhos_c = (np.asarray([0.5]) if oc == 1
                      else np.linalg.solve(R, bvec))
            m0 = model_outputs[-1]
            corr = 0.0
            for j in range(1, oc):
                corr = corr + float(rhos_c[j - 1]) * \
                    (model_outputs[-(j + 1)] - m0) / float(rks[j - 1])
            alpha_t = 1.0 - st
            x_ = (st / ss0) * last_sample - alpha_t * h_phi_1 * m0
            x = x_ - alpha_t * B_h * (corr + float(rhos_c[-1]) * (m - m0))
            # NOTE: the stored conversion `m` stays the PRE-correction one
            # (reference step(), fm_solvers_unipc.py:699-709)

        model_outputs.append(m)
        out_sigmas.append(s0)
        if len(model_outputs) > order:
            model_outputs.pop(0)
            out_sigmas.pop(0)

        this_order = min(order, n_steps - i) if lower_order_final else order
        this_order = min(this_order, lower_order_nums + 1)
        last_sample = x

        st = sig[i + 1]
        hist = [out_sigmas[-(j + 1)] for j in range(1, this_order)]
        h_phi_1, B_h, rks, R, bvec = _unipc_coeffs(
            s0, st, hist, this_order, solver_type)
        m0 = model_outputs[-1]
        alpha_t = 1.0 - st
        x = (st / s0) * last_sample - alpha_t * h_phi_1 * m0
        if this_order > 1:
            rhos_p = (np.asarray([0.5]) if this_order == 2
                      else np.linalg.solve(R[:-1, :-1], bvec[:-1]))
            pred = 0.0
            for j in range(1, this_order):
                pred = pred + float(rhos_p[j - 1]) * \
                    (model_outputs[-(j + 1)] - m0) / float(rks[j - 1])
            x = x - alpha_t * B_h * pred

        lower_order_nums = min(lower_order_nums + 1, order)
        prev_order = this_order
    return x
