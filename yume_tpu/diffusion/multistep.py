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
    step_range: tuple | None = None,
    init_carry: "MultistepCarry | None" = None,
    return_carry: bool = False,
):
    """Full DPM-Solver++(2M) trajectory over a descending sigma ladder
    (last entry 0). ``denoise_fn(x, sigma[B]) -> velocity``.

    Dual-expert mode (stock Wan2.2 I2V MoE, reference
    wan23/image2video.py:172-204, 388-391): with ``denoise_fn_low`` +
    ``boundary`` set, steps whose sigma·1000 ≥ boundary·1000 use
    ``denoise_fn`` (the high-noise expert) and the rest ``denoise_fn_low``
    — the sigma ladder is static so the split is trace-time, and the 2M
    history carry crosses the boundary exactly like the reference's
    scheduler state survives its model swap.

    Phase-split execution (single-chip expert HOST OFFLOAD, reference's
    per-step CPU shuttling wan23/image2video.py:172-204): ``step_range``
    =(lo, hi) runs only those ladder steps; ``init_carry`` resumes from a
    previous phase's carry and ``return_carry=True`` returns the
    :class:`MultistepCarry` instead of x — so each expert's phase can run
    as its own program with only that expert resident in HBM."""
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

    carry = (MultistepCarry(noise, jnp.zeros_like(noise), jnp.array(False))
             if init_carry is None else init_carry)
    if step_range is not None:
        lo, hi = step_range
        carry, _ = jax.lax.scan(mk_step(denoise_fn), carry, trips[lo:hi])
        return carry if return_carry else carry.x
    if denoise_fn_low is None:
        carry, _ = jax.lax.scan(mk_step(denoise_fn), carry, trips)
        return carry if return_carry else carry.x
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
    scan: bool = True,
    step_range: tuple | None = None,
    init_carry: tuple | None = None,
    return_carry: bool = False,
):
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

    # ---- trace-time coefficient tables ----------------------------------
    # Every coefficient depends only on the (static) sigma ladder, so the
    # whole UniP/UniC recurrence compiles as ONE lax.scan whose body traces
    # the model trunk once — this is what lets the scanned quantized 14B
    # trunk run under multistep solvers (multiple unrolled model calls each
    # closing over the multi-GiB weight stacks made XLA copy them per call;
    # the round-2 compile lesson).
    K = max(order - 1, 1)  # padded history-coefficient width
    tab = {k: np.zeros(n_steps) for k in
           ("s0", "use_c", "c_ratio", "c_ah", "c_last", "p_ratio", "p_ah")}
    tab["c_hist"] = np.zeros((n_steps, K))
    tab["p_hist"] = np.zeros((n_steps, K))
    out_sigmas: list = []
    prev_order = 0
    lower_order_nums = 0
    for i in range(n_steps):
        s0, st_next = sig[i], sig[i + 1]
        tab["s0"][i] = s0
        if use_corrector and i > 0:
            oc = prev_order
            ss0 = sig[i - 1]
            hist = [out_sigmas[-(j + 1)] for j in range(1, oc)]
            h_phi_1, B_h, rks, R, bvec = _unipc_coeffs(
                ss0, s0, hist, oc, solver_type)
            rhos_c = (np.asarray([0.5]) if oc == 1
                      else np.linalg.solve(R, bvec))
            alpha_t = 1.0 - s0
            tab["use_c"][i] = 1.0
            tab["c_ratio"][i] = s0 / ss0
            tab["c_ah"][i] = alpha_t * h_phi_1
            for j in range(1, oc):
                tab["c_hist"][i, j - 1] = (alpha_t * B_h
                                           * float(rhos_c[j - 1])
                                           / float(rks[j - 1]))
            tab["c_last"][i] = alpha_t * B_h * float(rhos_c[-1])
        out_sigmas.append(s0)
        if len(out_sigmas) > order:
            out_sigmas.pop(0)
        this_order = min(order, n_steps - i) if lower_order_final else order
        this_order = min(this_order, lower_order_nums + 1)
        hist = [out_sigmas[-(j + 1)] for j in range(1, this_order)]
        h_phi_1, B_h, rks, R, bvec = _unipc_coeffs(
            s0, st_next, hist, this_order, solver_type)
        alpha_t = 1.0 - st_next
        tab["p_ratio"][i] = st_next / s0
        tab["p_ah"][i] = alpha_t * h_phi_1
        if this_order > 1:
            rhos_p = (np.asarray([0.5]) if this_order == 2
                      else np.linalg.solve(R[:-1, :-1], bvec[:-1]))
            for j in range(1, this_order):
                tab["p_hist"][i, j - 1] = (alpha_t * B_h
                                           * float(rhos_p[j - 1])
                                           / float(rks[j - 1]))
        lower_order_nums = min(lower_order_nums + 1, order)
        prev_order = this_order
    xs = {k: jnp.asarray(v, jnp.float32) for k, v in tab.items()}

    # ---- the scan: fixed-size history ring, coefficient-masked math -----
    # hist[0] is the most recent x0 prediction; unused slots hold zeros and
    # are multiplied by zero coefficients (exact, not approximate).
    H = max(order, 2)

    def mk_body(fn):
        def body(carry, cs):
            x, last_sample, hist = carry
            v = fn(x, jnp.full((b,), 1.0, noise.dtype) * cs["s0"])
            m = x - cs["s0"] * v  # flow velocity → x0 prediction (:306-312)

            # UniC: correct the previous predictor step with the NEW m
            # (the stored conversion stays PRE-correction, reference
            # step(), fm_solvers_unipc.py:699-709)
            m0 = hist[0]
            diffs = hist[1:1 + K] - m0[None]
            corr = jnp.einsum("k,k...->...", cs["c_hist"], diffs)
            x_c = (cs["c_ratio"] * last_sample - cs["c_ah"] * m0
                   - (corr + cs["c_last"] * (m - m0)))
            x = jnp.where(cs["use_c"] > 0, x_c, x)

            hist = jnp.concatenate([m[None], hist[:-1]], axis=0)
            last_sample = x
            diffs = hist[1:1 + K] - m[None]
            pred = jnp.einsum("k,k...->...", cs["p_hist"], diffs)
            x = cs["p_ratio"] * x - cs["p_ah"] * m - pred
            return (x, last_sample, hist), None
        return body

    hist0 = jnp.zeros((H,) + noise.shape, noise.dtype)
    carry = ((noise, jnp.zeros_like(noise), hist0)
             if init_carry is None else init_carry)

    if step_range is not None:
        # phase-split execution (expert host offload — see sample_dpmpp_2m):
        # run only ladder steps [lo, hi) with denoise_fn, optionally
        # resuming/returning the (x, last_sample, hist) carry
        lo, hi = step_range
        take = {k: v[lo:hi] for k, v in xs.items()}
        carry, _ = jax.lax.scan(mk_body(denoise_fn), carry, take)
        return carry if return_carry else carry[0]

    if not scan:
        # unrolled variant: one fn call per step with a CONCRETE sigma —
        # required when denoise_fn is a host-side oracle (golden tests) or
        # per-step tracing must stay observable. Same body, same math.
        for i in range(n_steps):
            fn = denoise_fn
            if denoise_fn_low is not None and sig[i] < boundary:
                fn = denoise_fn_low
            cs = {k: (jnp.asarray(v[i]) if v.ndim == 1
                      else jnp.asarray(v[i])) for k, v in xs.items()}
            carry, _ = mk_body(fn)(carry, cs)
        return carry[0]

    if denoise_fn_low is None:
        (x, _, _), _ = jax.lax.scan(mk_body(denoise_fn), carry, xs)
        return x
    # dual-expert boundary switch (trace-time prefix split on the static
    # ladder; ≙ reference _prepare_model_for_timestep, wan23/image2video.py:
    # 172-204 — the scheduler state crosses the expert swap intact)
    split = int(np.sum(np.asarray(sig[:-1]) >= boundary))
    take = lambda lo, hi: {k: v[lo:hi] for k, v in xs.items()}
    if split:
        carry, _ = jax.lax.scan(mk_body(denoise_fn), carry, take(0, split))
    if split < n_steps:
        carry, _ = jax.lax.scan(mk_body(denoise_fn_low), carry,
                                take(split, n_steps))
    return carry[0]
