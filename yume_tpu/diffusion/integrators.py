"""ODE integrators for flow sampling: fixed-step Euler/Heun/midpoint and
adaptive Dormand–Prince (dopri5).

TPU-native equivalent of the reference's torchdiffeq-backed Sampler
(hyvideo/diffusion/flow/integrators.py:78-125, transport.py:328-446: ODE
with method in {euler, heun2, midpoint, dopri5}). The adaptive path is a
`lax.while_loop` with a PI-free (integral) step controller and embedded
4th/5th-order error estimate — data-independent shapes, so the whole solve
jits.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

# Dormand–Prince 5(4) Butcher tableau
_DP_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_DP_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_DP_B5 = np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784,
                   11 / 84, 0.0])
_DP_B4 = np.array([5179 / 57600, 0.0, 7571 / 16695, 393 / 640,
                   -92097 / 339200, 187 / 2100, 1 / 40])


def _fixed_step(fn, x, t0: float, t1: float, steps: int, method: str):
    ts = jnp.linspace(t0, t1, steps + 1)

    def euler(x, tt):
        t, tn = tt
        return x + (tn - t) * fn(x, t), None

    def heun(x, tt):
        t, tn = tt
        h = tn - t
        k1 = fn(x, t)
        k2 = fn(x + h * k1, tn)
        return x + 0.5 * h * (k1 + k2), None

    def midpoint(x, tt):
        t, tn = tt
        h = tn - t
        k1 = fn(x, t)
        k2 = fn(x + 0.5 * h * k1, t + 0.5 * h)
        return x + h * k2, None

    step = {"euler": euler, "heun2": heun, "midpoint": midpoint}[method]
    pairs = jnp.stack([ts[:-1], ts[1:]], axis=1)
    x, _ = jax.lax.scan(lambda c, tt: step(c, (tt[0], tt[1])), x, pairs)
    return x


def _dopri5(fn, x0, t0: float, t1: float, rtol: float, atol: float,
            max_steps: int):
    direction = 1.0 if t1 >= t0 else -1.0
    span = abs(t1 - t0)
    h0 = direction * span / 50.0

    def rk_step(x, t, h):
        ks = []
        for i in range(7):
            xi = x
            for j, a in enumerate(_DP_A[i]):
                xi = xi + h * a * ks[j]
            ks.append(fn(xi, t + float(_DP_C[i]) * h))
        x5 = x
        x4 = x
        for i in range(7):
            x5 = x5 + h * float(_DP_B5[i]) * ks[i]
            x4 = x4 + h * float(_DP_B4[i]) * ks[i]
        return x5, x5 - x4

    def err_norm(e, x, x_new):
        scale = atol + rtol * jnp.maximum(jnp.abs(x), jnp.abs(x_new))
        return jnp.sqrt(jnp.mean((e / scale) ** 2))

    def cond(state):
        x, t, h, n = state
        return (direction * (t1 - t) > 1e-8) & (n < max_steps)

    def body(state):
        x, t, h, n = state
        # clamp the step to not overshoot t1
        h = direction * jnp.minimum(jnp.abs(h), jnp.abs(t1 - t))
        x_new, e = rk_step(x, t, h)
        en = err_norm(e, x, x_new)
        accept = en <= 1.0
        # standard order-5 controller with safety factor
        factor = jnp.clip(0.9 * en ** (-0.2), 0.2, 5.0)
        h_next = h * factor
        x = jnp.where(accept, x_new, x)
        t = jnp.where(accept, t + h, t)
        return (x, t, h_next, n + 1)

    x, t, _, n = jax.lax.while_loop(
        cond, body,
        (x0, jnp.asarray(t0, x0.dtype), jnp.asarray(h0, x0.dtype),
         jnp.asarray(0, jnp.int32)))
    return x


def odeint(
    fn: Callable[[jax.Array, jax.Array], jax.Array],
    x0: jax.Array,
    t0: float = 1.0,
    t1: float = 0.0,
    *,
    method: str = "dopri5",
    steps: int = 50,
    rtol: float = 1e-5,
    atol: float = 1e-5,
    max_steps: int = 1000,
) -> jax.Array:
    """Integrate dx/dt = fn(x, t) from t0 to t1.

    method: 'euler' | 'heun2' | 'midpoint' (fixed ``steps``) or 'dopri5'
    (adaptive, embedded 5(4) error control) — the reference Sampler's ODE
    method set (hyvideo/diffusion/flow/transport.py:346-374).
    """
    if method == "dopri5":
        return _dopri5(fn, x0, float(t0), float(t1), rtol, atol, max_steps)
    return _fixed_step(fn, x0, float(t0), float(t1), steps, method)


def ode_sample(
    velocity_fn: Callable[[jax.Array, jax.Array], jax.Array],
    noise: jax.Array,
    *,
    method: str = "dopri5",
    steps: int = 50,
    rtol: float = 1e-5,
    atol: float = 1e-5,
) -> jax.Array:
    """Sample by integrating the reverse flow from σ=1 (noise) to σ=0.

    velocity_fn(x, sigma[B]) -> velocity (the flow-matching model output;
    on the reverse linear path dx/dσ = v, so sampling integrates x' = v
    from 1 down to 0 — ≙ Sampler.sample_ode, transport.py:346-374).
    """
    b = noise.shape[0]

    def fn(x, t):
        return velocity_fn(x, jnp.full((b,), t, noise.dtype))

    return odeint(fn, noise, 1.0, 0.0, method=method, steps=steps,
                  rtol=rtol, atol=atol)
