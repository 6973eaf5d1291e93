"""ODE integrator correctness (hyvideo/diffusion/flow/integrators.py
equivalents): exact on analytically solvable fields, adaptive dopri5 beats
fixed Euler at equal-ish cost."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yume_tpu.diffusion.integrators import ode_sample, odeint

TARGET = jnp.asarray(
    np.random.default_rng(3).standard_normal((1, 2, 4, 4, 3)).astype(np.float32))


def marginal_velocity(x, sigma):
    s = sigma.reshape(sigma.shape + (1,) * (x.ndim - 1))
    return (x - TARGET) / jnp.maximum(s, 1e-6)


@pytest.mark.parametrize("method,steps,tol", [
    ("euler", 400, 3e-2),
    ("dopri5", 0, 2e-2),
])
def test_ode_converges_to_target(method, steps, tol):
    # the single-point marginal field is singular at σ→0: only methods
    # whose final stage doesn't evaluate at the right endpoint see it
    # cleanly (euler), plus the adaptive solver which shrinks into it
    noise = jax.random.normal(jax.random.PRNGKey(0), TARGET.shape)
    out = ode_sample(marginal_velocity, noise, method=method, steps=steps,
                     rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(TARGET), atol=tol)


@pytest.mark.parametrize("method", ["heun2", "midpoint"])
def test_fixed_higher_order_on_smooth_field(method):
    """x' = -x/2 over σ 1→0 has exact solution x(0) = x(1)·e^{1/2}."""
    noise = jax.random.normal(jax.random.PRNGKey(1), (1, 8))
    out = ode_sample(lambda x, s: -0.5 * x, noise, method=method, steps=40)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(noise) * np.exp(0.5), rtol=1e-3)


def test_dopri5_exponential_decay_exact():
    """x' = -x from t=0..1 → x(1) = x0·e^{-1}, solved to controller tol."""
    x0 = jnp.ones((4,)) * 2.0
    out = odeint(lambda x, t: -x, x0, 0.0, 1.0, method="dopri5",
                 rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(out), 2.0 * np.exp(-1.0),
                               rtol=1e-6)


def test_dopri5_jits():
    x0 = jnp.ones((8,))
    f = jax.jit(lambda x: odeint(lambda y, t: -0.5 * y, x, 0.0, 2.0,
                                 method="dopri5"))
    np.testing.assert_allclose(np.asarray(f(x0)), np.exp(-1.0), rtol=1e-4)


def test_heun_second_order_accuracy():
    """Heun's global error should shrink ~4× when steps double."""
    x0 = jnp.ones((4,))
    exact = float(np.exp(-1.0))

    def err(steps):
        out = odeint(lambda x, t: -x, x0, 0.0, 1.0, method="heun2",
                     steps=steps)
        return abs(float(out[0]) - exact)

    e1, e2 = err(10), err(20)
    assert e2 < e1 / 3.0, (e1, e2)
