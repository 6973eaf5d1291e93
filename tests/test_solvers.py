"""Solver correctness on an analytically-solvable flow.

For a Gaussian-to-point linear flow with exact velocity v(x, σ) = x0 − x1
where the model returns the TRUE velocity field of the straight path toward
a fixed target, every consistent ODE solver must land exactly on the
target. We use v(x, σ) = (x − x1)/σ (the marginal velocity field of a
single data point x1), whose exact solution from any x at σ=1 is x1 at σ=0.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yume_tpu.diffusion import samplers
from yume_tpu.diffusion.multistep import sample_dpmpp_2m, sample_unipc
from yume_tpu.diffusion.schedule import sampling_sigmas

TARGET = jnp.asarray(np.random.default_rng(7).standard_normal((1, 2, 4, 4, 3)).astype(np.float32))


def true_velocity(x, sigma):
    s = sigma.reshape(sigma.shape + (1,) * (x.ndim - 1))
    return (x - TARGET) / jnp.maximum(s, 1e-8)


def test_euler_converges_to_target():
    noise = jax.random.normal(jax.random.PRNGKey(0), TARGET.shape)
    sig = sampling_sigmas(200, 1.0)

    def denoise(x, t_frame):
        return true_velocity(x, t_frame[:, -1] / 1000.0)

    out = samplers.euler_sample(denoise, noise, sig)
    np.testing.assert_allclose(np.asarray(out), np.asarray(TARGET), atol=3e-2)


@pytest.mark.parametrize("solver", [sample_dpmpp_2m, sample_unipc])
def test_multistep_exact_on_point_flow(solver):
    # data-prediction-based solvers are exact for this field at ANY step
    # count: x0_pred = x - sigma * (x - x1)/sigma = x1.
    noise = jax.random.normal(jax.random.PRNGKey(1), TARGET.shape)
    sig = sampling_sigmas(8, 3.0)
    out = solver(lambda x, s: true_velocity(x, s), noise, sig)
    np.testing.assert_allclose(np.asarray(out), np.asarray(TARGET), atol=1e-4)


@pytest.mark.parametrize("solver", [sample_dpmpp_2m, sample_unipc])
def test_multistep_matches_euler_on_linear_field(solver):
    # linear velocity field v = -x/2: solvers should roughly agree with a
    # fine-grained Euler solution
    noise = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 4, 4, 3))

    def v(x, s):
        return -0.5 * x

    sig_fine = sampling_sigmas(400, 1.0)

    def denoise(x, t_frame):
        return v(x, None)

    ref = samplers.euler_sample(denoise, noise, sig_fine)
    got = solver(v, noise, sampling_sigmas(25, 1.0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-3, rtol=2e-2)


def test_dual_model_sampler_exact_on_point_flow():
    from yume_tpu.diffusion.samplers import dual_model_euler_sample

    noise = jax.random.normal(jax.random.PRNGKey(3), TARGET.shape)
    sig = sampling_sigmas(200, 1.0)

    def denoise(x, t_frame):
        return true_velocity(x, t_frame[:, -1] / 1000.0)

    out = dual_model_euler_sample(denoise, denoise, noise, sig, boundary=0.9)
    np.testing.assert_allclose(np.asarray(out), np.asarray(TARGET), atol=3e-2)
