"""Schedule + transport math tests (closed forms)."""

import jax
import jax.numpy as jnp
import numpy as np

from yume_tpu.diffusion.schedule import sampling_sigmas, shift_t, unshift_t
from yume_tpu.diffusion.transport import Transport
from yume_tpu.utils.masks import best_output_size, masks_like, per_frame_timesteps


def test_shift_roundtrip():
    t = np.linspace(0.01, 0.99, 17)
    np.testing.assert_allclose(unshift_t(shift_t(t, 3.0), 3.0), t, atol=1e-7)


def test_sampling_sigmas_reference_formula():
    # reference wan/utils/fm_solvers.py:22-27
    steps, shift = 50, 7.0
    sig = sampling_sigmas(steps, shift, append_zero=False)
    want = np.linspace(1, 0, steps + 1)[:steps]
    want = shift * want / (1 + (shift - 1) * want)
    np.testing.assert_allclose(sig, want, atol=1e-6)
    full = sampling_sigmas(steps, shift)
    assert full.shape == (steps + 1,)
    assert full[0] == 1.0 and full[-1] == 0.0
    assert np.all(np.diff(full) < 0)


def test_plan_endpoints():
    x1 = jnp.ones((2, 3, 4))
    x0 = jnp.zeros((2, 3, 4))
    xt, ut = Transport.plan(jnp.array([0.0, 1.0]), x0, x1)
    np.testing.assert_allclose(xt[0], 1.0)  # t=0 → data
    np.testing.assert_allclose(xt[1], 0.0)  # t=1 → noise
    np.testing.assert_allclose(ut, -1.0)  # x0 - x1


def test_sample_t_distribution():
    tr = Transport(shift=3.0)
    t = tr.sample_t(jax.random.PRNGKey(0), 4096)
    assert float(t.min()) > 0 and float(t.max()) < 1
    # shift=3 pushes mass toward 1: median of sigmoid(N) is 0.5 → shifted 0.75
    med = float(jnp.median(t))
    assert 0.70 < med < 0.80


def test_score_from_velocity_consistency():
    # For xt = (1-t)x1 + t x0, v = x0 - x1: score = -x0 / ... actually
    # score of N((1-t)x1, t^2 I) at xt is -(xt-(1-t)x1)/t^2 = -x0/t.
    rng = np.random.default_rng(1)
    x1 = rng.standard_normal((2, 5)).astype(np.float32)
    x0 = rng.standard_normal((2, 5)).astype(np.float32)
    t = jnp.array([0.3, 0.8])
    xt, v = Transport.plan(t, jnp.asarray(x0), jnp.asarray(x1))
    score = Transport.score_from_velocity(v, xt, t)
    want = -x0 / np.array([0.3, 0.8])[:, None]
    np.testing.assert_allclose(score, want, rtol=1e-5, atol=1e-5)


def test_loss_tail_frames_only():
    tr = Transport()
    v = jnp.zeros((1, 10, 2, 2, 3))
    ut = jnp.concatenate(
        [jnp.full((1, 2, 2, 2, 3), 100.0), jnp.ones((1, 8, 2, 2, 3))], axis=1
    )
    loss = tr.loss(v, ut, tail_frames=8)
    np.testing.assert_allclose(loss, 1.0)


def test_masks_like_inference():
    m1, m2 = masks_like((1, 10, 4, 4, 3), zero=True, latent_frame_zero=3)
    np.testing.assert_allclose(m1, m2)
    np.testing.assert_allclose(m2[0, :7], 0.0)
    np.testing.assert_allclose(m2[0, 7:], 1.0)


def test_masks_like_training_noise():
    # with rng, mask1 history is either 0 or a small positive constant
    vals = set()
    for seed in range(20):
        m1, m2 = masks_like(
            (1, 6, 2, 2, 1), zero=True, rng=jax.random.PRNGKey(seed), p=0.5,
            latent_frame_zero=2,
        )
        np.testing.assert_allclose(m2[0, :4], 0.0)
        np.testing.assert_allclose(m1[0, 4:], 1.0)
        vals.add(round(float(m1[0, 0, 0, 0, 0]), 6))
    assert 0.0 in vals and any(v > 0 for v in vals)
    assert all(v < 0.35 for v in vals)  # exp(-3.5 ± 3σ) stays small


def test_per_frame_timesteps():
    mask2 = jnp.zeros((1, 5))
    ts = per_frame_timesteps(mask2, jnp.array([0.7]), latent_frame_zero=2)
    np.testing.assert_allclose(ts[0], [0, 0, 0, 0.7, 0.7])


def test_best_output_size():
    ow, oh = best_output_size(1280, 704, 32, 32, 704 * 1280)
    assert ow % 32 == 0 and oh % 32 == 0
    assert ow * oh <= 704 * 1280
