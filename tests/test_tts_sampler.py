"""TTS time-travel sampler parity vs a verbatim transcription of the
reference loop (fastvideo/sample/sample_tts.py:690-854): CFG Euler with
per-step history re-noise, lookahead rollout, splice-back, SDE churn."""

import jax
import jax.numpy as jnp
import numpy as np

from yume_tpu.diffusion import samplers
from yume_tpu.diffusion.schedule import sampling_sigmas

B, F, H, W, C = 1, 5, 4, 4, 3
LFZ = 2


def _fake_model(latent, sigma, bias):
    """Deterministic stand-in for the CFG transformer calls: a smooth
    function of (latent, σ, context-bias) over all frames."""
    return np.tanh(0.3 * latent + 0.1 * sigma + bias).astype(np.float32)


def _reference_loop(model_input, noise, sig, guide, interval, travel_steps,
                    sde=False, eta=0.3, rng=None):
    """Direct numpy transcription of sample_tts.py:690-854 (sample_step = S,
    ladder sig of length S+1 with sig[S] = 0 standing in for the reference's
    explicit `0` branches)."""
    S = len(sig) - 1
    hist = model_input[:, :F - LFZ]

    def cfg(lat, s):
        c = _fake_model(lat, s, 0.2)
        u = _fake_model(lat, s, -0.1)
        return u + guide * (c - u)

    def churn(tail_new, lat_tail, v_tail, s_i, s_n, rng, final=False):
        rng, eps_rng = jax.random.split(rng)
        pred_x0 = lat_tail + (0.0 - s_i) * v_tail
        delta_t = 0.0 if final else max(s_i - s_n, 0.0)
        dsigma = s_n - s_i
        std = eta * np.sqrt(delta_t)
        score = -(lat_tail - pred_x0 * (1.0 - s_i)) / (s_i ** 2)
        mean = tail_new + (-0.5 * eta ** 2 * score) * dsigma
        eps = np.asarray(jax.random.normal(eps_rng, tail_new.shape))
        return mean + std * eps, rng

    def renoise(idx):
        s = sig[min(S - 1, idx)]
        return noise[:, :F - LFZ] * s + (1 - s) * hist

    latent = np.concatenate([renoise(0), noise[:, F - LFZ:]], axis=1)
    for i in range(S):
        v = cfg(latent, sig[i])
        temp_x0 = latent[:, -LFZ:] + (sig[i + 1] - sig[i]) * v[:, -LFZ:]
        if sde:
            temp_x0, rng = churn(temp_x0, latent[:, -LFZ:], v[:, -LFZ:],
                                 sig[i], sig[i + 1], rng, final=(i + 1 == S))
        if interval > 0 and i % interval == 0:
            travel_stop = min(S - 1, i + travel_steps)
            lat_tr = np.concatenate([renoise(travel_stop), temp_x0], axis=1)
            current_pred = None
            for j in range(i + 1, travel_stop):
                v_tr = cfg(lat_tr, sig[j])
                x0_tr = lat_tr[:, -LFZ:] + (sig[j + 1] - sig[j]) * v_tr[:, -LFZ:]
                if sde:
                    x0_tr, rng = churn(x0_tr, lat_tr[:, -LFZ:],
                                       v_tr[:, -LFZ:], sig[j], sig[j + 1], rng)
                lat_tr = np.concatenate([renoise(j + 1), x0_tr], axis=1)
                current_pred = v_tr
            if current_pred is not None:
                temp_x0 = latent[:, -LFZ:] + \
                    (sig[i + 1] - sig[i]) * current_pred[:, -LFZ:]
        latent = np.concatenate([renoise(i + 1), temp_x0], axis=1)
    return latent


def _run_ours(model_input, noise, sig, guide, interval, travel_steps,
              sde=False, rng=None):
    def denoise(lat, t_frame, ctx):
        sigma = t_frame[0, -1] / 1000.0
        bias = ctx[0, 0, 0]
        return jnp.tanh(0.3 * lat + 0.1 * sigma + bias)

    ctx = jnp.full((B, 1, 1), 0.2)
    ctx_null = jnp.full((B, 1, 1), -0.1)
    return samplers.cfg_time_travel_sample_segment(
        denoise, jnp.asarray(model_input), jnp.asarray(noise), ctx, ctx_null,
        sig, LFZ, guide, interval=interval, travel_steps=travel_steps,
        sde=sde, rng=rng)


def _setup(seed=0):
    r = np.random.default_rng(seed)
    model_input = r.normal(size=(B, F, H, W, C)).astype(np.float32)
    noise = r.normal(size=(B, F, H, W, C)).astype(np.float32)
    sig = sampling_sigmas(8, 3.0)
    return model_input, noise, sig


def test_time_travel_matches_reference_loop():
    model_input, noise, sig = _setup()
    for interval, tsteps in ((2, 2), (3, 3), (0, 2)):
        want = _reference_loop(model_input, noise, sig, 5.0, interval, tsteps)
        got = _run_ours(model_input, noise, sig, 5.0, interval, tsteps)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-5)


def test_time_travel_sde_matches_reference_loop():
    """SDE churn inside outer+travel loops: identical jax PRNG split
    discipline in the oracle ⇒ exact trajectory match."""
    model_input, noise, sig = _setup(1)
    rng = jax.random.PRNGKey(42)
    want = _reference_loop(model_input, noise, sig, 5.0, 2, 2, sde=True,
                           rng=rng)
    got = _run_ours(model_input, noise, sig, 5.0, 2, 2, sde=True, rng=rng)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_frozen_history_time_travel_splices_lookahead():
    """5B-style variant: the travelled step must equal redoing step i with
    the lookahead velocity (NOT an average)."""
    model_input, noise, sig = _setup(2)

    calls = []

    def denoise(lat, t_frame):
        calls.append(np.asarray(t_frame[0, -1]))
        return jnp.tanh(0.3 * lat + 0.1 * t_frame[0, -1] / 1000.0)

    out = samplers.time_travel_sample_segment(
        denoise, jnp.asarray(model_input), sig, LFZ, interval=2,
        travel_steps=2)
    assert np.isfinite(np.asarray(out)).all()

    # manual first travelled step: v0 at sig0, lookahead v at sig1 on the
    # provisional state, then step 0 redone with the lookahead velocity
    lat = jnp.asarray(model_input)

    def v_at(lat, s):
        return jnp.tanh(0.3 * lat + 0.1 * s)

    v0 = v_at(lat, sig[0])
    prov_tail = lat[:, -LFZ:] + (sig[1] - sig[0]) * v0[:, -LFZ:]
    prov = jnp.concatenate([lat[:, :F - LFZ], prov_tail], axis=1)
    v_look = v_at(prov, sig[1])
    spliced_tail = lat[:, -LFZ:] + (sig[1] - sig[0]) * v_look[:, -LFZ:]

    # re-run with a single step to observe the post-step-0 state
    out1 = samplers.time_travel_sample_segment(
        denoise, jnp.asarray(model_input), sig[:2].tolist() + [0.0], LFZ,
        interval=2, travel_steps=2)
    # with a 2-sigma ladder [sig0, sig1, 0]: step0 travels (j=1), step1 plain
    # — verify step0's tail equals the splice, by re-deriving step1 from it
    v1 = v_at(jnp.concatenate([lat[:, :F - LFZ], spliced_tail], axis=1), sig[1])
    want_tail = spliced_tail + (0.0 - sig[1]) * v1[:, -LFZ:]
    np.testing.assert_allclose(np.asarray(out1[:, -LFZ:]),
                               np.asarray(want_tail), rtol=1e-5, atol=1e-5)
