"""Adaptive TeaCache scheduling: the rel-L1-threshold refresh policy
(diffusion/samplers.py euler_sample_segment_cached_adaptive /
cfg_euler_sample_segment_cached_adaptive). The cache mechanism matches the
reference's residual reuse (wan/modules/model.py:977-998); the adaptive
schedule is this framework's own policy, so the tests pin its limiting
behaviors: threshold 0 ≡ every step full (= plain euler), threshold ∞ ≡
one full step, and the pipeline plumbing end-to-end."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from yume_tpu.configs import (CLIPConfig, CONFIGS, DiTConfig, PipelineConfig,
                              T5Config, VAEConfig)
from yume_tpu.diffusion import samplers
from yume_tpu.diffusion.schedule import sampling_sigmas


def _toy_denoise():
    """A nonlinear 'model' whose full/cached variants agree when the cache
    is fresh: full computes v = tanh(Wx) and caches the block residual;
    cached adds the stored residual instead of recomputing block 2."""
    w = jax.random.normal(jax.random.PRNGKey(0), (4, 4)) * 0.4

    def block1(x):
        return jnp.tanh(x @ w)

    def block2(x):
        return x + 0.5 * jnp.sin(x)

    def full(lat, t_frame):
        h = block1(lat + t_frame[..., None, None, None] / 1000.0)
        out = block2(h)
        return out, out - h  # cache block2's residual

    def cached(lat, t_frame, cache):
        h = block1(lat + t_frame[..., None, None, None] / 1000.0)
        return h + cache

    return full, cached


def test_threshold_zero_matches_all_full():
    """threshold=0 refreshes on every step — identical to running the full
    model each step (the fixed-interval sampler with interval=1)."""
    full, cached = _toy_denoise()
    latent = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 4, 4, 4))
    sig = sampling_sigmas(6, 3.0)

    want = samplers.euler_sample_segment_cached(
        full, cached, latent, sig, 2, cache_interval=1)
    got, n_full = samplers.euler_sample_segment_cached_adaptive(
        full, cached, latent, sig, 2, threshold=0.0)
    assert int(n_full) == 6
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_threshold_inf_runs_one_full_step():
    full, cached = _toy_denoise()
    latent = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 4, 4, 4))
    sig = sampling_sigmas(6, 3.0)
    got, n_full = samplers.euler_sample_segment_cached_adaptive(
        full, cached, latent, sig, 2, threshold=1e9)
    assert int(n_full) == 1
    assert np.isfinite(np.asarray(got)).all()


def test_threshold_monotone_in_full_steps():
    """Lower thresholds must spend at least as many full steps."""
    full, cached = _toy_denoise()
    latent = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 4, 4, 4))
    sig = sampling_sigmas(12, 3.0)
    counts = []
    for th in (0.0, 0.05, 0.3, 1e9):
        _, n_full = samplers.euler_sample_segment_cached_adaptive(
            full, cached, latent, sig, 2, threshold=th)
        counts.append(int(n_full))
    assert counts == sorted(counts, reverse=True), counts
    assert counts[0] == 12 and counts[-1] == 1


def test_cfg_adaptive_threshold_zero_matches_all_full():
    full, cached = _toy_denoise()

    def cfull(lat, t, ctx):
        return full(lat + 0.01 * ctx.sum(), t)

    def ccached(lat, t, ctx, cache):
        return cached(lat + 0.01 * ctx.sum(), t, cache)

    latent = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 4, 4, 4))
    noise = jax.random.normal(jax.random.PRNGKey(2), latent.shape)
    ctx = jnp.ones((1, 3, 2))
    sig = sampling_sigmas(5, 3.0)

    want = samplers.cfg_euler_sample_segment_cached(
        cfull, ccached, latent, noise, ctx, 0.5 * ctx, sig, 2, 4.0,
        cache_interval=1)
    got, n_full = samplers.cfg_euler_sample_segment_cached_adaptive(
        cfull, ccached, latent, noise, ctx, 0.5 * ctx, sig, 2, 4.0,
        threshold=0.0)
    assert int(n_full) == 5
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def _tiny_ti2v():
    cfg = CONFIGS["ti2v-5B"]()
    cfg = dataclasses.replace(
        cfg,
        dit=DiTConfig(model_type="ti2v", in_dim=8, out_dim=8, dim=64,
                      ffn_dim=128, freq_dim=32, text_dim=16, text_len=16,
                      num_heads=4, num_layers=4, framepack=True),
        vae=VAEConfig(z_dim=8, base_dim=8, dim_mult=(1, 2, 2),
                      num_res_blocks=1, temporal_downsample=(True, False),
                      stride=(2, 8, 8), patchify=2),
        t5=T5Config(vocab_size=128, dim=16, dim_attn=16, dim_ffn=24,
                    num_heads=2, num_layers=1, text_len=16),
        latent_frame_zero=2,
    )
    from yume_tpu.pipelines.ti2v import TI2VPipeline

    return TI2VPipeline.from_config(cfg, jax.random.PRNGKey(0),
                                    latent_shape=(3, 4, 4),
                                    dtype=jnp.float32)


def test_pipeline_adaptive_teacache_end_to_end():
    """--teacache --teacache_threshold plumbing: generate_segment with a
    threshold runs the adaptive sampler; threshold 0 equals the plain euler
    trajectory (every step full ⇒ cache never used)."""
    pipe = _tiny_ti2v()
    latent = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 4, 4, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16))

    want = pipe.generate_segment(latent, ctx, steps=4, shift=3.0, seed=0)
    got = pipe.generate_segment(latent, ctx, steps=4, shift=3.0, seed=0,
                                sampler="teacache", teacache_threshold=0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    mid = pipe.generate_segment(latent, ctx, steps=4, shift=3.0, seed=0,
                                sampler="teacache", teacache_threshold=0.2)
    assert np.isfinite(np.asarray(mid)).all()


def test_pipeline_adaptive_teacache_i2v():
    cfg = PipelineConfig(
        name="tiny-i2v",
        dit=DiTConfig(model_type="i2v", in_dim=8 + 2 + 8, out_dim=8, dim=64,
                      ffn_dim=128, freq_dim=32, text_dim=16, text_len=16,
                      num_heads=4, num_layers=2, framepack=True,
                      image_context_len=5),
        vae=VAEConfig(z_dim=8, base_dim=8, dim_mult=(1, 2, 2),
                      num_res_blocks=1, temporal_downsample=(True, False),
                      stride=(2, 8, 8), patchify=2, arch="wan22"),
        t5=T5Config(vocab_size=64, dim=16, dim_attn=16, dim_ffn=24,
                    num_heads=2, num_layers=1, text_len=16),
        clip=CLIPConfig(image_size=28, patch_size=14, dim=32, num_heads=2,
                        num_layers=3, out_tokens=5),
        latent_frame_zero=2,
        sample_shift=3.0,
    )
    from yume_tpu.pipelines.i2v import I2VPipeline

    pipe = I2VPipeline.from_config(cfg, jax.random.PRNGKey(0), init_t5=True,
                                   init_clip=True, latent_shape=(3, 4, 4),
                                   dtype=jnp.float32)
    ids = jnp.zeros((1, 16), jnp.int32)
    ctx = pipe.encode_text(ids, jnp.ones_like(ids))
    img = jnp.zeros((1, 1, 32, 32, 3))
    latents, video = pipe.generate(img, ctx, ctx, frame_num=5, steps=4,
                                   sampler="teacache",
                                   teacache_threshold=0.15)
    assert np.isfinite(np.asarray(video)).all()
