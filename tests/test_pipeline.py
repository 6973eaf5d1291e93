"""End-to-end TI2V pipeline smoke tests (tiny shapes, random weights)."""

import jax
import jax.numpy as jnp
import numpy as np

from yume_tpu.configs import DiTConfig, PipelineConfig, T5Config, VAEConfig
from yume_tpu.pipelines.ti2v import TI2VPipeline

TINY = PipelineConfig(
    name="tiny",
    dit=DiTConfig(model_type="ti2v", in_dim=8, out_dim=8, dim=64, ffn_dim=128,
                  freq_dim=32, text_dim=16, text_len=16, num_heads=4,
                  num_layers=2, framepack=True),
    vae=VAEConfig(z_dim=8, base_dim=8, dim_mult=(1, 2, 2), num_res_blocks=1,
                  temporal_downsample=(True, False), stride=(2, 8, 8), patchify=2),
    t5=T5Config(vocab_size=64, dim=16, dim_attn=16, dim_ffn=24, num_heads=2,
                num_layers=1, text_len=16),
    latent_frame_zero=2,
    sample_shift=5.0,
)


def _pipe():
    return TI2VPipeline.from_config(
        TINY, jax.random.PRNGKey(0), init_t5=True, latent_shape=(3, 4, 4),
        dtype=jnp.float32,
    )


def test_t2v_end_to_end():
    pipe = _pipe()
    ids = jnp.zeros((1, 16), jnp.int32)
    ctx = pipe.encode_text(ids, jnp.ones_like(ids))
    assert ctx.shape == (1, 16, 16)
    video = pipe.generate_t2v(ctx, size=(32, 32), frame_num=5, steps=2)
    # stride (2,8,8): 5 frames → 3 latent → decode back to 5
    assert video.shape == (1, 5, 32, 32, 3)
    assert np.isfinite(np.asarray(video)).all()


def test_autoregressive_rollout():
    pipe = _pipe()
    ids = jnp.zeros((1, 16), jnp.int32)
    ctx = pipe.encode_text(ids, jnp.ones_like(ids))
    first = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 4, 4, 8))
    latents, videos = pipe.generate_long([ctx, ctx], first, steps=2)
    assert latents.shape == (1, 3 + 2 * TINY.latent_frame_zero, 4, 4, 8)
    assert len(videos) == 2
    for v in videos:
        assert np.isfinite(np.asarray(v)).all()


def test_image_conditioning():
    pipe = _pipe()
    img = jnp.zeros((1, 1, 32, 32, 3))
    z, mask2 = pipe.encode_image_conditioning(img, frame_num=5)
    assert z.shape == (1, 3, 4, 4, 8)
    np.testing.assert_allclose(np.asarray(mask2[0, -2:]), 1.0)
    np.testing.assert_allclose(np.asarray(mask2[0, :1]), 0.0)


def test_int8_segment_matches_bf16():
    """quantize_int8() must leave the segment sampler working and (at tiny,
    sub-threshold dims where nothing actually quantizes) exactly equal."""
    pipe = _pipe()
    ids = jnp.zeros((1, 16), jnp.int32)
    ctx = pipe.encode_text(ids, jnp.ones_like(ids))
    hist = jax.random.normal(jax.random.PRNGKey(5), (1, 3, 4, 4, 8))
    want = pipe.generate_segment(hist, ctx, steps=2)
    pipe.quantize_int8()
    assert isinstance(pipe.dit_params, tuple)
    got = pipe.generate_segment(hist, ctx, steps=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    # quantized t2v (euler, unpacked trunk) now works — sub-threshold dims
    # ⇒ exactly equals the bf16 path
    video = pipe.generate_t2v(ctx, size=(32, 32), frame_num=5, steps=2)
    assert np.isfinite(np.asarray(video)).all()
    # quantized TeaCache composes via the delta cache
    got_tc = pipe.generate_segment(hist, ctx, steps=2, sampler="teacache")
    assert np.isfinite(np.asarray(got_tc)).all()
    # multistep solvers route through the quantized trunk (round-5: the
    # UniPC/DPM++ model calls share the single-scan trunk — VERDICT r4 #5)
    video_u = pipe.generate_t2v(ctx, size=(32, 32), frame_num=5, steps=2,
                                solver="unipc", ctx_null=ctx)
    assert np.isfinite(np.asarray(video_u)).all()
    # unsupported paths still fail loudly, not wrongly
    import pytest

    with pytest.raises(NotImplementedError):
        pipe.generate_segment(hist, ctx, steps=2, sampler="sde")


def test_t2v_multistep_solvers():
    """Stock Wan2.1-style t2v loop: UniPC / DPM++ with CFG."""
    pipe = _pipe()
    ids = jnp.zeros((1, 16), jnp.int32)
    ctx = pipe.encode_text(ids, jnp.ones_like(ids))
    ctx_null = pipe.encode_text(ids + 1, jnp.ones_like(ids))
    for solver in ("unipc", "unipc3", "dpmpp"):
        video = pipe.generate_t2v(ctx, size=(32, 32), frame_num=5, steps=2,
                                  solver=solver, ctx_null=ctx_null,
                                  guide_scale=3.0)
        assert video.shape == (1, 5, 32, 32, 3)
        assert np.isfinite(np.asarray(video)).all()


def test_teacache_interval_plumbing():
    """--teacache_interval reaches the sampler: different intervals change
    which steps run the full DiT (full at i % N == 0), so at 4 steps the
    interval-2 and interval-3 trajectories must differ; interval >= steps
    degenerates to one full step + all-cached and still runs."""
    pipe = _pipe()

    # the zero-init head makes every sampler output v=0 identically — the
    # comparison would be vacuous (same fix as tests_tpu/test_quality_gate)
    def _randomize_head(path, leaf):
        names = [getattr(p, "key", "") for p in path]
        if "head" in names and names[-1] == "kernel":
            return jax.random.normal(jax.random.PRNGKey(7), leaf.shape,
                                     leaf.dtype) * 0.05
        return leaf

    pipe.dit_params = jax.tree_util.tree_map_with_path(
        _randomize_head, pipe.dit_params)
    ids = jnp.zeros((1, 16), jnp.int32)
    ctx = pipe.encode_text(ids, jnp.ones_like(ids))
    hist = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 4, 4, 8))
    ref = pipe.generate_segment(hist, ctx, steps=4, sampler="euler")
    tc2 = pipe.generate_segment(hist, ctx, steps=4, sampler="teacache",
                                teacache_interval=2)
    tc3 = pipe.generate_segment(hist, ctx, steps=4, sampler="teacache",
                                teacache_interval=3)
    tc9 = pipe.generate_segment(hist, ctx, steps=4, sampler="teacache",
                                teacache_interval=9)
    for out in (tc2, tc3, tc9):
        assert out.shape == ref.shape
        assert np.isfinite(np.asarray(out)).all()
    assert not np.allclose(np.asarray(tc2), np.asarray(tc3))
    # more cached steps ⇒ (usually) further from the dense trajectory;
    # strict monotonicity is not guaranteed for random weights + one seed,
    # so the gate is soft — it still catches interval plumbing regressions
    # (e.g. interval-9 accidentally running every step dense → err9 ≈ 0)
    err2 = float(np.mean((np.asarray(tc2) - np.asarray(ref)) ** 2))
    err9 = float(np.mean((np.asarray(tc9) - np.asarray(ref)) ** 2))
    assert err9 >= 0.5 * err2


def test_teacache_edge_plumbing():
    """--teacache_edge reaches the cache-list construction. On the 2-layer
    tiny model: edge=1 makes the cached list empty, so every step runs the
    full DiT and the trajectory must match plain euler; the default
    (edge=None -> n//4=0) caches BOTH blocks and must differ."""
    pipe = _pipe()

    def _randomize_head(path, leaf):
        names = [getattr(p, "key", "") for p in path]
        if "head" in names and names[-1] == "kernel":
            return jax.random.normal(jax.random.PRNGKey(7), leaf.shape,
                                     leaf.dtype) * 0.05
        return leaf

    pipe.dit_params = jax.tree_util.tree_map_with_path(
        _randomize_head, pipe.dit_params)
    ids = jnp.zeros((1, 16), jnp.int32)
    ctx = pipe.encode_text(ids, jnp.ones_like(ids))
    hist = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 4, 4, 8))
    ref = pipe.generate_segment(hist, ctx, steps=4, sampler="euler")
    tc_all_live = pipe.generate_segment(hist, ctx, steps=4,
                                        sampler="teacache",
                                        teacache_interval=2,
                                        teacache_edge=1)
    tc_default = pipe.generate_segment(hist, ctx, steps=4,
                                       sampler="teacache",
                                       teacache_interval=2)
    np.testing.assert_allclose(np.asarray(tc_all_live), np.asarray(ref),
                               atol=1e-4, rtol=1e-3)
    assert not np.allclose(np.asarray(tc_default), np.asarray(ref))
