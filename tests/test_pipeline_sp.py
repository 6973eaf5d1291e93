"""Pipeline-level multi-chip serving: generate_segment with a mesh set must
equal the meshless pipeline (sequence-parallel trunk behind the same
public API — ≙ the reference's use_usp flag in WanT2V/Yume,
wan/text2video.py:87-97)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yume_tpu.configs import CONFIGS, DiTConfig, T5Config, VAEConfig
from yume_tpu.parallel.mesh import make_mesh, make_usp_mesh
from yume_tpu.pipelines.ti2v import TI2VPipeline

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _tiny_pipe():
    cfg = CONFIGS["ti2v-5B"]()
    cfg = dataclasses.replace(
        cfg,
        dit=DiTConfig(model_type="ti2v", in_dim=8, out_dim=8, dim=64,
                      ffn_dim=128, freq_dim=32, text_dim=16, text_len=16,
                      num_heads=8, num_layers=2, framepack=True),
        vae=VAEConfig(z_dim=8, base_dim=8, dim_mult=(1, 2, 2),
                      num_res_blocks=1, temporal_downsample=(True, False),
                      stride=(2, 8, 8), patchify=2),
        t5=T5Config(vocab_size=128, dim=16, dim_attn=16, dim_ffn=24,
                    num_heads=2, num_layers=1, text_len=16),
        latent_frame_zero=2,
    )
    return TI2VPipeline.from_config(cfg, jax.random.PRNGKey(0),
                                    latent_shape=(3, 4, 4),
                                    dtype=jnp.float32)


@pytest.mark.parametrize("kind,mesh_fn", [
    ("ulysses", lambda: make_mesh(data=1, fsdp=1, sp=8)),
    ("usp", lambda: make_usp_mesh(data=1, fsdp=1, sp_u=2, sp_r=4)),
])
def test_generate_segment_sp_matches_dense(kind, mesh_fn):
    pipe = _tiny_pipe()
    lfz = pipe.config.latent_frame_zero
    latent = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 4, 4, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16))

    pipe.attn_impl = "xla"
    want = pipe.generate_segment(latent, ctx, steps=2, shift=3.0, seed=0)

    pipe.mesh = mesh_fn()
    pipe.sp_kind = kind
    got = pipe.generate_segment(latent, ctx, steps=2, shift=3.0, seed=0)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-4, rtol=5e-4)


def test_sp_mesh_refuses_samplers_that_bypass_the_sp_trunk():
    """With a mesh set, samplers whose denoise closure uses the dense
    dit.apply (tts/sde/time_travel) must refuse loudly instead of
    silently degrading to single-program execution."""
    pipe = _tiny_pipe()
    latent = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 4, 4, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16))
    pipe.mesh = make_mesh(data=1, fsdp=1, sp=8)
    pipe.sp_kind = "ulysses"
    for sampler in ("sde", "time_travel", "tts"):
        with pytest.raises(NotImplementedError, match="SP serving"):
            pipe.generate_segment(latent, ctx, steps=2, sampler=sampler)


def test_sp_mesh_refuses_int8_storage_trunk():
    """int8/int4 STORAGE trunks (quantize_int8) are single-chip; with a
    mesh set the pipeline must refuse instead of silently running the
    single-program quantized scan (w8a8 is the SP-compatible quant mode)."""
    pipe = _tiny_pipe()
    latent = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 4, 4, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16))
    pipe.quantize_int8()
    pipe.mesh = make_mesh(data=1, fsdp=1, sp=8)
    with pytest.raises(NotImplementedError, match="single-chip"):
        pipe.generate_segment(latent, ctx, steps=2)


@pytest.mark.parametrize("w8a8", [False, True])
def test_generate_segment_sp_teacache_matches_dense(w8a8):
    """--sp 8 --teacache (+ --w8a8): the SP TeaCache trajectory (token-
    sharded residual cache) must equal the single-chip one (≙ the reference
    running its cached model under FSDP sharding,
    fastvideo/sample/sample.py:979-985)."""
    pipe = _tiny_pipe()
    if w8a8:
        cfg = pipe.config
        cfg = dataclasses.replace(cfg, dit=dataclasses.replace(cfg.dit,
                                                               w8a8=True))
        pipe = TI2VPipeline.from_config(cfg, jax.random.PRNGKey(0),
                                        latent_shape=(3, 4, 4),
                                        dtype=jnp.float32)
    latent = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 4, 4, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16))

    pipe.attn_impl = "xla"
    want = pipe.generate_segment(latent, ctx, steps=4, shift=3.0, seed=0,
                                 sampler="teacache", teacache_interval=2)

    pipe.mesh = make_mesh(data=1, fsdp=1, sp=8)
    pipe.sp_kind = "ulysses"
    got = pipe.generate_segment(latent, ctx, steps=4, shift=3.0, seed=0,
                                sampler="teacache", teacache_interval=2)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-4, rtol=5e-4)


def test_i2v_generate_sp_teacache_matches_dense():
    """14B CFG TeaCache under the SP mesh equals the single-chip trajectory
    (cond + uncond caches both token-sharded)."""
    from yume_tpu.configs import CLIPConfig, PipelineConfig
    from yume_tpu.pipelines.i2v import I2VPipeline

    cfg = PipelineConfig(
        name="tiny-i2v",
        dit=DiTConfig(model_type="i2v", in_dim=8 + 2 + 8, out_dim=8, dim=64,
                      ffn_dim=128, freq_dim=32, text_dim=16, text_len=16,
                      num_heads=8, num_layers=2, framepack=True,
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
    pipe = I2VPipeline.from_config(cfg, jax.random.PRNGKey(0), init_t5=True,
                                   init_clip=True, latent_shape=(3, 4, 4),
                                   dtype=jnp.float32)
    ids = jnp.zeros((1, 16), jnp.int32)
    ctx = pipe.encode_text(ids, jnp.ones_like(ids))
    img = jnp.zeros((1, 1, 32, 32, 3))

    pipe.attn_impl = "xla"
    want, _ = pipe.generate(img, ctx, ctx, frame_num=5, steps=4,
                            sampler="teacache", teacache_interval=2)

    pipe.mesh = make_mesh(data=1, fsdp=1, sp=8)
    pipe.sp_kind = "ulysses"
    got, _ = pipe.generate(img, ctx, ctx, frame_num=5, steps=4,
                           sampler="teacache", teacache_interval=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-4, rtol=5e-4)


def test_teacache_interval_validated():
    pipe = _tiny_pipe()
    latent = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 4, 4, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16))
    for bad in (0, -1):
        with pytest.raises(ValueError, match="teacache_interval"):
            pipe.generate_segment(latent, ctx, steps=2, sampler="teacache",
                                  teacache_interval=bad)


def test_generate_segment_pp_matches_dense():
    """Pipeline-parallel trunk behind the same public API (the bf16
    multi-chip route: weights 1/S per chip)."""
    pipe = _tiny_pipe()
    lfz = pipe.config.latent_frame_zero
    latent = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 4, 4, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16))

    pipe.attn_impl = "xla"
    want = pipe.generate_segment(latent, ctx, steps=2, shift=3.0, seed=0)

    pipe.parallelize_pp(2)
    got = pipe.generate_segment(latent, ctx, steps=2, shift=3.0, seed=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-4, rtol=5e-4)
