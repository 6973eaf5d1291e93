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
    dit.apply (tts/sde/time_travel/teacache) must refuse loudly instead of
    silently degrading to single-program execution."""
    pipe = _tiny_pipe()
    latent = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 4, 4, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16))
    pipe.mesh = make_mesh(data=1, fsdp=1, sp=8)
    pipe.sp_kind = "ulysses"
    for sampler in ("sde", "time_travel", "tts", "teacache"):
        with pytest.raises(NotImplementedError, match="SP serving"):
            pipe.generate_segment(latent, ctx, steps=2, sampler=sampler)


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
