"""Expert-parallel dual-model forward vs dense single-expert forward
(EP layer-streaming for the Wan2.2 dual-expert MoE, wan/image2video.py:
104-204 noise-boundary switching)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yume_tpu.configs import DiTConfig
from yume_tpu.models.dit import WanDiT
from yume_tpu.parallel.expert import (ep_dit_apply, ep_stack_experts,
                                      make_ep_mesh)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs 2 (virtual) devices"
)

CFG = DiTConfig(model_type="ti2v", in_dim=8, out_dim=8, dim=64, ffn_dim=128,
                freq_dim=32, text_dim=16, num_heads=8, num_layers=2,
                framepack=True)


@pytest.mark.parametrize("expert", [0, 1])
def test_ep_forward_matches_dense(expert):
    dit = WanDiT(CFG, dtype=jnp.float32)
    lfz = 2
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 8, 8, CFG.in_dim))
    t = jnp.zeros((1, 5)).at[:, -lfz:].set(600.0)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 16, CFG.text_dim))
    p_low = dit.init(jax.random.PRNGKey(2), x, t, ctx, packed=True,
                     latent_frame_zero=lfz)
    p_high = dit.init(jax.random.PRNGKey(3), x, t, ctx, packed=True,
                      latent_frame_zero=lfz)

    dense = dit.apply([p_low, p_high][expert], x, t, ctx, packed=True,
                      latent_frame_zero=lfz, attn_impl="xla")

    mesh = make_ep_mesh()
    others, ep_blocks = ep_stack_experts(p_low, p_high, CFG.num_layers)
    got = ep_dit_apply(dit, others, ep_blocks, mesh, expert, x, t, ctx,
                       latent_frame_zero=lfz, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(dense),
                               atol=2e-4, rtol=2e-4)


def test_dual_expert_ep_pipeline_matches_dense():
    """generate_t2v_dual with EPParams (each group stores one expert) must
    equal the two-params dense dual sampler."""
    import dataclasses

    from yume_tpu.configs import CONFIGS, T5Config, VAEConfig
    from yume_tpu.parallel.expert import prepare_ep
    from yume_tpu.pipelines.ti2v import TI2VPipeline

    cfg = CONFIGS["ti2v-5B"]()
    cfg = dataclasses.replace(
        cfg,
        dit=CFG,
        vae=VAEConfig(z_dim=8, base_dim=8, dim_mult=(1, 2, 2),
                      num_res_blocks=1, temporal_downsample=(True, False),
                      stride=(2, 8, 8), patchify=2),
        t5=T5Config(vocab_size=128, dim=16, dim_attn=16, dim_ffn=24,
                    num_heads=2, num_layers=1, text_len=16),
        latent_frame_zero=2,
    )
    pipe = TI2VPipeline.from_config(cfg, jax.random.PRNGKey(0),
                                    latent_shape=(3, 4, 4),
                                    dtype=jnp.float32)
    pipe.attn_impl = "xla"
    p_high = pipe.dit_params
    p_low = pipe.dit.init(jax.random.PRNGKey(9),
                          jnp.zeros((1, 3, 4, 4, CFG.in_dim)),
                          jnp.zeros((1, 3)),
                          jnp.zeros((1, 16, CFG.text_dim)), packed=False)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 16, CFG.text_dim))

    want = pipe.generate_t2v_dual(ctx, p_high, p_low, size=(32, 32),
                                  frame_num=5, steps=4, seed=1)
    ep = prepare_ep(p_high, p_low, CFG.num_layers)
    got = pipe.generate_t2v_dual(ctx, ep, None, size=(32, 32),
                                 frame_num=5, steps=4, seed=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-4, rtol=5e-4)
