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
