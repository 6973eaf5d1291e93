"""Pipeline-parallel DiT forward vs the single-device packed forward
(beyond-reference; the torch reference scales only via FSDP/SP)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yume_tpu.configs import DiTConfig
from yume_tpu.models.dit import WanDiT
from yume_tpu.parallel.pipeline import (make_pp_mesh, pp_dit_apply,
                                        pp_stage_params)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

CFG = DiTConfig(model_type="ti2v", in_dim=8, out_dim=8, dim=64, ffn_dim=128,
                freq_dim=32, text_dim=16, num_heads=8, num_layers=4,
                framepack=True)


def _setup(b):
    dit = WanDiT(CFG, dtype=jnp.float32)
    lfz = 2
    x = jax.random.normal(jax.random.PRNGKey(0), (b, 5, 8, 8, CFG.in_dim))
    t = jnp.zeros((b, 5)).at[:, -lfz:].set(600.0)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (b, 16, CFG.text_dim))
    params = dit.init(jax.random.PRNGKey(2), x, t, ctx, packed=True,
                      latent_frame_zero=lfz)
    return dit, lfz, x, t, ctx, params


@pytest.mark.parametrize("pp,mb", [(2, 1), (2, 2), (4, 2), (4, 4)])
def test_pp_forward_matches_dense(pp, mb):
    dit, lfz, x, t, ctx, params = _setup(b=4)
    want = dit.apply(params, x, t, ctx, packed=True, latent_frame_zero=lfz,
                     attn_impl="xla")
    mesh = make_pp_mesh(pp)
    other, staged = pp_stage_params(params, CFG.num_layers, pp)
    got = pp_dit_apply(dit, other, staged, mesh, x, t, ctx,
                       latent_frame_zero=lfz, num_microbatches=mb,
                       attn_impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_pp_forward_batch1_inference():
    """b=1 degenerates to sequential stages — must still be exact."""
    dit, lfz, x, t, ctx, params = _setup(b=1)
    want = dit.apply(params, x, t, ctx, packed=True, latent_frame_zero=lfz,
                     attn_impl="xla")
    mesh = make_pp_mesh(4)
    other, staged = pp_stage_params(params, CFG.num_layers, 4)
    got = pp_dit_apply(dit, other, staged, mesh, x, t, ctx,
                       latent_frame_zero=lfz, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_pp_gradients_match_dense():
    """The tick loop (scan + ppermute + masked psum) must transpose
    correctly so pipeline stages can train."""
    dit, lfz, x, t, ctx, params = _setup(b=2)
    mesh = make_pp_mesh(2)
    other, staged = pp_stage_params(params, CFG.num_layers, 2)

    def loss_dense(p):
        out = dit.apply(p, x, t, ctx, packed=True, latent_frame_zero=lfz,
                        attn_impl="xla")
        return jnp.mean(out.astype(jnp.float32) ** 2)

    def loss_pp(o, s):
        out = pp_dit_apply(dit, o, s, mesh, x, t, ctx, latent_frame_zero=lfz,
                           num_microbatches=2, attn_impl="xla")
        return jnp.mean(out.astype(jnp.float32) ** 2)

    g_dense = jax.grad(loss_dense)(params)
    g_other, g_staged = jax.grad(loss_pp, argnums=(0, 1))(other, staged)

    # staged grads [S, N/S, ...] must equal the per-layer dense grads
    gd0 = g_dense["params"]["blocks_0"]
    gs0 = jax.tree_util.tree_map(lambda l: l[0, 0], g_staged)
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-4, rtol=2e-4),
        gd0, gs0)
    # non-block (embed/head) grads replicated path
    np.testing.assert_allclose(
        np.asarray(g_other["params"]["head"]["head"]["kernel"]),
        np.asarray(g_dense["params"]["head"]["head"]["kernel"]),
        atol=2e-4, rtol=2e-4)
