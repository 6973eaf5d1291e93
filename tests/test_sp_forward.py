"""Sequence-parallel DiT forward vs the single-device packed forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yume_tpu.configs import DiTConfig
from yume_tpu.models.dit import WanDiT
from yume_tpu.parallel.mesh import make_mesh
from yume_tpu.parallel.sp_forward import sp_dit_apply

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

CFG = DiTConfig(model_type="ti2v", in_dim=8, out_dim=8, dim=64, ffn_dim=128,
                freq_dim=32, text_dim=16, num_heads=8, num_layers=2,
                framepack=True)


@pytest.mark.parametrize("kind", ["ulysses", "ring"])
def test_sp_forward_matches_dense(kind):
    mesh = make_mesh(data=1, fsdp=1, sp=8)
    dit = WanDiT(CFG, dtype=jnp.float32)
    lfz = 2
    # history 3 + tail 2 at 8x8: plan [1x(1), 2x(pad→1x1=... ), ...]; token
    # count need not divide 8 — sp_dit_apply pads and masks (ulysses)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 8, 8, CFG.in_dim))
    t = jnp.zeros((1, 5)).at[:, -lfz:].set(600.0)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 16, CFG.text_dim))
    params = dit.init(jax.random.PRNGKey(2), x, t, ctx, packed=True,
                      latent_frame_zero=lfz)
    want = dit.apply(params, x, t, ctx, packed=True, latent_frame_zero=lfz,
                     attn_impl="xla")
    got = sp_dit_apply(dit, params, mesh, x, t, ctx, latent_frame_zero=lfz,
                       kind=kind)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("kind", ["ulysses", "ring"])
def test_sp_attention_masks_padding(kind):
    """Zero-pad keys (L not divisible by sp) must not be attended — the
    sharded attention with kv_len must equal dense attention over the true
    length (regression: the non-flash Ulysses fallback used to drop kv_len)."""
    from yume_tpu.ops.attention import xla_attention
    from yume_tpu.parallel.ulysses import sp_shard_map_attention

    mesh = make_mesh(data=1, fsdp=1, sp=8)
    b, l_true, n, d = 2, 21, 8, 16
    l_pad = 24
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (b, l_pad, n, d))
    # pads are *not* zero — the mask alone must exclude them
    kv_len = jnp.full((b,), l_true, jnp.int32)

    got = sp_shard_map_attention(mesh, kind, impl="xla", kv_len=kv_len)(q, q, q)
    want = xla_attention(q[:, :l_true], q[:, :l_true], q[:, :l_true])
    np.testing.assert_allclose(np.asarray(got[:, :l_true]), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("u,r", [(2, 4), (4, 2), (8, 1), (1, 8)])
def test_usp_hybrid_matches_dense(u, r):
    """Ulysses×ring hybrid over a 2D sp mesh == dense attention (the
    reference delegates this composition to xfuser,
    wan/distributed/xdit_context_parallel.py:179)."""
    from yume_tpu.ops.attention import xla_attention
    from yume_tpu.parallel.mesh import make_usp_mesh
    from yume_tpu.parallel.ulysses import usp_shard_map_attention

    mesh = make_usp_mesh(data=1, fsdp=1, sp_u=u, sp_r=r)
    b, l, n, d = 2, 32, 8, 16
    rng = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(jax.random.fold_in(rng, i), (b, l, n, d))
               for i in range(3))
    got = usp_shard_map_attention(mesh)(q, k, v)
    want = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_usp_hybrid_kv_len_masking():
    from yume_tpu.ops.attention import xla_attention
    from yume_tpu.parallel.mesh import make_usp_mesh
    from yume_tpu.parallel.ulysses import usp_shard_map_attention

    mesh = make_usp_mesh(data=1, fsdp=1, sp_u=2, sp_r=4)
    b, l_true, l_pad, n, d = 2, 27, 32, 8, 16
    q = jax.random.normal(jax.random.PRNGKey(1), (b, l_pad, n, d))
    kv_len = jnp.full((b,), l_true, jnp.int32)
    got = usp_shard_map_attention(mesh, kv_len=kv_len)(q, q, q)
    want = xla_attention(q[:, :l_true], q[:, :l_true], q[:, :l_true])
    np.testing.assert_allclose(np.asarray(got[:, :l_true]), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_sp_forward_usp_matches_dense():
    """Full DiT trunk sharded over the 2D usp mesh == dense forward."""
    from yume_tpu.parallel.mesh import make_usp_mesh

    mesh = make_usp_mesh(data=1, fsdp=1, sp_u=2, sp_r=4)
    dit = WanDiT(CFG, dtype=jnp.float32)
    lfz = 2
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 8, 8, CFG.in_dim))
    t = jnp.zeros((1, 5)).at[:, -lfz:].set(600.0)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 16, CFG.text_dim))
    params = dit.init(jax.random.PRNGKey(2), x, t, ctx, packed=True,
                      latent_frame_zero=lfz)
    want = dit.apply(params, x, t, ctx, packed=True, latent_frame_zero=lfz,
                     attn_impl="xla")
    got = sp_dit_apply(dit, params, mesh, x, t, ctx, latent_frame_zero=lfz,
                       kind="usp")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)
