"""MVDT batched-masking parity: batch>1 must behave as per-sample runs.

Regression test for the per-sample RoPE gather (the keep-shuffle is drawn
per sample — reference wan23/modules/model.py:500-528 gathers freqs with each
sample's ids_keep at :776-800, so sample b's kept positions must rotate only
sample b's q/k).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yume_tpu.configs import DiTConfig
from yume_tpu.models.dit import WanDiT


@pytest.fixture(scope="module")
def mvdt_setup():
    cfg = DiTConfig(
        model_type="ti2v", in_dim=4, out_dim=4, dim=32, ffn_dim=64,
        freq_dim=16, text_dim=8, text_len=6, num_heads=2, num_layers=2,
        framepack=True, mvdt=True,
    )
    dit = WanDiT(cfg, dtype=jnp.float32)
    lfz = 2
    b, f, h, w = 2, 3 + lfz, 8, 8
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (b, f, h, w, cfg.in_dim))
    t = jnp.broadcast_to(jnp.linspace(0.0, 700.0, f)[None], (b, f))
    ctx = jax.random.normal(jax.random.fold_in(rng, 1), (b, cfg.text_len, cfg.text_dim))
    params = dit.init(jax.random.PRNGKey(1), x[:1], t[:1], ctx[:1],
                      packed=True, latent_frame_zero=lfz,
                      mvdt_rng=jax.random.PRNGKey(2), mvdt_keep=4)
    return dit, params, x, t, ctx, lfz


def _fwd(dit, params, x, t, ctx, lfz, noise, keep):
    return dit.apply(params, x, t, ctx, packed=True, latent_frame_zero=lfz,
                     mvdt_rng=noise, mvdt_keep=keep)


def test_mvdt_batch2_matches_per_sample(mvdt_setup):
    """out(batch=[xa,xb])[i] == out(batch=[xi]) with pinned per-sample
    shuffles — fails if any per-sample table (rope/modulation/restore) is
    gathered with sample 0's indices for every sample."""
    dit, params, x, t, ctx, lfz = mvdt_setup
    # token count of the packed sequence: probe via a cheap shape trick
    # (history 3 frames at 8x8 lat, tail 2 frames full res)
    l = None
    # derive L from a forward with noise=None? simpler: compute from plan
    from yume_tpu.models.dit import framepack_plan

    plan = framepack_plan(3)
    p = dit.cfg.patch_size[1]
    l_hist = sum(
        (ch.stop - ch.start)
        * ((8 + (-8) % (p * ch.scale * (4 if ch.double_f else 1)))
           // (p * ch.scale * (4 if ch.double_f else 1))) ** 2
        for ch in plan)
    l_tail = lfz * (8 // p) ** 2
    l = l_hist + l_tail

    keep = l // 2
    noise = jax.random.uniform(jax.random.PRNGKey(7), (2, l))

    out_b2 = _fwd(dit, params, x, t, ctx, lfz, noise, keep)
    out_0 = _fwd(dit, params, x[:1], t[:1], ctx[:1], lfz, noise[:1], keep)
    out_1 = _fwd(dit, params, x[1:], t[1:], ctx[1:], lfz, noise[1:], keep)

    # distinct shuffles per sample (otherwise the test proves nothing)
    assert not np.array_equal(np.argsort(noise[0]), np.argsort(noise[1]))
    np.testing.assert_allclose(out_b2[0], out_0[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(out_b2[1], out_1[0], rtol=2e-4, atol=2e-4)


def test_mvdt_unpacked_batch2(mvdt_setup):
    dit, params, x, t, ctx, lfz = mvdt_setup
    b, f, h, w, _ = x.shape
    p = dit.cfg.patch_size[1]
    l = f * (h // p) * (w // p)
    keep = l // 2
    noise = jax.random.uniform(jax.random.PRNGKey(9), (2, l))
    out_b2 = dit.apply(params, x, t, ctx, packed=False, mvdt_rng=noise,
                       mvdt_keep=keep)
    out_1 = dit.apply(params, x[1:], t[1:], ctx[1:], packed=False,
                      mvdt_rng=noise[1:], mvdt_keep=keep)
    np.testing.assert_allclose(out_b2[1], out_1[0], rtol=2e-4, atol=2e-4)
