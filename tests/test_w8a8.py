"""W8A8 int8-MXU matmul path (beyond-reference; ops/quant_matmul.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from yume_tpu.configs import DiTConfig
from yume_tpu.models.dit import WanDiT
from yume_tpu.ops.quant_matmul import int8_dot_general


def test_int8_dot_general_accuracy():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((128, 96)).astype(np.float32) * 0.05)
    dims = (((1,), (0,)), ((), ()))
    exact = jax.lax.dot_general(a, w, dims)
    quant = int8_dot_general(a, w, dims)
    rel = np.linalg.norm(np.asarray(quant - exact)) / np.linalg.norm(
        np.asarray(exact))
    assert rel < 0.02, rel
    assert quant.dtype == exact.dtype


def test_int8_dot_general_falls_back_off_pattern():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((4, 8, 16)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((4, 16, 8)).astype(np.float32))
    dims = (((2,), (1,)), ((0,), (0,)))  # batched — not the Dense pattern
    got = int8_dot_general(a, b, dims)
    want = jax.lax.dot_general(a, b, dims)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_w8a8_dit_forward_close_to_dense():
    import dataclasses

    cfg = DiTConfig(model_type="ti2v", in_dim=8, out_dim=8, dim=128,
                    ffn_dim=256, freq_dim=32, text_dim=16, num_heads=8,
                    num_layers=2, framepack=True)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 5, 8, 8, 8)).astype(np.float32))
    t = jnp.zeros((1, 5)).at[:, -2:].set(600.0)
    ctx = jnp.asarray(rng.standard_normal((1, 16, 16)).astype(np.float32))

    dit = WanDiT(cfg, dtype=jnp.float32)
    params = dit.init(jax.random.PRNGKey(0), x, t, ctx, packed=True,
                      latent_frame_zero=2)
    hk = params["params"]["head"]["head"]["kernel"]
    params["params"]["head"]["head"]["kernel"] = (
        jax.random.normal(jax.random.PRNGKey(7), hk.shape, hk.dtype) * 0.02)
    dense = dit.apply(params, x, t, ctx, packed=True, latent_frame_zero=2,
                      attn_impl="xla")

    dit_q = WanDiT(dataclasses.replace(cfg, w8a8=True), dtype=jnp.float32)
    quant = dit_q.apply(params, x, t, ctx, packed=True, latent_frame_zero=2,
                        attn_impl="xla")
    d = np.asarray(dense)
    rel = np.linalg.norm(np.asarray(quant) - d) / np.linalg.norm(d)
    assert rel < 0.05, rel
