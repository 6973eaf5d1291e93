"""W8A8 int8-MXU matmul path (beyond-reference; ops/quant_matmul.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from yume_tpu.configs import DiTConfig
from yume_tpu.models.dit import QDense, WanDiT
from yume_tpu.ops.quant_matmul import Q8, int8_dot_general, q8_dot


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


def _q8(w):
    scale = jnp.abs(w).max(axis=0, keepdims=True) / 127.0
    return Q8(q=jnp.round(w / scale).astype(jnp.int8),
              scale=scale.astype(jnp.float32))


def test_q8_dot_direct_beats_requant_roundtrip():
    """q8_dot consumes the stored int8 weights directly; it must match the
    dequantized matmul at least as tightly as the old dequantize→requantize
    round-trip (which rounds the weights a second time)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((32, 128)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((128, 96)).astype(np.float32) * 0.05)
    q = _q8(w)
    w_dq = q.q.astype(jnp.float32) * q.scale
    exact = x @ w_dq  # the int8-storage trunk's reference semantics
    dims = (((1,), (0,)), ((), ()))
    direct = q8_dot(x, q, jnp.float32)
    roundtrip = int8_dot_general(x, w_dq, dims)
    e = np.asarray(exact)
    rel_direct = np.linalg.norm(np.asarray(direct) - e) / np.linalg.norm(e)
    rel_round = np.linalg.norm(np.asarray(roundtrip) - e) / np.linalg.norm(e)
    assert rel_direct < 0.02, rel_direct
    assert rel_direct <= rel_round * 1.05, (rel_direct, rel_round)


def test_qdense_consumes_q8_kernel_directly():
    """QDense with a Q8 kernel value must produce exactly q8_dot + bias
    (w8a8 direct) / the dequantized dense product (exact mode)."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))
    m = QDense(96, dtype=jnp.float32, w8a8=True)
    params = m.init(jax.random.PRNGKey(0), x)
    q = _q8(jnp.asarray(rng.standard_normal((128, 96)).astype(np.float32)))
    bias = jnp.asarray(rng.standard_normal((96,)).astype(np.float32))
    got = m.apply({"params": {"kernel": q, "bias": bias}}, x)
    want = q8_dot(x, q, jnp.float32) + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)
    # exact mode: dequantize, plain matmul
    m_exact = QDense(96, dtype=jnp.float32)
    got = m_exact.apply({"params": {"kernel": q, "bias": bias}}, x)
    want = x @ (q.q.astype(jnp.float32) * q.scale) + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    # param-compat with nn.Dense: same tree shapes/names
    import flax.linen as nn
    p_dense = nn.Dense(96).init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p_dense))


def test_w8a8_direct_trunk_close_to_dense():
    """int8-storage trunk + cfg.w8a8: Q8 kernels reach the MXU directly
    (models/quantized.py keeps Q8 leaves; QDense routes them to q8_dot)."""
    import dataclasses

    from yume_tpu.models.quantized import int8_dit_apply, quantize_dit_blocks

    cfg = DiTConfig(model_type="ti2v", in_dim=8, out_dim=8, dim=128,
                    ffn_dim=256, freq_dim=32, text_dim=16, num_heads=8,
                    num_layers=2, framepack=True)
    rng = np.random.default_rng(5)
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
    other, stacked = quantize_dit_blocks(params, cfg.num_layers, bits=8)

    dit_w = WanDiT(dataclasses.replace(cfg, w8a8=True), dtype=jnp.float32)
    out = int8_dit_apply(dit_w, other, stacked, x, t, ctx,
                         latent_frame_zero=2, attn_impl="xla")
    d = np.asarray(dense)
    rel = np.linalg.norm(np.asarray(out) - d) / np.linalg.norm(d)
    assert rel < 0.05, rel


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
