"""Pallas-kernel-vs-XLA-oracle parity on the real chip (SURVEY §4: the TPU
test tier — kernel regressions caught by the suite, not only by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def _rand(key, shape, dtype=jnp.bfloat16):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32).astype(dtype)


def test_flash_attention_fwd_matches_xla():
    from yume_tpu.ops.attention import xla_attention
    from yume_tpu.ops.flash_attention import flash_attention

    b, l, n, d = 1, 512, 4, 128
    q, k, v = (_rand(i, (b, l, n, d)) for i in range(3))
    got = jax.jit(flash_attention)(q, k, v)
    want = xla_attention(q, k, v)
    # bf16 inputs, fp32 accumulation in both paths
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2)


def test_flash_attention_kv_len_mask():
    from yume_tpu.ops.attention import xla_attention
    from yume_tpu.ops.flash_attention import flash_attention

    b, l, n, d = 1, 512, 4, 128
    q, k, v = (_rand(10 + i, (b, l, n, d)) for i in range(3))
    kv_len = jnp.asarray([384], jnp.int32)
    got = jax.jit(lambda q, k, v: flash_attention(q, k, v, kv_len=kv_len))(q, k, v)
    want = xla_attention(q, k, v, kv_len=kv_len)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2)


def test_flash_attention_bwd_matches_xla():
    from yume_tpu.ops.attention import xla_attention
    from yume_tpu.ops.flash_attention import flash_attention

    b, l, n, d = 1, 256, 4, 128
    q, k, v = (_rand(20 + i, (b, l, n, d), jnp.float32) for i in range(3))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v).astype(jnp.float32) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v).astype(jnp.float32) ** 2)

    g1 = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    g2 = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-2, rtol=5e-2)


def test_bias_act_matches_ref_impl():
    from yume_tpu.ops.bias_act import bias_act

    x = _rand(30, (64, 384), jnp.float32)
    b = _rand(31, (384,), jnp.float32)
    got = jax.jit(lambda x, b: bias_act(x, b, act="lrelu", gain=1.4,
                                        clamp=2.0))(x, b)
    want = jnp.clip(jax.nn.leaky_relu(x + b, 0.2) * 1.4, -2.0, 2.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_single_step_pipeline_smoke_on_chip():
    """Tiny 5B-architecture segment step compiles and runs finite on the
    chip (bf16, Pallas attention auto-dispatch)."""
    from yume_tpu.configs import DiTConfig
    from yume_tpu.models.dit import WanDiT

    cfg = DiTConfig(model_type="ti2v", in_dim=8, out_dim=8, dim=256,
                    ffn_dim=512, freq_dim=64, text_dim=32, text_len=32,
                    num_heads=2, num_layers=2, framepack=True)
    dit = WanDiT(cfg, dtype=jnp.bfloat16)
    lfz = 2
    x = _rand(40, (1, 3 + lfz, 16, 16, cfg.in_dim))
    t = jnp.zeros((1, 3 + lfz)).at[:, -lfz:].set(600.0)
    ctx = _rand(41, (1, cfg.text_len, cfg.text_dim))
    params = dit.init(jax.random.PRNGKey(0), x, t, ctx, packed=True,
                      latent_frame_zero=lfz)
    out = jax.jit(lambda p, x, t, c: dit.apply(
        p, x, t, c, packed=True, latent_frame_zero=lfz))(params, x, t, ctx)
    assert out.shape == (1, lfz, 16, 16, cfg.out_dim)
    assert np.isfinite(float(jnp.sum(out.astype(jnp.float32))))


def test_quantized_trunk_on_chip_matches_bf16():
    """int4 scan trunk + TeaCache delta cache + W8A8 MXU matmuls run ON THE
    CHIP and stay within quantization error of the bf16 forward (the CPU
    suite proves exact math; this proves the real-TPU lowering)."""
    import dataclasses

    from yume_tpu.configs import DiTConfig
    from yume_tpu.models.dit import WanDiT
    from yume_tpu.models.quantized import int8_dit_apply, quantize_dit_blocks

    cfg = DiTConfig(model_type="ti2v", in_dim=8, out_dim=8, dim=256,
                    ffn_dim=512, freq_dim=64, text_dim=32, text_len=32,
                    num_heads=2, num_layers=2, framepack=True)
    dit = WanDiT(cfg, dtype=jnp.bfloat16)
    lfz = 2
    x = _rand(50, (1, 3 + lfz, 16, 16, cfg.in_dim))
    t = jnp.zeros((1, 3 + lfz)).at[:, -lfz:].set(600.0)
    ctx = _rand(51, (1, cfg.text_len, cfg.text_dim))
    params = dit.init(jax.random.PRNGKey(0), x, t, ctx, packed=True,
                      latent_frame_zero=lfz)
    hk = params["params"]["head"]["head"]["kernel"]
    params["params"]["head"]["head"]["kernel"] = (
        jax.random.normal(jax.random.PRNGKey(7), hk.shape, hk.dtype) * 0.02)

    dense = jax.jit(lambda p: dit.apply(
        p, x, t, ctx, packed=True, latent_frame_zero=lfz))(params)
    d = np.asarray(dense, np.float32)

    other, stacked = quantize_dit_blocks(params, cfg.num_layers, bits=4)
    out4, cache = jax.jit(lambda o, s: int8_dit_apply(
        dit, o, s, x, t, ctx, latent_frame_zero=lfz,
        return_cache=True))(other, stacked)
    rel = np.linalg.norm(np.asarray(out4, np.float32) - d) / np.linalg.norm(d)
    assert rel < 0.15, rel

    cached = jax.jit(lambda o, s, c: int8_dit_apply(
        dit, o, s, x, t, ctx, latent_frame_zero=lfz,
        block_cache=c))(other, stacked, cache)
    rel_c = np.linalg.norm(np.asarray(cached, np.float32) - d) / np.linalg.norm(d)
    assert rel_c < 0.2, rel_c

    dit_q = WanDiT(dataclasses.replace(cfg, w8a8=True), dtype=jnp.bfloat16)
    w8 = jax.jit(lambda p: dit_q.apply(
        p, x, t, ctx, packed=True, latent_frame_zero=lfz))(params)
    rel_w = np.linalg.norm(np.asarray(w8, np.float32) - d) / np.linalg.norm(d)
    assert rel_w < 0.1, rel_w
