"""Int8 trunk: scan-over-layers parity and quantization accuracy."""

import jax
import jax.numpy as jnp
import numpy as np

from yume_tpu.configs import DiTConfig
from yume_tpu.models.dit import WanDiT
from yume_tpu.models.quantized import (Q8, int8_dit_apply, quantize_dit_blocks,
                                       quantized_bytes)


def _setup(rng_np, dim, ffn_dim, heads):
    cfg = DiTConfig(model_type="ti2v", in_dim=8, out_dim=8, dim=dim,
                    ffn_dim=ffn_dim, freq_dim=32, text_dim=16,
                    num_heads=heads, num_layers=3, framepack=True)
    dit = WanDiT(cfg, dtype=jnp.float32)
    x = jnp.asarray(rng_np.standard_normal((1, 5, 8, 8, 8)).astype(np.float32))
    t = jnp.zeros((1, 5)).at[:, -2:].set(600.0)
    ctx = jnp.asarray(rng_np.standard_normal((1, 16, 16)).astype(np.float32))
    params = dit.init(jax.random.PRNGKey(0), x, t, ctx, packed=True,
                      latent_frame_zero=2)
    # the head kernel zero-initializes → outputs would be trivially equal
    hk = params["params"]["head"]["head"]["kernel"]
    params["params"]["head"]["head"]["kernel"] = (
        jax.random.normal(jax.random.PRNGKey(7), hk.shape, hk.dtype) * 0.02)
    dense = dit.apply(params, x, t, ctx, packed=True, latent_frame_zero=2,
                      attn_impl="xla")
    return cfg, dit, params, x, t, ctx, dense


def test_scan_trunk_matches_loop_exactly(rng_np):
    """With dims below the quantization threshold nothing quantizes, so the
    scanned trunk must reproduce the python-loop trunk to fp32 noise."""
    cfg, dit, params, x, t, ctx, dense = _setup(rng_np, 64, 96, 8)
    other, stacked = quantize_dit_blocks(params, cfg.num_layers)
    assert not any(isinstance(l, Q8) for l in jax.tree_util.tree_leaves(
        stacked, is_leaf=lambda l: isinstance(l, Q8)))
    out = int8_dit_apply(dit, other, stacked, x, t, ctx, latent_frame_zero=2,
                         attn_impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                               atol=1e-5, rtol=1e-5)


def test_int8_trunk_close_to_dense(rng_np):
    """At quantizable dims the int8 trunk stays within ~3% relative L2 of
    the bf16/fp32 forward and halves the trunk bytes."""
    cfg, dit, params, x, t, ctx, dense = _setup(rng_np, 128, 256, 8)
    other, stacked = quantize_dit_blocks(params, cfg.num_layers)
    q_leaves = [l for l in jax.tree_util.tree_leaves(
        stacked, is_leaf=lambda l: isinstance(l, Q8)) if isinstance(l, Q8)]
    assert q_leaves and q_leaves[0].q.dtype == jnp.int8

    out = int8_dit_apply(dit, other, stacked, x, t, ctx, latent_frame_zero=2,
                         attn_impl="xla")
    d = np.asarray(dense)
    rel = np.linalg.norm(np.asarray(out) - d) / np.linalg.norm(d)
    assert rel < 0.03, rel

    q8, bf16 = quantized_bytes(stacked)
    assert q8 < 0.6 * bf16  # ≈½ for kernel-dominated trunks


def test_int8_apply_jits(rng_np):
    cfg, dit, params, x, t, ctx, _ = _setup(rng_np, 128, 256, 8)
    other, stacked = quantize_dit_blocks(params, cfg.num_layers)
    fn = jax.jit(lambda o, s, x, t, c: int8_dit_apply(
        dit, o, s, x, t, c, latent_frame_zero=2, attn_impl="xla"))
    out = fn(other, stacked, x, t, ctx)
    assert np.isfinite(np.asarray(out)).all()


def test_int4_trunk_close_to_dense(rng_np):
    """Grouped int4 stays within ~8% relative L2 and quarters the bytes."""
    cfg, dit, params, x, t, ctx, dense = _setup(rng_np, 128, 256, 8)
    other, stacked = quantize_dit_blocks(params, cfg.num_layers, bits=4)
    from yume_tpu.models.quantized import Q4
    q_leaves = [l for l in jax.tree_util.tree_leaves(
        stacked, is_leaf=lambda l: isinstance(l, Q4)) if isinstance(l, Q4)]
    assert q_leaves and q_leaves[0].q.dtype == jnp.uint8

    out = int8_dit_apply(dit, other, stacked, x, t, ctx, latent_frame_zero=2,
                         attn_impl="xla")
    d = np.asarray(dense)
    rel = np.linalg.norm(np.asarray(out) - d) / np.linalg.norm(d)
    assert rel < 0.08, rel

    q4, bf16 = quantized_bytes(stacked)
    assert q4 < 0.35 * bf16


def test_int4_pack_roundtrip(rng_np):
    """Nibble pack/unpack is exact for values already on the int4 grid."""
    from yume_tpu.models.quantized import (_dequantize_leaf, _quantize_leaf4)
    scale = 0.013
    w = (rng_np.integers(-7, 8, (256, 128)) * scale).astype(np.float32)
    q = _quantize_leaf4(jnp.asarray(w), group=128)
    back = np.asarray(_dequantize_leaf(q, jnp.float32))
    np.testing.assert_allclose(back, w, atol=1e-6)


def test_unpacked_quantized_matches_loop(rng_np):
    """packed=False (t2v first segment) on the scanned trunk == the dense
    unpacked forward (sub-quantization dims → exact)."""
    cfg, dit, params, x, t, ctx, _ = _setup(rng_np, 64, 96, 8)
    other, stacked = quantize_dit_blocks(params, cfg.num_layers)
    dense = dit.apply(params, x, t, ctx, packed=False, attn_impl="xla")
    out = int8_dit_apply(dit, other, stacked, x, t, ctx, packed=False,
                         attn_impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                               atol=1e-5, rtol=1e-5)


def test_teacache_delta_cache_exact(rng_np):
    """full pass with return_cache, then a cached pass on the SAME input,
    must reproduce the plain forward exactly (delta = middle-chunk x_out −
    x_in is an identity substitution at equal inputs)."""
    cfg, dit, params, x, t, ctx, dense = _setup(rng_np, 64, 96, 8)
    other, stacked = quantize_dit_blocks(params, cfg.num_layers)
    out_full, cache = int8_dit_apply(dit, other, stacked, x, t, ctx,
                                     latent_frame_zero=2, attn_impl="xla",
                                     return_cache=True)
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(dense),
                               atol=1e-5, rtol=1e-5)
    assert cache is not None and cache.ndim == 3  # [B, L, dim] token delta
    out_cached = int8_dit_apply(dit, other, stacked, x, t, ctx,
                                latent_frame_zero=2, attn_impl="xla",
                                block_cache=cache)
    # bf16 cache storage bounds the reuse error
    np.testing.assert_allclose(np.asarray(out_cached), np.asarray(dense),
                               atol=2e-2, rtol=2e-2)


def test_pipelined_dequant_matches(rng_np):
    cfg, dit, params, x, t, ctx, dense = _setup(rng_np, 64, 96, 8)
    other, stacked = quantize_dit_blocks(params, cfg.num_layers)
    out = int8_dit_apply(dit, other, stacked, x, t, ctx, latent_frame_zero=2,
                         attn_impl="xla", pipelined=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                               atol=1e-5, rtol=1e-5)


def test_pipelined_composes_with_delta_cache(rng_np):
    """pipelined dequant and the TeaCache delta path share the single-scan
    body (counter-gated inject/capture) — the composition must stay exact."""
    cfg, dit, params, x, t, ctx, dense = _setup(rng_np, 64, 96, 8)
    other, stacked = quantize_dit_blocks(params, cfg.num_layers)
    out_full, cache = int8_dit_apply(dit, other, stacked, x, t, ctx,
                                     latent_frame_zero=2, attn_impl="xla",
                                     return_cache=True, pipelined=True)
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(dense),
                               atol=1e-5, rtol=1e-5)
    out_cached = int8_dit_apply(dit, other, stacked, x, t, ctx,
                                latent_frame_zero=2, attn_impl="xla",
                                block_cache=cache, pipelined=True)
    np.testing.assert_allclose(np.asarray(out_cached), np.asarray(dense),
                               atol=2e-2, rtol=2e-2)


def test_quantize_host_blocks_matches_device_path(rng_np):
    """Streamed host→device quantization (the single-chip 14B loader) must
    produce the same stacked trunk as quantize_dit_blocks."""
    import numpy as np_

    from yume_tpu.models.quantized import quantize_host_blocks

    cfg, dit, params, x, t, ctx, dense = _setup(rng_np, 128, 256, 8)
    host = jax.tree_util.tree_map(lambda l: np_.asarray(l, np_.float32),
                                  params)
    other_h, stacked_h = quantize_host_blocks(host, cfg.num_layers, bits=4)
    out = int8_dit_apply(dit, other_h, stacked_h, x, t, ctx,
                         latent_frame_zero=2, attn_impl="xla")
    d = np_.asarray(dense)
    rel = np_.linalg.norm(np_.asarray(out) - d) / np_.linalg.norm(d)
    assert rel < 0.12, rel  # bf16 cast + int4 storage error only


def test_multistep_on_quantized_trunk(rng_np):
    """UniPC/DPM++ solvers on the quantized (stack-only, bits=16) trunk
    reproduce the bf16-trunk trajectory exactly — the 14B quality-serving
    path (UniPC at 8-16 steps instead of 50 Euler) over the single-scan
    trunk (reference wan/utils/fm_solvers_unipc.py driven by
    wan23/textimage2video.py:583-610)."""
    import dataclasses

    from yume_tpu.configs import (CONFIGS, T5Config, VAEConfig)
    from yume_tpu.pipelines.ti2v import TI2VPipeline

    cfg = CONFIGS["ti2v-5B"]()
    cfg = dataclasses.replace(
        cfg,
        dit=DiTConfig(model_type="ti2v", in_dim=8, out_dim=8, dim=64,
                      ffn_dim=128, freq_dim=32, text_dim=16, text_len=16,
                      num_heads=4, num_layers=2, framepack=True),
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
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16))
    ctx_null = 0.5 * ctx
    for solver in ("unipc", "dpmpp"):
        want = pipe.generate_t2v(ctx, ctx_null=ctx_null, size=(32, 32),
                                 frame_num=5, steps=4, solver=solver,
                                 seed=0, return_latents=True)
        qpipe = TI2VPipeline.from_config(cfg, jax.random.PRNGKey(0),
                                         latent_shape=(3, 4, 4),
                                         dtype=jnp.float32)
        qpipe.quantize_int8(bits=16)  # stack-only: exact scan parity
        assert isinstance(qpipe.dit_params, tuple)
        got = qpipe.generate_t2v(ctx, ctx_null=ctx_null, size=(32, 32),
                                 frame_num=5, steps=4, solver=solver,
                                 seed=0, return_latents=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=2e-4)

    # int8 quantization: same trajectory within weight-quant noise
    qpipe = TI2VPipeline.from_config(cfg, jax.random.PRNGKey(0),
                                     latent_shape=(3, 4, 4),
                                     dtype=jnp.float32)
    qpipe.quantize_int8(bits=8)
    got = qpipe.generate_t2v(ctx, ctx_null=ctx_null, size=(32, 32),
                             frame_num=5, steps=4, solver="unipc",
                             seed=0, return_latents=True)
    assert np.isfinite(np.asarray(got)).all()


def test_q4_dot_matches_group_dequant(rng_np):
    """The W4A8 path (q4_dot = Q4→Q8 relay + s8 dot) ≈ dequantize-then-
    matmul within activation + weight-regrid noise; the regrid noise alone
    is bounded by half an int8 step of the channel grid (~25 dB below the
    int4 step); and q4_dot is EXACT vs the relayed-int8 weights when
    activations quantize losslessly."""
    from yume_tpu.models.quantized import _quantize_leaf4
    from yume_tpu.ops.quant_matmul import (q4_dequant, q4_dot, q4_to_q8,
                                           q8_dequant)

    w = rng_np.standard_normal((256, 128)).astype(np.float32) * 0.1
    q4 = _quantize_leaf4(jnp.asarray(w), group=128)
    x = jnp.asarray(rng_np.standard_normal((2, 16, 256)).astype(np.float32))

    want = x @ q4_dequant(q4, jnp.float32)
    got = q4_dot(x, q4, jnp.float32)
    err = np.abs(np.asarray(got) - np.asarray(want)).max()
    ref = np.abs(np.asarray(want)).max()
    assert err < 0.02 * ref, (err, ref)

    # weight-regrid noise bound: |relay(w) − w| ≤ ½ int8 step of the
    # channel grid = 4·max_g scale_g / 127 (q4_to_q8 docstring)
    w4 = np.asarray(q4_dequant(q4, jnp.float32))
    w8 = np.asarray(q8_dequant(q4_to_q8(q4), jnp.float32))
    bound = np.asarray(q4.scale).max(axis=0) * 4.0 / 127.0 + 1e-7
    assert (np.abs(w8 - w4) <= bound[None, :]).all()

    # exact case vs the relayed weights: activations that quantize
    # losslessly make the s8 composition exact
    a_scale = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    x_exact = jnp.round(x / a_scale) * a_scale
    got_e = q4_dot(x_exact, q4, jnp.float32)
    want_e = x_exact @ jnp.asarray(w8)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                               atol=1e-4, rtol=1e-4)


def test_int4_w8a8_trunk_close_to_dense(rng_np):
    """int4 storage + w8a8 (= W4A8 direct in-kernel unpack) stays within
    quantization distance of the bf16 dense forward — the 14B single-chip
    serving trunk with no bf16 dequant round-trip."""
    import dataclasses

    cfg, dit, params, x, t, ctx, dense = _setup(rng_np, 256, 384, 4)
    other, stacked = quantize_dit_blocks(params, cfg.num_layers, bits=4)
    dit_w = WanDiT(dataclasses.replace(cfg, w8a8=True), dtype=jnp.float32)
    out = int8_dit_apply(dit_w, other, stacked, x, t, ctx,
                         latent_frame_zero=2, attn_impl="xla")
    err = np.abs(np.asarray(out) - np.asarray(dense)).max()
    ref = np.abs(np.asarray(dense)).max() + 1e-6
    assert np.isfinite(np.asarray(out)).all()
    assert err < 0.35 * ref, (err, ref)

    # and the plain int4 (dequant) trunk agrees with the W4A8 one within
    # activation-quant noise
    out_dq = int8_dit_apply(dit, other, stacked, x, t, ctx,
                            latent_frame_zero=2, attn_impl="xla")
    rel = (np.abs(np.asarray(out) - np.asarray(out_dq)).max()
           / (np.abs(np.asarray(out_dq)).max() + 1e-6))
    assert rel < 0.25, rel
