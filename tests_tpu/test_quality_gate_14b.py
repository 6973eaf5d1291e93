"""14B full-width quality anchor (VERDICT r4 task 6).

The 14B serving modes (int4 storage, W4A8 direct, W8A8, TeaCache and the
compositions) were quality-gated only at dim-768 proxy scale, which the
round-4c full-scale anchor proved over-predicts cache fidelity by ~11 dB.
This anchor runs the REAL 14B width/depth (dim 5120, 40 layers, 40 heads,
ffn 13824 — random weights) through the CFG serving path at a reduced
540P-class grid.

A bf16 reference cannot exist here: 28 GB of bf16 weights don't fit the
16 GB chip — which is the entire reason these modes exist. The reference
trajectory is the **int8-storage trunk** (its weight-quant noise measured
~25 dB above the int4/cache errors at 5B scale, so it bounds them cleanly).

Assertions are regression pins at measured−4 dB (the measured table lives
in BASELINE.md round-5; pins below were set from the first on-chip run)
plus the structural claims (quant noise subdominant to cache error;
W4A8 ≈ int4).
"""

import dataclasses
import gc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu

STEPS = 12
F_TAIL = 9   # latent_frame_zero (denoised tail, production tail is also 9)
F_HIST = 3   # re-noised history prefix (production 540P runs 26)
F_LAT = F_TAIL + F_HIST
H, W = 20, 36


def _psnr(ref, got):
    rng_pp = float(ref.max() - ref.min())
    mse = float(np.mean((np.asarray(got, np.float32) - ref) ** 2))
    return 10.0 * np.log10(rng_pp ** 2 / max(mse, 1e-12))


def _free(tree):
    for leaf in jax.tree_util.tree_leaves(
            tree, is_leaf=lambda l: hasattr(l, "delete")):
        for a in ([leaf.q, leaf.scale] if hasattr(leaf, "q") else [leaf]):
            try:
                a.delete()
            except Exception:
                pass


def _rand_tree(shapes, seed):
    key = jax.random.PRNGKey(seed)
    return jax.tree_util.tree_map(
        lambda s: jax.random.normal(key, s.shape, jnp.bfloat16) * 0.02,
        shapes)


def _build_stack(block_shapes, num_layers, bits):
    """Per-layer seeded random bf16 block → quantize → leaf-wise stack
    (same deterministic bf16 values for bits=8 and bits=4, so the int8
    reference and the int4 trunks share underlying weights).

    Quantizes ON DEVICE one (layer, leaf) at a time but accumulates the
    int8/int4 pieces in HOST RAM and ships each stacked leaf to the chip
    once: peak device HBM = final stack + one transient leaf, instead of
    ~2× the stack (which OOMs the 16 GB chip at ~13 GB of 14B int8)."""
    from yume_tpu.models.quantized import _quantize_leaf, _quantize_leaf4

    qfn = _quantize_leaf if bits == 8 else _quantize_leaf4
    leaves, treedef = jax.tree_util.tree_flatten(block_shapes)
    stacked = []
    for s in leaves:
        host_parts, qtype = None, None
        for i in range(num_layers):
            # identical per-leaf values to _rand_tree(block_shapes, 1000+i)
            blk = jax.random.normal(jax.random.PRNGKey(1000 + i), s.shape,
                                    jnp.bfloat16) * 0.02
            q = qfn(blk)
            parts = [q.q, q.scale] if hasattr(q, "q") else [q]
            qtype = type(q) if hasattr(q, "q") else None
            if host_parts is None:
                host_parts = [[] for _ in parts]
            for j, a in enumerate(parts):
                host_parts[j].append(np.asarray(a))
            _free(blk)
            _free(q)
        dev = [jnp.asarray(np.stack(h)) for h in host_parts]
        for a in dev:
            _ = np.asarray(a.ravel()[:1])  # force the transfer
        stacked.append(qtype(q=dev[0], scale=dev[1]) if qtype else dev[0])
    return jax.tree_util.tree_unflatten(treedef, stacked)


def test_14b_fullwidth_serving_modes():
    from yume_tpu.configs import i2v_14b
    from yume_tpu.models.dit import WanDiT
    from yume_tpu.pipelines.i2v import I2VPipeline

    cfg = dataclasses.replace(i2v_14b(), latent_frame_zero=F_TAIL)
    dit = WanDiT(cfg.dit, dtype=jnp.bfloat16)
    dit_w = WanDiT(dataclasses.replace(cfg.dit, w8a8=True),
                   dtype=jnp.bfloat16)

    x_s = jnp.zeros((1, F_LAT, H, W, cfg.dit.in_dim), jnp.bfloat16)
    t_s = jnp.zeros((1, F_LAT))
    c_s = jnp.zeros((1, cfg.dit.text_len, cfg.dit.text_dim), jnp.bfloat16)
    clip_s = jnp.zeros((1, cfg.dit.image_context_len, cfg.dit.image_dim),
                       jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda k: dit.init(k, x_s, t_s, c_s, packed=True,
                           latent_frame_zero=F_TAIL, clip_context=clip_s),
        jax.random.PRNGKey(0))
    tree = shapes["params"]
    block_shapes = tree["blocks_0"]
    other = {"params": _rand_tree(
        {k: v for k, v in tree.items() if not k.startswith("blocks_")}, 7)}

    z = 16
    noise = jax.random.normal(jax.random.PRNGKey(1),
                              (1, F_LAT, H, W, z), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(2),
                          (1, F_LAT, H, W, cfg.dit.in_dim - z),
                          jnp.float32) * 0.5
    ctx = jax.random.normal(jax.random.PRNGKey(3),
                            (1, cfg.dit.text_len, cfg.dit.text_dim),
                            jnp.float32) * 0.2
    ctx_null = 0.3 * ctx
    clip_ctx = jax.random.normal(
        jax.random.PRNGKey(4),
        (1, cfg.dit.image_context_len, cfg.dit.image_dim), jnp.float32) * 0.2

    pipe = I2VPipeline(config=cfg, dit=dit, dit_params=None, vae=None,
                       vae_params=None)
    pipe_w = I2VPipeline(config=cfg, dit=dit_w, dit_params=None, vae=None,
                         vae_params=None)
    shift, gs = 3.0, 5.0
    results = {}

    # ---- int8 phase: reference + W8A8-direct + TeaCache modes ----------
    q8 = _build_stack(block_shapes, cfg.dit.num_layers, 8)
    params8 = (other, q8)
    ref = np.asarray(pipe._sample_cfg(params8, noise, y, ctx, ctx_null,
                                      clip_ctx, STEPS, shift, gs)[:, -F_TAIL:],
                     np.float32)
    assert np.isfinite(ref).all()

    got = pipe_w._sample_cfg(params8, noise, y, ctx, ctx_null, clip_ctx,
                             STEPS, shift, gs)
    results["w8a8_direct"] = _psnr(ref, np.asarray(got[:, -F_TAIL:]))

    got, _ = pipe._sample_cfg_teacache(params8, noise, y, ctx, ctx_null,
                                       clip_ctx, STEPS, shift, gs, 3)
    results["int8_teacache@3"] = _psnr(ref, np.asarray(got[:, -F_TAIL:]))

    got, n_full = pipe._sample_cfg_teacache(params8, noise, y, ctx,
                                            ctx_null, clip_ctx, STEPS,
                                            shift, gs, 3, None, 0.1)
    results["int8_adaptive@0.1"] = _psnr(ref, np.asarray(got[:, -F_TAIL:]))
    results["adaptive_n_full"] = int(n_full)
    _free(q8)
    del q8, params8, got
    gc.collect()

    # ---- int4 phase: dequant trunk, W4A8 direct, W4A8+adaptive ---------
    q4 = _build_stack(block_shapes, cfg.dit.num_layers, 4)
    params4 = (other, q4)
    got = pipe._sample_cfg(params4, noise, y, ctx, ctx_null, clip_ctx,
                           STEPS, shift, gs)
    results["int4"] = _psnr(ref, np.asarray(got[:, -F_TAIL:]))

    got = pipe_w._sample_cfg(params4, noise, y, ctx, ctx_null, clip_ctx,
                             STEPS, shift, gs)
    results["w4a8_direct"] = _psnr(ref, np.asarray(got[:, -F_TAIL:]))

    got, _ = pipe_w._sample_cfg_teacache(params4, noise, y, ctx, ctx_null,
                                         clip_ctx, STEPS, shift, gs, 3,
                                         None, 0.1)
    results["w4a8_adaptive@0.1"] = _psnr(ref, np.asarray(got[:, -F_TAIL:]))
    _free(q4)

    print("14B full-width anchors:", {k: (round(v, 1)
                                          if isinstance(v, float) else v)
                                      for k, v in results.items()})
    for k, v in results.items():
        if isinstance(v, float):
            assert np.isfinite(v), (k, v)
            assert v <= 80.0, (k, v)

    # regression pins: measured 2026-08-20 − 4 dB
    pins = {"int4": 34.3, "w4a8_direct": 33.6, "w8a8_direct": 45.5,
            "int8_teacache@3": 28.0, "int8_adaptive@0.1": 28.5,
            "w4a8_adaptive@0.1": 27.5}
    for k, pin in pins.items():
        assert results[k] >= pin, (k, results[k], pin)

    # structural claims: W4A8 ≈ int4 (activation-quant noise is small next
    # to the int4 weight noise), and cache error dominates quant error
    assert abs(results["int4"] - results["w4a8_direct"]) < 4.0
    assert results["w8a8_direct"] > results["int8_teacache@3"]
