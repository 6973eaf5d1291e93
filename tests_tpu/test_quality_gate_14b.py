"""14B full-width quality anchors (VERDICT r4 task 6).

The 14B serving modes (int4 storage, W4A8 direct, W8A8, TeaCache and the
compositions) were quality-gated only at dim-768 proxy scale, which the
round-4c full-scale anchor proved over-predicts cache fidelity by ~11 dB.
These anchors run the REAL 14B width (dim 5120, 40 heads, ffn 13824 —
random weights) through the CFG serving path at a reduced 540P-class grid.

A bf16 reference cannot exist at full scale: ~32 GB of bf16 weights
(and even ~16.2 GB of int8) exceed the 16 GB chip — the same physics
that motivates the int4 trunk. So the anchor splits:

* ``test_14b_fullwidth_quant_anchor`` — dim 5120 × 20 layers, where the
  int8-storage trunk FITS (8.1 GB) and serves as the reference (its
  weight-quant noise measured ~25 dB above the int4/cache errors at 5B
  scale): pins the quantization ladder (W8A8 direct, int4, W4A8) at full
  width.
* ``test_14b_fulldepth_cache_anchor`` — dim 5120 × the full 40 layers,
  run END-TO-END on the W4A8 trunk (int4 storage + in-kernel unpack +
  s8×s8 MXU — the flagship 14B serving trunk): pins the CACHE error
  (the quantity that failed the 35 dB bar at 5B full scale) at full
  width AND depth, with the uncached W4A8 trajectory as reference.
  W4A8-referencing is valid for cache fidelity because cache error
  dominates quant noise by ~25 dB (r3/r4 tables + the quant anchor
  above) — and it is the path 40 int4 layers actually serve with: the
  bf16-dequant trunk at full depth makes XLA materialize layout-
  converted copies of the whole 7 GiB weight stack as HLO temps
  (11.2 GiB padded, round-5 OOM), while the Pallas W4A8 kernel consumes
  the packed nibbles in their stored layout.

Assertions are regression pins at measured−4 dB (measured table in
BASELINE.md round-5; pins set from the first on-chip run) plus the
structural claims (quant noise subdominant to cache error; W4A8 ≈ int4).
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
SHIFT, GS = 3.0, 5.0


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
    once: peak device HBM = final stack + one transient leaf."""
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


def _setup(num_layers):
    """(pipes, other-params, conditioning, block_shapes) at dim 5120 /
    ``num_layers``."""
    from yume_tpu.configs import i2v_14b
    from yume_tpu.models.dit import WanDiT
    from yume_tpu.pipelines.i2v import I2VPipeline

    cfg = dataclasses.replace(i2v_14b(), latent_frame_zero=F_TAIL)
    cfg = dataclasses.replace(
        cfg, dit=dataclasses.replace(cfg.dit, num_layers=num_layers))
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
    other = {"params": _rand_tree(
        {k: v for k, v in tree.items() if not k.startswith("blocks_")}, 7)}

    z = 16
    cond = dict(
        noise=jax.random.normal(jax.random.PRNGKey(1),
                                (1, F_LAT, H, W, z), jnp.float32),
        y=jax.random.normal(jax.random.PRNGKey(2),
                            (1, F_LAT, H, W, cfg.dit.in_dim - z),
                            jnp.float32) * 0.5,
        ctx=jax.random.normal(jax.random.PRNGKey(3),
                              (1, cfg.dit.text_len, cfg.dit.text_dim),
                              jnp.float32) * 0.2,
        clip_ctx=jax.random.normal(
            jax.random.PRNGKey(4),
            (1, cfg.dit.image_context_len, cfg.dit.image_dim),
            jnp.float32) * 0.2,
    )
    cond["ctx_null"] = 0.3 * cond["ctx"]

    pipe = I2VPipeline(config=cfg, dit=dit, dit_params=None, vae=None,
                      vae_params=None)
    pipe_w = I2VPipeline(config=cfg, dit=dit_w, dit_params=None, vae=None,
                         vae_params=None)
    return pipe, pipe_w, other, cond, tree["blocks_0"]


def _run(pipe, params, c):
    out = pipe._sample_cfg(params, c["noise"], c["y"], c["ctx"],
                           c["ctx_null"], c["clip_ctx"], STEPS, SHIFT, GS)
    return np.asarray(out[:, -F_TAIL:], np.float32)


def _run_tc(pipe, params, c, interval=3, edge=None, threshold=None):
    out, n_full = pipe._sample_cfg_teacache(
        params, c["noise"], c["y"], c["ctx"], c["ctx_null"], c["clip_ctx"],
        STEPS, SHIFT, GS, interval, edge, threshold)
    return np.asarray(out[:, -F_TAIL:], np.float32), int(n_full)


def test_14b_fullwidth_quant_anchor():
    """dim 5120 × 20 layers: the quantization ladder vs a clean
    int8-storage reference (the deepest full-width geometry whose int8
    reference fits 16 GB)."""
    pipe, pipe_w, other, cond, block_shapes = _setup(20)
    results = {}

    q8 = _build_stack(block_shapes, 20, 8)
    params8 = (other, q8)
    ref = _run(pipe, params8, cond)
    assert np.isfinite(ref).all()
    results["w8a8_direct"] = _psnr(ref, _run(pipe_w, params8, cond))
    got, _ = _run_tc(pipe, params8, cond, interval=3)
    results["int8_teacache@3"] = _psnr(ref, got)
    _free(q8)
    del q8, params8
    gc.collect()

    q4 = _build_stack(block_shapes, 20, 4)
    params4 = (other, q4)
    results["int4"] = _psnr(ref, _run(pipe, params4, cond))
    results["w4a8_direct"] = _psnr(ref, _run(pipe_w, params4, cond))
    _free(q4)

    print("14B full-width (20L) anchors:",
          {k: round(v, 1) for k, v in results.items()})
    for k, v in results.items():
        assert np.isfinite(v) and v <= 90.0, (k, v)

    # regression pins: measured 2026-08-20 − 4 dB (BASELINE.md round-5)
    pins = {"w8a8_direct": 40.0, "int4": 26.0, "w4a8_direct": 25.0,
            "int8_teacache@3": 20.0}
    for k, pin in pins.items():
        assert results[k] >= pin, (k, results[k], pin)
    # structural: activation-quant noise is small next to int4 weight noise
    assert abs(results["int4"] - results["w4a8_direct"]) < 4.0
    # cache error dominates quant error
    assert results["w8a8_direct"] > results["int8_teacache@3"]


def test_14b_fulldepth_cache_anchor():
    """dim 5120 × the FULL 40 layers on the W4A8 trunk (the production
    single-chip 14B serving path): TeaCache fidelity vs the uncached W4A8
    trajectory (bf16/int8 references physically cannot fit — W4A8
    referencing is valid for CACHE fidelity since quant noise sits ~25 dB
    below cache error, test_14b_fullwidth_quant_anchor)."""
    _, pipe_w, other, cond, block_shapes = _setup(40)
    results = {}

    q4 = _build_stack(block_shapes, 40, 4)
    params4 = (other, q4)
    ref = _run(pipe_w, params4, cond)
    assert np.isfinite(ref).all()

    got, _ = _run_tc(pipe_w, params4, cond, interval=3)
    results["w4a8_teacache@3"] = _psnr(ref, got)
    got, n_full = _run_tc(pipe_w, params4, cond, threshold=0.1)
    results["w4a8_adaptive@0.1"] = _psnr(ref, got)
    results["adaptive_n_full"] = n_full
    _free(q4)

    print("14B full-depth (40L) cache anchors:",
          {k: (round(v, 1) if isinstance(v, float) else v)
           for k, v in results.items()})
    for k, v in results.items():
        if isinstance(v, float):
            assert np.isfinite(v) and v <= 90.0, (k, v)

    # regression pins: measured 2026-08-20 − 4 dB (BASELINE.md round-5)
    pins = {"w4a8_teacache@3": 20.0, "w4a8_adaptive@0.1": 22.0}
    for k, pin in pins.items():
        assert results[k] >= pin, (k, results[k], pin)
    # the adaptive schedule must not be WORSE than fixed interval-3 at a
    # comparable budget (the round-5 sweep's full-depth claim)
    assert results["w4a8_adaptive@0.1"] >= results["w4a8_teacache@3"] - 1.0
