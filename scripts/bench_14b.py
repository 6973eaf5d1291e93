"""14B single-chip throughput measurements (VERDICT r1 item 6).

Measures the grouped-int4 14B-architecture DiT forward at the reference
inference geometry (544×960, 33 pixel frames → 9 latent history + 9 tail,
~18k tokens) in several variants:

  * baseline scan (dequantize-in-body)
  * pipelined dequant (software double-buffer)
  * TeaCache cached step (middle-chunk delta reuse)
  * unpacked (t2v-style) quantized forward

Usage:  python scripts/bench_14b.py [--bits 4] [--variants base,pipe,cache]
Prints one JSON line per variant.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--variants", default="base,pipe,cache,unpacked")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import numpy as np

    from yume_tpu.configs import i2v_14b
    from yume_tpu.models.dit import WanDiT
    from yume_tpu.models.quantized import (_quantize_leaf, _quantize_leaf4,
                                           int8_dit_apply)
    from yume_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    cfg = i2v_14b()
    dit = WanDiT(cfg.dit, dtype=jnp.bfloat16)
    # r1-baseline geometry (scripts/bench_14b_int8.py): 33 pixel frames →
    # 9 latent frames total at 544×960 (f_lat=9, tail lfz=8, history 1)
    lfz = min(cfg.latent_frame_zero, 8)
    f_hist, h_lat, w_lat = 1, 68, 120  # 544×960 / 8
    in_dim = cfg.dit.in_dim

    x = jax.random.normal(jax.random.PRNGKey(1),
                          (1, f_hist + lfz, h_lat, w_lat, in_dim), jnp.bfloat16)
    t = jnp.zeros((1, f_hist + lfz), jnp.float32).at[:, -lfz:].set(700.0)
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (1, cfg.dit.text_len, cfg.dit.text_dim), jnp.bfloat16)
    clip_ctx = jax.random.normal(jax.random.PRNGKey(3),
                                 (1, 257, cfg.dit.image_dim), jnp.bfloat16)

    shapes = jax.eval_shape(
        lambda k: dit.init(k, x, t, ctx, packed=True, latent_frame_zero=lfz,
                           clip_context=clip_ctx),
        jax.random.PRNGKey(0))
    # synthesize the quantized trunk WITHOUT materializing 28 GB of bf16
    # weights: quantize one random block on device, tile it across layers
    # (values don't matter for a perf measurement; bytes do)
    tree = shapes["params"]
    n_layers = cfg.dit.num_layers
    rng_np = np.random.default_rng(0)

    def rand_bf16(s):
        return jnp.asarray(
            rng_np.standard_normal(s.shape).astype(np.float32) * 0.02,
            jnp.bfloat16)

    qfn = {8: _quantize_leaf, 4: _quantize_leaf4}[args.bits]
    block0 = jax.tree_util.tree_map(lambda s: qfn(rand_bf16(s)),
                                    tree["blocks_0"])
    stacked = jax.tree_util.tree_map(
        lambda l: jnp.tile(l[None], (n_layers,) + (1,) * l.ndim), block0)
    other = {"params": jax.tree_util.tree_map(
        rand_bf16, {k: v for k, v in tree.items()
                    if not k.startswith("blocks_")})}

    def timeit(fn, *a):
        out = fn(*a)
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        ts = []
        for _i in range(args.iters):
            t0 = time.perf_counter()
            out = fn(*a)
            _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    variants = args.variants.split(",")
    results = {}

    if "base" in variants:
        f = jax.jit(lambda o, s: int8_dit_apply(
            dit, o, s, x, t, ctx, latent_frame_zero=lfz, clip_context=clip_ctx))
        results["dit_fwd_s_base"] = timeit(f, other, stacked)

    if "pipe" in variants:
        f = jax.jit(lambda o, s: int8_dit_apply(
            dit, o, s, x, t, ctx, latent_frame_zero=lfz, clip_context=clip_ctx,
            pipelined=True))
        try:
            results["dit_fwd_s_pipelined"] = timeit(f, other, stacked)
        except Exception as e:
            results["dit_fwd_s_pipelined"] = f"failed: {type(e).__name__}"

    if "cache" in variants:
        f_full = jax.jit(lambda o, s: int8_dit_apply(
            dit, o, s, x, t, ctx, latent_frame_zero=lfz, clip_context=clip_ctx,
            return_cache=True))
        out, cache = f_full(other, stacked)
        _ = float(jnp.sum(out))
        f_cached = jax.jit(lambda o, s, c: int8_dit_apply(
            dit, o, s, x, t, ctx, latent_frame_zero=lfz, clip_context=clip_ctx,
            block_cache=c))
        results["dit_fwd_s_full_with_cache"] = timeit(f_full, other, stacked)
        results["dit_fwd_s_cached"] = timeit(f_cached, other, stacked, cache)

    if "w8a8" in variants or "w8a8cache" in variants:
        import dataclasses

        dit_q = WanDiT(dataclasses.replace(cfg.dit, w8a8=True),
                       dtype=jnp.bfloat16)
        if "w8a8" in variants:
            f = jax.jit(lambda o, s: int8_dit_apply(
                dit_q, o, s, x, t, ctx, latent_frame_zero=lfz,
                clip_context=clip_ctx))
            results["dit_fwd_s_w8a8"] = timeit(f, other, stacked)
        if "w8a8cache" in variants:
            f_full = jax.jit(lambda o, s: int8_dit_apply(
                dit_q, o, s, x, t, ctx, latent_frame_zero=lfz,
                clip_context=clip_ctx, return_cache=True))
            out, cache = f_full(other, stacked)
            _ = float(jnp.sum(out))
            f_cached = jax.jit(lambda o, s, c: int8_dit_apply(
                dit_q, o, s, x, t, ctx, latent_frame_zero=lfz,
                clip_context=clip_ctx, block_cache=c))
            t_full = timeit(f_full, other, stacked)
            t_cached = timeit(f_cached, other, stacked, cache)
            results["dit_fwd_s_w8a8_full_with_cache"] = t_full
            results["dit_fwd_s_w8a8_cached"] = t_cached
            # distilled few-step serving (--distilled: cond-only euler, no
            # CFG doubling — sample.py, reference sample_5b.py:942's 4-step
            # recipe applied to 14B): TeaCache interval 3 over 4 steps =
            # 2 full + 2 cached forwards; the euler update between forwards
            # is a negligible elementwise pass
            results["segment_s_distilled4_w8a8_teacache"] = (
                2 * t_full + 2 * t_cached)

    if "unpacked" in variants:
        xt = x[:, -lfz:]
        tt = t[:, -lfz:]
        f = jax.jit(lambda o, s: int8_dit_apply(
            dit, o, s, xt, tt, ctx, packed=False, clip_context=clip_ctx))
        results["dit_fwd_s_unpacked_tail"] = timeit(f, other, stacked)

    print(json.dumps({
        "metric": "dit_fwd_14b_int%d" % args.bits,
        "latent_frames": f_hist + lfz,
        "grid": [h_lat, w_lat],
        "results": {k: (round(v, 3) if isinstance(v, float) else v)
                    for k, v in results.items()},
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
