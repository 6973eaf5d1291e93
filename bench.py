"""Benchmark: seconds per 2 s 720p clip (Yume-5B continuation segment).

Measures the DiT denoise cost of one autoregressive continuation segment at
the reference's production geometry (reference
fastvideo/sample/sample_5b.py:920-1040): Wan2.2-TI2V-5B, 720p latent grid
44×80 (stride 16), FramePack-packed 31-frame history (one decoded 121-frame
first segment) + 8 new latent frames, 50 denoise steps, cond-only (no CFG).

The HEADLINE is the repo's best-serving configuration — TeaCache
interval-3 block-residual caching (1 full : 2 cached steps), the config
the sample CLI/webapp actually serve with (``--teacache``), quality-gated
on-chip by tests_tpu/test_quality_gate.py. The plain bf16 step and the
W8A8(+TeaCache) variants are measured live and reported in ``detail``
(sec_bf16 is the honest uncached number).

North star (BASELINE.md): < 60 s per 2 s 720p clip at 50 steps on v5p-8.
``vs_baseline`` = 60 s / the MEASURED single-chip best-serving time (>1 ⇒
faster than the target on one chip — no extrapolation; the v5p-8 scaling
estimate stays in ``detail`` as an estimate only).

Prints ONE JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from yume_tpu.configs import ti2v_5b
    from yume_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    from yume_tpu.models.dit import WanDiT

    cfg = ti2v_5b()
    dit = WanDiT(cfg.dit, dtype=jnp.bfloat16)

    lfz = cfg.latent_frame_zero  # 8
    f_hist = 31                  # 121-frame first segment → 31 latent frames
    h_lat, w_lat = 44, 80        # 704×1280 / 16
    steps = 50

    def _init(k, x, t, c):
        return dit.init(k, x, t, c, packed=True, latent_frame_zero=lfz)

    shapes = jax.eval_shape(
        _init, jax.random.PRNGKey(0),
        jnp.zeros((1, f_hist + lfz, h_lat, w_lat, cfg.dit.in_dim), jnp.bfloat16),
        jnp.zeros((1, f_hist + lfz)),
        jnp.zeros((1, cfg.dit.text_len, cfg.dit.text_dim), jnp.bfloat16),
    )
    # random-ish bf16 params without a 20 GB fp32 init
    key = jax.random.PRNGKey(0)
    params = jax.tree_util.tree_map(
        lambda s: (jax.random.normal(key, s.shape, jnp.bfloat16) * 0.02
                   if s.size > 1 else jnp.zeros(s.shape, jnp.bfloat16)),
        shapes,
    )

    x = jax.random.normal(jax.random.PRNGKey(1),
                          (1, f_hist + lfz, h_lat, w_lat, cfg.dit.in_dim),
                          jnp.bfloat16)
    t = jnp.zeros((1, f_hist + lfz), jnp.float32).at[:, -lfz:].set(700.0)
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (1, cfg.dit.text_len, cfg.dit.text_dim),
                            jnp.bfloat16)

    @jax.jit
    def step(params, x, t, ctx):
        return dit.apply(params, x, t, ctx, packed=True, latent_frame_zero=lfz)

    def timeit(fn, *a):
        # warmup / compile. NOTE: fetch a scalar each call — on relayed/
        # remote PJRT backends block_until_ready alone does not force
        # execution.
        out = fn(*a)
        _ = float((out[0] if isinstance(out, tuple) else out).sum())
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*a)
            _ = float((out[0] if isinstance(out, tuple) else out).sum())
            times.append(time.perf_counter() - t0)
        return min(times)

    dt = timeit(step, params, x, t, ctx)

    # TeaCache cached step (middle-half block residuals reused), measured
    # live — the sampler runs full:cached at 1:1 or 1:2
    n = cfg.dit.num_layers
    cache_list = tuple(range(n // 4, n - n // 4))

    @jax.jit
    def step_full(params, x, t, ctx):
        return dit.apply(params, x, t, ctx, packed=True, latent_frame_zero=lfz,
                         cache_list=cache_list, return_cache=True)

    _, cache = step_full(params, x, t, ctx)
    # a real TeaCache "full" step captures the block deltas — time it as run
    dt_full_capture = timeit(step_full, params, x, t, ctx)

    @jax.jit
    def step_cached(params, x, t, ctx, cache):
        return dit.apply(params, x, t, ctx, packed=True, latent_frame_zero=lfz,
                         cache_list=cache_list, block_cache=cache)

    dt_cached = timeit(step_cached, params, x, t, ctx, cache)

    # W8A8 int8-MXU matmuls (ops/quant_matmul.py), measured live
    import dataclasses

    dit_q = WanDiT(dataclasses.replace(cfg.dit, w8a8=True), dtype=jnp.bfloat16)

    @jax.jit
    def step_w8a8(params, x, t, ctx):
        return dit_q.apply(params, x, t, ctx, packed=True,
                           latent_frame_zero=lfz)

    dt_w8a8 = timeit(step_w8a8, params, x, t, ctx)

    # the serving path's full step CAPTURES the block deltas — time it as
    # run (same treatment as the bf16 composition above)
    @jax.jit
    def step_w8a8_full(params, x, t, ctx):
        return dit_q.apply(params, x, t, ctx, packed=True,
                           latent_frame_zero=lfz, cache_list=cache_list,
                           return_cache=True)

    dt_w8a8_capture = timeit(step_w8a8_full, params, x, t, ctx)

    @jax.jit
    def step_w8a8_cached(params, x, t, ctx, cache):
        return dit_q.apply(params, x, t, ctx, packed=True,
                           latent_frame_zero=lfz, cache_list=cache_list,
                           block_cache=cache)

    dt_w8a8_cached = timeit(step_w8a8_cached, params, x, t, ctx, cache)

    # best-serving composition: TeaCache interval 3 → 1 full : 2 cached.
    # Both --teacache (bf16) and --teacache --w8a8 pass the on-chip quality
    # gate at the same 36 dB floor (TeaCache error dominates the
    # composition; tests_tpu/test_quality_gate.py) — headline the faster.
    n_full = -(-steps // 3)
    clip_tc = n_full * dt_full_capture + (steps - n_full) * dt_cached
    clip_bf16 = dt * steps
    clip_w8a8_tc = n_full * dt_w8a8_capture + (steps - n_full) * dt_w8a8_cached
    clip_best = min(clip_tc, clip_w8a8_tc)
    best_cfg = ("teacache_interval3_bf16" if clip_best == clip_tc
                else "teacache_interval3_w8a8")
    dev = str(jax.devices()[0])
    is_v5e = "v5 lite" in dev or "v5e" in dev
    scale = (197.0 / 459.0) / 8.0 if is_v5e else 1.0 / 8.0
    print(json.dumps({
        "metric": "sec_per_2s_720p_clip_5B_50step_best_serving_1chip",
        "value": round(clip_best, 3),
        "unit": "s",
        "vs_baseline": round(60.0 / clip_best, 2),
        "detail": {
            "serving_config": best_cfg,
            "sec_bf16": round(clip_bf16, 3),
            "sec_teacache_bf16": round(clip_tc, 3),
            "sec_w8a8_teacache": round(clip_w8a8_tc, 3),
            "dit_step_ms": round(dt * 1000, 2),
            "teacache_full_step_ms": round(dt_full_capture * 1000, 2),
            "teacache_step_ms": round(dt_cached * 1000, 2),
            "w8a8_step_ms": round(dt_w8a8 * 1000, 2),
            "w8a8_full_step_ms": round(dt_w8a8_capture * 1000, 2),
            "w8a8_teacache_step_ms": round(dt_w8a8_cached * 1000, 2),
            "steps": steps,
            "history_latent_frames": f_hist,
            "v5p8_extrapolated_s_estimate": round(clip_bf16 * scale, 2),
            "device": dev,
        },
    }))


if __name__ == "__main__":
    main()
