"""Sweep the TeaCache operating point: (interval × live-edge width).

Cached steps recompute only ``edge`` blocks per side and reuse the middle
residuals, so their cost is ~linear in edge — but so is the reuse error.
The round-3 operating point (interval 3, edge n//4 = 7) was never swept
against narrower edges; this script measures both axes on-chip:

  --part quality   latent PSNR vs the bf16 euler reference at the REAL 5B
                   width/depth (random weights — the pessimistic bound, same
                   harness as tests_tpu/test_quality_gate_fullscale.py) for
                   each (interval, edge)
  --part speed     per-step cost at the 720p headline geometry (44×80,
                   31+8 packed latent frames, W8A8 + bf16) for each edge

The serving default moves only if a config is BOTH faster (predicted
50-step denoise) and within quality noise of the current point.

Run: python scripts/bench_teacache_sweep.py --part quality
     python scripts/bench_teacache_sweep.py --part speed
"""
import argparse
import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 12
LFZ = 4
F_HIST = 9
H, W = 24, 40


def _psnr(ref, got):
    rng_pp = float(ref.max() - ref.min())
    mse = float(np.mean((np.asarray(got, np.float32) - ref) ** 2))
    return 10.0 * np.log10(rng_pp ** 2 / max(mse, 1e-12))


def part_quality(grid, steps=STEPS):
    from yume_tpu.configs import ti2v_5b
    from yume_tpu.models.dit import WanDiT
    from yume_tpu.pipelines.ti2v import TI2VPipeline

    cfg = dataclasses.replace(ti2v_5b(), latent_frame_zero=LFZ)
    dit = WanDiT(cfg.dit, dtype=jnp.bfloat16)

    def _init(k, x, t, c):
        return dit.init(k, x, t, c, packed=True, latent_frame_zero=LFZ)

    shapes = jax.eval_shape(
        _init, jax.random.PRNGKey(0),
        jnp.zeros((1, F_HIST + LFZ, H, W, cfg.dit.in_dim), jnp.bfloat16),
        jnp.zeros((1, F_HIST + LFZ)),
        jnp.zeros((1, cfg.dit.text_len, cfg.dit.text_dim), jnp.bfloat16))
    key = jax.random.PRNGKey(0)
    params = jax.tree_util.tree_map(
        lambda s: jax.random.normal(key, s.shape, jnp.bfloat16) * 0.02, shapes)
    pipe = TI2VPipeline(config=cfg, dit=dit, dit_params=params,
                        vae=None, vae_params=None, t5=None, t5_params=None)
    hist = jax.random.normal(jax.random.PRNGKey(1),
                             (1, F_HIST, H, W, cfg.dit.in_dim), jnp.float32)
    ctx = jax.random.normal(
        jax.random.PRNGKey(2),
        (1, cfg.dit.text_len, cfg.dit.text_dim), jnp.float32) * 0.2
    ref = np.asarray(pipe.generate_segment(
        hist, ctx, steps=steps, shift=7.0, sampler="euler")[:, -LFZ:],
        np.float32)
    print(f"bf16 euler reference done ({steps} steps)")
    sys.stdout.flush()

    for spec, edge in grid:
        if isinstance(spec, float):  # adaptive threshold entry ("t0.15x7")
            got = pipe.generate_segment(
                hist, ctx, steps=steps, shift=7.0, sampler="teacache",
                teacache_edge=edge, teacache_threshold=spec)
            n_full = int(pipe.last_teacache_n_full)
            p = _psnr(ref, np.asarray(got[:, -LFZ:], np.float32))
            print(f"threshold={spec} edge={edge}: {p:.1f} dB "
                  f"(n_full {n_full}/{steps})")
        else:
            got = pipe.generate_segment(
                hist, ctx, steps=steps, shift=7.0, sampler="teacache",
                teacache_interval=spec, teacache_edge=edge)
            p = _psnr(ref, np.asarray(got[:, -LFZ:], np.float32))
            print(f"interval={spec} edge={edge}: {p:.1f} dB")
        sys.stdout.flush()


def part_speed(edges):
    from yume_tpu.configs import ti2v_5b
    from yume_tpu.models.dit import WanDiT

    cfg = ti2v_5b()
    lfz, f_hist, h_lat, w_lat = cfg.latent_frame_zero, 31, 44, 80
    n = cfg.dit.num_layers

    def timeit(fn, *a):
        out = fn(*a)
        _ = float((out[0] if isinstance(out, tuple) else out).sum())
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*a)
            _ = float((out[0] if isinstance(out, tuple) else out).sum())
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for w8a8 in (True, False):
        dit = WanDiT(dataclasses.replace(cfg.dit, w8a8=w8a8),
                     dtype=jnp.bfloat16)

        def _init(k, x, t, c):
            return dit.init(k, x, t, c, packed=True, latent_frame_zero=lfz)

        shapes = jax.eval_shape(
            _init, jax.random.PRNGKey(0),
            jnp.zeros((1, f_hist + lfz, h_lat, w_lat, cfg.dit.in_dim),
                      jnp.bfloat16),
            jnp.zeros((1, f_hist + lfz)),
            jnp.zeros((1, cfg.dit.text_len, cfg.dit.text_dim), jnp.bfloat16))
        key = jax.random.PRNGKey(0)
        params = jax.tree_util.tree_map(
            lambda s: jax.random.normal(key, s.shape, jnp.bfloat16) * 0.02,
            shapes)
        x = jax.random.normal(
            jax.random.PRNGKey(1),
            (1, f_hist + lfz, h_lat, w_lat, cfg.dit.in_dim), jnp.bfloat16)
        t = jnp.zeros((1, f_hist + lfz), jnp.float32).at[:, -lfz:].set(700.0)
        ctx = jax.random.normal(
            jax.random.PRNGKey(2),
            (1, cfg.dit.text_len, cfg.dit.text_dim), jnp.bfloat16)

        for edge in edges:
            cache_list = tuple(range(edge, n - edge))

            @jax.jit
            def full(params, x, t, ctx, _cl=cache_list):
                return dit.apply(params, x, t, ctx, packed=True,
                                 latent_frame_zero=lfz, cache_list=_cl,
                                 return_cache=True)

            @jax.jit
            def cached(params, x, t, ctx, cache, _cl=cache_list):
                return dit.apply(params, x, t, ctx, packed=True,
                                 latent_frame_zero=lfz, cache_list=_cl,
                                 block_cache=cache)

            _, cache = full(params, x, t, ctx)
            dt_full = timeit(full, params, x, t, ctx)
            dt_cached = timeit(cached, params, x, t, ctx, cache)
            for leaf in jax.tree_util.tree_leaves(cache):
                leaf.delete()
            for steps, interval in ((50, 3), (50, 2)):
                n_full = -(-steps // interval)
                total = n_full * dt_full + (steps - n_full) * dt_cached
                print(f"w8a8={w8a8} edge={edge}: full {dt_full*1e3:.0f} ms "
                      f"cached {dt_cached*1e3:.0f} ms -> {steps}st@{interval} "
                      f"= {total:.1f} s")
            sys.stdout.flush()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", choices=["quality", "speed"], required=True)
    ap.add_argument("--grid", default="3x7,3x5,3x3,3x1,2x3,2x1",
                    help="quality part: interval×edge pairs; prefix 't' "
                         "for adaptive thresholds (t0.15x7)")
    ap.add_argument("--edges", default="7,5,3,1")
    ap.add_argument("--steps", type=int, default=STEPS,
                    help="quality part: denoise steps (50 = bench headline)")
    args = ap.parse_args()
    if args.part == "quality":
        def _spec(tok):
            a, b = tok.split("x")
            return (float(a[1:]) if a.startswith("t") else int(a), int(b))
        part_quality([_spec(tok) for tok in args.grid.split(",")],
                     steps=args.steps)
    else:
        part_speed([int(v) for v in args.edges.split(",")])


if __name__ == "__main__":
    main()
