"""14B single-chip capability check: int8 trunk at production shapes.

The reference can only run Wan2.1-14B sharded across multiple 80 GB GPUs
(FSDP at inference, fastvideo/sample/sample.py:979-983). The 14B trunk is
16.15 B params — int8 (15.1 GiB) still overflows a 16 GB chip next to
activations, so the single-chip configuration is grouped int4
(yume_tpu/models/quantized.py Q4): ~8.1 GiB of weights + one dequantized
block live at a time.

Weights here are synthetic (zeros/ones) — this measures memory fit and
step time, not quality (numerics are golden-tested at tiny scale).

Usage: python scripts/bench_14b_int8.py [--frames 33] [--size 544 960]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=33)
    ap.add_argument("--size", type=int, nargs=2, default=(544, 960))
    args = ap.parse_args()

    from yume_tpu.configs import i2v_14b
    from yume_tpu.models.dit import WanDiT
    from yume_tpu.models.quantized import Q4, int8_dit_apply

    cfg = i2v_14b()
    c = cfg.dit
    dit = WanDiT(c, dtype=jnp.bfloat16)

    s = cfg.vae.stride
    f_lat = (args.frames - 1) // s[0] + 1
    h_lat, w_lat = args.size[0] // s[1] // c.patch_size[1] * c.patch_size[1], \
        args.size[1] // s[2] // c.patch_size[2] * c.patch_size[2]
    h_lat, w_lat = args.size[0] // s[1], args.size[1] // s[2]
    lfz = min(cfg.latent_frame_zero, f_lat - 1)

    x = jnp.zeros((1, f_lat, h_lat, w_lat, c.in_dim), jnp.bfloat16)
    t = jnp.zeros((1, f_lat), jnp.float32).at[:, -lfz:].set(700.0)
    ctx = jnp.zeros((1, c.text_len, c.text_dim), jnp.bfloat16)
    clip_ctx = jnp.zeros((1, c.image_context_len, c.image_dim), jnp.bfloat16)

    # non-block params via eval_shape (never materialise 28 GB of bf16)
    def init_fn(key):
        return dit.init(key, x, t, ctx, packed=True, latent_frame_zero=lfz,
                        clip_context=clip_ctx)

    shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0))["params"]
    other = {"params": {
        k: jax.tree_util.tree_map(
            lambda sh: jnp.full(sh.shape, 0.02, jnp.bfloat16), v)
        for k, v in shapes.items() if not k.startswith("blocks_")
    }}

    # stacked int8 blocks built directly at int8 (synthetic weights)
    blk = shapes["blocks_0"]
    n = c.num_layers

    group = 128

    def mk(sh):
        shape = (n,) + sh.shape
        if len(sh.shape) == 2 and min(sh.shape) >= 128:
            din, dout = sh.shape
            return Q4(
                q=jnp.full((n, din // group, group // 2, dout), 0x99,
                           jnp.uint8),  # nibbles 9 → (9-8)*scale
                scale=jnp.full((n, din // group, dout), 2e-3, jnp.float32))
        return jnp.full(shape, 0.02, jnp.bfloat16)

    stacked_q = jax.tree_util.tree_map(mk, blk)
    q_bytes = sum(l.size * l.dtype.itemsize for l in jax.tree_util.tree_leaves(stacked_q))
    print(f"trunk bytes on device: {q_bytes / 2**30:.2f} GiB "
          f"(bf16 would be {(q_bytes * 2 - 0) / 2**30:.0f}+ GiB)", flush=True)

    fn = jax.jit(lambda o, sq, x, t, ctx, cc: int8_dit_apply(
        dit, o, sq, x, t, ctx, latent_frame_zero=lfz, clip_context=cc))
    t0 = time.time()
    out = fn(other, stacked_q, x, t, ctx, clip_ctx)
    v = float(jnp.sum(jnp.abs(out.astype(jnp.float32))))
    print(f"compile+first step: {time.time() - t0:.1f}s, |out| sum={v:.3e}, "
          f"out shape={out.shape}", flush=True)
    assert np.isfinite(v)

    times = []
    for _ in range(3):
        t0 = time.time()
        out = fn(other, stacked_q, x, t, ctx, clip_ctx)
        float(jnp.sum(out.astype(jnp.float32)))  # force execution (relay!)
        times.append(time.time() - t0)
    step = min(times)
    tokens = f_lat * (h_lat // 2) * (w_lat // 2)
    print(f"14B int4 DiT step ({tokens} tokens, {args.frames}f "
          f"{args.size[0]}x{args.size[1]}): {step:.2f}s/fwd "
          f"(50-step CFG clip ≈ {step * 100:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
