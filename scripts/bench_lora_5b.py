"""Single-chip 5B LoRA finetune step at production geometry.

Capability the reference cannot match on one device: its LoRA path wraps
FSDP across GPUs (fastvideo/utils/fsdp_util.py:96-110); here the frozen
bf16 base (≈10 GiB) plus rank-R adapters, per-block remat, and the fused
flow-matching step run inside one 16 GB v5e.

Usage: python scripts/bench_lora_5b.py [--rank 16] [--frames 33]
Prints one JSON line.
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
    ap.add_argument("--rank", type=int, default=16)
    ap.add_argument("--frames", type=int, default=33)
    ap.add_argument("--size", type=int, nargs=2, default=(352, 640))
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from yume_tpu.configs import ti2v_5b
    from yume_tpu.models.dit import WanDiT
    from yume_tpu.training.lora import (count_params, init_lora,
                                        make_lora_train_step)
    from yume_tpu.training.train_step import TrainConfig, init_train_state
    from yume_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    cfg = ti2v_5b()
    lfz = cfg.latent_frame_zero
    dit = WanDiT(cfg.dit, dtype=jnp.bfloat16, remat=True)

    s = cfg.vae.stride
    f = (args.frames - 1) // s[0] + 1 + lfz
    h, w = args.size[0] // s[1], args.size[1] // s[2]

    x = jnp.zeros((1, f, h, w, cfg.dit.in_dim), jnp.bfloat16)
    t = jnp.zeros((1, f))
    ctx = jnp.zeros((1, cfg.dit.text_len, cfg.dit.text_dim), jnp.bfloat16)

    shapes = jax.eval_shape(
        lambda k: dit.init(k, x, t, ctx, packed=True, latent_frame_zero=lfz),
        jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(0)
    base = jax.tree_util.tree_map(
        lambda sh: (jax.random.normal(key, sh.shape, jnp.bfloat16) * 0.02
                    if sh.size > 1 else jnp.zeros(sh.shape, jnp.bfloat16)),
        shapes)

    lora = init_lora(jax.random.PRNGKey(1), base, rank=args.rank)
    tc = TrainConfig(latent_frame_zero=lfz)
    state = init_train_state(lora, tc)
    lora_step = jax.jit(make_lora_train_step(dit.apply, tc, packed=True))

    def step(st, batch, rng):
        return lora_step(st, base, batch, rng)

    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(2),
                                     (1, f, h, w, cfg.dit.in_dim)),
        "context": jax.random.normal(jax.random.PRNGKey(3),
                                     (1, cfg.dit.text_len,
                                      cfg.dit.text_dim)) * 0.02,
    }

    state, m = step(state, batch, jax.random.PRNGKey(4))
    _ = float(m["loss"])  # forces execution on relayed PJRT
    ts = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        state, m = step(state, batch, jax.random.PRNGKey(5 + i))
        _ = float(m["loss"])
        ts.append(time.perf_counter() - t0)

    print(json.dumps({
        "metric": "lora_train_step_5b_1chip",
        "value": round(min(ts), 3),
        "unit": "s",
        "detail": {
            "rank": args.rank,
            "trainable_params": count_params(lora),
            "base_params": count_params(base),
            "latent_frames": f, "grid": [h, w],
            "grad_norm": round(float(m["grad_norm"]), 5),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
