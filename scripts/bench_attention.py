"""Flash-attention microbenchmark sweep (block sizes × exp domain).

Times the Pallas forward kernel at the 5B headline geometry (L=12095 →
padded 12288, 24 heads, d=128, bf16) with a chained device loop — N
applications inside one jit'd scan, so relay fetch latency (~28 ms fixed)
amortizes away. Prints one JSON line per configuration.

Usage: python scripts/bench_attention.py [--l 12095] [--heads 24] [--iters 10]
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
    ap.add_argument("--l", type=int, default=12095)
    ap.add_argument("--heads", type=int, default=24)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--blocks", default="512x1024,512x2048,1024x1024,1024x2048,2048x2048")
    ap.add_argument("--mode", choices=["full", "partial"], default="full",
                    help="partial = one ring hop: flash_attention_partial + "
                         "lse merge at the per-shard geometry (default --l "
                         "9408 ≙ 75k tokens / sp=8 at 720p)")
    args = ap.parse_args()

    from yume_tpu.ops.flash_attention import flash_attention, flash_attention_partial
    from yume_tpu.parallel.ulysses import _merge_partials
    from yume_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    b, l, n, d = 1, args.l, args.heads, args.d
    q = jax.random.normal(jax.random.PRNGKey(0), (b, l, n, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, l, n, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, l, n, d), jnp.bfloat16)

    flops = 4.0 * l * l * d * n  # 2 matmuls (QK^T, PV) x 2 flops/MAC

    if args.mode == "partial":
        # one ring hop: partial flash (o, lse) + merge into the carry —
        # everything a hop does except the ppermute (pure ICI)
        o0 = jnp.zeros((b, l, n, d), jnp.float32)
        lse0 = jnp.full((b, n, l), -1e30, jnp.float32)

        for spec in args.blocks.split(","):
            bq, bkv = (int(x) for x in spec.split("x"))

            @jax.jit
            def hop_chain(q, k, v, bq=bq, bkv=bkv):
                def body(c, _):
                    o, lse = c
                    o_b, lse_b = flash_attention_partial(
                        q, k, v, block_q=bq, block_kv=bkv)
                    return _merge_partials(o, lse, o_b.astype(jnp.float32),
                                           lse_b), ()
                (o, lse), _ = jax.lax.scan(body, (o0, lse0), None,
                                           length=args.iters)
                return o
            try:
                out = hop_chain(q, k, v)
                _ = float(out.sum())
                t0 = time.perf_counter()
                out = hop_chain(q, k, v)
                _ = float(out.sum())
                dt = (time.perf_counter() - t0) / args.iters
                print(json.dumps({
                    "mode": "ring_hop", "blocks": spec,
                    "ms": round(dt * 1000, 2),
                    "tflops": round(flops / dt / 1e12, 1),
                }))
            except Exception as e:
                print(json.dumps({"mode": "ring_hop", "blocks": spec,
                                  "error": f"{type(e).__name__}: {e}"[:200]}))
        return

    for spec in args.blocks.split(","):
        bq, bkv = (int(x) for x in spec.split("x"))

        @jax.jit
        def chained(q, k, v, bq=bq, bkv=bkv):
            def body(c, _):
                # vary q each iteration so XLA can't CSE the chain away
                o = flash_attention(c, k, v, block_q=bq, block_kv=bkv)
                return o, ()
            out, _ = jax.lax.scan(body, q, None, length=args.iters)
            return out

        try:
            out = chained(q, k, v)
            _ = float(out.sum())  # force (block_until_ready lies on relays)
            t0 = time.perf_counter()
            out = chained(q, k, v)
            _ = float(out.sum())
            dt = (time.perf_counter() - t0) / args.iters
            print(json.dumps({
                "blocks": spec,
                "ms": round(dt * 1000, 2),
                "tflops": round(flops / dt / 1e12, 1),
            }))
        except Exception as e:
            print(json.dumps({"blocks": spec,
                              "error": f"{type(e).__name__}: {e}"[:200]}))


if __name__ == "__main__":
    main()
