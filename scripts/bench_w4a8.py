"""q4_dot (W4A8 in-kernel unpack) vs per-layer dequant+bf16 matmul at 14B
shapes, with the dequant kept IN-LOOP (scan over a 2-layer stack, like the
real trunk) so XLA cannot hoist it. Run from the repo root."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from yume_tpu.ops.quant_matmul import q4_dot, q4_dequant, Q4
from yume_tpu.models.quantized import _quantize_leaf4

def timeit_chain(f, x, stack, reps=10):
    @jax.jit
    def chain(x, stack):
        def body(c, sl):
            y = f(c, sl)
            # fold EVERY output column into the carry: slicing would let
            # XLA prune the unused columns out of the wide dot (the round-3
            # harness lesson, docs/PERF.md)
            s = y.astype(jnp.float32).sum(axis=-1, keepdims=True)
            return c + (jnp.bfloat16(1e-8) * s).astype(c.dtype), None
        c, _ = jax.lax.scan(body, x, stack, length=reps)
        return c
    r = chain(x, stack); _ = float(r.sum())
    t0 = time.perf_counter(); r = chain(x, stack); _ = float(r.sum())
    return (time.perf_counter() - t0) / reps

M = int(sys.argv[1]) if len(sys.argv) > 1 else 8640
for (k, n, tag) in [(5120, 15360, "qkv-fused"), (5120, 5120, "o"),
                    (5120, 13824, "fc1"), (13824, 5120, "fc2")]:
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32) * 0.02
    q1 = _quantize_leaf4(w)
    del w
    # 2-layer stack scanned over => per-iteration slice, dequant in-loop
    st = Q4(q=jnp.stack([q1.q, q1.q]), scale=jnp.stack([q1.scale, q1.scale]))
    st = jax.tree_util.tree_map(lambda l: jnp.tile(l, (5,) + (1,) * (l.ndim - 1)), st)
    x = jax.random.normal(jax.random.PRNGKey(0), (M, k), jnp.bfloat16)
    t_w4a8 = timeit_chain(lambda c, sl: q4_dot(c, sl), x, st)
    t_deq = timeit_chain(lambda c, sl: c @ q4_dequant(sl, jnp.bfloat16), x, st)
    tf = 2 * M * k * n
    print(f"{tag:10s} K={k:5d} N={n:5d}: w4a8 {t_w4a8*1e3:7.2f} ms ({tf/t_w4a8/1e12:6.1f} TF/s)"
          f"  dequant+bf16 {t_deq*1e3:7.2f} ms ({tf/t_deq/1e12:6.1f} TF/s)", flush=True)
