"""W8A8 matmul microbenchmark: where does the int8 MXU headroom go?

Times the big-block matmul geometries of the 5B headline step
(M=12095 tokens; square 3072x3072 qkvo and wide 3072x14336 ffn) under four
schemes, chained N deep inside one jit so the relay fetch latency
amortizes (see docs/PERF.md):

  bf16        plain bf16 dot (the baseline the W8A8 path must beat)
  w8a8_live   ops/quant_matmul.int8_dot_general as shipped: weights
              REquantized inside the step (what nn.Dense(dot_general=..)
              runs today)
  w8a8_preq   activations quantized in-step, weights already int8 with a
              per-channel fp32 scale (ops/quant_matmul.q8_dot — the
              stored-Q8 serving trunk; includes the fused Pallas kernel
              on its K>=8192 route)
  int8_only   pure s8xs8->s32 dot on pre-quantized tensors (the MXU
              ceiling for this shape; no quant passes at all)

Shapes: the post-fusion 5B step geometries — fused qkv [3072,9216]
(models/dit.py::fused_sibling_dense), o [3072,3072], ffn up
[3072,14336] and down [14336,3072] (the down projection is the
fused-Pallas route).

Prints one JSON line per (shape, scheme): ms per application + TFLOP/s.

Usage: python scripts/bench_quant_matmul.py [--m 12095] [--iters 20]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def quant_rows(a):
    s = jnp.maximum(jnp.max(jnp.abs(a.astype(jnp.float32)), axis=-1,
                            keepdims=True), 1e-8) / 127.0
    q = jnp.clip(jnp.round(a.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


def quant_cols(w):
    s = jnp.maximum(jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0,
                            keepdims=True), 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=12095)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from yume_tpu.ops.quant_matmul import int8_dot_general
    from yume_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    m = args.m
    dn = (((1,), (0,)), ((), ()))

    def timeit(fn, *tensors):
        @jax.jit
        def chained(*ts):
            def body(c, _):
                o = fn(c, *ts[1:])
                # fold the FULL output back into the carry via a row-sum:
                # slicing columns here lets XLA dead-code-eliminate the
                # unused output columns of the dot (it did: the wide-N
                # shapes measured only K columns of work); a sum depends on
                # every column, and ×0 cannot fold away under IEEE floats
                red = jnp.sum(o.astype(jnp.float32), axis=-1, keepdims=True)
                return c + (red * 0.0).astype(c.dtype), ()

            out, _ = jax.lax.scan(body, ts[0], None, length=args.iters)
            return out

        out = chained(*tensors)
        _ = float(out.sum())
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            out = chained(*tensors)
            _ = float(out.sum())
            dt = (time.perf_counter() - t0) / args.iters
            best = dt if best is None else min(best, dt)
        return best

    from yume_tpu.ops.quant_matmul import Q8, q8_dot

    for k, n in ((3072, 9216), (3072, 3072), (3072, 14336), (14336, 3072)):
        a = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16)
        qw, ws = quant_cols(w)
        qa, ascale = quant_rows(a)
        flops = 2.0 * m * k * n

        def bf16(x, w):
            return jax.lax.dot_general(x, w, dn)

        def w8a8_live(x, w):
            return int8_dot_general(x, w, dn)

        def w8a8_preq(x, qw, ws):
            return q8_dot(x, Q8(q=qw, scale=ws))

        def int8_only(qa_carry, qw):
            # the carry IS the int8 activation: the dot must depend on it
            # or XLA hoists the whole matmul out of the scan (it did)
            return jax.lax.dot_general(qa_carry, qw, dn,
                                       preferred_element_type=jnp.int32)

        for name, fn, tensors in (
            ("bf16", bf16, (a, w)),
            ("w8a8_live", w8a8_live, (a, w)),
            ("w8a8_preq", w8a8_preq, (a, qw, ws)),
            ("int8_only", int8_only, (qa, qw)),
        ):
            try:
                dt = timeit(fn, *tensors)
                print(json.dumps({
                    "shape": f"{m}x{k}x{n}", "scheme": name,
                    "ms": round(dt * 1e3, 3),
                    "tflops": round(flops / dt / 1e12, 1),
                }))
            except Exception as e:  # noqa: BLE001 — sweep must continue
                print(json.dumps({"shape": f"{m}x{k}x{n}", "scheme": name,
                                  "error": str(e)[:200]}))


if __name__ == "__main__":
    main()
