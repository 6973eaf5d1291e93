"""Experiment: fused activation-quantize + s8 dot Pallas kernel, block sweep.

Compares against the XLA preq path (quantize-in-XLA + lax int8 dot) and the
pure int8 dot ceiling at the 5B step geometries. Not shipped — findings land
in ops/quant_matmul.py + docs/PERF.md.
"""

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, ascale_ref, qw_ref, wscale_ref, o_ref, acc_ref, *, nk):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    s = ascale_ref[...].astype(jnp.float32)  # [bm, 1]
    xq = jnp.clip(jnp.round(x_ref[...].astype(jnp.float32) / s),
                  -127, 127).astype(jnp.int8)
    acc_ref[...] += jax.lax.dot_general(
        xq, qw_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == nk - 1)
    def _done():
        out = acc_ref[...].astype(jnp.float32) * s * wscale_ref[...]
        o_ref[...] = out.astype(o_ref.dtype)


def fused_q8_matmul(x, a_scale, qw, w_scale, *, bm, bn, bk, out_dtype):
    m, k = x.shape
    _, n = qw.shape
    nk = pl.cdiv(k, bk)
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn), nk)
    return pl.pallas_call(
        functools.partial(_kernel, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bm, 1), lambda i, j, kk: (i, 0)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x, a_scale, qw, w_scale)


def quant_cols(w):
    s = jnp.maximum(jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0,
                            keepdims=True), 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


def row_scale(a):
    return jnp.maximum(jnp.max(jnp.abs(a.astype(jnp.float32)), axis=-1,
                               keepdims=True), 1e-8) / 127.0


def timeit(fn, tensors, iters):
    @jax.jit
    def chained(*ts):
        def body(c, _):
            o = fn(c, *ts[1:])
            red = jnp.sum(o.astype(jnp.float32), axis=-1, keepdims=True)
            return c + (red * 0.0).astype(c.dtype), ()
        out, _ = jax.lax.scan(body, ts[0], None, length=iters)
        return out

    out = chained(*tensors)
    _ = float(out.sum())
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = chained(*tensors)
        _ = float(out.sum())
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=12095)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    for k, n in ((3072, 3072), (3072, 14336), (14336, 3072)):
        a = jax.random.normal(jax.random.PRNGKey(0), (args.m, k), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16)
        qw, ws = quant_cols(w)
        flops = 2.0 * args.m * k * n
        dn = (((1,), (0,)), ((), ()))

        def preq(x, qw, ws):
            s = row_scale(x)
            q = jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                         -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(q, qw, dn,
                                      preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * s * ws).astype(x.dtype)

        dt = timeit(preq, (a, qw, ws), args.iters)
        print(json.dumps({"shape": f"{args.m}x{k}x{n}", "scheme": "xla_preq",
                          "ms": round(dt * 1e3, 3),
                          "tflops": round(flops / dt / 1e12, 1)}))

        for bm, bn, bk in ((512, 512, 1024), (512, 1024, 1024),
                           (1024, 512, 1024), (256, 1024, 1024),
                           (512, 512, 2048), (1024, 1024, 512),
                           (512, 2048, 512), (1024, 1024, 1024)):
            def fused(x, qw, ws, bm=bm, bn=bn, bk=bk):
                s = row_scale(x)
                return fused_q8_matmul(x, s, qw, ws, bm=bm, bn=bn, bk=bk,
                                       out_dtype=x.dtype)
            try:
                dt = timeit(fused, (a, qw, ws), args.iters)
                print(json.dumps({
                    "shape": f"{args.m}x{k}x{n}",
                    "scheme": f"fused_{bm}x{bn}x{bk}",
                    "ms": round(dt * 1e3, 3),
                    "tflops": round(flops / dt / 1e12, 1)}))
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"shape": f"{args.m}x{k}x{n}",
                                  "scheme": f"fused_{bm}x{bn}x{bk}",
                                  "error": str(e)[:160]}))


if __name__ == "__main__":
    main()
