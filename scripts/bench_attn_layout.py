"""Measure: does head-via-grid BlockSpec indexing beat the fold-transpose?

The production wrapper (ops/flash_attention.py::flash_attention) transposes
[B, L, N, D] -> [B*N, L, D] for q/k/v and back for the output — four
materialized layout passes per attention call, ~30 calls per 5B step. A
Pallas grid can instead walk the head axis directly with BlockSpec
(1, block_q, 1, d) index maps over the natural [B, L, N, D] layout, so the
DMA engine does the strided gather and no transpose is ever materialized
in HBM.

This script times both at the 5B headline geometry (L=12095, 24 heads,
d=128, bf16) with the chained-loop method (single-dispatch timings on the
relayed backend carry ~28 ms of fetch latency).

Usage: python scripts/bench_attn_layout.py [--l 12095] [--heads 24]
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

from yume_tpu.ops.flash_attention import (
    _cdiv, _fwd_kernel, _round_up, flash_attention)


def _fwd_grid_heads(q, k, v, kv_len, scale, block_q, block_kv):
    """Forward over the natural [B, L, N, D] layout; heads walked by grid."""
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    b, lq, n, d = q.shape
    lk = k.shape[1]
    block_q = min(block_q, lq)
    block_kv = min(block_kv, lk)
    q_blocks, kv_blocks = _cdiv(lq, block_q), _cdiv(lk, block_kv)

    def kern(kv_len_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
             m_scr, l_scr, acc_scr, *, block_kv, kv_blocks):
        # adapt the 4D refs to the 3D kernel's [1, blk, d] view
        class _V:  # tiny ref view: [0] -> 2D tile
            def __init__(self, ref):
                self.ref = ref
                self.dtype = ref.dtype

            def __getitem__(self, i):
                return self.ref[0, :, 0, :]

            def __setitem__(self, i, val):
                self.ref[0, :, 0, :] = val

        class _L:  # lse view [1,1,blk] -> same
            def __init__(self, ref):
                self.ref = ref

            def __setitem__(self, i, val):
                self.ref[0, 0, 0] = val

        _fwd_kernel(kv_len_ref, _V(q_ref), _V(k_ref), _V(v_ref),
                    _V(o_ref), _L(lse_ref), m_scr, l_scr, acc_scr,
                    scale=1.0, block_kv=block_kv, kv_blocks=kv_blocks)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * n, q_blocks, kv_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, 1, d),
                         lambda bn, qi, ki, *_: (bn // n if n > 1 else bn, qi, bn % n, 0)),
            pl.BlockSpec((1, block_kv, 1, d),
                         lambda bn, qi, ki, *_: (bn // n if n > 1 else bn, ki, bn % n, 0)),
            pl.BlockSpec((1, block_kv, 1, d),
                         lambda bn, qi, ki, *_: (bn // n if n > 1 else bn, ki, bn % n, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, 1, d),
                         lambda bn, qi, ki, *_: (bn // n if n > 1 else bn, qi, bn % n, 0)),
            pl.BlockSpec((1, 1, 1, block_q),
                         lambda bn, qi, ki, *_: (bn // n if n > 1 else bn, 0, bn % n, qi)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )
    out, _lse = pl.pallas_call(
        functools.partial(kern, block_kv=block_kv, kv_blocks=kv_blocks),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, lq, n, d), q.dtype),
            jax.ShapeDtypeStruct((b, 1, n, lq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(kv_len, q, k, v)
    return out


def grid_attention(q, k, v, *, block_q=1024, block_kv=1024):
    b, lq, n, d = q.shape
    lk = k.shape[1]
    scale = d ** -0.5
    bq = min(block_q, _round_up(lq, 128))
    bkv = min(block_kv, _round_up(lk, 128))
    lq_p, lk_p = _round_up(lq, bq), _round_up(lk, bkv)
    if lq_p != lq:
        q = jnp.pad(q, ((0, 0), (0, lq_p - lq), (0, 0), (0, 0)))
    if lk_p != lk:
        k = jnp.pad(k, ((0, 0), (0, lk_p - lk), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, lk_p - lk), (0, 0), (0, 0)))
    kv_len = jnp.repeat(jnp.full((b,), lk, jnp.int32), n)
    out = _fwd_grid_heads(q, k, v, kv_len, scale, bq, bkv)
    return out[:, :lq]


def chain_time(fn, q, k, v, iters=8):
    """Chained device loop: run fn iters times with a data dependency."""
    @jax.jit
    def chained(q, k, v):
        def body(c, _):
            o = fn(q + c * 0.0, k, v)
            return jnp.float32(o[0, 0, 0, 0]), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    _ = float(chained(q, k, v))  # compile+warm
    t0 = time.perf_counter()
    _ = float(chained(q, k, v))
    t_n = time.perf_counter() - t0

    @jax.jit
    def one(q, k, v):
        return jnp.float32(fn(q, k, v)[0, 0, 0, 0])

    _ = float(one(q, k, v))
    t0 = time.perf_counter()
    _ = float(one(q, k, v))
    t_1 = time.perf_counter() - t0
    return (t_n - t_1) / (iters - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--l", type=int, default=12095)
    ap.add_argument("--heads", type=int, default=24)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    shape = (1, args.l, args.heads, args.d)
    q = jax.random.normal(key, shape, jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), shape, jnp.bfloat16)

    t_fold = chain_time(lambda q, k, v: flash_attention(q, k, v),
                        q, k, v, args.iters)
    t_grid = chain_time(lambda q, k, v: grid_attention(q, k, v),
                        q, k, v, args.iters)

    # parity
    o1 = flash_attention(q, k, v)
    o2 = grid_attention(q, k, v)
    err = float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32))))

    flops = 4 * args.l * args.l * args.d * args.heads
    print(json.dumps({
        "geometry": {"l": args.l, "heads": args.heads, "d": args.d},
        "fold_transpose_ms": round(t_fold * 1e3, 2),
        "grid_heads_ms": round(t_grid * 1e3, 2),
        "fold_tflops": round(flops / t_fold / 1e12, 1),
        "grid_tflops": round(flops / t_grid / 1e12, 1),
        "max_abs_err": err,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
