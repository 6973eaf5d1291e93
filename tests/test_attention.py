"""Flash attention kernel vs XLA reference (values + gradients).

Runs the Pallas kernel in interpreter mode on CPU; on a real TPU the same
tests exercise the compiled kernel (see bench.py for perf).

Tolerances are bf16-scale: TPU MXU matmuls (and the interpreter, which
emulates them) consume inputs at bf16 precision by default, matching how the
reference runs flash-attn in bf16.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yume_tpu.ops.attention import attention, xla_attention
from yume_tpu.ops import flash_attention as fa

ON_TPU = jax.default_backend() == "tpu"


def _pallas_attention(q, k, v, **kw):
    if ON_TPU:
        return fa.flash_attention(q, k, v, **kw)
    # interpreter mode on CPU
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        return fa.flash_attention(q, k, v, **kw)


@pytest.mark.parametrize("lq,lk", [(256, 256), (384, 640)])
def test_flash_matches_xla(rng_np, lq, lk):
    b, n, d = 2, 3, 64
    q = rng_np.standard_normal((b, lq, n, d)).astype(np.float32)
    k = rng_np.standard_normal((b, lk, n, d)).astype(np.float32)
    v = rng_np.standard_normal((b, lk, n, d)).astype(np.float32)
    got = _pallas_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    want = xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=8e-3, rtol=8e-3)


def test_flash_kv_len_mask(rng_np):
    b, lq, lk, n, d = 2, 128, 512, 2, 64
    q = rng_np.standard_normal((b, lq, n, d)).astype(np.float32)
    k = rng_np.standard_normal((b, lk, n, d)).astype(np.float32)
    v = rng_np.standard_normal((b, lk, n, d)).astype(np.float32)
    kv_len = jnp.array([77, 350], jnp.int32)
    got = _pallas_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), kv_len=kv_len
    )
    want = xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), kv_len=kv_len)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=8e-3, rtol=8e-3)


def _interpret_ctx():
    import contextlib

    if ON_TPU:
        return contextlib.nullcontext()
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.force_tpu_interpret_mode()


def test_flash_grad_matches_xla(rng_np):
    b, l, n, d = 1, 256, 2, 64
    q = rng_np.standard_normal((b, l, n, d)).astype(np.float32)
    k = rng_np.standard_normal((b, l, n, d)).astype(np.float32)
    v = rng_np.standard_normal((b, l, n, d)).astype(np.float32)
    g = rng_np.standard_normal((b, l, n, d)).astype(np.float32)

    def loss(fn, q, k, v):
        return jnp.sum(fn(q, k, v) * jnp.asarray(g))

    grads_ref = jax.grad(functools.partial(loss, xla_attention), argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    )
    with _interpret_ctx():
        grads_got = jax.grad(
            functools.partial(loss, fa.flash_attention), argnums=(0, 1, 2)
        )(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    for got, want, name in zip(grads_got, grads_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-2, rtol=5e-2, err_msg=name
        )


def test_flash_grad_with_mask(rng_np):
    b, lq, lk, n, d = 1, 128, 256, 1, 64
    q = jnp.asarray(rng_np.standard_normal((b, lq, n, d)).astype(np.float32))
    k = jnp.asarray(rng_np.standard_normal((b, lk, n, d)).astype(np.float32))
    v = jnp.asarray(rng_np.standard_normal((b, lk, n, d)).astype(np.float32))
    kv_len = jnp.array([100], jnp.int32)

    def loss(fn, q, k, v):
        return jnp.sum(fn(q, k, v, kv_len=kv_len) ** 2)

    grads_ref = jax.grad(functools.partial(loss, xla_attention), argnums=(0, 1, 2))(q, k, v)
    with _interpret_ctx():
        grads_got = jax.grad(
            functools.partial(loss, fa.flash_attention), argnums=(0, 1, 2)
        )(q, k, v)
    for got, want, name in zip(grads_got, grads_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-2, rtol=5e-2, err_msg=name
        )
    # masked-out kv positions must get zero grad
    np.testing.assert_allclose(np.asarray(grads_got[1])[:, 100:], 0.0, atol=1e-6)


def test_attention_dispatch_bf16(rng_np):
    q = jnp.asarray(rng_np.standard_normal((1, 128, 2, 64)), jnp.bfloat16)
    out = attention(q, q, q, impl="xla")
    assert out.dtype == jnp.bfloat16 and out.shape == q.shape


# ---------------------------------------------------------------------------
# partial attention (ring building block): per-block (o, lse) + merging
# ---------------------------------------------------------------------------


def test_flash_partial_merge_matches_full(rng_np):
    """Running the flash kernel per kv-block and merging via logsumexp must
    equal full attention — the invariant ring attention rests on."""
    from yume_tpu.parallel.ulysses import _merge_partials

    b, lq, lk, n, d = 1, 128, 512, 2, 64
    q = jnp.asarray(rng_np.standard_normal((b, lq, n, d)).astype(np.float32))
    k = jnp.asarray(rng_np.standard_normal((b, lk, n, d)).astype(np.float32))
    v = jnp.asarray(rng_np.standard_normal((b, lk, n, d)).astype(np.float32))
    want = xla_attention(q, k, v)

    with _interpret_ctx():
        o1, l1 = fa.flash_attention_partial(q, k[:, :256], v[:, :256])
        o2, l2 = fa.flash_attention_partial(q, k[:, 256:], v[:, 256:])
    o, _ = _merge_partials(o1.astype(jnp.float32), l1,
                           o2.astype(jnp.float32), l2)
    np.testing.assert_allclose(np.asarray(o), np.asarray(want),
                               atol=8e-3, rtol=8e-3)


def test_flash_partial_fully_masked_block(rng_np):
    """A fully masked kv block (kv_len=0) must merge to zero weight — the
    ring-hop case where a shard holds only pad tokens."""
    from yume_tpu.parallel.ulysses import _merge_partials

    b, lq, lk, n, d = 1, 128, 128, 2, 64
    q = jnp.asarray(rng_np.standard_normal((b, lq, n, d)).astype(np.float32))
    k = jnp.asarray(rng_np.standard_normal((b, lk, n, d)).astype(np.float32))
    v = jnp.asarray(rng_np.standard_normal((b, lk, n, d)).astype(np.float32))
    want = xla_attention(q, k, v)
    with _interpret_ctx():
        o1, l1 = fa.flash_attention_partial(q, k, v)
        o2, l2 = fa.flash_attention_partial(
            q, k, v, kv_len=jnp.zeros((b,), jnp.int32))
    o, _ = _merge_partials(o1.astype(jnp.float32), l1,
                           o2.astype(jnp.float32), l2)
    assert np.isfinite(np.asarray(o)).all()
    np.testing.assert_allclose(np.asarray(o), np.asarray(want),
                               atol=8e-3, rtol=8e-3)


def test_flash_partial_grad_through_merge(rng_np):
    """Gradients through per-block partial attention + lse merge must match
    the dense attention gradient — exercises the lse-cotangent fold in the
    partial VJP (ring attention training path)."""
    from yume_tpu.parallel.ulysses import _merge_partials

    b, lq, lk, n, d = 1, 128, 256, 1, 64
    q = jnp.asarray(rng_np.standard_normal((b, lq, n, d)).astype(np.float32))
    k = jnp.asarray(rng_np.standard_normal((b, lk, n, d)).astype(np.float32))
    v = jnp.asarray(rng_np.standard_normal((b, lk, n, d)).astype(np.float32))
    g = jnp.asarray(rng_np.standard_normal((b, lq, n, d)).astype(np.float32))

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v) * g)

    def loss_blocked(q, k, v):
        o1, l1 = fa.flash_attention_partial(q, k[:, :128], v[:, :128])
        o2, l2 = fa.flash_attention_partial(q, k[:, 128:], v[:, 128:])
        o, _ = _merge_partials(o1.astype(jnp.float32), l1,
                               o2.astype(jnp.float32), l2)
        return jnp.sum(o * g)

    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with _interpret_ctx():
        grads_got = jax.grad(loss_blocked, argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip(grads_got, grads_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-2, rtol=5e-2,
            err_msg=name,
        )
