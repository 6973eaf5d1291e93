"""On-chip parity for the fused Pallas quantize+s8-dot route
(ops/quant_matmul.py::_fused_q8_matmul_2d, taken by q8_dot /
int8_dot_general when K >= 8192): identical rounding + exact s32
accumulation means the kernel must match the XLA composition bitwise-ish
(one f32 rescale is the only float op after the dot)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def _oracle(x, qw, wscale):
    a = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(a), axis=-1, keepdims=True),
                    1e-8) / 127.0
    qa = jnp.clip(jnp.round(a / s), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(qa, qw, (((x.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * s * wscale).astype(x.dtype)


@pytest.mark.parametrize("m", [300, 1024])
def test_fused_q8_dot_matches_oracle(m):
    from yume_tpu.ops.quant_matmul import Q8, q8_dot

    k, n = 14336, 512
    x = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32)
    ws = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    qw = jnp.clip(jnp.round(w / ws), -127, 127).astype(jnp.int8)

    got = np.asarray(jax.jit(q8_dot)(x, Q8(q=qw, scale=ws)), np.float32)
    ref = np.asarray(jax.jit(_oracle)(x, qw, ws), np.float32)
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)


def test_fused_route_3d_batch():
    from yume_tpu.ops.quant_matmul import Q8, q8_dot

    k, n = 14336, 256
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 77, k), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(3), (k, n), jnp.float32)
    ws = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    qw = jnp.clip(jnp.round(w / ws), -127, 127).astype(jnp.int8)

    got = np.asarray(jax.jit(q8_dot)(x, Q8(q=qw, scale=ws)), np.float32)
    ref = np.asarray(jax.jit(_oracle)(x, qw, ws), np.float32)
    assert got.shape == (2, 77, n)
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)


def test_int8_dot_general_fused_route():
    from yume_tpu.ops.quant_matmul import int8_dot_general

    k, n = 14336, 384
    x = jax.random.normal(jax.random.PRNGKey(4), (640, k), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(5), (k, n), jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    got = np.asarray(jax.jit(
        lambda x, w: int8_dot_general(x, w, dn))(x, w), np.float32)
    # oracle: quantize the weight exactly as int8_dot_general does
    wf = w.astype(jnp.float32)
    ws = jnp.maximum(jnp.max(jnp.abs(wf), axis=0, keepdims=True),
                     1e-8) / 127.0
    qw = jnp.clip(jnp.round(wf / ws), -127, 127).astype(jnp.int8)
    ref = np.asarray(jax.jit(_oracle)(x, qw, ws), np.float32)
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)


def _q4_oracle(x, q4):
    """The q4_dot relay composition with a plain f32 matmul (CPU-identical
    math: s8×s8 partial sums are < 2^24, exact in f32)."""
    from yume_tpu.ops.quant_matmul import q4_to_q8

    q8 = q4_to_q8(q4)
    a = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(a), axis=-1, keepdims=True),
                    1e-8) / 127.0
    qa = jnp.clip(jnp.round(a / s), -127, 127)
    acc = qa @ q8.q.astype(jnp.float32)
    return (acc * s * q8.scale).astype(x.dtype)


@pytest.mark.parametrize("m,k,n", [(512, 5120, 512), (300, 13824, 256)])
def test_w4a8_kernel_matches_oracle(m, k, n):
    """The W4A8 path (Q4→Q8 relay + s8×s8 MXU dot, fused Pallas at
    K ≥ 8192) must match the jnp relay oracle to f32 noise."""
    from yume_tpu.models.quantized import _quantize_leaf4
    from yume_tpu.ops.quant_matmul import q4_dot

    x = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32) * 0.05
    q4 = _quantize_leaf4(w, group=128)

    got = np.asarray(jax.jit(q4_dot)(x, q4), np.float32)
    ref = np.asarray(jax.jit(_q4_oracle)(x, q4), np.float32)
    np.testing.assert_allclose(got, ref, rtol=2e-6, atol=2e-5)
