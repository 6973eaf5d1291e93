"""On-chip parity for the fused DiT glue kernels (ops/fused_adaln.py):
each Pallas kernel must match its jnp fallback (the math the CPU golden
suite pins against the torch reference). Tolerances are a few bf16 ulp —
Mosaic fuses multiply-adds the XLA path rounds individually."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yume_tpu.ops import fused_adaln as fa
from yume_tpu.ops import rope as rope_lib

pytestmark = pytest.mark.tpu

B, L, D, K = 1, 2117, 1024, 9   # ragged L on purpose
N, DH = 8, 128


def _tol(got, ref):
    got = np.asarray(got, np.float32)
    ref = np.asarray(ref, np.float32)
    # Mosaic keeps fused multiply-adds in higher precision than the XLA
    # path's per-op rounding, so individual elements may differ by ~1 bf16
    # ulp of the LARGEST INTERMEDIATE (not of the cancelled result). A real
    # defect (wrong modulation row, broken rotation) moves *most* elements
    # by O(1): gate on the mean and a generous per-element cap.
    diff = np.abs(got - ref)
    assert diff.max() <= 0.25, f"worst {diff.max()}"
    assert diff.mean() <= 0.005, f"mean {diff.mean()}"
    assert (diff > 0.05 * np.maximum(np.abs(ref), 1.0)).mean() < 1e-3


@pytest.fixture(scope="module")
def data():
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    return dict(
        x=jax.random.normal(ks[0], (B, L, D), jnp.bfloat16),
        y=jax.random.normal(ks[1], (B, L, D), jnp.bfloat16),
        st=jax.random.normal(ks[2], (B, K, D), jnp.float32),
        bt=jax.random.normal(ks[3], (B, K, D), jnp.float32),
        idx=jax.random.randint(ks[4], (B, L), 0, K),
        w=jax.random.normal(ks[5], (D,), jnp.float32) * 0.1 + 1.0,
        w2=jax.random.normal(ks[6], (D,), jnp.float32) * 0.1 + 1.0,
    )


def test_adaln_norm_matches_fallback(data):
    got = jax.jit(fa.adaln_norm)(data["x"], data["st"], data["bt"],
                                 data["idx"])
    s = jnp.take_along_axis(data["st"], data["idx"][:, :, None], axis=1)
    t = jnp.take_along_axis(data["bt"], data["idx"][:, :, None], axis=1)
    xf = data["x"].astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    n = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
    ref = (n * (1.0 + s) + t).astype(jnp.bfloat16)
    _tol(got, ref)


def test_adaln_norm_affine_form(data):
    # gate=0, K=1: exact affine LayerNorm (AffineLayerNorm/norm3 route)
    w = data["w"][None, None, :]
    bb = data["w2"][None, None, :]
    got = jax.jit(lambda x: fa.adaln_norm(x, w, bb, None, gate=0.0))(data["x"])
    xf = data["x"].astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    n = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
    ref = (n * data["w"] + data["w2"]).astype(jnp.bfloat16)
    _tol(got, ref)


def test_adaln_residual_matches_fallback(data):
    got = jax.jit(fa.adaln_residual)(data["x"], data["y"], data["st"],
                                     data["idx"])
    s = jnp.take_along_axis(data["st"], data["idx"][:, :, None], axis=1)
    ref = (data["x"].astype(jnp.float32)
           + data["y"].astype(jnp.float32) * s).astype(jnp.bfloat16)
    _tol(got, ref)


def test_rms_norm_matches_fallback(data):
    got = jax.jit(lambda x: fa.rms_norm(x, data["w"], eps=1e-5))(data["x"])
    xf = data["x"].astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + 1e-5)
    ref = (n * data["w"]).astype(jnp.bfloat16)
    _tol(got, ref)


def test_grads_flow_through_kernels(data):
    """jax.grad through the Pallas forwards (custom_vjp recomputes via the
    jnp fallback) — must match grad of the fallback composition. Covers
    the TPU training/LoRA/distillation paths."""
    x, y, st, bt, idx = (data["x"], data["y"], data["st"], data["bt"],
                         data["idx"])

    def loss_fused(x, st, bt, y):
        h = fa.adaln_norm(x, st, bt, idx)
        o = fa.adaln_residual(x, h, st, idx)
        o = fa.rms_norm(o, data["w"], eps=1e-5)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_ref(x, st, bt, y):
        s = jnp.take_along_axis(st, idx[:, :, None], axis=1)
        t = jnp.take_along_axis(bt, idx[:, :, None], axis=1)
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        h = (((xf - mu) * jax.lax.rsqrt(var + 1e-6)) * (1.0 + s)
             + t).astype(x.dtype)
        o = (x.astype(jnp.float32) + h.astype(jnp.float32) * s).astype(x.dtype)
        of = o.astype(jnp.float32)
        n = of * jax.lax.rsqrt(jnp.mean(of * of, axis=-1, keepdims=True)
                               + 1e-5)
        return jnp.sum((n * data["w"]).astype(x.dtype).astype(jnp.float32) ** 2)

    g_fused = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(x, st, bt, y)
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(x, st, bt, y)
    for gf, gr in zip(g_fused, g_ref):
        gf = np.asarray(gf, np.float32)
        gr = np.asarray(gr, np.float32)
        denom = np.abs(gr).mean() + 1e-6
        assert np.abs(gf - gr).mean() / denom < 0.02


def test_qk_norm_rope_matches_fallback(data):
    q, k = data["x"], data["y"]
    half = jnp.arange(DH // 2, dtype=jnp.float32) / (DH // 2)
    ang = jnp.arange(L, dtype=jnp.float32)[:, None] * (10000.0 ** -half)
    cos, sin = jnp.cos(ang), jnp.sin(ang)

    def oracle(q, k):
        def norm(xx, w):
            xf = xx.astype(jnp.float32)
            ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
            return (xf * jax.lax.rsqrt(ms + 1e-5) * w).astype(xx.dtype)
        q4 = norm(q, data["w"]).reshape(B, L, N, DH)
        k4 = norm(k, data["w2"]).reshape(B, L, N, DH)
        return (rope_lib.apply_rope(q4, cos, sin).reshape(B, L, D),
                rope_lib.apply_rope(k4, cos, sin).reshape(B, L, D))

    gq, gk = jax.jit(lambda a, b: fa.qk_norm_rope(
        a, b, data["w"], data["w2"], cos, sin, N, eps=1e-5))(q, k)
    rq, rk = jax.jit(oracle)(q, k)
    _tol(gq, rq)
    _tol(gk, rk)
