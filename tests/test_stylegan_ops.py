"""bias_act / upfirdn2d / filtered_lrelu parity vs the published formulas,
and discriminator smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yume_tpu.ops.bias_act import ACTIVATIONS, bias_act, bias_act_xla
from yume_tpu.ops.filtered_lrelu import filtered_lrelu
from yume_tpu.ops.upfirdn2d import setup_filter, upfirdn2d

ON_TPU = jax.default_backend() == "tpu"


def _oracle_bias_act(x, b, act, alpha, gain, clamp):
    # direct numpy transcription of the reference formula
    # (ADD/th_utils/ops/bias_act.py:75-123)
    if b is not None:
        x = x + b[None, :]
    a = alpha
    f = {
        "linear": lambda v: v,
        "relu": lambda v: np.maximum(v, 0),
        "lrelu": lambda v: np.where(v >= 0, v, a * v),
        "tanh": np.tanh,
        "sigmoid": lambda v: 1 / (1 + np.exp(-v)),
        "elu": lambda v: np.where(v >= 0, v, np.expm1(v)),
        "selu": lambda v: 1.0507009873554805 * np.where(
            v >= 0, v, 1.6732632423543772 * np.expm1(v)),
        "softplus": lambda v: np.log1p(np.exp(-np.abs(v))) + np.maximum(v, 0),
        "swish": lambda v: v / (1 + np.exp(-v)),
    }[act]
    y = f(x) * gain
    if clamp is not None and clamp >= 0:
        y = np.clip(y, -clamp, clamp)
    return y


@pytest.mark.parametrize("act", sorted(ACTIVATIONS))
def test_bias_act_xla_matches_formula(rng_np, act):
    x = rng_np.standard_normal((64, 32)).astype(np.float32) * 3
    b = rng_np.standard_normal((32,)).astype(np.float32)
    spec = ACTIVATIONS[act]
    got = bias_act_xla(jnp.asarray(x), jnp.asarray(b), act=act, clamp=2.0)
    want = _oracle_bias_act(x, b, act, spec.def_alpha, spec.def_gain, 2.0)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)


def test_bias_act_pallas_matches_xla(rng_np):
    from jax.experimental.pallas import tpu as pltpu
    import contextlib

    x = jnp.asarray(rng_np.standard_normal((128, 128)).astype(np.float32))
    b = jnp.asarray(rng_np.standard_normal((128,)).astype(np.float32))
    ctx = contextlib.nullcontext() if ON_TPU else pltpu.force_tpu_interpret_mode()
    with ctx:
        got = bias_act(x, b, act="lrelu", clamp=1.0, impl="pallas")
    want = bias_act(x, b, act="lrelu", clamp=1.0, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_bias_act_grad(rng_np):
    x = jnp.asarray(rng_np.standard_normal((32, 16)).astype(np.float32))
    b = jnp.asarray(rng_np.standard_normal((16,)).astype(np.float32))

    def f_xla(x, b):
        return jnp.sum(bias_act_xla(x, b, act="swish", clamp=1.5) ** 2)

    from jax.experimental.pallas import tpu as pltpu
    import contextlib

    def f_pal(x, b):
        return jnp.sum(bias_act(x, b, act="swish", clamp=1.5, impl="pallas") ** 2)

    gx_ref, gb_ref = jax.grad(f_xla, argnums=(0, 1))(x, b)
    ctx = contextlib.nullcontext() if ON_TPU else pltpu.force_tpu_interpret_mode()
    with ctx:
        gx, gb = jax.grad(f_pal, argnums=(0, 1))(x, b)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_ref), atol=1e-5)


def _oracle_upfirdn2d(x, f, up, down, pad):
    # direct transcription of the reference `_upfirdn2d_ref`
    # (ADD/th_utils/ops/upfirdn2d.py:167-215)
    b, c, h, w = x.shape
    px0, px1, py0, py1 = pad
    # upsample by zero insertion
    z = np.zeros((b, c, h, up, w, up), x.dtype)
    z[:, :, :, 0, :, 0] = x
    z = z.reshape(b, c, h * up, w * up)
    # pad (crop if negative)
    z = np.pad(z, ((0, 0), (0, 0), (max(py0, 0), max(py1, 0)),
                   (max(px0, 0), max(px1, 0))))
    z = z[:, :, max(-py0, 0): z.shape[2] - max(-py1, 0),
          max(-px0, 0): z.shape[3] - max(-px1, 0)]
    # FIR convolve (correlation with flipped filter)
    from scipy.signal import convolve2d

    out = np.stack([
        np.stack([convolve2d(z[i, j], f, mode="valid") for j in range(c)])
        for i in range(b)
    ])
    return out[:, :, ::down, ::down]


@pytest.mark.parametrize("up,down,pad", [(1, 1, (1, 1, 1, 1)), (2, 1, (2, 1, 2, 1)),
                                         (1, 2, (1, 1, 1, 1)), (2, 2, (2, 2, 2, 2))])
def test_upfirdn2d_matches_oracle(rng_np, up, down, pad):
    x = rng_np.standard_normal((2, 3, 8, 8)).astype(np.float32)
    f = setup_filter([1, 3, 3, 1])
    got = upfirdn2d(jnp.asarray(x), f, up=up, down=down, padding=pad)
    want = _oracle_upfirdn2d(x, f, up, down, pad)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)


def test_filtered_lrelu_composition(rng_np):
    x = rng_np.standard_normal((1, 4, 8, 8)).astype(np.float32)
    b = rng_np.standard_normal((4,)).astype(np.float32)
    f = setup_filter([1, 3, 3, 1])
    out = filtered_lrelu(jnp.asarray(x), f, f, jnp.asarray(b), up=2, down=2,
                         impl="xla")
    assert out.shape == (1, 4, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_discriminator_forward(rng_np):
    from yume_tpu.models.discriminator import ProjectedDiscriminator

    disc = ProjectedDiscriminator()
    x = jnp.asarray(rng_np.standard_normal((2, 16, 16, 16)).astype(np.float32))
    variables = disc.init(jax.random.PRNGKey(0), x)
    (logits, logits_f), mut = disc.apply(variables, x, mutable=["spectral"])
    # 5 hooks × 196 tokens
    assert logits.shape == (2, 5 * 196)
    assert logits_f.shape == (196, 5 * 2)
    assert np.isfinite(np.asarray(logits)).all()


def test_hinge_losses():
    from yume_tpu.training.distill import gan_g_loss, hinge_d_loss

    ones = jnp.ones((2, 10))
    # perfect discriminator: real ≥ 1, fake ≤ -1 → zero loss
    assert float(hinge_d_loss(ones, ones, -ones, -ones)) == 0.0
    assert float(gan_g_loss(ones, ones)) == -2.0
