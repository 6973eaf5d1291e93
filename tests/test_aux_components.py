"""Tests for the auxiliary components: 8-bit Adam, DiffAugment, plücker
rays, stats collector."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from yume_tpu.data.camera import plucker_rays
from yume_tpu.data.diffaugment import diff_augment
from yume_tpu.training.optim import adam8bit
from yume_tpu.utils.stats import Collector


def test_adam8bit_tracks_fp32_adam(rng_np):
    """Quantized-moment Adam must follow exact fp32 Adam closely on a
    quadratic: same argmin direction, bounded parameter divergence."""
    w0 = {"a": jnp.asarray(rng_np.standard_normal((300,)).astype(np.float32)),
          "b": jnp.asarray(rng_np.standard_normal((7, 5)).astype(np.float32))}
    target = jax.tree_util.tree_map(lambda x: x * 0.0 + 1.5, w0)

    def loss(w):
        return sum(jnp.sum((wi - ti) ** 2)
                   for wi, ti in zip(jax.tree_util.tree_leaves(w),
                                     jax.tree_util.tree_leaves(target)))

    def run(opt):
        w = w0
        state = opt.init(w)
        step = jax.jit(lambda w, s: (lambda g: opt.update(g, s, w))(
            jax.grad(loss)(w)))
        for _ in range(60):
            upd, state = step(w, state)
            w = optax.apply_updates(w, upd)
        return w

    w_q = run(adam8bit(1e-1))
    w_f = run(optax.adam(1e-1))
    # int8 moments inject bounded quantization noise (same as bitsandbytes
    # Adam8bit): expect convergence to the same optimum, not bitwise equality
    for q, f in zip(jax.tree_util.tree_leaves(w_q),
                    jax.tree_util.tree_leaves(w_f)):
        np.testing.assert_allclose(np.asarray(q), np.asarray(f), atol=0.25)
    assert float(loss(w_q)) < 0.05 * float(loss(w0))
    leaves = jax.tree_util.tree_leaves(w_q)
    mean_err = np.mean([np.mean(np.abs(np.asarray(l) - 1.5)) for l in leaves])
    assert mean_err < 0.08


def test_adam8bit_state_is_int8():
    opt = adam8bit(1e-3)
    state = opt.init({"k": jnp.zeros((1000,))})
    leaf = jax.tree_util.tree_leaves(
        state[0].leaves, is_leaf=lambda x: hasattr(x, "m_q"))[0]
    assert leaf.m_q.dtype == jnp.int8 and leaf.v_q.dtype == jnp.int8
    assert leaf.m_q.size == 1024  # padded to BLOCK


def test_diffaugment_shapes_and_effects(rng_np):
    x = jnp.asarray(rng_np.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    rng = jax.random.PRNGKey(0)
    y = diff_augment(rng, x)
    assert y.shape == x.shape
    assert not np.allclose(np.asarray(y), np.asarray(x))
    # cutout zeroes roughly a (h/2)x(w/2) box
    z = diff_augment(rng, jnp.ones_like(x), policy="cutout")
    frac = float(jnp.mean(z == 0.0))
    assert 0.05 < frac < 0.5
    # empty policy is identity
    np.testing.assert_array_equal(np.asarray(diff_augment(rng, x, policy="")),
                                  np.asarray(x))
    # jits (static shapes)
    jax.jit(lambda r, v: diff_augment(r, v))(rng, x)


def test_diffaugment_translation_zero_shift_possible(rng_np):
    """Translation keeps content (shifted copy with zero border)."""
    x = jnp.asarray(rng_np.uniform(0, 1, (4, 8, 8, 1)).astype(np.float32))
    y = diff_augment(jax.random.PRNGKey(3), x, policy="translation")
    # every output value must come from the input or be the zero pad
    xs = set(np.round(np.asarray(x).ravel(), 5).tolist()) | {0.0}
    assert set(np.round(np.asarray(y).ravel(), 5).tolist()) <= xs


def test_plucker_rays_identity_pose():
    h = w = 4
    K = np.array([[[2.0, 2.0, w / 2, h / 2]]])  # [1,1,4]
    c2w = np.eye(4)[None, None]
    p = plucker_rays(K, c2w, h, w)
    assert p.shape == (1, 1, h, w, 6)
    # identity pose, origin at 0 → moment o×d = 0, directions unit-norm
    np.testing.assert_allclose(p[..., :3], 0.0, atol=1e-12)
    np.testing.assert_allclose(np.linalg.norm(p[..., 3:], axis=-1), 1.0,
                               atol=1e-12)
    # center pixels look mostly along +z
    assert p[0, 0, h // 2, w // 2, 5] > 0.9


def test_plucker_rays_translation_moment():
    h = w = 4
    K = np.array([[[2.0, 2.0, w / 2, h / 2]]])
    c2w = np.eye(4)[None, None].copy()
    c2w[..., 0, 3] = 3.0  # camera at x=3
    p = plucker_rays(K, c2w, h, w)
    o = np.array([3.0, 0.0, 0.0])
    d = p[0, 0, 1, 2, 3:]
    np.testing.assert_allclose(p[0, 0, 1, 2, :3], np.cross(o, d), atol=1e-12)


def test_stats_collector():
    c = Collector()
    for v in (1.0, 2.0, 3.0):
        c.report(loss=v, lr=0.1)
    s = c.summary()
    assert s["loss"] == {"mean": 2.0, "min": 1.0, "max": 3.0, "n": 3}
    assert abs(s["lr"]["mean"] - 0.1) < 1e-12
    c.reset()
    c.report(loss=jnp.asarray(5.0))
    assert c.mean("loss") == 5.0
