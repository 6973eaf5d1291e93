"""RoPE golden tests against the reference complex-fp64 formulation.

The oracle reimplements the published rotary formula (complex polar tables,
adjacent-pair rotation) independently in numpy fp64 — the same math as
reference wan23/modules/model.py:27-118 — and checks our fp32 real-valued
implementation against it.
"""

import numpy as np
import jax.numpy as jnp

from yume_tpu.ops import rope


def _oracle_axis_table(max_len, axis_dim, theta=10000.0):
    half = axis_dim // 2
    inv = 1.0 / theta ** (np.arange(0, axis_dim, 2, dtype=np.float64) / axis_dim)
    ang = np.outer(np.arange(max_len, dtype=np.float64), inv)
    return np.exp(1j * ang)  # [max_len, half]


def _oracle_grid_freqs(f_idx, h, w, head_dim, theta=10000.0):
    df, dh, dw = rope.axis_dims(head_dim)
    tf = _oracle_axis_table(1100, df, theta)
    th = _oracle_axis_table(1100, dh, theta)
    tw = _oracle_axis_table(1100, dw, theta)
    f = len(f_idx)
    out = np.concatenate(
        [
            np.broadcast_to(tf[f_idx][:, None, None, :], (f, h, w, df // 2)),
            np.broadcast_to(th[:h][None, :, None, :], (f, h, w, dh // 2)),
            np.broadcast_to(tw[:w][None, None, :, :], (f, h, w, dw // 2)),
        ],
        axis=-1,
    )
    return out.reshape(f * h * w, head_dim // 2)


def _oracle_apply(x, freqs):
    # x: [B, L, N, D]; rotate adjacent pairs by complex multiply.
    b, l, n, d = x.shape
    xc = x.astype(np.float64).reshape(b, l, n, d // 2, 2)
    xc = xc[..., 0] + 1j * xc[..., 1]
    out = xc * freqs[None, :, None, :]
    res = np.stack([out.real, out.imag], axis=-1).reshape(b, l, n, d)
    return res


def test_axis_dims_sum():
    for d in (64, 128, 96):
        df, dh, dw = rope.axis_dims(d)
        assert df + dh + dw == d
        assert df % 2 == dh % 2 == dw % 2 == 0


def test_grid_rope_matches_complex_oracle():
    head_dim = 128  # 5B: 3072/24
    f, h, w = 3, 4, 5
    cos, sin = rope.grid_rope(f, h, w, head_dim)
    oracle = _oracle_grid_freqs(np.arange(f), h, w, head_dim)
    np.testing.assert_allclose(cos, oracle.real, atol=2e-6)
    np.testing.assert_allclose(sin, oracle.imag, atol=2e-6)


def test_grid_rope_f_offset():
    head_dim = 128
    cos, sin = rope.grid_rope(2, 3, 3, head_dim, f_offset=7)
    oracle = _oracle_grid_freqs(np.arange(7, 9), 3, 3, head_dim)
    np.testing.assert_allclose(cos, oracle.real, atol=2e-6)
    np.testing.assert_allclose(sin, oracle.imag, atol=2e-6)


def test_apply_rope_matches_oracle(rng_np):
    head_dim = 64
    b, n = 2, 3
    f, h, w = 2, 3, 4
    l = f * h * w
    x = rng_np.standard_normal((b, l, n, head_dim)).astype(np.float32)
    cos, sin = rope.grid_rope(f, h, w, head_dim)
    got = np.asarray(rope.apply_rope(jnp.asarray(x), jnp.asarray(cos), jnp.asarray(sin)))
    want = _oracle_apply(x, _oracle_grid_freqs(np.arange(f), h, w, head_dim))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_apply_rope_preserves_norm(rng_np):
    # rotations are norm-preserving per pair
    x = rng_np.standard_normal((1, 10, 2, 128)).astype(np.float32)
    cos, sin = rope.grid_rope(10, 1, 1, 128)
    y = np.asarray(rope.apply_rope(jnp.asarray(x), jnp.asarray(cos), jnp.asarray(sin)))
    np.testing.assert_allclose(
        np.linalg.norm(x, axis=-1), np.linalg.norm(y, axis=-1), rtol=1e-4
    )


def test_framepack_rope_offsets_accumulate():
    head_dim = 128
    grids = [(1, 2, 2), (2, 3, 3), (4, 6, 6)]
    cos, sin = rope.framepack_rope(grids, head_dim)
    assert cos.shape[0] == sum(f * h * w for f, h, w in grids)
    # third chunk starts at temporal offset 1+2=3
    c3, s3 = rope.grid_rope(4, 6, 6, head_dim, f_offset=3)
    np.testing.assert_allclose(cos[-4 * 36:], c3, atol=1e-6)
    np.testing.assert_allclose(sin[-4 * 36:], s3, atol=1e-6)
