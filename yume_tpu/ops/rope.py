"""3D rotary position embeddings for the Wan DiT family.

TPU-first re-design of the reference RoPE (wan23/modules/model.py:27-118,
wan/modules/model.py:29-144): the reference materialises complex fp64
frequency tables (`rope_params` → `torch.polar`) and rotates via complex
multiplication per sample in a Python loop. Here we precompute real-valued
cos/sin tables in fp32 (TPU has no fp64 fast path; fp32 angles are exact to
<1e-6 for positions < 1024) and apply the rotation as fused elementwise VPU
ops over the whole batch.

The head dimension D is split into three axis groups
(frame, height, width) = (D - 4*(D//6), 2*(D//6), 2*(D//6))
matching reference wan23/modules/model.py:475-480, and rotation pairs are
*adjacent* elements (x[..., 2i], x[..., 2i+1]) matching the
`view_as_complex(reshape(..., -1, 2))` convention of
reference wan23/modules/model.py:62.

FramePack multi-resolution RoPE (`up_fre`, reference
wan23/modules/model.py:933-940, wan/modules/model.py:1080-1087): each
compressed history chunk gets frequencies indexed at its *compressed*
temporal offset and its *compressed* spatial extent; `grid_rope` takes an
explicit temporal offset to support this.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def axis_dims(head_dim: int) -> Tuple[int, int, int]:
    """Per-axis rotary sub-dimensions (frame, height, width).

    Matches reference wan23/modules/model.py:475-480.
    """
    d6 = head_dim // 6
    return head_dim - 4 * d6, 2 * d6, 2 * d6


def _inv_freqs(axis_dim: int, theta: float) -> np.ndarray:
    """Inverse frequencies for one axis: theta^(-2j/axis_dim), j=0..axis_dim/2-1.

    Matches reference `rope_params` (wan23/modules/model.py:28-35).
    """
    half = axis_dim // 2
    return theta ** (-np.arange(half, dtype=np.float64) * 2.0 / axis_dim)


@functools.lru_cache(maxsize=32)
def _axis_tables(max_len: int, axis_dim: int, theta: float):
    """cos/sin tables [max_len, axis_dim/2] for one axis (host-side, cached)."""
    angles = np.outer(np.arange(max_len, dtype=np.float64), _inv_freqs(axis_dim, theta))
    return (np.cos(angles).astype(np.float32), np.sin(angles).astype(np.float32))


def grid_rope(
    f_len: int,
    h_len: int,
    w_len: int,
    head_dim: int,
    *,
    f_offset: int = 0,
    max_len: int = 1024,
    theta: float = 10000.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin tables for a (F, H, W) token grid, flattened row-major to
    [F*H*W, head_dim//2].

    ``f_offset`` shifts the temporal positions (FramePack chunk packing uses
    the cumulative compressed-frame count as the offset; reference
    wan23/modules/model.py:613-721 `up_fre(..., f_z)`).

    Returns numpy arrays (host constants — they get embedded into the jitted
    program once per static grid shape).
    """
    df, dh, dw = axis_dims(head_dim)
    fc, fs = _axis_tables(max_len, df, theta)
    hc, hs = _axis_tables(max_len, dh, theta)
    wc, ws = _axis_tables(max_len, dw, theta)

    f_idx = np.arange(f_offset, f_offset + f_len)
    shape = (f_len, h_len, w_len)

    def _assemble(tf, th_, tw):
        out = np.concatenate(
            [
                np.broadcast_to(tf[f_idx][:, None, None, :], shape + (df // 2,)),
                np.broadcast_to(th_[:h_len][None, :, None, :], shape + (dh // 2,)),
                np.broadcast_to(tw[:w_len][None, None, :, :], shape + (dw // 2,)),
            ],
            axis=-1,
        )
        return np.ascontiguousarray(out.reshape(f_len * h_len * w_len, head_dim // 2))

    return _assemble(fc, hc, wc), _assemble(fs, hs, ws)


def framepack_rope(
    chunk_grids: Sequence[Tuple[int, int, int]],
    head_dim: int,
    *,
    max_len: int = 1024,
    theta: float = 10000.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """RoPE tables for a FramePack packed sequence.

    ``chunk_grids`` is the per-chunk (F_compressed, H_compressed,
    W_compressed) token grid list, in packing order (coarsest history first,
    full-resolution tail last). Temporal offsets accumulate across chunks in
    compressed units (reference wan23/modules/model.py:613-721: offsets
    f1, f1+f2, ... and the tail at f_z).
    """
    cos_parts, sin_parts = [], []
    f_off = 0
    for (f, h, w) in chunk_grids:
        c, s = grid_rope(f, h, w, head_dim, f_offset=f_off, max_len=max_len, theta=theta)
        cos_parts.append(c)
        sin_parts.append(s)
        f_off += f
    return np.concatenate(cos_parts, axis=0), np.concatenate(sin_parts, axis=0)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate ``x`` by the given cos/sin tables.

    Args:
        x:   [B, L, N, D] query or key tensor (any float dtype).
        cos: [L, D//2] or [B, L, D//2].
        sin: same shape as cos.

    Rotation pairs adjacent elements (2i, 2i+1), matching the reference's
    `view_as_complex` convention (wan23/modules/model.py:62). Computation in
    fp32 with the result cast back to x.dtype — mirrors the reference's
    autocast-disabled fp64 block (wan23/modules/model.py:38) at TPU-native
    precision.
    """
    b, l, n, d = x.shape
    xf = x.astype(jnp.float32).reshape(b, l, n, d // 2, 2)
    xe, xo = xf[..., 0], xf[..., 1]
    if cos.ndim == 2:
        c = cos[None, :, None, :]
        s = sin[None, :, None, :]
    else:
        c = cos[:, :, None, :]
        s = sin[:, :, None, :]
    re = xe * c - xo * s
    im = xe * s + xo * c
    out = jnp.stack([re, im], axis=-1).reshape(b, l, n, d)
    return out.astype(x.dtype)
