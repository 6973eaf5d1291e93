"""upfirdn2d: upsample → FIR filter → downsample (StyleGAN resampling).

TPU-native equivalent of the reference CUDA plugin
(ADD/th_utils/ops/upfirdn2d.{cu,cpp,h}, binding upfirdn2d.py:118-275).
On TPU the right "kernel" for this op is a grouped
`lax.conv_general_dilated` — lhs_dilation implements the zero-insertion
upsample, window strides the downsample, and the FIR filter rides the MXU as
a depthwise conv; a hand-rolled Pallas kernel cannot beat the conv engine
here, so this *is* the native implementation (autodiff gives the exact
custom-gradient the reference implements by transposed filtering).

Semantics match the reference `_upfirdn2d_ref` (upfirdn2d.py:167-215):
x: [B, C, H, W]; f: [fh, fw] (or separable [f]) un-normalised FIR filter;
pad = (x0, x1, y0, y1) may be negative (crop).
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


def setup_filter(f, normalize=True, gain=1.0, separable=None) -> np.ndarray:
    """Prepare a FIR filter (reference upfirdn2d.py:22-58)."""
    f = np.asarray(f, np.float32)
    if f.ndim == 0:
        f = f[None]
    if f.ndim == 1 and separable is not True:
        f = np.outer(f, f)
    if normalize:
        f = f / f.sum()
    return f * gain


def _parse_pad(padding) -> Tuple[int, int, int, int]:
    if isinstance(padding, int):
        return (padding,) * 4
    padding = tuple(padding)
    if len(padding) == 2:
        px, py = padding
        return (px, px, py, py)
    return padding  # (x0, x1, y0, y1)


def upfirdn2d(
    x: jax.Array,
    f: Union[np.ndarray, jax.Array],
    *,
    up: int = 1,
    down: int = 1,
    padding=0,
    gain: float = 1.0,
) -> jax.Array:
    """x: [B, C, H, W] → [B, C, H', W'] with
    H' = (H·up + y0 + y1 − fh + down) // down."""
    b, c, h, w = x.shape
    x0, x1, y0, y1 = _parse_pad(padding)
    f = jnp.asarray(f, jnp.float32)
    if f.ndim == 1:
        f = jnp.outer(f, f)
    fh, fw = f.shape

    eff_gain = gain

    # fold C into batch for a depthwise conv
    xr = x.reshape(b * c, 1, h, w).astype(jnp.float32)
    # conv_general_dilated with lhs_dilation=up inserts up-1 zeros between
    # samples; padding applies in the dilated domain (same as the
    # reference's pad-after-upsample)
    kernel = jnp.flip(f, (0, 1))[None, None]  # correlation → convolution
    # XLA lhs_dilation yields (h-1)*up+1 samples — the reference's
    # zero-insertion upsample keeps the trailing up-1 zeros, so add them
    # to the low-side padding
    out = jax.lax.conv_general_dilated(
        xr, kernel.astype(jnp.float32),
        window_strides=(down, down),
        padding=((y0, y1 + up - 1), (x0, x1 + up - 1)),
        lhs_dilation=(up, up),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    out = out * eff_gain
    _, _, ho, wo = out.shape
    return out.reshape(b, c, ho, wo).astype(x.dtype)


def upsample2d(x, f, up=2, padding=0, gain=1.0):
    """(reference upfirdn2d.py:282-313)"""
    fh, fw = (f.shape[0], f.shape[0]) if np.ndim(f) == 1 else f.shape
    p = _parse_pad(padding)
    pad = (
        p[0] + (fw + up - 1) // 2,
        p[1] + (fw - up) // 2,
        p[2] + (fh + up - 1) // 2,
        p[3] + (fh - up) // 2,
    )
    return upfirdn2d(x, f, up=up, padding=pad, gain=gain * up * up)


def downsample2d(x, f, down=2, padding=0, gain=1.0):
    """(reference upfirdn2d.py:316-347)"""
    fh, fw = (f.shape[0], f.shape[0]) if np.ndim(f) == 1 else f.shape
    p = _parse_pad(padding)
    pad = (
        p[0] + (fw - down + 1) // 2,
        p[1] + (fw - down) // 2,
        p[2] + (fh - down + 1) // 2,
        p[3] + (fh - down) // 2,
    )
    return upfirdn2d(x, f, down=down, padding=pad, gain=gain)


def filter2d(x, f, padding=0, gain=1.0):
    fh, fw = (f.shape[0], f.shape[0]) if np.ndim(f) == 1 else f.shape
    p = _parse_pad(padding)
    pad = (p[0] + fw // 2, p[1] + (fw - 1) // 2, p[2] + fh // 2, p[3] + (fh - 1) // 2)
    return upfirdn2d(x, f, padding=pad, gain=gain)
