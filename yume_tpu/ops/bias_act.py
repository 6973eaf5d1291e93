"""Fused bias + activation + gain + clamp (StyleGAN `bias_act`).

TPU-native equivalent of the reference CUDA plugin
(ADD/th_utils/ops/bias_act.{cu,cpp,h}, python binding bias_act.py:52-209)
used by the discriminator's FullyConnectedLayer (ADD/models/shared.py:63).
The forward is a single Pallas VPU kernel; the backward comes from a
custom_vjp with the analytic elementwise derivative (XLA fuses it into the
surrounding graph, matching the reference's custom autograd without a
second-order CUDA kernel).

Activation table mirrors reference bias_act.py:20-30 (func, def_alpha,
def_gain).
"""

from __future__ import annotations

import dataclasses
import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


@dataclasses.dataclass(frozen=True)
class ActSpec:
    fn: callable
    grad: callable  # d act(x) / dx, as a function of x (pre-activation)
    def_alpha: float = 0.0
    def_gain: float = 1.0


def _elu(x, alpha):
    return jnp.where(x >= 0, x, jnp.expm1(x))


_SELU_L, _SELU_A = 1.0507009873554805, 1.6732632423543772

ACTIVATIONS = {
    "linear": ActSpec(lambda x, a: x, lambda x, a: jnp.ones_like(x)),
    "relu": ActSpec(lambda x, a: jnp.maximum(x, 0),
                    lambda x, a: (x >= 0).astype(x.dtype),
                    def_gain=float(np.sqrt(2))),
    "lrelu": ActSpec(lambda x, a: jnp.where(x >= 0, x, a * x),
                     lambda x, a: jnp.where(x >= 0, 1.0, a).astype(x.dtype),
                     def_alpha=0.2, def_gain=float(np.sqrt(2))),
    "tanh": ActSpec(lambda x, a: jnp.tanh(x),
                    lambda x, a: 1 - jnp.tanh(x) ** 2),
    "sigmoid": ActSpec(lambda x, a: jax.nn.sigmoid(x),
                       lambda x, a: jax.nn.sigmoid(x) * (1 - jax.nn.sigmoid(x))),
    "elu": ActSpec(_elu, lambda x, a: jnp.where(x >= 0, 1.0, jnp.exp(x))),
    "selu": ActSpec(lambda x, a: _SELU_L * jnp.where(x >= 0, x, _SELU_A * jnp.expm1(x)),
                    lambda x, a: _SELU_L * jnp.where(x >= 0, 1.0, _SELU_A * jnp.exp(x))),
    "softplus": ActSpec(lambda x, a: jax.nn.softplus(x),
                        lambda x, a: jax.nn.sigmoid(x)),
    "swish": ActSpec(lambda x, a: jax.nn.sigmoid(x) * x,
                     lambda x, a: jax.nn.sigmoid(x) * (1 + x * (1 - jax.nn.sigmoid(x))),
                     def_gain=float(np.sqrt(2))),
}


def _apply(x, b, act, alpha, gain, clamp, dim):
    spec = ACTIVATIONS[act]
    if b is not None:
        shape = [1] * x.ndim
        shape[dim] = -1
        x = x + b.reshape(shape)
    y = spec.fn(x, alpha)
    if gain != 1.0:
        y = y * gain
    if clamp is not None and clamp >= 0:
        y = jnp.clip(y, -clamp, clamp)
    return y


def bias_act_xla(x, b=None, *, dim=-1, act="linear", alpha=None, gain=None,
                 clamp=None):
    """Reference XLA implementation (≙ `_bias_act_ref`, bias_act.py:75-123)."""
    spec = ACTIVATIONS[act]
    alpha = spec.def_alpha if alpha is None else float(alpha)
    gain = spec.def_gain if gain is None else float(gain)
    return _apply(x, b, act, alpha, gain, clamp, dim)


# -- pallas forward kernel ---------------------------------------------------


def _kernel(x_ref, *refs, act, alpha, gain, clamp, has_bias):
    b_ref, o_ref = refs if has_bias else (None, refs[0])
    x = x_ref[...].astype(jnp.float32)
    if has_bias:
        x = x + b_ref[...].astype(jnp.float32)[None, :]
    spec = ACTIVATIONS[act]
    y = spec.fn(x, alpha) * gain
    if clamp is not None and clamp >= 0:
        y = jnp.clip(y, -clamp, clamp)
    o_ref[...] = y.astype(o_ref.dtype)


def _forward_pallas(x2, b, act, alpha, gain, clamp):
    n, c = x2.shape
    has_bias = b is not None
    # row-blocked grid so arbitrarily large inputs stay within VMEM;
    # sublane dim must be 8-aligned (or the full array)
    block_n = max(8, ((1 << 18) // max(c, 1)) // 8 * 8)  # ~256K elements (fp32 staging fits VMEM)
    if block_n >= n:
        block_n = n
    grid = (_cdiv_ba(n, block_n),)
    args = (x2, b) if has_bias else (x2,)
    in_specs = [pl.BlockSpec((block_n, c), lambda i: (i, 0))]
    if has_bias:
        in_specs.append(pl.BlockSpec((c,), lambda i: (0,)))
    return pl.pallas_call(
        functools.partial(_kernel, act=act, alpha=alpha, gain=gain,
                          clamp=clamp, has_bias=has_bias),
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((n, c), x2.dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_n, c), lambda i: (i, 0)),
    )(*args)


def _cdiv_ba(a, b):
    return -(-a // b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _bias_act_core(x2, b, act, alpha, gain, clamp, use_pallas):
    if use_pallas:
        return _forward_pallas(x2, b, act, alpha, gain, clamp)
    return _apply(x2, b, act, alpha, gain, clamp, dim=-1)


def _core_fwd(x2, b, act, alpha, gain, clamp, use_pallas):
    y = _bias_act_core(x2, b, act, alpha, gain, clamp, use_pallas)
    return y, (x2, b, y)


def _core_bwd(act, alpha, gain, clamp, use_pallas, res, g):
    x2, b, y = res
    spec = ACTIVATIONS[act]
    xb = x2 + b[None, :] if b is not None else x2
    d = spec.grad(xb.astype(jnp.float32), alpha) * gain
    if clamp is not None and clamp >= 0:
        d = jnp.where(jnp.abs(y.astype(jnp.float32)) >= clamp, 0.0, d)
    dx = (g.astype(jnp.float32) * d).astype(x2.dtype)
    db = jnp.sum(dx, axis=0).astype(b.dtype) if b is not None else None
    return dx, db


_bias_act_core.defvjp(_core_fwd, _core_bwd)


def bias_act(x, b=None, *, dim=-1, act="linear", alpha=None, gain=None,
             clamp=None, impl=None):
    """Fused bias+activation+gain+clamp.

    impl: 'pallas' | 'xla' | None (auto: pallas on TPU).
    ``dim`` is the channel axis of ``x`` matching ``b``.
    """
    spec = ACTIVATIONS[act]
    alpha = float(spec.def_alpha if alpha is None else alpha)
    gain = float(spec.def_gain if gain is None else gain)
    if impl is None:
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        return _apply(x, b, act, alpha, gain, clamp, dim)

    # canonicalise to [-1, C] 2D with channels last for the kernel
    dim = dim % x.ndim
    perm = [i for i in range(x.ndim) if i != dim] + [dim]
    inv = np.argsort(perm)
    x2 = x.transpose(perm)
    lead = x2.shape[:-1]
    x2 = x2.reshape(-1, x.shape[dim])
    y = _bias_act_core(x2, b, act, alpha, gain, clamp, True)
    return y.reshape(lead + (x.shape[dim],)).transpose(inv)
