"""Attention dispatch: Pallas flash kernel on TPU, XLA reference elsewhere.

TPU-native replacement for the reference attention wrapper
(wan/modules/attention.py:24-179), which dispatched FA3 → FA2 → SDPA. Here:
``impl='pallas'`` (our flash kernel, yume_tpu/ops/flash_attention.py),
``impl='xla'`` (einsum+softmax reference, used on CPU and as a numerical
oracle in tests), ``impl=None`` auto-selects by backend.

Varlen semantics: the reference passes q_lens/k_lens into flash-attn's
cu_seqlens API; every live call site reduces to "dense q, kv padded to a
fixed length with a true-length mask", which is the ``kv_len`` argument
here.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .flash_attention import flash_attention


def xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    kv_len: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Reference dense attention in fp32 softmax. Layout [B, L, N, D]."""
    d = q.shape[-1]
    if scale is None:
        scale = d ** -0.5
    s = jnp.einsum("bqnd,bknd->bnqk", q.astype(jnp.float32), k.astype(jnp.float32))
    s = s * scale
    if kv_len is not None:
        col = jnp.arange(k.shape[1])
        mask = col[None, :] < kv_len[:, None]  # [B, Lk]
        s = jnp.where(mask[:, None, None, :], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bnqk,bknd->bqnd", p, v.astype(jnp.float32))
    return out.astype(q.dtype)


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    kv_len: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    impl: Optional[str] = None,
) -> jax.Array:
    """Multi-head attention over [B, L, N, D] (same layout as the reference
    wan attention wrapper). ``impl`` may be a callable (q, k, v) -> out for
    custom paths (e.g. a shard_map-bound Ulysses/ring attention)."""
    if callable(impl):
        return impl(q, k, v)
    if impl is None:
        from .partitioning import auto_spmd

        impl = ("pallas" if jax.default_backend() == "tpu"
                and not auto_spmd() else "xla")
    if impl == "pallas":
        return flash_attention(q, k, v, kv_len=kv_len, scale=scale)
    if impl == "xla":
        return xla_attention(q, k, v, kv_len=kv_len, scale=scale)
    raise ValueError(f"unknown attention impl {impl!r}")
