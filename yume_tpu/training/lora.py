"""LoRA adapters for parameter-efficient fine-tuning.

Equivalent of the reference's peft-based LoRA path (fastvideo/utils/
checkpoint.py:340-397 save/resume, fsdp_util.py:96-110 LoRA wrap policy),
re-designed as a pure param-tree transformation: adapters live in their own
small pytree (trainable), the frozen base stays untouched, and `merge`
produces effective weights under jit (XLA fuses the A·B addition into the
consumer matmul's producer chain — no persistent merged copy).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp


DEFAULT_TARGETS = ("self_attn/q", "self_attn/k", "self_attn/v", "self_attn/o",
                   "cross_attn/q", "cross_attn/k", "cross_attn/v", "cross_attn/o")


def _paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _paths(v, prefix + (k,))
    else:
        yield prefix, tree


def init_lora(
    rng: jax.Array,
    params: Any,
    *,
    rank: int = 16,
    targets: Tuple[str, ...] = DEFAULT_TARGETS,
) -> Dict:
    """Create LoRA (A, B) pairs for every 2-D kernel whose path matches one
    of ``targets``. B is zero-initialised so merged == base at step 0."""
    lora: Dict = {}
    for path, leaf in _paths(params):
        key = "/".join(path)
        if not key.endswith("kernel") or leaf.ndim != 2:
            continue
        if not any(t in key for t in targets):
            continue
        rng, sub = jax.random.split(rng)
        d_in, d_out = leaf.shape
        node = lora
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = {
            "lora_a": jax.random.normal(sub, (d_in, rank), leaf.dtype) / jnp.sqrt(d_in),
            "lora_b": jnp.zeros((rank, d_out), leaf.dtype),
        }
    return lora


def merge_lora(params: Any, lora: Dict, *, scale: float = 1.0) -> Any:
    """Effective params: W + scale·(A @ B) where adapters exist."""
    def go(p, l):
        if isinstance(p, dict):
            return {k: go(v, l.get(k, {})) if isinstance(l, dict) else v
                    for k, v in p.items()}
        return p

    def walk(p_node, l_node):
        out = {}
        for k, v in p_node.items():
            l_sub = l_node.get(k) if isinstance(l_node, dict) else None
            if isinstance(v, dict):
                out[k] = walk(v, l_sub or {})
            elif isinstance(l_sub, dict) and "lora_a" in l_sub:
                out[k] = v + scale * (l_sub["lora_a"] @ l_sub["lora_b"]).astype(v.dtype)
            else:
                out[k] = v
        return out

    return walk(params, lora)


def count_params(tree) -> int:
    return sum(int(l.size) for _, l in _paths(tree))


def make_lora_train_step(
    dit_apply: Callable,
    train_cfg,
    *,
    scale: float = 1.0,
    packed: bool = True,
) -> Callable:
    """Train step over the LoRA tree only (base frozen).

    Returns ``step(state, base_params, batch, rng) -> (state, metrics)``.
    The frozen base is a *step argument* on purpose: closing over it would
    bake the ~10 GiB bf16 tree into the jitted program as constants
    (doubling HBM and retracing on any base change)."""
    from .train_step import make_train_step

    def step(state, base_params, batch, rng):
        inner = make_train_step(
            lambda lora, *a, **kw: dit_apply(
                merge_lora(base_params, lora, scale=scale), *a, **kw),
            train_cfg, packed=packed)
        return inner(state, batch, rng)

    return step
