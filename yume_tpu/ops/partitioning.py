"""Auto-SPMD gate for the Mosaic (Pallas) kernels.

XLA's SPMD partitioner cannot automatically partition a Mosaic custom
call: a ``pallas_call`` traced with sharded global-shape operands under
plain ``jit`` fails to lower ("Mosaic kernels cannot be automatically
partitioned. Please wrap the call in a shard_map."). The framework's
sharded paths therefore come in two flavors:

* **shard_map'd compute** (SP/USP/ring trunks, PP stages, EP experts —
  ``parallel/sp_forward.py`` etc.): the kernels see per-shard LOCAL
  shapes and stay enabled. This is the serving path; it keeps the fused
  one-pass glue kernels and the Pallas flash attention.
* **auto-partitioned programs** (the fsdp/dp training step: plain ``jit``
  over a mesh with sharding annotations, ``training/train_step.py``):
  kernels must yield to their jnp fallbacks — identical math, XLA-fusable,
  partitionable. Training pays ~10-15% forward latency for it; the
  backward already recomputes through the fallbacks by design
  (ops/fused_adaln.py custom_vjp), so only the forward changes.

``train.py`` flips the gate when its mesh spans >1 device;
``scripts/aot_memory_witness.py`` does the same for the fsdp-train AOT
compile. Single-chip training and all shard_map'd paths keep the kernels.

The flag is read at TRACE time — set it before the first call of a jitted
step (retraces pick up changes; already-compiled programs don't).
"""

from __future__ import annotations

import contextlib

_AUTO_SPMD = False


def set_auto_spmd(on: bool) -> None:
    """Declare that subsequently-traced programs are auto-partitioned by
    GSPMD (not shard_map'd): Pallas kernels fall back to jnp math."""
    global _AUTO_SPMD
    _AUTO_SPMD = bool(on)


def auto_spmd() -> bool:
    return _AUTO_SPMD


@contextlib.contextmanager
def auto_spmd_scope(on: bool = True):
    global _AUTO_SPMD
    prev = _AUTO_SPMD
    _AUTO_SPMD = bool(on)
    try:
        yield
    finally:
        _AUTO_SPMD = prev
