"""Runtime defaults: persistent compilation cache.

Autoregressive rollout compiles one program per FramePack history bucket;
the persistent cache makes later segments and later runs start instantly
(first compile of the 5B DiT is ~25 s on-device, minutes on a 1-core host).
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    import jax

    if jax.default_backend() != "tpu":
        # CPU AOT cache entries are machine-feature-sensitive (SIGILL risk
        # when the cache moves between hosts) and compiles are cheap there.
        return
    path = path or os.environ.get("YUME_CACHE_DIR", os.path.expanduser("~/.cache/yume_tpu_xla"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def enable_debug_checks():
    """NaN/Inf checking for debugging (the TPU-side analogue of the
    reference's deterministic-attention + sync flags, SURVEY §5.2)."""
    import jax

    jax.config.update("jax_debug_nans", True)
