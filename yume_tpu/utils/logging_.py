"""Logging helpers (≙ reference fastvideo/utils/logging_.py `main_print`
rank-0 gating + per-phase timing; plus jax.profiler trace helpers, the
first-class replacement for the reference's ad-hoc wall-clock prints,
SURVEY §5.1)."""

from __future__ import annotations

import contextlib
import time

import jax


def main_print(*args, **kwargs):
    """Print only on process 0 (multi-host)."""
    if jax.process_index() == 0:
        print(*args, **kwargs)


@contextlib.contextmanager
def timed(name: str, sync: bool = False):
    """Wall-clock a phase; with sync=True, blocks on device work."""
    t0 = time.perf_counter()
    yield
    if sync:
        jax.effects_barrier()
    main_print(f"--> {name}: {time.perf_counter() - t0:.4f} s")


@contextlib.contextmanager
def profile(logdir: str = "/tmp/yume_trace"):
    """jax.profiler trace around a region (view with xprof/tensorboard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        main_print(f"trace written to {logdir}")
