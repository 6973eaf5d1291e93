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
    import os

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        main_print(f"trace written to {logdir}")


# --------------------------------------------------------------------------
# Per-phase timing registry (≙ reference wall-clock prints sample.py:763-832
# and step_times deque distill_model.py:709, made first-class per SURVEY
# §5.1: named phases nest into the jax.profiler timeline AND accumulate into
# a host-side table printed at the end of a run).
# --------------------------------------------------------------------------

_PHASES: dict = {}


@contextlib.contextmanager
def phase(name: str, sync: bool = False):
    """Time a named phase and tag it in the profiler timeline.

    Accumulates (total_s, count) per name into a process-global registry
    (``phase_summary`` prints it); inside an active ``profile()`` trace the
    region shows up as a named TraceAnnotation span.
    """
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
        if sync:
            jax.effects_barrier()
    tot, cnt = _PHASES.get(name, (0.0, 0))
    _PHASES[name] = (tot + time.perf_counter() - t0, cnt + 1)


def step_annotation(step: int, name: str = "train"):
    """Profiler step marker so xprof groups ops by training step."""
    return jax.profiler.StepTraceAnnotation(name, step_num=step)


def phase_summary(reset: bool = False) -> dict:
    """{name: {"total_s", "n", "mean_s"}}; prints an aligned table."""
    out = {n: {"total_s": t, "n": c, "mean_s": t / max(c, 1)}
           for n, (t, c) in sorted(_PHASES.items(),
                                   key=lambda kv: -kv[1][0])}
    if out:
        w = max(len(n) for n in out)
        main_print(f"{'phase'.ljust(w)}  {'total_s':>9}  {'n':>5}  {'mean_s':>9}")
        for n, r in out.items():
            main_print(f"{n.ljust(w)}  {r['total_s']:9.3f}  {r['n']:5d}  "
                       f"{r['mean_s']:9.4f}")
    if reset:
        _PHASES.clear()
    return out
