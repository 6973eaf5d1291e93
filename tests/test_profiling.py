"""First-class tracing/profiling (SURVEY §5.1: jax.profiler traces +
per-phase timing replace the reference's ad-hoc wall-clock prints,
fastvideo/sample/sample.py:763-832 and distill_model.py:709)."""

import jax
import jax.numpy as jnp

from yume_tpu.utils import logging_


def test_phase_registry_accumulates():
    logging_._PHASES.clear()
    with logging_.phase("unit_phase"):
        _ = jnp.sum(jnp.ones((8, 8))).block_until_ready()
    with logging_.phase("unit_phase"):
        pass
    summary = logging_.phase_summary(reset=True)
    assert summary["unit_phase"]["n"] == 2
    assert summary["unit_phase"]["total_s"] >= 0
    assert logging_._PHASES == {}


def test_profile_trace_writes_files(tmp_path):
    logdir = tmp_path / "trace"
    with logging_.profile(str(logdir)):
        with logging_.step_annotation(0, "unit"), logging_.phase("traced"):
            _ = jnp.dot(jnp.ones((64, 64)), jnp.ones((64, 64)))
            jax.effects_barrier()
    logging_.phase_summary(reset=True)
    # the profiler writes a plugins/profile/<ts>/ tree with at least one file
    written = [p for p in logdir.rglob("*") if p.is_file()]
    assert written, f"no trace files under {logdir}"
