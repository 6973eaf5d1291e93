"""Analytic communication model for the PP / EP trunks, checked against the
compiled HLO by tests/test_comm_volume.py (no multi-chip hardware is
available, so the schedule itself is the witness: collective counts and byte
volumes are asserted from the post-optimization program, and these closed
forms document what a step costs on ICI).

PP (parallel/pipeline.py — GPipe tick loop):
  * one ``collective-permute`` of the activation block [mb, l, d] per tick,
    (M + S − 1) ticks per forward;
  * one masked ``psum`` of the [M, mb, l, d] output buffer at the end;
  * bubble fraction = (S − 1) / (M + S − 1): at inference batch 1 (M = 1)
    the schedule degenerates to sequential stages (bubble (S−1)/S) — PP is
    then purely a memory win (weights 1/S per chip), not a throughput win.

EP (parallel/expert.py — dual-expert layer streaming):
  * one masked ``psum`` per *block-parameter leaf* per layer: the active
    expert's weights stream to every chip each forward, so the ICI volume
    per step is the FULL trunk weight size. Decision rule (documented in
    docs/ARCHITECTURE.md): EP wins only when the step is HBM-capacity-bound
    (both experts cannot fit) AND ICI bandwidth × step time ≥ trunk bytes;
    when one expert fits resident, keeping it resident is strictly better.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def _tree_bytes(tree: Any) -> int:
    return sum(int(np.prod(l.shape)) * l.dtype.itemsize
               for l in jax.tree_util.tree_leaves(tree))


def pp_comm_model(*, microbatches: int, stages: int, mb: int, l: int, d: int,
                  itemsize: int = 4) -> Dict[str, float]:
    """Expected per-forward comm for `pp_dit_apply`.

    Returns instruction counts as they appear in the compiled HLO (the
    collective-permute sits inside the tick while-loop body, so it appears
    ONCE; ``ticks`` is its trip count) plus total byte volumes per device.
    """
    act_bytes = mb * l * d * itemsize
    ticks = microbatches + stages - 1
    return {
        "hlo_collective_permutes": 1,
        "ticks": ticks,
        "permute_bytes_total": ticks * act_bytes,
        "hlo_all_reduces": 1,
        "psum_bytes": microbatches * mb * l * d * itemsize,
        "bubble_fraction": (stages - 1) / ticks,
    }


def ep_comm_model(blocks_one_expert: Any, num_layers: int) -> Dict[str, float]:
    """Expected per-forward comm for `ep_dit_apply`.

    ``blocks_one_expert``: one expert's stacked trunk subtree ([N, ...]
    leaves). The per-layer psum streams 1/N of it; HLO shows one all-reduce
    per leaf inside the layer while-loop (trip count ``num_layers``).
    """
    leaves = jax.tree_util.tree_leaves(blocks_one_expert)
    trunk_bytes = _tree_bytes(blocks_one_expert)
    return {
        "hlo_all_reduces": len(leaves),
        "layers": num_layers,
        "stream_bytes_total": trunk_bytes,
    }
