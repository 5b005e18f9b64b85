"""Profiling / tracing helpers (reference auxiliary subsystem, SURVEY.md §5).

The reference instruments kernels with %globaltimer/%smid clocks
(aggr_gcn.h:116-248) and drives nvprof externally (Figure9/run.sh).  On TPU
the equivalents are (a) the XLA profiler trace, wrapped here, and (b) an
analytic cost model per aggregation plan — bytes moved and FLOPs — playing
the role of the L2-hit-rate / balanced-time derivations.
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional

from gnn_computing_tpu.schedule.plan import AggregationPlan
from gnn_computing_tpu.schedule.tiles import TilePlan


@contextlib.contextmanager
def trace(logdir: str = "/tmp/gnn_tpu_trace"):
    """``with trace(dir): run_step()`` — captures an XLA profiler trace
    viewable in TensorBoard/xprof (the nvprof analog)."""
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def plan_cost(
    plan: AggregationPlan, feature_len: int, dtype_bytes: int = 4
) -> dict:
    """Analytic per-pass cost of the gather strategy on a plan.

    bytes_gathered counts EVERY issued slot (pads included) — the balance /
    occupancy loss the reference measures with per-block clocks shows up
    here as the pad fraction.
    """
    slots = plan.num_tasks_padded * plan.block_size
    row_bytes = feature_len * dtype_bytes
    return {
        "slots_issued": int(slots),
        "valid_edges": int(plan.num_edges),
        "slot_occupancy": plan.num_edges / max(slots, 1),
        "bytes_gathered": int(slots) * row_bytes,
        "bytes_output": plan.num_nodes * row_bytes,
        "flops": 2 * plan.num_edges * feature_len,
    }


def tile_cost(
    tp: TilePlan, feature_len: int, h_bytes_per_elem: int = 2
) -> dict:
    """Analytic per-pass cost of the dense-tile strategy: A-tile stream +
    one H tile per step + one output-tile write per run."""
    a = tp.a
    a_bytes = int(getattr(a, "nbytes", 0))
    t = a.shape[0]
    h_tile_bytes = tp.tile_cols * feature_len * h_bytes_per_elem
    runs = len(set(int(x) for x in tp.tile_row[: tp.num_tiles])) or 1
    return {
        "num_tiles": int(t),
        "a_bytes": a_bytes,
        "h_bytes": int(t) * h_tile_bytes,
        "out_bytes": runs * tp.tile_rows * feature_len * 4,
        "flops_mxu": 2 * int(t) * tp.tile_rows * tp.tile_cols * feature_len,
        "edges_covered": int(tp.num_dense_edges),
        "bytes_per_edge": (
            (a_bytes + t * h_tile_bytes) / max(tp.num_dense_edges, 1)
        ),
    }
