"""Neighbor-grouping schedule (load balancing).

TPU-native rendition of the reference ``neighbor_grouping_schedule``
(graph_schedule.h:91-154): split every CSR row into groups of at most B edges
so each task has bounded work.  On GPU this equalized warp workloads; on TPU it
produces the uniform [num_tasks, B] tile grid that XLA/Pallas require, with B
as the pad-waste vs parallelism trade-off (the reference's ``--nei`` sweep).

Implemented as vectorized numpy passes (no per-row Python loop) — the O(m)
CPU hot loop of the reference (graph_schedule.h:100-120) becomes a handful of
bincount/cumsum/gather array ops.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from gnn_computing_tpu.graph.csr import CSRGraph
from gnn_computing_tpu.schedule.plan import AggregationPlan, build_plan


def chunk_runs(
    run_start: np.ndarray,
    run_len: np.ndarray,
    run_dst: np.ndarray,
    block_size: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Split runs of consecutive edges into tasks of <= block_size edges.

    A run is a maximal contiguous span of scheduled edges sharing one
    destination.  Returns (task_start, task_count, task_dst, task_of_run0)
    where task_start indexes the *scheduled* edge order. Zero-length runs are
    dropped (matching the reference: rows with no edges emit no tasks).
    """
    run_start = np.asarray(run_start, dtype=np.int64)
    run_len = np.asarray(run_len, dtype=np.int64)
    run_dst = np.asarray(run_dst, dtype=np.int64)

    keep = run_len > 0
    run_start, run_len, run_dst = run_start[keep], run_len[keep], run_dst[keep]

    tasks_per_run = -(-run_len // block_size)  # ceil div
    total = int(tasks_per_run.sum())
    first_task = np.zeros(len(run_len) + 1, dtype=np.int64)
    np.cumsum(tasks_per_run, out=first_task[1:])

    task_run = np.repeat(np.arange(len(run_len), dtype=np.int64), tasks_per_run)
    k = np.arange(total, dtype=np.int64) - first_task[task_run]
    task_start = run_start[task_run] + k * block_size
    task_count = np.minimum(block_size, run_len[task_run] - k * block_size)
    task_dst = run_dst[task_run]
    return task_start, task_count, task_dst, first_task


def gather_task_slots(
    edge_arr: np.ndarray,
    task_start: np.ndarray,
    task_count: np.ndarray,
    block_size: int,
    fill,
) -> np.ndarray:
    """Materialize [num_tasks, B] slots from a flat per-edge array."""
    num_edges = len(edge_arr)
    pos = task_start[:, None] + np.arange(block_size, dtype=np.int64)[None, :]
    valid = pos < (task_start + task_count)[:, None]
    pos = np.minimum(pos, max(num_edges - 1, 0))
    out = edge_arr[pos]
    out[~valid] = fill
    return out


def neighbor_grouping_plan(
    g: CSRGraph,
    block_size: int = 32,
    val: Optional[np.ndarray] = None,
    pad_multiple: int = 8,
) -> AggregationPlan:
    """Schedule(neighbor_grouping) — reference graph_schedule.h:91-154."""
    if val is None:
        val = g.val
    deg = g.degrees.astype(np.int64)
    starts = g.indptr[:-1].astype(np.int64)
    dsts = np.arange(g.num_nodes, dtype=np.int64)

    task_start, task_count, task_dst, _ = chunk_runs(
        starts, deg, dsts, block_size
    )
    src = gather_task_slots(
        g.indices.astype(np.int64), task_start, task_count, block_size, 0
    ).astype(np.int32)
    if val is not None:
        vmat = gather_task_slots(
            np.asarray(val, np.float32), task_start, task_count, block_size, 0.0
        )
    else:
        # mask-only values: 1.0 on valid slots so unweighted aggregation
        # (reference all-ones vals, our.py:78) needs no separate mask.
        vmat = gather_task_slots(
            np.ones(g.num_edges, np.float32),
            task_start,
            task_count,
            block_size,
            0.0,
        )

    return build_plan(
        src=src,
        count=task_count.astype(np.int32),
        dst=task_dst.astype(np.int32),
        val=vmat,
        edge_perm=None,  # NG preserves CSR edge order
        num_nodes=g.num_nodes,
        n_src=g.n_src,
        block_size=block_size,
        num_edges=g.num_edges,
        sorted_by_dst=True,
        partition_starts=(0, len(task_start)),
        pad_multiple=pad_multiple,
    )


def nop_plan(
    g: CSRGraph, val: Optional[np.ndarray] = None, pad_multiple: int = 8
) -> AggregationPlan:
    """Schedule(nop): one task per row padded to max degree — the analog of
    the reference's unscheduled warp-per-row path (aggr_gcn.h:5-36).  Only
    sensible for bounded-degree graphs (e.g. the _sample_16 SAGE inputs)."""
    b = max(g.max_degree(), 1)
    return neighbor_grouping_plan(g, b, val=val, pad_multiple=pad_multiple)
