"""Locality-aware schedule (cache/VMEM reuse).

TPU-native rendition of the reference ``locality_schedule`` /
``localityNeighborGrouping`` (graph_schedule.h:17-89, 156-243): iterate edges
in source-column partitions so the gathered input rows of one partition stay
resident — L2 on the GPU, a VMEM tile / ICI feature shard on TPU.  The same
partition boundaries later serve as the per-chip shards of the multi-host ring
aggregation (parallel/), exactly as SURVEY.md §7 prescribes.

Edges are permuted partition-major (stable, so row-major within a partition,
matching the reference's nested par->row->edge loop) and then chunked into
fixed-size tasks; plain LAS (unbounded task size) is the block_size=None
degenerate case using the longest run.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from gnn_computing_tpu.graph.csr import CSRGraph
from gnn_computing_tpu.schedule.plan import AggregationPlan, build_plan
from gnn_computing_tpu.schedule.neighbor_grouping import (
    chunk_runs,
    gather_task_slots,
)


def source_partition_of(
    src: np.ndarray, n_src: int, num_partitions: int
) -> np.ndarray:
    """Partition id per edge: equal ranges of the source id space, last
    partition absorbing the remainder (graph_schedule.h:24-29)."""
    width = max(n_src // num_partitions, 1)
    return np.minimum(src // width, num_partitions - 1).astype(np.int32)


def locality_plan(
    g: CSRGraph,
    num_partitions: int,
    block_size: Optional[int] = 32,
    val: Optional[np.ndarray] = None,
    pad_multiple: int = 8,
) -> AggregationPlan:
    """Schedule(locality[+neighbor_grouping]).

    block_size=None reproduces plain ``locality_schedule`` semantics (one task
    per partition-row run, padded to the longest run); an int cap reproduces
    ``localityNeighborGrouping``.
    """
    if val is None:
        val = g.val
    m = g.num_edges
    n = g.num_nodes
    src_all = g.indices.astype(np.int64)
    dst_all = g.dst_per_edge.astype(np.int64)

    part = source_partition_of(src_all, g.n_src, num_partitions)
    # Stable partition-major permutation; original order is row(dst)-major, so
    # within each partition edges remain grouped by destination row in row
    # order — the reference's nested loop order.
    perm = np.argsort(part, kind="stable").astype(np.int64)
    s_src = src_all[perm]
    s_dst = dst_all[perm]
    s_part = part[perm]
    s_val = None if val is None else np.asarray(val, np.float32)[perm]

    # Runs: maximal spans with equal (partition, dst).
    if m == 0:
        boundaries = np.zeros(1, dtype=np.int64)
    else:
        change = np.flatnonzero(
            (np.diff(s_dst) != 0) | (np.diff(s_part) != 0)
        )
        boundaries = np.concatenate(
            ([0], change + 1, [m])
        ).astype(np.int64)
    run_start = boundaries[:-1]
    run_len = np.diff(boundaries)
    run_dst = s_dst[run_start] if m else np.zeros(0, dtype=np.int64)
    run_part = s_part[run_start] if m else np.zeros(0, dtype=np.int64)

    if block_size is None:
        block_size = int(run_len.max()) if len(run_len) else 1

    task_start, task_count, task_dst, _ = chunk_runs(
        run_start, run_len, run_dst, block_size
    )

    src = gather_task_slots(
        s_src, task_start, task_count, block_size, 0
    ).astype(np.int32)
    if s_val is not None:
        vmat = gather_task_slots(
            s_val, task_start, task_count, block_size, 0.0
        )
    else:
        vmat = gather_task_slots(
            np.ones(m, np.float32), task_start, task_count, block_size, 0.0
        )

    # Partition boundaries in task space (tasks are partition-major).
    task_part = (
        source_partition_of(
            src[np.arange(len(task_start)), 0].astype(np.int64),
            g.n_src,
            num_partitions,
        )
        if len(task_start)
        else np.zeros(0, np.int32)
    )
    starts = np.searchsorted(
        task_part, np.arange(num_partitions + 1), side="left"
    )

    return build_plan(
        src=src,
        count=task_count.astype(np.int32),
        dst=task_dst.astype(np.int32),
        val=vmat,
        edge_perm=perm.astype(np.int32),
        num_nodes=n,
        n_src=g.n_src,
        block_size=block_size,
        num_edges=m,
        sorted_by_dst=False,  # sorted within partitions only
        partition_starts=tuple(int(x) for x in starts),
        pad_multiple=pad_multiple,
    )


def locality_neighbor_grouping_plan(
    g: CSRGraph,
    num_partitions: int,
    block_size: int = 32,
    val: Optional[np.ndarray] = None,
    pad_multiple: int = 8,
) -> AggregationPlan:
    """Alias with the reference's combined-schedule name
    (graph_schedule.h:156-243)."""
    return locality_plan(
        g, num_partitions, block_size, val=val, pad_multiple=pad_multiple
    )
