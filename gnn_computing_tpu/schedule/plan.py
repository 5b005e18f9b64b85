"""Aggregation plans: irregular CSR -> fixed-shape tiled work for TPU.

The reference's schedule layer (include/graph_schedule.h) rewrites a CSR into a
``(ptr_scheduled, idx_scheduled, target_scheduled)`` triple of *variable-size*
tasks consumed by CUDA kernels with atomics.  XLA/Pallas want *static shapes*,
so the TPU-native equivalent emits a dense, padded task grid:

  src   int32[num_tasks_p, B]  source vertex per (task, slot); pad slots -> 0
  count int32[num_tasks_p]     valid slots per task (mask = iota < count)
  dst   int32[num_tasks_p]     destination row per task (reference target_vec)
  val   f32 [num_tasks_p, B]   optional edge values, 0.0 in pad slots

A "task" is the reference's neighbor group (<= B edges, one destination).
Aggregation = gather rows of H by ``src``, weight by ``val``, reduce over the
B slot axis, then segment-sum tasks into destination rows — scatter-free
within a task, one deterministic segment reduction across tasks (replacing the
reference's atomicAdd accumulation, aggr_gcn.h:78-114).

Plans are registered pytrees so they pass through ``jax.jit`` as arguments.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import numpy as np


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["src", "count", "dst", "val", "edge_perm"],
    meta_fields=[
        "num_nodes",
        "n_src",
        "block_size",
        "num_tasks",
        "num_edges",
        "sorted_by_dst",
        "partition_starts",
    ],
)
@dataclasses.dataclass
class AggregationPlan:
    """A scheduled graph: dense padded tasks ready for TPU aggregation."""

    src: np.ndarray  # int32[num_tasks_p, B]
    count: np.ndarray  # int32[num_tasks_p]
    dst: np.ndarray  # int32[num_tasks_p]
    val: Optional[np.ndarray]  # f32[num_tasks_p, B] or None
    # scheduled edge order -> original edge id, or None when the schedule
    # preserves CSR edge order (neighbor grouping does; locality does not).
    edge_perm: Optional[np.ndarray]  # int32[num_edges] or None

    num_nodes: int
    n_src: int
    block_size: int
    num_tasks: int  # valid tasks (before padding)
    num_edges: int
    sorted_by_dst: bool
    # Task-index boundaries of source partitions (locality schedules);
    # (0, num_tasks) when unpartitioned. Tuple of ints => hashable jit meta.
    partition_starts: Tuple[int, ...]

    @property
    def num_tasks_padded(self) -> int:
        if getattr(self.src, "ndim", 2) == 1:  # device-side flat storage
            return self.src.shape[0] // self.block_size
        return self.src.shape[0]

    def src_flat(self):
        """Slot sources as a FLAT [nt_p * B] vector (the only form the
        aggregation kernels touch).  Device plans store src/val flat:
        2-D [nt, B] arrays are (8,128)-tiled in HBM, so B=4 slot grids
        pad 32x — measured 7.46 GB for a 240 MB plan at products scale,
        both at rest and in every pad/copy the compiler makes of them."""
        import jax.numpy as jnp

        return jnp.asarray(self.src).reshape(-1)

    @property
    def num_partitions(self) -> int:
        return len(self.partition_starts) - 1

    def slot_mask(self):
        """bool[num_tasks_p, B] — valid (non-pad) slots."""
        import jax.numpy as jnp

        iota = jnp.arange(self.block_size, dtype=jnp.int32)[None, :]
        return iota < jnp.asarray(self.count)[:, None]

    def device_put(self, sharding=None) -> "AggregationPlan":
        import jax.numpy as jnp

        put = (
            (lambda x: jax.device_put(x, sharding))
            if sharding is not None
            else jnp.asarray
        )
        # src/val go to the device FLAT (see src_flat): narrow 2-D slot
        # grids pay a 128/B lane-padding factor in HBM.  Sharded puts keep
        # the host layout — the ring path shards the task axis and its
        # per-shard sizes are small.
        flat = (
            (lambda x: put(x.reshape(-1)))
            if sharding is None
            else put
        )
        return dataclasses.replace(
            self,
            src=flat(self.src),
            count=put(self.count),
            dst=put(self.dst),
            val=None if self.val is None else flat(self.val),
            edge_perm=None if self.edge_perm is None else put(self.edge_perm),
        )

    def stats(self) -> dict:
        """Task-size diagnostics — the reference's ANALYSE_RESULT histograms
        (graph_schedule.h:58-88) as first-class data."""
        counts = np.asarray(self.count[: self.num_tasks])
        b = self.block_size
        total_slots = self.num_tasks * b
        return {
            "num_tasks": int(self.num_tasks),
            "num_tasks_padded": int(self.num_tasks_padded),
            "block_size": int(b),
            "num_edges": int(self.num_edges),
            "min_task": int(counts.min()) if len(counts) else 0,
            "max_task": int(counts.max()) if len(counts) else 0,
            "mean_task": float(counts.mean()) if len(counts) else 0.0,
            "under_half_full": int((counts < b / 2).sum()),
            "zero_tasks": int((counts == 0).sum()),
            "slot_occupancy": (
                float(counts.sum()) / total_slots if total_slots else 0.0
            ),
            "pad_overhead": (
                float(self.num_tasks_padded * b) / max(self.num_edges, 1)
            ),
        }


def _pad_tasks(arrs: dict, num_tasks: int, multiple: int) -> Tuple[dict, int]:
    """Pad the task axis of every array to a multiple (dst pads to 0 with
    count 0, contributing exact zeros to row 0)."""
    padded = -(-num_tasks // multiple) * multiple
    if padded == num_tasks:
        return arrs, num_tasks
    extra = padded - num_tasks
    out = {}
    for k, v in arrs.items():
        if v is None:
            out[k] = None
            continue
        pad_width = [(0, extra)] + [(0, 0)] * (v.ndim - 1)
        out[k] = np.pad(v, pad_width)
    return out, padded


def build_plan(
    src: np.ndarray,
    count: np.ndarray,
    dst: np.ndarray,
    val: Optional[np.ndarray],
    edge_perm: Optional[np.ndarray],
    num_nodes: int,
    n_src: int,
    block_size: int,
    num_edges: int,
    sorted_by_dst: bool,
    partition_starts: Tuple[int, ...],
    pad_multiple: int = 8,
) -> AggregationPlan:
    num_tasks = src.shape[0]
    arrs, _ = _pad_tasks(
        dict(src=src, count=count, dst=dst, val=val),
        num_tasks,
        pad_multiple,
    )
    return AggregationPlan(
        src=arrs["src"].astype(np.int32),
        count=arrs["count"].astype(np.int32),
        dst=arrs["dst"].astype(np.int32),
        val=None if arrs["val"] is None else arrs["val"].astype(np.float32),
        edge_perm=(
            None if edge_perm is None else np.asarray(edge_perm, np.int32)
        ),
        num_nodes=num_nodes,
        n_src=n_src,
        block_size=block_size,
        num_tasks=num_tasks,
        num_edges=num_edges,
        sorted_by_dst=sorted_by_dst,
        partition_starts=tuple(int(x) for x in partition_starts),
    )
