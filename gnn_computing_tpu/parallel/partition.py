"""Multi-chip graph partitioning: destination-owned shards + ring schedule.

The reference has NO working distribution (NCCL commented out, GPUNUM==1
asserted everywhere — include/util.h:25,42,72, Figure8/main.cu:32); this
module provides the TPU-native scale-out design from SURVEY.md §2e/§7:

  * vertices are split into D contiguous shards; chip d owns the feature and
    output rows of shard d (destination-owned edges);
  * chip d's edges are scheduled with the LOCALITY schedule whose source
    partitions ARE the shards (graph_schedule.h:17-89 reborn as the
    inter-chip partitioning — the same blocking that gave L2 reuse on GPU
    gives ring-step locality on the pod);
  * aggregation runs as a D-step ring: at step k chip d holds feature shard
    (d+k) mod D (rotated via ppermute) and aggregates the edge group whose
    sources live in that shard, overlapping the permute with compute.

All per-(chip, step) plans are padded to a common task count so the stacked
arrays shard cleanly over the mesh (SPMD).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import numpy as np

from gnn_computing_tpu.graph.csr import CSRGraph
from gnn_computing_tpu.schedule.locality import locality_plan


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["src", "count", "dst", "val"],
    meta_fields=["num_devices", "shard_size", "block_size", "num_edges"],
)
@dataclasses.dataclass
class RingPlan:
    """Stacked per-(chip, ring-step) aggregation plans.

    src/val: [D, D, nt, B] — src ids LOCAL to the step's source shard.
    count:   [D, D, nt]
    dst:     [D, D, nt]    — dst ids LOCAL to the owning chip's shard.
    Axis 0 is sharded over the mesh; axis 1 is the ring step.
    """

    src: np.ndarray
    count: np.ndarray
    dst: np.ndarray
    val: np.ndarray
    num_devices: int
    shard_size: int
    block_size: int
    num_edges: int

    @property
    def tasks_per_step(self) -> int:
        return self.src.shape[2]

    def device_put(self, sharding=None) -> "RingPlan":
        import jax.numpy as jnp

        put = (
            (lambda x: jax.device_put(x, sharding))
            if sharding is not None
            else jnp.asarray
        )
        return dataclasses.replace(
            self,
            src=put(self.src),
            count=put(self.count),
            dst=put(self.dst),
            val=put(self.val),
        )

    def stats(self) -> dict:
        counts = np.asarray(self.count)
        d = self.num_devices
        per_cell_edges = counts.sum(axis=2)  # [D, D]
        local = np.trace(per_cell_edges)
        return {
            "num_devices": d,
            "shard_size": self.shard_size,
            "tasks_per_step": self.tasks_per_step,
            "edges": int(per_cell_edges.sum()),
            "local_edge_fraction": float(local) / max(per_cell_edges.sum(), 1),
            "max_cell_edges": int(per_cell_edges.max()),
            "mean_cell_edges": float(per_cell_edges.mean()),
            "slot_occupancy": float(counts.sum())
            / (counts.size * self.block_size),
        }


def pad_to_shards(g: CSRGraph, num_devices: int) -> CSRGraph:
    """Pad the vertex set so n is a multiple of D (extra isolated rows)."""
    n = g.num_nodes
    n_pad = -(-n // num_devices) * num_devices
    if n_pad == n:
        return g
    indptr = np.concatenate(
        [g.indptr, np.full(n_pad - n, g.indptr[-1], dtype=np.int32)]
    )
    return CSRGraph(indptr=indptr, indices=g.indices, val=g.val, n_src=n_pad)


def build_ring_plan(
    g: CSRGraph,
    num_devices: int,
    block_size: int = 32,
    val: Optional[np.ndarray] = None,
    shuffle_seed: Optional[int] = None,
) -> tuple:
    """Partition + schedule a graph for ring aggregation.

    Returns (ring_plan, padded_graph, perm) where ``perm`` is the vertex
    shuffle applied for load balance (None if shuffle_seed is None).  Output
    row i of the distributed run corresponds to original vertex perm[i]
    (reference reorder semantics, src/data.cu:105-113).
    """
    perm = None
    if shuffle_seed is not None:
        rng = np.random.default_rng(shuffle_seed)
        perm = rng.permutation(g.num_nodes)
        if val is not None:
            g = CSRGraph(g.indptr, g.indices, val=np.asarray(val, np.float32),
                         n_src=g.n_src)
            val = None
        g = g.reorder(perm)

    d = num_devices
    g = pad_to_shards(g, d)
    if val is None:
        val = (
            g.val
            if g.val is not None
            else np.ones(g.num_edges, np.float32)
        )
    n_pad = g.num_nodes
    ns = n_pad // d

    # Per chip: schedule its destination rows with shard-aligned source
    # partitions (LAS where partition == shard).
    per_chip = []
    nt_max = 8
    for dev in range(d):
        lo, hi = dev * ns, (dev + 1) * ns
        sub = CSRGraph(
            indptr=(g.indptr[lo : hi + 1] - g.indptr[lo]).astype(np.int32),
            indices=g.indices[g.indptr[lo] : g.indptr[hi]],
            n_src=n_pad,
        )
        sub_val = val[g.indptr[lo] : g.indptr[hi]]
        plan = locality_plan(
            sub, d, block_size, val=sub_val, pad_multiple=1
        )
        per_chip.append(plan)
        starts = np.asarray(plan.partition_starts)
        nt_max = max(nt_max, int(np.diff(starts).max()) if len(starts) > 1 else 0)

    src = np.zeros((d, d, nt_max, block_size), np.int32)
    valm = np.zeros((d, d, nt_max, block_size), np.float32)
    count = np.zeros((d, d, nt_max), np.int32)
    dst = np.zeros((d, d, nt_max), np.int32)
    for dev, plan in enumerate(per_chip):
        starts = plan.partition_starts
        for k in range(d):
            a, b = starts[k], starts[k + 1]
            nt = b - a
            if nt == 0:
                continue
            # step index: at ring step s chip dev holds shard (dev + s) % d
            s = (k - dev) % d
            # localize to shard k; pad slots must stay in-range (out-of-range
            # gather indices NaN-poison reverse-mode through jnp.take)
            localized = plan.src[a:b].astype(np.int64) - k * ns
            mask = (
                np.arange(block_size, dtype=np.int64)[None, :]
                < plan.count[a:b][:, None]
            )
            src[dev, s, :nt] = np.where(mask, localized, 0)
            valm[dev, s, :nt] = plan.val[a:b]
            count[dev, s, :nt] = plan.count[a:b]
            dst[dev, s, :nt] = plan.dst[a:b]

    ring = RingPlan(
        src=src,
        count=count,
        dst=dst,
        val=valm,
        num_devices=d,
        shard_size=ns,
        block_size=block_size,
        num_edges=g.num_edges,
    )
    return ring, g, perm
