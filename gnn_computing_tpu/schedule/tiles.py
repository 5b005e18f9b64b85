"""Tile densification: block-sparse (BCSR) extraction for MXU aggregation.

The reference fights gather bandwidth with locality scheduling + LSH
reordering so gathered rows stay in L2 (graph_schedule.h:17-89,
script/cluster2.py).  On TPU the measured ceiling of ANY row-gather
formulation is the ~1.2 G-rows/s row-issue rate (PERF_NOTES.md) — far below
the V100 baseline.  The TPU-native escape is the MXU: after a
locality-improving vertex reorder, real graphs concentrate edges in a small
set of dense [TS x TS] adjacency tiles.  Those tiles become *dense* blocks
multiplied on the systolic array (one [TS, TS] @ [TS, f] matmul aggregates
every edge in the tile and reuses each gathered H tile for TS destination
rows); the leftover sparse edges go through the standard gather plan.

This is the same locality insight as the reference's LAS, re-derived for a
machine whose fast path is dense matmul rather than cached gathers.

Cost model (v5e, f=128, bf16 tiles): a dense tile costs ~40 ns (HBM-bound on
the A-tile read) vs ~0.83 ns/edge for gathers => densify tiles with >= ~48
edges.  The threshold is exposed and autotunable.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import numpy as np

from gnn_computing_tpu.graph.csr import CSRGraph


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["a", "tile_col", "tile_row"],
    meta_fields=[
        "num_nodes",
        "n_src",
        "tile_size",
        "num_tiles",
        "num_dense_edges",
    ],
)
@dataclasses.dataclass
class TilePlan:
    """Dense adjacency tiles ready for MXU aggregation.

    a:        [num_tiles, TS, TS] tile values; a[t, i, j] is the weight of
              edge (src = tile_col[t]*TS + j) -> (dst = tile_row[t]*TS + i),
              0 where no edge.
    tile_col: int32[num_tiles] source-tile index per tile.
    tile_row: int32[num_tiles] destination-tile index per tile, sorted
              ascending so output tiles are visited in consecutive runs.
    """

    a: np.ndarray
    tile_col: np.ndarray
    tile_row: np.ndarray

    num_nodes: int
    n_src: int
    tile_size: int
    num_tiles: int
    num_dense_edges: int

    @property
    def num_row_tiles(self) -> int:
        return -(-self.num_nodes // self.tile_size)

    @property
    def num_col_tiles(self) -> int:
        return -(-self.n_src // self.tile_size)

    def device_put(self, sharding=None) -> "TilePlan":
        import jax.numpy as jnp

        put = (
            (lambda x: jax.device_put(x, sharding))
            if sharding is not None
            else jnp.asarray
        )
        return dataclasses.replace(
            self,
            a=put(self.a),
            tile_col=put(self.tile_col),
            tile_row=put(self.tile_row),
        )

    def astype(self, dtype) -> "TilePlan":
        import jax.numpy as jnp

        if isinstance(self.a, np.ndarray):
            a = self.a.astype(dtype)
        else:
            a = self.a.astype(jnp.dtype(dtype))
        return dataclasses.replace(self, a=a)

    def transpose(self) -> "TilePlan":
        """Tile plan of the transposed matrix A^T (for backward aggregation):
        swap row/col roles, transpose every tile, re-sort by new row."""
        order = np.argsort(self.tile_col, kind="stable")
        a = np.ascontiguousarray(
            np.asarray(self.a)[order].transpose(0, 2, 1)
        )
        return TilePlan(
            a=a,
            tile_col=np.asarray(self.tile_row)[order].astype(np.int32),
            tile_row=np.asarray(self.tile_col)[order].astype(np.int32),
            num_nodes=self.n_src,
            n_src=self.num_nodes,
            tile_size=self.tile_size,
            num_tiles=self.num_tiles,
            num_dense_edges=self.num_dense_edges,
        )

    def stats(self) -> dict:
        a = np.asarray(self.a)
        return {
            "num_tiles": int(self.num_tiles),
            "tile_size": int(self.tile_size),
            "num_dense_edges": int(self.num_dense_edges),
            "mean_edges_per_tile": (
                self.num_dense_edges / self.num_tiles if self.num_tiles else 0.0
            ),
            "a_bytes": int(a.nbytes),
        }


def densify(
    g: CSRGraph,
    val: Optional[np.ndarray] = None,
    tile_size: int = 128,
    threshold: int = 48,
    ensure_row_coverage: bool = True,
    dtype=np.float32,
) -> Tuple[TilePlan, CSRGraph]:
    """Split a graph into (dense tile plan, residual sparse graph).

    Edges falling in [tile_size x tile_size] adjacency blocks holding at
    least ``threshold`` edges are materialized as dense MXU tiles; the rest
    are returned as a residual CSRGraph (same node ids) for the gather path.

    ``ensure_row_coverage`` appends one all-zero tile for every destination
    tile-row with no dense tile, so a Pallas kernel writing output blocks by
    tile_row covers (and zero-initializes) the whole output.  Zero tiles are
    exact no-ops.  Duplicate edges accumulate into the tile entry (matching
    segment-sum semantics of the sparse path).
    """
    if val is None:
        val = g.val
    if val is None:
        val = np.ones(g.num_edges, np.float32)
    val = np.asarray(val, np.float32)

    ts = tile_size
    src = g.indices.astype(np.int64)
    dst = g.dst_per_edge.astype(np.int64)
    nct = -(-g.n_src // ts)
    nrt = -(-g.num_nodes // ts)

    key = (dst // ts) * nct + (src // ts)
    uniq, inverse, counts = np.unique(
        key, return_inverse=True, return_counts=True
    )
    dense_sel = counts >= threshold  # per unique tile
    edge_dense = dense_sel[inverse]  # per edge

    dense_keys = uniq[dense_sel]
    num_tiles = len(dense_keys)
    # tile id per dense edge: position of its key among dense keys
    tile_of_edge = np.searchsorted(dense_keys, key[edge_dense])

    tile_row = (dense_keys // nct).astype(np.int32)
    tile_col = (dense_keys % nct).astype(np.int32)

    # dense tile values (duplicates accumulate)
    a = np.zeros((max(num_tiles, 0), ts, ts), np.float32)
    if num_tiles:
        de_src = src[edge_dense]
        de_dst = dst[edge_dense]
        flat = (
            tile_of_edge * (ts * ts)
            + (de_dst % ts) * ts
            + (de_src % ts)
        )
        np.add.at(a.reshape(-1), flat, val[edge_dense])

    num_dense_edges = int(edge_dense.sum())

    if ensure_row_coverage:
        missing = np.setdiff1d(
            np.arange(nrt, dtype=np.int32), tile_row, assume_unique=False
        )
        if len(missing):
            a = np.concatenate(
                [a, np.zeros((len(missing), ts, ts), np.float32)]
            )
            tile_row = np.concatenate([tile_row, missing])
            tile_col = np.concatenate(
                [tile_col, np.zeros(len(missing), np.int32)]
            )
            num_tiles += len(missing)

    order = np.argsort(tile_row, kind="stable")
    plan = TilePlan(
        a=a[order].astype(dtype),
        tile_col=tile_col[order].astype(np.int32),
        tile_row=tile_row[order].astype(np.int32),
        num_nodes=g.num_nodes,
        n_src=g.n_src,
        tile_size=ts,
        num_tiles=num_tiles,
        num_dense_edges=num_dense_edges,
    )

    # residual graph: remaining edges, original ids/order
    res_sel = ~edge_dense
    res = CSRGraph.from_edges(
        dst=dst[res_sel],
        src=src[res_sel].astype(np.int32),
        num_nodes=g.num_nodes,
        val=val[res_sel],
        n_src=g.n_src,
    )
    return plan, res
