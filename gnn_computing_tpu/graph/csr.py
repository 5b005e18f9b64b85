"""CSR graph container (host side, numpy).

The reference keeps graphs as raw ``int* indptr / int* indices`` CSR with rows =
destination vertices and indices = source vertices (messages flow src -> dst
within a row); see ``CSR`` in reference include/util.h:197-205 and the loader in
reference src/data.cu:31-139.  We keep the same row convention but wrap it in a
proper container with the operations the framework needs: permutation
(reference ``reorderCSR``, src/data.cu:4-29), transposition (needed for
backward-pass aggregation, which the reference hand-writes in aggr_gat.h),
degree queries, and conversion to device arrays.

All host-side graph manipulation is numpy (vectorized) with optional native
C++ acceleration via gnn_computing_tpu.native.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class CSRGraph:
    """A directed graph in CSR form.

    Row ``i`` lists the *source* vertices of edges whose destination is ``i``
    (in-edges), matching the reference's aggregation convention: aggregating a
    row produces the output feature of destination vertex ``i``.

    Attributes:
      indptr:  int32[n + 1] — row offsets.
      indices: int32[m] — source vertex of each edge, row-major by destination.
      val:     optional float32[m] — per-edge values (e.g. normalized weights).
      n_src:   number of source-side vertices (defaults to n; differs for
               sampled subgraphs / bipartite blocks).
    """

    indptr: np.ndarray
    indices: np.ndarray
    val: Optional[np.ndarray] = None
    n_src: Optional[int] = None

    def __post_init__(self):
        self.indptr = np.asarray(self.indptr, dtype=np.int32)
        self.indices = np.asarray(self.indices, dtype=np.int32)
        if self.val is not None:
            self.val = np.asarray(self.val, dtype=np.float32)
            assert self.val.shape == self.indices.shape
        if self.n_src is None:
            self.n_src = self.num_nodes
        assert self.indptr.ndim == 1 and self.indices.ndim == 1
        assert int(self.indptr[0]) == 0
        assert int(self.indptr[-1]) == self.num_edges

    # ------------------------------------------------------------------ basic
    @property
    def num_nodes(self) -> int:
        return len(self.indptr) - 1

    @property
    def num_edges(self) -> int:
        return len(self.indices)

    @property
    def degrees(self) -> np.ndarray:
        """In-degree of every destination row, int32[n]."""
        return np.diff(self.indptr).astype(np.int32)

    @property
    def dst_per_edge(self) -> np.ndarray:
        """Destination vertex of every edge (COO expansion), int32[m].

        The analog of the reference's ``csr2edgelist`` (aggregator.h:11-23),
        computed vectorized on host instead of with a warp-per-row kernel.
        """
        return np.repeat(
            np.arange(self.num_nodes, dtype=np.int32), self.degrees
        )

    def max_degree(self) -> int:
        d = self.degrees
        return int(d.max()) if len(d) else 0

    # ------------------------------------------------------------- transforms
    @classmethod
    def from_edges(
        cls,
        dst: np.ndarray,
        src: np.ndarray,
        num_nodes: int,
        val: Optional[np.ndarray] = None,
        n_src: Optional[int] = None,
    ) -> "CSRGraph":
        """Build CSR from a COO edge list, sorting edges by destination."""
        dst = np.asarray(dst, dtype=np.int64)
        src = np.asarray(src, dtype=np.int32)
        order = np.argsort(dst, kind="stable")
        dst = dst[order]
        src = src[order]
        if val is not None:
            val = np.asarray(val, dtype=np.float32)[order]
        counts = np.bincount(dst, minlength=num_nodes).astype(np.int64)
        indptr = np.zeros(num_nodes + 1, dtype=np.int64)
        np.cumsum(counts, out=indptr[1:])
        return cls(
            indptr=indptr.astype(np.int32),
            indices=src,
            val=val,
            n_src=n_src,
        )

    def reorder(self, rows: np.ndarray) -> "CSRGraph":
        """Permute the graph so new row ``i`` is old row ``rows[i]``.

        Exactly the semantics of reference ``reorderCSR`` (src/data.cu:4-29):
        ``rows`` maps new id -> old id; indices are renumbered through the
        inverse permutation so sources refer to new ids too.  Requires
        n_src == num_nodes (square graph).
        """
        n = self.num_nodes
        assert self.n_src == n, "reorder requires a square graph"
        rows = np.asarray(rows, dtype=np.int64)
        assert rows.shape == (n,)
        reverse = np.empty(n, dtype=np.int32)
        reverse[rows] = np.arange(n, dtype=np.int32)

        deg = self.degrees.astype(np.int64)
        new_deg = deg[rows]
        new_indptr = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(new_deg, out=new_indptr[1:])
        # Vectorized row gather: for each new row i, copy the slice of the old
        # row rows[i] and renumber its sources.
        old_starts = self.indptr[rows].astype(np.int64)
        # edge k (in new order) belongs to new row r(k); its old position is
        # old_starts[r(k)] + (k - new_indptr[r(k)])
        m = self.num_edges
        row_of_edge = np.repeat(np.arange(n, dtype=np.int64), new_deg)
        offs = np.arange(m, dtype=np.int64) - new_indptr[row_of_edge]
        old_pos = old_starts[row_of_edge] + offs
        new_indices = reverse[self.indices[old_pos]]
        new_val = self.val[old_pos] if self.val is not None else None
        return CSRGraph(
            indptr=new_indptr.astype(np.int32),
            indices=new_indices,
            val=new_val,
        )

    def transpose(self) -> "CSRGraph":
        """Reverse every edge (dst <-> src). Used for backward aggregation."""
        return self.transpose_with_map()[0]

    def transpose_with_map(self) -> tuple:
        """Transpose plus the edge correspondence: returns (gt, edge_map)
        where transposed edge ``i`` is original edge ``edge_map[i]``.  Needed
        to carry per-edge values (e.g. attention scores) into backward-pass
        aggregation over the reversed graph."""
        assert self.n_src is not None
        dst = self.indices.astype(np.int64)
        order = np.argsort(dst, kind="stable")
        gt = CSRGraph.from_edges(
            dst=dst,
            src=self.dst_per_edge,
            num_nodes=self.n_src,
            val=self.val,
            n_src=self.num_nodes,
        )
        return gt, order.astype(np.int64)

    def with_val(self, val: np.ndarray) -> "CSRGraph":
        """Return a copy carrying per-edge values (reference ``updateval``,
        aggr_gcn.h:540-548, without the device-buffer swap)."""
        return CSRGraph(self.indptr, self.indices, val=val, n_src=self.n_src)

    def gcn_norm_val(self) -> np.ndarray:
        """Symmetric GCN normalization 1/sqrt(deg_dst * deg_src) per edge.

        The reference benchmarks use random or all-ones edge values
        (our.py:78); real GCN training wants this normalization, so it is
        provided as a first-class helper.
        """
        out_deg = np.bincount(self.indices, minlength=self.n_src).astype(
            np.float32
        )
        in_deg = self.degrees.astype(np.float32)
        dst = self.dst_per_edge
        denom = np.sqrt(
            np.maximum(in_deg[dst], 1.0) * np.maximum(out_deg[self.indices], 1.0)
        )
        return (1.0 / denom).astype(np.float32)

    # ------------------------------------------------------------------ misc
    def __repr__(self):
        return (
            f"CSRGraph(n={self.num_nodes}, m={self.num_edges}, "
            f"n_src={self.n_src}, val={'yes' if self.val is not None else 'no'})"
        )
