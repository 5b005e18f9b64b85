"""Graph sampling: k-hop subgraphs and fixed-size neighbor sampling.

Reference include/sample.h: ``fullGraph`` (:126-129), ``sampleVertex``
(k-hop frontier expansion + compaction into a CSRSubGraph, :131-200) and
``sampleVertexSampleNeighbor`` (same with a per-vertex neighbor cap via
curand rejection sampling, :274-357).  The reference runs these on GPU with
thrust scans; sampling is host-side data preparation for the TPU pipeline,
so the rebuild uses vectorized numpy with a seeded generator (deterministic,
like the reference's fixed curand seed) — the compiled TPU step only ever
sees the resulting fixed-shape arrays.

``presample_fixed_neighbors`` produces the [n, k] neighbor matrix of the
reference's pre-sampled ``<dset>_sample_16`` inputs (Figure7/run_our.sh:16-20)
consumed by the SAGE-LSTM model.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from gnn_computing_tpu.graph.csr import CSRGraph


@dataclasses.dataclass
class SubGraph:
    """A compacted sampled subgraph (reference CSRSubGraph, util.h:207-221).

    vertices: int32[num_v] — original vertex id of each subgraph row
              (reference ``vertexset``).
    graph:    CSR over renumbered ids: row i aggregates sources given as
              positions into ``vertices``.
    """

    vertices: np.ndarray
    graph: CSRGraph

    @property
    def num_v(self) -> int:
        return len(self.vertices)

    @property
    def num_e(self) -> int:
        return self.graph.num_edges


def full_graph(g: CSRGraph) -> SubGraph:
    """reference fullGraph (sample.h:126-129)."""
    return SubGraph(
        vertices=np.arange(g.num_nodes, dtype=np.int32), graph=g
    )


def _compact(
    g: CSRGraph,
    seeds: np.ndarray,
    hops: int,
    cap: Optional[int],
    rng: np.random.Generator,
) -> SubGraph:
    n = g.num_nodes
    active = np.zeros(n, dtype=bool)
    seeds = np.asarray(seeds, dtype=np.int64)
    active[seeds] = True

    # frontier expansion (expandActive, sample.h:109-124): after `hops`
    # rounds, active = vertices reachable within `hops` edges from seeds.
    frontier = seeds
    for _ in range(hops):
        if len(frontier) == 0:
            break
        starts = g.indptr[frontier].astype(np.int64)
        degs = (g.indptr[frontier + 1] - g.indptr[frontier]).astype(np.int64)
        idx = np.concatenate(
            [np.arange(s, s + d) for s, d in zip(starts, degs)]
        ) if len(frontier) else np.zeros(0, np.int64)
        nbrs = np.unique(g.indices[idx].astype(np.int64))
        new = nbrs[~active[nbrs]]
        active[new] = True
        frontier = new

    vertices = np.flatnonzero(active).astype(np.int32)
    renum = np.full(n, -1, dtype=np.int64)
    renum[vertices] = np.arange(len(vertices))

    # edges among active vertices, rows = active vertices, sources kept only
    # if active (getSubDegree/moveEdge, sample.h:20-45,59-75); native
    # compaction (csrc/gnnhost.cpp gs_subgraph_compact) when available
    from gnn_computing_tpu import native

    compact = native.subgraph_compact(
        vertices,
        g.indptr,
        g.indices,
        active.astype(np.uint8),
        renum,
        cap=0 if cap is None else cap,
        seed=int(rng.integers(1, 2**63 - 1)),
    )
    if compact is not None:
        src, dst, _ = compact
        src = src.astype(np.int64)
        dst = dst.astype(np.int64)
    else:
        dst_rows = []
        src_rows = []
        for new_id, v in enumerate(vertices):
            row = g.indices[g.indptr[v] : g.indptr[v + 1]].astype(np.int64)
            row = row[active[row]]
            if cap is not None and len(row) > cap:
                # per-vertex neighbor cap via sampling without replacement
                # (getSubDegreeWithSample/moveEdgeSelective, sample.h:47-107)
                row = rng.choice(row, size=cap, replace=False)
            src_rows.append(renum[row])
            dst_rows.append(np.full(len(row), new_id, dtype=np.int64))
        src = (
            np.concatenate(src_rows) if src_rows else np.zeros(0, np.int64)
        )
        dst = (
            np.concatenate(dst_rows) if dst_rows else np.zeros(0, np.int64)
        )
    sub = CSRGraph.from_edges(
        dst=dst,
        src=src.astype(np.int32),
        num_nodes=len(vertices),
        n_src=len(vertices),
    )
    return SubGraph(vertices=vertices, graph=sub)


def sample_vertex(
    g: CSRGraph, seeds: np.ndarray, hops: int = 2, seed: int = 123
) -> SubGraph:
    """k-hop expansion + compaction (reference sampleVertex,
    sample.h:131-200)."""
    return _compact(g, seeds, hops, None, np.random.default_rng(seed))


def sample_vertex_sample_neighbor(
    g: CSRGraph,
    seeds: np.ndarray,
    hops: int = 2,
    cap: int = 16,
    seed: int = 123,
) -> SubGraph:
    """k-hop expansion with per-vertex neighbor cap (reference
    sampleVertexSampleNeighbor, sample.h:274-357)."""
    return _compact(g, seeds, hops, cap, np.random.default_rng(seed))


def presample_fixed_neighbors(
    g: CSRGraph, k: int = 16, seed: int = 123
) -> np.ndarray:
    """[n, k] neighbor matrix: k sampled in-neighbors per vertex.

    Vertices with >= k neighbors sample without replacement; smaller rows
    sample with replacement; isolated vertices self-loop — producing the
    fixed-degree graphs of the reference's ``<dset>_sample_16`` inputs.
    Fully vectorized: random keys per edge, segment-wise top-k by argsort.
    """
    n = g.num_nodes
    rng = np.random.default_rng(seed)
    deg = g.degrees.astype(np.int64)
    out = np.empty((n, k), dtype=np.int32)

    # rows with deg >= k: per-edge random keys, take first k per row
    keys = rng.random(g.num_edges)
    # sort edges within rows by key: global argsort of (row, key)
    dst = g.dst_per_edge.astype(np.int64)
    order = np.lexsort((keys, dst))
    sorted_src = g.indices[order]
    # position within row after shuffle
    starts = g.indptr[:-1].astype(np.int64)
    pos_in_row = np.arange(g.num_edges, dtype=np.int64) - starts[dst[order]]
    big = deg >= k
    sel = big[dst[order]] & (pos_in_row < k)
    out_rows = dst[order][sel]
    out_pos = pos_in_row[sel]
    out[out_rows, out_pos] = sorted_src[sel]

    # rows with 0 < deg < k: sample with replacement
    small = np.flatnonzero((deg > 0) & (deg < k))
    if len(small):
        offs = rng.integers(0, deg[small][:, None], size=(len(small), k))
        out[small] = g.indices[
            starts[small][:, None] + offs
        ]

    # isolated rows: self-loops
    iso = np.flatnonzero(deg == 0)
    if len(iso):
        out[iso] = iso[:, None].astype(np.int32)
    return out


def fixed_neighbors_to_graph(nbr: np.ndarray) -> CSRGraph:
    """Convert an [n, k] neighbor matrix to the equivalent fixed-degree CSR
    (what the reference stores on disk as ``<dset>_sample_16.graph``)."""
    n, k = nbr.shape
    indptr = np.arange(0, (n + 1) * k, k, dtype=np.int64)
    return CSRGraph(
        indptr=indptr.astype(np.int32),
        indices=np.asarray(nbr, np.int32).reshape(-1),
    )
