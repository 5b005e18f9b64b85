"""Tile densification: block-sparse (BCSR) extraction for MXU aggregation.

The reference fights gather bandwidth with locality scheduling + LSH
reordering so gathered rows stay in L2 (graph_schedule.h:17-89,
script/cluster2.py).  On TPU the measured ceiling of ANY row-gather
formulation is the ~1.2 G-rows/s row-issue rate (PERF_NOTES.md) — far below
the V100 baseline.  The TPU-native escape is the MXU: after a
locality-improving vertex reorder, real graphs concentrate edges in a small
set of dense adjacency tiles.  Those tiles become *dense* blocks multiplied
on the systolic array; the leftover sparse edges go through the standard
gather plan (a hybrid, assembled by ops.bcsr.hybrid_spmm).

This is the same locality insight as the reference's LAS, re-derived for a
machine whose fast path is dense matmul rather than cached gathers.

Design points (all measured on v5e, see PERF_NOTES.md):
  * Tiles are RECTANGULAR [R x 128] with R defaulting to 256: the kernel is
    HBM-bound on (A tile + H tile) traffic, and a taller tile amortizes one
    [128, f] H read over R destination rows.
  * Edge values can be FACTORED out as out = s_dst * (A01 @ (s_src * h))
    when they are a product val[e] = s_dst[dst] * s_src[src] (GCN symmetric
    normalization; unweighted graphs are the trivial case).  The tile
    matrix then holds exact small-integer edge counts, representable
    EXACTLY in bfloat16 — half the A traffic at full f32 accuracy.
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
    data_fields=["a", "tile_col", "tile_row", "scale_dst", "scale_src"],
    meta_fields=[
        "num_nodes",
        "n_src",
        "tile_rows",
        "tile_cols",
        "num_tiles",
        "num_dense_edges",
        "pack",
        "bits",
    ],
)
@dataclasses.dataclass
class TilePlan:
    """Dense adjacency tiles ready for MXU aggregation.

    a:        [num_tiles, R, C] tile values; a[t, i, j] is the weight of
              edge (src = tile_col[t]*C + j) -> (dst = tile_row[t]*R + i),
              0 where no edge (duplicate edges accumulate).
    tile_col: int32[num_tiles] source-tile index per tile.
    tile_row: int32[num_tiles] destination-tile index per tile, sorted
              ascending so output tiles are visited in consecutive runs.
    scale_dst/scale_src: optional f32[num_nodes]/[n_src] diagonal factors
              applied around the tile matmul (factored edge values).
    """

    a: np.ndarray
    tile_col: np.ndarray
    tile_row: np.ndarray
    scale_dst: Optional[np.ndarray]
    scale_src: Optional[np.ndarray]

    num_nodes: int
    n_src: int
    tile_rows: int
    tile_cols: int
    num_tiles: int
    num_dense_edges: int
    # run-length multiple guaranteed by pad_runs (K tiles per Pallas step)
    pack: int = 1
    # bit-packed {0,1} tiles: ``a`` is uint8 [T, R//8, C], bit b of
    # a[t, i, c] == cell (8*i + b, c).  8x less A traffic than int8 — the
    # dominant dense-side HBM cost at reddit scale (PERF_NOTES) — decoded
    # in-kernel by 8 constant shifts + a sublane interleave.  Only valid
    # when every cell multiplicity is 0/1 (see split_bit_tiles).
    bits: bool = False

    @property
    def num_row_tiles(self) -> int:
        return -(-self.num_nodes // self.tile_rows)

    @property
    def num_col_tiles(self) -> int:
        return -(-self.n_src // self.tile_cols)

    def device_put(self, sharding=None) -> "TilePlan":
        import jax.numpy as jnp

        put = (
            (lambda x: jax.device_put(x, sharding))
            if sharding is not None
            else jnp.asarray
        )
        opt = lambda x: None if x is None else put(x)
        return dataclasses.replace(
            self,
            a=put(self.a),
            tile_col=put(self.tile_col),
            tile_row=put(self.tile_row),
            scale_dst=opt(self.scale_dst),
            scale_src=opt(self.scale_src),
        )

    def astype(self, dtype) -> "TilePlan":
        assert not self.bits, "bit-packed tiles have a fixed uint8 layout"
        return dataclasses.replace(self, a=self.a.astype(dtype))

    def unpack_bits(self) -> "TilePlan":
        """Bit-packed plan -> equivalent int8 dense-tile plan (host/XLA
        fallback paths and tests; the Pallas kernels decode in-kernel)."""
        if not self.bits:
            return self
        return dataclasses.replace(
            self, a=unpack_bit_tiles(np.asarray(self.a)), bits=False
        )

    def pad_runs(self, multiple: int) -> "TilePlan":
        """Pad every tile-row run with all-zero tiles so each run's length
        is a multiple of ``multiple`` — the layout contract of the
        pack-K Pallas kernel (K tiles per grid step; a step must never
        straddle two destination runs).  Zero tiles use column 0 and
        contribute nothing.  Typical overhead at reddit scale (runs of
        ~50-80 tiles): <10% for multiple=8."""
        if multiple <= 1:
            return self
        rows = np.asarray(self.tile_row)
        cols = np.asarray(self.tile_col)
        a = np.asarray(self.a)
        segs = []
        i = 0
        while i < len(rows):
            j = i
            while j < len(rows) and rows[j] == rows[i]:
                j += 1
            segs.append((i, j))
            i = j
        na, nr, nc = [], [], []
        for i, j in segs:
            na.append(a[i:j])
            nr.append(rows[i:j])
            nc.append(cols[i:j])
            rem = (j - i) % multiple
            if rem:
                pad = multiple - rem
                na.append(np.zeros((pad,) + a.shape[1:], a.dtype))
                nr.append(np.repeat(rows[i:i+1], pad))
                nc.append(np.zeros(pad, np.int32))
        return dataclasses.replace(
            self,
            a=np.concatenate(na) if na else a,
            tile_row=np.concatenate(nr).astype(np.int32) if nr else rows,
            tile_col=np.concatenate(nc).astype(np.int32) if nc else cols,
            num_tiles=int(sum(len(x) for x in nr)) if nr else 0,
            pack=multiple,
        )

    def transpose(self) -> "TilePlan":
        """Tile plan of the transposed matrix A^T (for backward
        aggregation): swap row/col roles, transpose every tile, re-sort by
        new row.  Requires square tiles OR re-tiling; for rectangular tiles
        the transposed plan has shape [C x R] tiles, which the ops handle
        symmetrically.

        Destination-row coverage is RESTORED after the swap (zero filler
        tiles for forward column-blocks that had no tile): the Pallas
        kernel only initializes output blocks it visits, so an uncovered
        transposed row-block would return uninitialized HBM garbage.
        (Found as a ~4%-of-elements backward error at reddit scale —
        forward plans always cover rows via densify ensure_row_coverage,
        transposed ones only did when every forward column had a tile.)"""
        if self.bits:
            t = self.unpack_bits().transpose()
            return dataclasses.replace(
                t, a=pack_bit_tiles(t.a), bits=True
            )
        order = np.argsort(self.tile_col, kind="stable")
        a = np.ascontiguousarray(
            np.asarray(self.a)[order].transpose(0, 2, 1)
        )
        rows = np.asarray(self.tile_col)[order].astype(np.int32)
        cols = np.asarray(self.tile_row)[order].astype(np.int32)
        num_tiles = self.num_tiles
        nrt_t = -(-self.n_src // self.tile_cols)
        missing = np.setdiff1d(np.arange(nrt_t, dtype=np.int32), rows)
        if len(missing):
            a = np.concatenate(
                [a, np.zeros((len(missing),) + a.shape[1:], a.dtype)]
            )
            rows = np.concatenate([rows, missing])
            cols = np.concatenate([cols, np.zeros(len(missing), np.int32)])
            order2 = np.argsort(rows, kind="stable")
            a, rows, cols = a[order2], rows[order2], cols[order2]
            num_tiles += len(missing)
        return TilePlan(
            a=a,
            tile_col=cols,
            tile_row=rows,
            scale_dst=self.scale_src,
            scale_src=self.scale_dst,
            num_nodes=self.n_src,
            n_src=self.num_nodes,
            tile_rows=self.tile_cols,
            tile_cols=self.tile_rows,
            num_tiles=num_tiles,
            num_dense_edges=self.num_dense_edges,
        )

    def stats(self) -> dict:
        a = np.asarray(self.a)
        return {
            "num_tiles": int(self.num_tiles),
            "tile_rows": int(self.tile_rows),
            "tile_cols": int(self.tile_cols),
            "num_dense_edges": int(self.num_dense_edges),
            "mean_edges_per_tile": (
                self.num_dense_edges / self.num_tiles if self.num_tiles else 0.0
            ),
            "a_bytes": int(a.nbytes),
            "bits": bool(self.bits),
            "factored": self.scale_dst is not None
            or self.scale_src is not None,
        }


def pack_bit_tiles(a: np.ndarray) -> np.ndarray:
    """[T, R, C] 0/1 tiles -> uint8 [T, R//8, C], PLANE-MAJOR along rows:
    bit b of out[t, i, c] = a[t, b*(R//8) + i, c].  Plane-major packing
    lets the kernel decode with 8 constant shift+mask ops and ONE sublane
    concatenation (lane layouts untouched — the cheap direction on TPU);
    a row-interleaved packing would need a stack+reshape relayout."""
    a = np.asarray(a)
    t, r, c = a.shape
    assert r % 8 == 0
    bits = (a != 0).astype(np.uint8).reshape(t, 8, r // 8, c)
    shifts = (1 << np.arange(8, dtype=np.uint8))[None, :, None, None]
    return (bits * shifts).sum(axis=1, dtype=np.uint8)


def unpack_bit_tiles(packed: np.ndarray) -> np.ndarray:
    """Inverse of pack_bit_tiles: uint8 [T, R//8, C] -> int8 [T, R, C]."""
    packed = np.asarray(packed)
    t, r8, c = packed.shape
    planes = np.concatenate(
        [(packed >> b) & 1 for b in range(8)], axis=1
    )  # [T, 8*R//8, C], row = b*(R//8) + i
    return planes.astype(np.int8)


def split_bit_tiles(tp: TilePlan):
    """Split an integer-count TilePlan into (bit_plan, int_plan) by tile
    content: tiles whose every cell is 0/1 go bit-packed (8x less A
    traffic), multigraph tiles (any cell multiplicity > 1 — the hub tiles
    at reddit scale, ~26% of tiles but ~93% of dense edges) stay int8.
    Either part may be None.  Both parts keep full destination-row
    coverage (all-zero filler tiles) so each Pallas call initializes every
    output block; the hybrid op adds the two partial outputs.

    Must run BEFORE pad_runs (the split re-sorts by row and re-pads).
    """
    assert not tp.bits and tp.pack == 1, "split before pad_runs"
    a = np.asarray(tp.a)
    t = a.shape[0]
    if t == 0:
        return None, tp
    multi = np.zeros(t, bool)
    chunk = 4096
    for i in range(0, t, chunk):
        multi[i : i + chunk] = a[i : i + chunk].max(axis=(1, 2)) > 1
    if not multi.any():
        return dataclasses.replace(
            tp, a=pack_bit_tiles(a), bits=True
        ), None
    if multi.all():
        return None, tp

    def part(sel, pack, count_edges):
        aa = a[sel]
        rows = np.asarray(tp.tile_row)[sel]
        cols = np.asarray(tp.tile_col)[sel]
        # restore full row coverage with zero tiles
        nrt = -(-tp.num_nodes // tp.tile_rows)
        missing = np.setdiff1d(np.arange(nrt, dtype=np.int32), rows)
        if len(missing):
            aa = np.concatenate(
                [aa, np.zeros((len(missing),) + aa.shape[1:], aa.dtype)]
            )
            rows = np.concatenate([rows, missing])
            cols = np.concatenate([cols, np.zeros(len(missing), np.int32)])
        order = np.argsort(rows, kind="stable")
        return dataclasses.replace(
            tp,
            a=pack_bit_tiles(aa[order]) if pack else aa[order],
            tile_row=rows[order].astype(np.int32),
            tile_col=cols[order].astype(np.int32),
            num_tiles=len(rows),
            num_dense_edges=int(count_edges),
            bits=pack,
        )

    edges_multi = int(
        sum(
            a[i : i + chunk][multi[i : i + chunk]].sum(dtype=np.int64)
            for i in range(0, t, chunk)
        )
    )
    bit_plan = part(~multi, True, tp.num_dense_edges - edges_multi)
    int_plan = part(multi, False, edges_multi)
    return bit_plan, int_plan


def densify(
    g: CSRGraph,
    val: Optional[np.ndarray] = None,
    tile_rows: int = 256,
    tile_cols: int = 128,
    threshold: Optional[int] = None,
    ensure_row_coverage: bool = True,
    dtype=np.float32,
    scale_dst: Optional[np.ndarray] = None,
    scale_src: Optional[np.ndarray] = None,
    # backwards-compat alias for square tiles
    tile_size: Optional[int] = None,
) -> Tuple[TilePlan, CSRGraph]:
    """Split a graph into (dense tile plan, residual sparse graph).

    Edges falling in [tile_rows x tile_cols] adjacency blocks holding at
    least ``threshold`` edges are materialized as dense MXU tiles; the rest
    are returned as a residual CSRGraph (same node ids) for the gather path.
    Default threshold scales with tile area: 48 edges per 128x128 of area
    (the v5e break-even density, PERF_NOTES.md).

    With ``scale_dst``/``scale_src`` given, tile entries hold
    ``val[e] / (scale_dst[dst] * scale_src[src])`` (exact edge counts when
    val is exactly that product) and the scales ride along in the plan; the
    residual graph keeps the ORIGINAL values, so
    hybrid = scaled-tile-matmul + plain residual aggregation.

    ``ensure_row_coverage`` appends one all-zero tile for every destination
    tile-row with no dense tile, so a Pallas kernel writing output blocks by
    tile_row covers (and zero-initializes) the whole output.
    """
    if tile_size is not None:
        tile_rows = tile_cols = tile_size
    if threshold is None:
        threshold = max(1, (48 * tile_rows * tile_cols) // (128 * 128))
    if val is None:
        val = g.val
    if val is None:
        val = np.ones(g.num_edges, np.float32)
    val = np.asarray(val, np.float32)

    tr, tc = tile_rows, tile_cols
    src = g.indices.astype(np.int64)
    dst = g.dst_per_edge.astype(np.int64)
    nct = -(-g.n_src // tc)
    nrt = -(-g.num_nodes // tr)

    key = (dst // tr) * nct + (src // tc)
    nbins = nrt * nct
    if nbins <= (1 << 29):
        # direct histogram over tile cells — O(m + bins), no 114M-key sort
        counts_all = np.bincount(key, minlength=nbins)
        dense_mask = counts_all >= threshold
        edge_dense = dense_mask[key]
        dense_keys = np.flatnonzero(dense_mask)
        tile_id_of_key = np.cumsum(dense_mask) - 1
        tile_of_edge = tile_id_of_key[key[edge_dense]]
    else:  # gigantic bin space: fall back to the sort-based unique
        uniq, inverse, counts = np.unique(
            key, return_inverse=True, return_counts=True
        )
        dense_sel = counts >= threshold
        edge_dense = dense_sel[inverse]
        dense_keys = uniq[dense_sel]
        tile_of_edge = np.searchsorted(dense_keys, key[edge_dense])
    num_tiles = len(dense_keys)

    tile_row = (dense_keys // nct).astype(np.int32)
    tile_col = (dense_keys % nct).astype(np.int32)

    tile_val = val[edge_dense]
    if scale_dst is not None:
        tile_val = tile_val / np.asarray(scale_dst, np.float32)[dst[edge_dense]]
    if scale_src is not None:
        tile_val = tile_val / np.asarray(scale_src, np.float32)[src[edge_dense]]

    de_src = src[edge_dense]
    de_dst = dst[edge_dense]
    flat = tile_of_edge * (tr * tc) + (de_dst % tr) * tc + (de_src % tc)

    # Integer tile dtypes store exact edge COUNTS with a bounded range
    # (int8: 127); cells whose multiplicity exceeds the cap spill the
    # excess duplicate edges back to the residual gather path.
    from gnn_computing_tpu import native as _native

    int_tiles = np.issubdtype(np.dtype(dtype), np.integer)
    if int_tiles:
        assert np.allclose(tile_val, 1.0), (
            "integer tile dtypes hold edge counts — only valid for "
            "unweighted/unit-valued graphs"
        )
        int_cap = int(np.iinfo(dtype).max)
        a8 = np.zeros(max(num_tiles, 0) * tr * tc, dtype)
        spill = (
            _native.saturating_count_i8(flat, int_cap, a8)
            if dtype == np.int8 and num_tiles
            else None
        )
        if spill is None:  # numpy fallback: rank duplicates per cell
            order = np.argsort(flat, kind="stable")
            sf = flat[order]
            _, first, counts_per_cell = np.unique(
                sf, return_index=True, return_counts=True
            )
            rank = np.arange(len(sf)) - np.repeat(first, counts_per_cell)
            spill = np.zeros(len(flat), bool)
            spill[order] = rank >= int_cap
            a8 = None
        if spill.any():
            # demote spilled duplicates: flip their dense flag
            dense_idx = np.flatnonzero(edge_dense)
            edge_dense[dense_idx[spill]] = False
            keep = ~spill
            de_src, de_dst = de_src[keep], de_dst[keep]
            flat = flat[keep]
            tile_val = tile_val[keep]
        if a8 is not None:
            a = a8.reshape(max(num_tiles, 0), tr, tc)
        else:
            a = np.zeros((max(num_tiles, 0), tr, tc), np.float32)
            if num_tiles:
                np.add.at(a.reshape(-1), flat, tile_val)
    else:
        a = np.zeros((max(num_tiles, 0), tr, tc), np.float32)
        if num_tiles:
            flat_c = np.ascontiguousarray(flat, np.int64)
            val_c = np.ascontiguousarray(tile_val, np.float32)
            if not _native.scatter_add_f32(flat_c, val_c, a.reshape(-1)):
                np.add.at(a.reshape(-1), flat, tile_val)

    num_dense_edges = int(edge_dense.sum())

    if ensure_row_coverage:
        missing = np.setdiff1d(
            np.arange(nrt, dtype=np.int32), tile_row, assume_unique=False
        )
        if len(missing):
            a = np.concatenate([a, np.zeros((len(missing), tr, tc), a.dtype)])
            tile_row = np.concatenate([tile_row, missing])
            tile_col = np.concatenate(
                [tile_col, np.zeros(len(missing), np.int32)]
            )
            num_tiles += len(missing)

    order = np.argsort(tile_row, kind="stable")
    plan = TilePlan(
        a=a[order].astype(dtype, copy=False),
        tile_col=tile_col[order].astype(np.int32),
        tile_row=tile_row[order].astype(np.int32),
        scale_dst=(
            None
            if scale_dst is None
            else np.asarray(scale_dst, np.float32)
        ),
        scale_src=(
            None
            if scale_src is None
            else np.asarray(scale_src, np.float32)
        ),
        num_nodes=g.num_nodes,
        n_src=g.n_src,
        tile_rows=tr,
        tile_cols=tc,
        num_tiles=num_tiles,
        num_dense_edges=num_dense_edges,
    )

    res_sel = ~edge_dense
    res = CSRGraph.from_edges(
        dst=dst[res_sel],
        src=src[res_sel].astype(np.int32),
        num_nodes=g.num_nodes,
        val=val[res_sel],
        n_src=g.n_src,
    )
    return plan, res


def densify_gcn_norm(
    g: CSRGraph, **kw
) -> Tuple[TilePlan, CSRGraph]:
    """Densify with the symmetric GCN normalization factored out:
    val[e] = 1/sqrt(deg_dst * deg_src) == scale_dst[dst] * scale_src[src],
    so tiles hold exact edge counts (bf16-exact)."""
    out_deg = np.bincount(g.indices, minlength=g.n_src).astype(np.float32)
    in_deg = g.degrees.astype(np.float32)
    s_dst = 1.0 / np.sqrt(np.maximum(in_deg, 1.0))
    s_src = 1.0 / np.sqrt(np.maximum(out_deg, 1.0))
    val = s_dst[g.dst_per_edge] * s_src[g.indices]
    return densify(g, val=val, scale_dst=s_dst, scale_src=s_src, **kw)
