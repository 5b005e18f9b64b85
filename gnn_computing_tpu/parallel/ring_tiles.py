"""Distributed HYBRID aggregation: BCSR tiles + residual gather on a ring.

ROLE (settled round 3): the ring is the CAPACITY-ONLY fallback; the
DEFAULT distribution is `parallel/allgather_tiles.py`.  The crossover is
a memory bound, not a speed crossover:

  * The all-gather form materializes the full gathered H on every chip
    (n_pad * f * 4 B: reddit f=512 -> 0.48 GB, products f=512 -> 5.0 GB
    of v5e's 16 GB HBM) and then reuses the UNMODIFIED single-chip
    Pallas kernels at their measured single-chip rates (PERF_NOTES) —
    per-owner padding, pack-K runs, bit tiles all transfer.
  * The ring never holds more than one feature SHARD (n_pad/D * f * 4 B)
    but pays per-step einsum tiles (no pack-K Pallas dispatch), f32 tile
    storage, and per-(owner,step)-cell max padding — all strictly slower
    per edge than the single-chip kernel path.

  => use the ring exactly when the gathered H cannot fit: roughly
  n * f * 4 B > ~8 GB/chip (half of HBM, leaving room for the tile plan,
  residual arrays, and activations) — e.g. 16 GB H at n=8M/f=512, where
  the all-gather form is simply inadmissible.  Below that bound the
  all-gather form wins outright, so the ring keeps its simple (einsum,
  globally-padded) formulation rather than duplicating the Pallas
  dispatch machinery; `__graft_entry__.dryrun_multichip` exercises it at
  toy scale only for coverage of the ppermute pipeline.

The single-chip hybrid (schedule/tiles.py + ops/bcsr.py) is ~3x faster than
any gather formulation at reddit scale; this module is its multi-chip form,
extending the gather-only ring (parallel/ring.py).  The reference has no
distribution at all (NCCL commented out — include/util.h:25,42,72); this is
the SURVEY.md §2e/§7 scale-out design applied to the MXU-densified schedule:

  * vertices are split into D contiguous shards; chip d owns the output rows
    and feature rows of shard d (destination-owned edges);
  * the PADDED global graph is densified ONCE; each dense tile belongs to
    (owner chip = tile_row shard, ring step = source shard distance), so the
    tile arrays stack as [D, D, T, R, C] and shard cleanly over the mesh;
  * aggregation is a D-step ring: at step s chip d holds feature shard
    (d+s) mod D (rotated via ppermute) and, from that ONE buffer, computes
    both the step's dense-tile matmuls (MXU) and the residual sparse gather
    — one rotation feeds both paths, and XLA overlaps the permute with the
    step's compute (the BASELINE.json halo-overlap north star).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from gnn_computing_tpu.graph.csr import CSRGraph
from gnn_computing_tpu.parallel.mesh import GRAPH_AXIS
from gnn_computing_tpu.parallel.partition import RingPlan, build_ring_plan
from gnn_computing_tpu.schedule.tiles import densify


def _pvary(x, axis):
    """Mark ``x`` as varying over ``axis`` (scan-carry type matching).
    lax.pvary is deprecated in favor of pcast(..., to='varying')."""
    if hasattr(lax, "pcast"):
        return lax.pcast(x, axis, to="varying")
    return lax.pvary(x, axis)  # older jax


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["a", "col", "row"],
    meta_fields=[
        "num_devices",
        "shard_size",
        "tile_rows",
        "tile_cols",
        "num_dense_edges",
    ],
)
@dataclasses.dataclass
class RingTilePlan:
    """Dense tiles bucketed per (owner chip, ring step).

    a:   [D, D, T, R, C] tile values (zero-padded per cell to common T).
    col: [D, D, T] int32 — source tile index LOCAL to the step's shard.
    row: [D, D, T] int32 — destination tile index LOCAL to the owner chip.
    Axis 0 shards over the mesh's graph axis; axis 1 is the ring step.
    """

    a: np.ndarray
    col: np.ndarray
    row: np.ndarray
    num_devices: int
    shard_size: int
    tile_rows: int
    tile_cols: int
    num_dense_edges: int

    @property
    def tiles_per_cell(self) -> int:
        return self.a.shape[2]

    def device_put(self, sharding=None) -> "RingTilePlan":
        put = (
            (lambda x: jax.device_put(x, sharding))
            if sharding is not None
            else jnp.asarray
        )
        return dataclasses.replace(
            self, a=put(self.a), col=put(self.col), row=put(self.row)
        )

    def stats(self) -> dict:
        a = np.asarray(self.a)
        nz_cells = (np.abs(a).sum(axis=(3, 4)) > 0).sum()
        d = self.num_devices
        per_cell = (np.abs(a).sum(axis=(3, 4)) > 0).sum(axis=2)  # [D, D]
        return {
            "num_devices": d,
            "tiles_per_cell_padded": int(self.tiles_per_cell),
            "nonzero_tiles": int(nz_cells),
            "local_tile_fraction": (
                float(per_cell[:, 0].sum()) / max(per_cell.sum(), 1)
            ),
            "a_bytes": int(a.nbytes),
            "num_dense_edges": int(self.num_dense_edges),
        }


def build_ring_hybrid(
    g: CSRGraph,
    num_devices: int,
    tile_rows: int = 256,
    tile_cols: int = 128,
    threshold: Optional[int] = None,
    residual_block: int = 8,
    tile_dtype=np.float32,
    val: Optional[np.ndarray] = None,
) -> Tuple[RingTilePlan, RingPlan, CSRGraph]:
    """(tile ring plan, residual gather ring plan, padded graph).

    The graph is padded so every shard holds a whole number of both row and
    column tiles, densified globally, and the dense tiles are bucketed by
    (owner = tile_row shard, step = (source shard - owner) mod D).  Residual
    edges go through the existing gather ring builder (partition.py).
    """
    d = num_devices
    if val is None and g.val is not None:
        val = g.val
    # shard size must be a multiple of both tile dims
    unit = int(np.lcm(np.lcm(tile_rows, tile_cols), 1))
    n_pad = -(-g.num_nodes // (d * unit)) * (d * unit)
    if n_pad != g.num_nodes:
        indptr = np.concatenate(
            [
                g.indptr,
                np.full(n_pad - g.num_nodes, g.indptr[-1], np.int32),
            ]
        )
        g = CSRGraph(indptr=indptr, indices=g.indices, val=g.val, n_src=n_pad)
    ns = n_pad // d
    nrt_local = ns // tile_rows
    nct_local = ns // tile_cols

    tp, res = densify(
        g,
        val=val,
        tile_rows=tile_rows,
        tile_cols=tile_cols,
        threshold=threshold,
        ensure_row_coverage=False,
        dtype=tile_dtype,
    )
    assert tp.scale_dst is None and tp.scale_src is None

    trow = np.asarray(tp.tile_row)[: tp.num_tiles]
    tcol = np.asarray(tp.tile_col)[: tp.num_tiles]
    a_all = np.asarray(tp.a)[: tp.num_tiles]
    owner = trow // nrt_local
    src_shard = tcol // nct_local
    step = (src_shard - owner) % d

    # bucket (owner, step) -> tile list; pad every cell to the max count
    cell_of_tile = owner * d + step
    order = np.argsort(cell_of_tile, kind="stable")
    cell_sorted = cell_of_tile[order]
    counts = np.bincount(cell_sorted, minlength=d * d)
    t_max = max(int(counts.max()), 1)

    a = np.zeros((d, d, t_max, tile_rows, tile_cols), a_all.dtype)
    col = np.zeros((d, d, t_max), np.int32)
    row = np.zeros((d, d, t_max), np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)])
    for cell in range(d * d):
        sel = order[starts[cell] : starts[cell + 1]]
        if not len(sel):
            continue
        dev, s = divmod(cell, d)
        k = len(sel)
        # keep destination-sorted order within the cell
        sel = sel[np.argsort(trow[sel], kind="stable")]
        a[dev, s, :k] = a_all[sel]
        col[dev, s, :k] = (tcol[sel] % nct_local).astype(np.int32)
        row[dev, s, :k] = (trow[sel] % nrt_local).astype(np.int32)

    rtp = RingTilePlan(
        a=a,
        col=col,
        row=row,
        num_devices=d,
        shard_size=ns,
        tile_rows=tile_rows,
        tile_cols=tile_cols,
        num_dense_edges=tp.num_dense_edges,
    )
    ring, g_ring, _ = build_ring_plan(
        res, d, block_size=residual_block, val=res.val
    )
    assert g_ring.num_nodes == n_pad
    return rtp, ring, g


def _local_ring_hybrid(
    a,
    col,
    row,
    rsrc,
    rcount,
    rdst,
    rval,
    h_local,
    *,
    num_devices,
    tile_rows,
    tile_cols,
    precision,
):
    """Per-chip body under shard_map.

    a: [1, D, T, R, C]; col/row: [1, D, T]; rsrc/rval: [1, D, nt, B];
    rcount/rdst: [1, D, nt]; h_local: [ns, f].
    """
    d = num_devices
    ns, f = h_local.shape
    a, col, row = a[0], col[0], row[0]
    rsrc, rcount, rdst, rval = rsrc[0], rcount[0], rdst[0], rval[0]
    t = a.shape[1]
    nt, b = rsrc.shape[1], rsrc.shape[2]
    nrt = ns // tile_rows
    nct = ns // tile_cols

    perm = [(i, (i - 1) % d) for i in range(d)]

    def step(s, carry):
        out_t, out_r, buf = carry
        nxt = lax.ppermute(buf, GRAPH_AXIS, perm) if d > 1 else buf
        # ---- dense tiles of this step (MXU)
        a_s = lax.dynamic_index_in_dim(a, s, 0, keepdims=False)
        col_s = lax.dynamic_index_in_dim(col, s, 0, keepdims=False)
        row_s = lax.dynamic_index_in_dim(row, s, 0, keepdims=False)
        h_t = buf.reshape(nct, tile_cols, f)
        gsel = jnp.take(h_t, col_s, axis=0)  # [T, C, f]
        p = jnp.einsum(
            "tij,tjf->tif",
            a_s.astype(buf.dtype),
            gsel,
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        out_t = out_t.at[row_s].add(p.astype(out_t.dtype))
        # ---- residual gather from the SAME buffer
        src_s = lax.dynamic_index_in_dim(rsrc, s, 0, keepdims=False)
        val_s = lax.dynamic_index_in_dim(rval, s, 0, keepdims=False)
        dst_s = lax.dynamic_index_in_dim(rdst, s, 0, keepdims=False)
        msg = jnp.take(buf, src_s.reshape(-1), axis=0) * val_s.reshape(-1)[
            :, None
        ].astype(buf.dtype)
        task = msg.reshape(nt, b, f).sum(axis=1)
        out_r = out_r + jax.ops.segment_sum(
            task, dst_s, num_segments=ns, indices_are_sorted=False
        )
        return (out_t, out_r, nxt)

    # pcast marks the fresh zeros as varying over the mesh axis so the scan
    # carry types match the ppermute-updated buffer (zeros_like trick in
    # ring.py, generalized to a different shape).  lax.pvary was deprecated
    # in favor of pcast(..., to='varying').
    out_t0 = _pvary(
        jnp.zeros((nrt, tile_rows, f), h_local.dtype), GRAPH_AXIS
    )
    out_r0 = jnp.zeros_like(h_local)
    out_t, out_r, _ = lax.fori_loop(0, d, step, (out_t0, out_r0, h_local))
    return out_t.reshape(ns, f) + out_r


def ring_hybrid_spmm(
    mesh: Mesh,
    rtp: RingTilePlan,
    ring: RingPlan,
    h: jnp.ndarray,
    precision=lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Distributed hybrid SpMM: h is [n_pad, f] row-sharded over the graph
    axis; returns the aggregated output with the same sharding."""
    body = jax.shard_map(
        functools.partial(
            _local_ring_hybrid,
            num_devices=rtp.num_devices,
            tile_rows=rtp.tile_rows,
            tile_cols=rtp.tile_cols,
            precision=precision,
        ),
        mesh=mesh,
        in_specs=(
            P(GRAPH_AXIS),
            P(GRAPH_AXIS),
            P(GRAPH_AXIS),
            P(GRAPH_AXIS),
            P(GRAPH_AXIS),
            P(GRAPH_AXIS),
            P(GRAPH_AXIS),
            P(GRAPH_AXIS, None),
        ),
        out_specs=P(GRAPH_AXIS, None),
    )
    return body(
        rtp.a, rtp.col, rtp.row, ring.src, ring.count, ring.dst, ring.val, h
    )


def ring_hybrid_gcn_forward(mesh, rtp, ring, params, h):
    """Distributed 3-layer GCN over the hybrid ring (dense transform local,
    aggregation via ring_hybrid_spmm)."""
    for i, w in enumerate(params):
        z = jnp.dot(h, w, preferred_element_type=jnp.float32).astype(h.dtype)
        z = ring_hybrid_spmm(mesh, rtp, ring, z)
        h = jax.nn.relu(z) if i < len(params) - 1 else z
    return h


# ----------------------------------------------------------------- GAT ring
def _local_ring_hybrid_gat(
    a,
    col,
    row,
    rsrc,
    rcount,
    rdst,
    h_local,
    ad_local,
    *,
    num_devices,
    tile_rows,
    tile_cols,
    relu_slope,
    precision,
):
    """Per-chip fused-GAT body under shard_map.

    The rotated buffer packs [h | v1 | as] per source row so one ppermute
    feeds the tile dots, the residual gather, and the attention factors
    (v1 = exp(as); branch-2 factors derive from as in-step).  Unstabilized
    reference form (aggr_gat.h:116-164) so partial denominators from all
    steps merge exactly.
    """
    d = num_devices
    a, col, row = a[0], col[0], row[0]
    rsrc, rcount, rdst = rsrc[0], rcount[0], rdst[0]
    ns = h_local.shape[0]
    f = h_local.shape[1] - 2
    nt, b = rsrc.shape[1], rsrc.shape[2]
    nrt = ns // tile_rows
    nct = ns // tile_cols

    ad = ad_local[:, 0]  # [ns]
    u1 = jnp.exp(ad)
    u2 = jnp.exp(relu_slope * ad)
    u1t = u1.reshape(nrt, tile_rows)
    u2t = u2.reshape(nrt, tile_rows)
    adt = ad.reshape(nrt, tile_rows)

    perm = [(i, (i - 1) % d) for i in range(d)]

    def step(s, carry):
        num, den, buf = carry
        nxt = lax.ppermute(buf, GRAPH_AXIS, perm) if d > 1 else buf
        hb = buf[:, :f]
        v1 = buf[:, f]
        asb = buf[:, f + 1]
        v2 = jnp.exp(relu_slope * asb)
        # ---- dense tiles (two-branch exact form, gat_bcsr_xla math)
        a_s = lax.dynamic_index_in_dim(a, s, 0, keepdims=False)
        col_s = lax.dynamic_index_in_dim(col, s, 0, keepdims=False)
        row_s = lax.dynamic_index_in_dim(row, s, 0, keepdims=False)
        hv1 = jnp.concatenate([hb * v1[:, None], v1[:, None]], axis=1)
        hv2 = jnp.concatenate([hb * v2[:, None], v2[:, None]], axis=1)
        hv1 = hv1.reshape(nct, tile_cols, f + 1)
        hv2 = hv2.reshape(nct, tile_cols, f + 1)
        ast = asb.reshape(nct, tile_cols)
        z = jnp.take(adt, row_s, axis=0)[:, :, None] + jnp.take(
            ast, col_s, axis=0
        )[:, None, :]
        af = a_s.astype(jnp.float32)
        a1 = jnp.where(z > 0, af, 0.0)
        a2 = af - a1
        p1 = jnp.einsum(
            "tij,tjf->tif", a1, jnp.take(hv1, col_s, axis=0),
            precision=precision,
        )
        p2 = jnp.einsum(
            "tij,tjf->tif", a2, jnp.take(hv2, col_s, axis=0),
            precision=precision,
        )
        p = (
            jnp.take(u1t, row_s, axis=0)[:, :, None] * p1
            + jnp.take(u2t, row_s, axis=0)[:, :, None] * p2
        )
        num = num.at[row_s].add(p[:, :, :f])
        den = den.at[row_s].add(p[:, :, f])
        # ---- residual gather from the same buffer
        src_s = lax.dynamic_index_in_dim(rsrc, s, 0, keepdims=False).reshape(-1)
        cnt_s = lax.dynamic_index_in_dim(rcount, s, 0, keepdims=False)
        dst_s = lax.dynamic_index_in_dim(rdst, s, 0, keepdims=False)
        zr = jnp.take(ad, dst_s, axis=0)[:, None] + jnp.take(
            asb, src_s, axis=0
        ).reshape(nt, b)
        slot = (
            lax.broadcasted_iota(jnp.int32, (nt, b), 1)
            < cnt_s[:, None]
        )
        score = jnp.where(
            slot, jnp.exp(jnp.where(zr > 0, zr, relu_slope * zr)), 0.0
        )
        msg = jnp.take(hb, src_s, axis=0).reshape(nt, b, f) * score[:, :, None]
        num_flat = num.reshape(ns, f)
        den_flat = den.reshape(ns)
        num_flat = num_flat + jax.ops.segment_sum(
            msg.sum(axis=1), dst_s, num_segments=ns
        )
        den_flat = den_flat + jax.ops.segment_sum(
            score.sum(axis=1), dst_s, num_segments=ns
        )
        return (
            num_flat.reshape(nrt, tile_rows, f),
            den_flat.reshape(nrt, tile_rows),
            nxt,
        )

    num0 = _pvary(
        jnp.zeros((nrt, tile_rows, f), jnp.float32), GRAPH_AXIS
    )
    den0 = _pvary(jnp.zeros((nrt, tile_rows), jnp.float32), GRAPH_AXIS)
    num, den, _ = lax.fori_loop(0, d, step, (num0, den0, h_local))
    num = num.reshape(ns, f)
    den = den.reshape(ns)
    safe = jnp.where(den == 0.0, 1.0, den)
    return num / safe[:, None]


def ring_hybrid_gat(
    mesh: Mesh,
    rtp: RingTilePlan,
    ring: RingPlan,
    h: jnp.ndarray,
    att: jnp.ndarray,
    relu_slope: float = 0.2,
    precision=lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Distributed fused GAT over the hybrid ring.  ``h`` [n_pad, f] and
    ``att`` [n_pad, 2] are row-sharded over the graph axis.

    Requires raw COUNT tiles — build the ring plan from an UNWEIGHTED graph
    (no g.val / val=None), since attention provides the edge weights; a
    value-weighted build silently computes val-scaled attention."""
    packed = jnp.concatenate(
        [
            h.astype(jnp.float32),
            jnp.exp(att[:, 1:2].astype(jnp.float32)),
            att[:, 1:2].astype(jnp.float32),
        ],
        axis=1,
    )
    body = jax.shard_map(
        functools.partial(
            _local_ring_hybrid_gat,
            num_devices=rtp.num_devices,
            tile_rows=rtp.tile_rows,
            tile_cols=rtp.tile_cols,
            relu_slope=relu_slope,
            precision=precision,
        ),
        mesh=mesh,
        in_specs=(
            P(GRAPH_AXIS),
            P(GRAPH_AXIS),
            P(GRAPH_AXIS),
            P(GRAPH_AXIS),
            P(GRAPH_AXIS),
            P(GRAPH_AXIS),
            P(GRAPH_AXIS, None),
            P(GRAPH_AXIS, None),
        ),
        out_specs=P(GRAPH_AXIS, None),
    )
    return body(
        rtp.a,
        rtp.col,
        rtp.row,
        ring.src,
        ring.count,
        ring.dst,
        packed,
        att[:, 0:1].astype(jnp.float32),
    ).astype(h.dtype)
