"""Distributed hybrid aggregation, all-gather form: full kernel reuse.

The ring form (parallel/ring_tiles.py) rotates feature shards and buckets
tiles per (owner, ring step) — right when the feature matrix cannot fit a
chip, but it pays two structural costs at scale: every (owner, step) cell
pads to the global max tile count (quadratic in skew), and the per-step
einsum path cannot use the measured-fast Pallas BCSR kernel (the tile set
changes every step).

This module is the capacity-friendly alternative for graphs whose FEATURE
matrix fits one chip (reddit H at f=128 is 119 MB; products 1.25 GB —
both trivial next to the 2-8 GB plans): one ``lax.all_gather`` of the
row-sharded H per aggregation, then each chip runs its OWN row-shard's
tiles through the UNMODIFIED single-chip Pallas kernel (pack-K, bit-packed
tiles, split residue operands — everything transfers), plus its residual
tasks as one fused gather against the gathered buffer.  Communication
volume equals the ring's (each chip receives (D-1)/D of H); XLA overlaps
the all-gather with the layer's transform.

Plans pad PER OWNER (max tiles over D shards), not per (owner, step) —
linear in shard skew.  Reference role: this is the scale-out path the
reference lacks entirely (NCCL commented out, include/util.h:25-72).
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
from gnn_computing_tpu.schedule import Schedule, make_plan
from gnn_computing_tpu.schedule.plan import AggregationPlan
from gnn_computing_tpu.schedule.tiles import TilePlan, densify, split_bit_tiles


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["a", "row", "col"],
    meta_fields=["tile_rows", "tile_cols", "pack", "bits", "local"],
)
@dataclasses.dataclass
class TileGroup:
    """One tile class (bit-packed or int) bucketed per owner shard.

    a:   [D, T, R(/8 if bits), C]; row/col: int32[D, T].  row is LOCAL to
    the owner (tile_row % local row-tiles), col is GLOBAL (the kernel
    reads the all-gathered H).  Every owner is padded to the common T by
    EXTENDING its last destination run with zero tiles (keeps the
    pad_runs(K) run-length contract and never re-visits an earlier output
    block, which would overwrite its accumulated value with zeros).
    """

    a: np.ndarray
    row: np.ndarray
    col: np.ndarray
    tile_rows: int
    tile_cols: int
    pack: int
    bits: bool
    # local=True: every tile's source columns lie in the owner's OWN
    # row shard — the kernel reads h_local (col indices shard-rebased)
    # with NO data dependence on the all-gather, so the halo exchange
    # overlaps this group's compute (the BASELINE.json north-star
    # schedule: [start halo] || [aggregate local] -> [aggregate halo])
    local: bool = False


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "groups", "rsrc", "rcnt", "rdst", "rval",
        "lsrc", "lcnt", "ldst", "lval",
    ],
    meta_fields=[
        "num_devices",
        "shard_size",
        "n_pad",
        "block_size",
        "num_edges",
        "num_res_edges",
    ],
)
@dataclasses.dataclass
class AllGatherHybrid:
    """Row-sharded hybrid plan: tile groups + residual NG tasks per owner.

    rsrc: int32[D, NT*B] flat slot sources (GLOBAL ids); rval f32 same
    shape (0 in pad slots); rcnt/rdst int32[D, NT] (dst LOCAL).
    lsrc/lcnt/ldst/lval: same layout for the LOCAL residual tasks (every
    source in the destination's own shard, sources shard-rebased) —
    present when the plan was built with local_split; these read h_local
    and overlap the all-gather like the local tile groups.
    """

    groups: Tuple[TileGroup, ...]
    rsrc: np.ndarray
    rcnt: np.ndarray
    rdst: np.ndarray
    rval: np.ndarray
    num_devices: int
    shard_size: int
    n_pad: int
    block_size: int
    num_edges: int
    num_res_edges: int
    lsrc: Optional[np.ndarray] = None
    lcnt: Optional[np.ndarray] = None
    ldst: Optional[np.ndarray] = None
    lval: Optional[np.ndarray] = None

    def device_put(self, sharding=None) -> "AllGatherHybrid":
        put = (
            (lambda x: jax.device_put(x, sharding))
            if sharding is not None
            else jnp.asarray
        )
        return dataclasses.replace(
            self,
            groups=tuple(
                dataclasses.replace(
                    g, a=put(g.a), row=put(g.row), col=put(g.col)
                )
                for g in self.groups
            ),
            rsrc=put(self.rsrc),
            rcnt=put(self.rcnt),
            rdst=put(self.rdst),
            rval=put(self.rval),
            lsrc=None if self.lsrc is None else put(self.lsrc),
            lcnt=None if self.lcnt is None else put(self.lcnt),
            ldst=None if self.ldst is None else put(self.ldst),
            lval=None if self.lval is None else put(self.lval),
        )

    def stats(self) -> dict:
        return {
            "num_devices": self.num_devices,
            "groups": [
                {
                    "bits": g.bits,
                    "local": g.local,
                    "tiles_per_owner": int(g.a.shape[1]),
                    "a_bytes": int(np.asarray(g.a).nbytes),
                }
                for g in self.groups
            ],
            "res_tasks_per_owner": int(np.asarray(self.rcnt).shape[1]),
            "local_res_tasks_per_owner": (
                None
                if self.lcnt is None
                else int(np.asarray(self.lcnt).shape[1])
            ),
            "num_res_edges": int(self.num_res_edges),
        }


def _bucket_tiles_by_owner(tp: TilePlan, d: int, ns: int, pack: int):
    """TilePlan -> per-owner padded [D, T, ...] arrays (row made local)."""
    nrt_local = ns // tp.tile_rows
    rows = np.asarray(tp.tile_row)[: tp.num_tiles]
    cols = np.asarray(tp.tile_col)[: tp.num_tiles]
    a = np.asarray(tp.a)[: tp.num_tiles]
    owner = rows // nrt_local

    per_owner = []
    for dev in range(d):
        sel = np.flatnonzero(owner == dev)
        aa = a[sel]
        rr = (rows[sel] % nrt_local).astype(np.int32)
        cc = cols[sel].astype(np.int32)
        # local row coverage: the kernel only initializes output blocks it
        # visits — missing local rows get zero tiles (col 0)
        missing = np.setdiff1d(np.arange(nrt_local, dtype=np.int32), rr)
        if len(missing):
            aa = np.concatenate(
                [aa, np.zeros((len(missing),) + aa.shape[1:], aa.dtype)]
            )
            rr = np.concatenate([rr, missing])
            cc = np.concatenate([cc, np.zeros(len(missing), np.int32)])
        order = np.argsort(rr, kind="stable")
        sub = dataclasses.replace(
            tp,
            a=aa[order],
            tile_row=rr[order],
            tile_col=cc[order],
            num_tiles=len(rr),
        ).pad_runs(pack)
        per_owner.append(
            (np.asarray(sub.a), sub.tile_row, sub.tile_col)
        )

    t_max = max(x[0].shape[0] for x in per_owner)
    t_max = -(-t_max // pack) * pack
    arrs, rws, cls = [], [], []
    for aa, rr, cc in per_owner:
        padn = t_max - aa.shape[0]
        if padn:
            # extend the LAST run: same row, col 0, zero tiles (K-aligned
            # because both t_max and every per-owner count are)
            aa = np.concatenate(
                [aa, np.zeros((padn,) + aa.shape[1:], aa.dtype)]
            )
            last_row = rr[-1] if len(rr) else np.int32(0)
            rr = np.concatenate([rr, np.full(padn, last_row, np.int32)])
            cc = np.concatenate([cc, np.zeros(padn, np.int32)])
        arrs.append(aa)
        rws.append(rr)
        cls.append(cc)
    return (
        np.stack(arrs),
        np.stack(rws).astype(np.int32),
        np.stack(cls).astype(np.int32),
    )


def build_allgather_hybrid(
    g: CSRGraph,
    num_devices: int,
    tile_rows: int = 256,
    tile_cols: int = 128,
    threshold: Optional[int] = None,
    residual_block: int = 4,
    tile_dtype=np.int8,
    bit_tiles: bool = True,
    pack: int = 8,
    val: Optional[np.ndarray] = None,
    local_split: bool = True,
) -> Tuple[AllGatherHybrid, CSRGraph]:
    """(sharded hybrid plan, padded graph).  The graph pads so every shard
    is whole tiles; tiles bucket per owner (vectorized argsort split, no
    d^2 Python loop); residual NG tasks bucket by destination shard.

    local_split (default on): additionally partition each owner's tiles
    and residual tasks into LOCAL work (all sources inside the owner's
    own H shard — computed from h_local, independent of the collective)
    and HALO work (needs the gathered buffer).  This is the north-star
    overlap schedule: XLA is free to run the all-gather concurrently
    with the local groups because nothing in them consumes its result
    (see probes/overlap_evidence.py for the compiled-schedule proof)."""
    d = num_devices
    if val is None and g.val is not None:
        val = g.val
    unit = int(np.lcm(tile_rows, tile_cols))
    n_pad = -(-g.num_nodes // (d * unit)) * (d * unit)
    if n_pad != g.num_nodes:
        indptr = np.concatenate(
            [g.indptr, np.full(n_pad - g.num_nodes, g.indptr[-1], np.int32)]
        )
        g = CSRGraph(indptr=indptr, indices=g.indices, val=g.val, n_src=n_pad)
    ns = n_pad // d

    tp, res = densify(
        g,
        val=val,
        tile_rows=tile_rows,
        tile_cols=tile_cols,
        threshold=threshold,
        ensure_row_coverage=False,  # per-owner coverage added in bucketing
        dtype=tile_dtype,
    )
    assert tp.scale_dst is None and tp.scale_src is None
    parts = []
    if bit_tiles and np.issubdtype(np.dtype(tile_dtype), np.integer):
        bit_p, int_p = split_bit_tiles(
            dataclasses.replace(tp, pack=1)
        )
        if bit_p is not None:
            parts.append(bit_p)
        if int_p is not None:
            parts.append(int_p)
    else:
        parts.append(tp)
    nrt_local = ns // tile_rows
    nct_local = ns // tile_cols

    def _split_local(p: TilePlan):
        """(local part with shard-rebased cols, halo part)."""
        rows = np.asarray(p.tile_row)[: p.num_tiles]
        cols = np.asarray(p.tile_col)[: p.num_tiles]
        owner = rows // nrt_local
        is_local = (cols // nct_local) == owner
        out = []
        for sel, loc in (
            (np.flatnonzero(is_local), True),
            (np.flatnonzero(~is_local), False),
        ):
            cc = cols[sel]
            if loc:
                cc = cc - owner[sel] * nct_local
            out.append(
                (
                    dataclasses.replace(
                        p,
                        a=np.asarray(p.a)[sel],
                        tile_row=rows[sel],
                        tile_col=cc.astype(np.int32),
                        num_tiles=len(sel),
                    ),
                    loc,
                )
            )
        return out

    groups = []
    for p in parts:
        split = _split_local(p) if local_split else [(p, False)]
        for sub, loc in split:
            a, row, col = _bucket_tiles_by_owner(sub, d, ns, pack)
            groups.append(
                TileGroup(
                    a=a,
                    row=row,
                    col=col,
                    tile_rows=tile_rows,
                    tile_cols=tile_cols,
                    pack=pack,
                    bits=p.bits,
                    local=loc,
                )
            )

    # residual: NG tasks sorted by dst -> contiguous owner ranges
    rp = make_plan(res, Schedule.neighbor_grouping, block_size=residual_block)
    nt = rp.num_tasks
    dst = np.asarray(rp.dst)[:nt]
    src = np.asarray(rp.src)[:nt]
    cnt = np.asarray(rp.count)[:nt]
    v = (
        np.asarray(rp.val)[:nt]
        if rp.val is not None
        else (
            np.arange(rp.block_size)[None, :] < cnt[:, None]
        ).astype(np.float32)
    )
    bounds = np.searchsorted(dst, np.arange(d + 1) * ns)
    b = rp.block_size
    # task locality: every VALID slot's source in the destination's shard
    slot_valid = np.arange(b)[None, :] < cnt[:, None]
    task_owner = dst // ns
    src_local = (src // ns) == task_owner[:, None]
    task_is_local = np.logical_or(src_local, ~slot_valid).all(axis=1)

    def _bucket_res(keep_mask, rebase):
        nt_max = 1
        picks = []
        for dev in range(d):
            lo, hi = bounds[dev], bounds[dev + 1]
            sel = np.flatnonzero(keep_mask[lo:hi]) + lo
            picks.append(sel)
            nt_max = max(nt_max, len(sel))
        s = np.zeros((d, nt_max, b), np.int32)
        vv = np.zeros((d, nt_max, b), np.float32)
        c = np.zeros((d, nt_max), np.int32)
        dd = np.zeros((d, nt_max), np.int32)
        for dev, sel in enumerate(picks):
            k = len(sel)
            ss = src[sel]
            if rebase:
                # pad slots may carry arbitrary global ids — clamp into
                # the shard so rebased indices stay in range (val 0)
                ss = np.clip(ss - dev * ns, 0, ns - 1)
            s[dev, :k] = ss
            vv[dev, :k] = v[sel]
            c[dev, :k] = cnt[sel]
            dd[dev, :k] = (dst[sel] - dev * ns).astype(np.int32)
        return s.reshape(d, nt_max * b), c, dd, vv.reshape(d, nt_max * b)

    if local_split:
        rsrc, rcnt, rdst, rval = _bucket_res(~task_is_local, False)
        lsrc, lcnt, ldst, lval = _bucket_res(task_is_local, True)
    else:
        rsrc, rcnt, rdst, rval = _bucket_res(
            np.ones(len(dst), bool), False
        )
        lsrc = lcnt = ldst = lval = None

    plan = AllGatherHybrid(
        groups=tuple(groups),
        rsrc=rsrc,
        rcnt=rcnt,
        rdst=rdst,
        rval=rval,
        num_devices=d,
        shard_size=ns,
        n_pad=n_pad,
        block_size=b,
        num_edges=g.num_edges,
        num_res_edges=res.num_edges,
        lsrc=lsrc,
        lcnt=lcnt,
        ldst=ldst,
        lval=lval,
    )
    return plan, g


def _local_allgather_hybrid(
    plan: AllGatherHybrid,
    h_local,
    *,
    tile_h_mode,
    residual_gather_dtype,
):
    """Per-chip body under shard_map: ONE all-gather, then the single-chip
    kernels verbatim."""
    from gnn_computing_tpu.ops.bcsr import bcsr_spmm
    from gnn_computing_tpu.ops.spmm import spmm_xla

    ns = plan.shard_size
    n_pad = plan.n_pad
    # The all-gather and the LOCAL groups/tasks below are mutually
    # independent: XLA's scheduler may (and on TPU does — see
    # probes/overlap_evidence.py) run the collective concurrently with
    # the local aggregation, which is the halo-overlap north star.
    h_full = lax.all_gather(h_local, GRAPH_AXIS, axis=0, tiled=True)
    out = None

    def run_group(grp, h_src, n_src):
        tp = TilePlan(
            a=grp.a[0],
            tile_row=grp.row[0],
            tile_col=grp.col[0],
            scale_dst=None,
            scale_src=None,
            num_nodes=ns,
            n_src=n_src,
            tile_rows=grp.tile_rows,
            tile_cols=grp.tile_cols,
            num_tiles=grp.a.shape[1],
            num_dense_edges=0,
            pack=grp.pack,
            bits=grp.bits,
        )
        return bcsr_spmm(tp, h_src, h_mode=tile_h_mode)

    def run_res(s, c, dd, vv, h_src, n_src):
        nt = c.shape[0]
        rp = AggregationPlan(
            src=s,
            count=c,
            dst=dd,
            val=vv,
            edge_perm=None,
            num_nodes=ns,
            n_src=n_src,
            block_size=plan.block_size,
            num_tasks=nt,
            num_edges=1,  # nonzero: pad tasks have val 0 -> zeros
            sorted_by_dst=True,
            partition_starts=(0, nt),
        )
        return spmm_xla(rp, h_src, gather_dtype=residual_gather_dtype)

    for grp in plan.groups:
        part = run_group(
            grp,
            h_local if grp.local else h_full,
            ns if grp.local else n_pad,
        )
        out = part if out is None else out + part
    if plan.lsrc is not None:
        part = run_res(
            plan.lsrc[0], plan.lcnt[0], plan.ldst[0], plan.lval[0],
            h_local, ns,
        )
        out = part if out is None else out + part
    res = run_res(
        plan.rsrc[0], plan.rcnt[0], plan.rdst[0], plan.rval[0],
        h_full, n_pad,
    )
    return res if out is None else out + res


def allgather_hybrid_spmm(
    mesh: Mesh,
    plan: AllGatherHybrid,
    h: jnp.ndarray,
    tile_h_mode: str = "auto",
    residual_gather_dtype=None,
) -> jnp.ndarray:
    """Distributed hybrid SpMM: ``h`` [n_pad, f] row-sharded over the
    graph axis; output has the same sharding.  Inside each shard the
    dense part dispatches to the Pallas BCSR kernel on TPU (per-owner
    TilePlan view) with the XLA scan as the portable fallback."""
    body = jax.shard_map(
        functools.partial(
            _local_allgather_hybrid,
            tile_h_mode=tile_h_mode,
            residual_gather_dtype=residual_gather_dtype,
        ),
        mesh=mesh,
        in_specs=(P(GRAPH_AXIS), P(GRAPH_AXIS, None)),
        out_specs=P(GRAPH_AXIS, None),
    )
    return body(plan, h)


def allgather_hybrid_gcn_forward(mesh, plan, params, h, **kw):
    """Distributed 3-layer GCN: local transform (HIGHEST), all-gather
    hybrid aggregation, relu."""
    for i, w in enumerate(params):
        z = jnp.dot(
            h, w, preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        ).astype(h.dtype)
        z = allgather_hybrid_spmm(mesh, plan, z, **kw)
        h = jax.nn.relu(z) if i < len(params) - 1 else z
    return h
