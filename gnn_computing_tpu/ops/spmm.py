"""SpMM neighbor aggregation: the keystone operator.

Computes ``out[i] = sum_{e=(j->i)} val[e] * h[j]`` over a scheduled plan —
the semantics of the reference's GCN aggregation kernels (aggr_gcn.h:5-114)
— with multiple TPU strategies:

  * ``xla``    — gather + per-task einsum reduce + one segment-sum.  XLA fuses
                 the gather/multiply/reduce; the segment-sum over task rows
                 (tasks/row = ceil(deg/B)) replaces the reference's atomicAdd
                 (deterministically).  Always available, used as the reference
                 implementation for validation.
There is deliberately NO Pallas gather-path kernel: manual Mosaic per-row
DMA gathers measured 11.5-30 ns/row vs XLA take's 10.7 on the same indices
(PERF_NOTES.md session "overlap is dead") — XLA's gather already sits at the
(8,128)-HBM-tile random-row limit, so the hand kernel only appears on the
tile-densified path (ops/pallas_bcsr.py).

Backward pass (jax.custom_vjp): dH = A^T @ dOut is the same SpMM with src/dst
roles flipped (slot-scatter form), and dVal = SDDMM(h, dOut) — the operator
pairing the reference hand-fuses in aggr_gat_fine_bwd (aggr_gat.h:222-294).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from gnn_computing_tpu.schedule.plan import AggregationPlan


def match_varying(x: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Mark ``x`` as varying over whatever manual mesh axes ``ref`` varies
    over (no-op outside shard_map).  Scan carries initialized with fresh
    zeros inside a shard_map body otherwise fail the carry-type check
    ("varying manual axes do not match") when the loop body mixes them
    with per-shard data."""
    try:
        vma = jax.typeof(ref).vma
    except Exception:
        return x
    if not vma:
        return x
    axes = tuple(vma)
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, axes, to="varying")
    return jax.lax.pvary(x, axes)  # older jax


# --------------------------------------------------------------- slot helpers
def slot_positions(plan: AggregationPlan):
    """Scheduled edge position of every (task, slot): cum_count[t] + b.

    Tasks tile the scheduled edge sequence contiguously in order, so the
    exclusive cumsum of counts recovers each task's first scheduled edge.
    """
    count = jnp.asarray(plan.count)
    cum = jnp.cumsum(count) - count  # exclusive
    b = jnp.arange(plan.block_size, dtype=count.dtype)[None, :]
    return cum[:, None] + b  # [nt, B]


def slots_from_edge_values(plan: AggregationPlan, edge_val: jnp.ndarray):
    """Spread per-edge values (original CSR edge order) into [nt, B] slots.

    The analog of the value-carrying in the reference schedules
    (graph_schedule.h:41-42) and of ``updateval`` (aggr_gcn.h:540-548).
    """
    pos = slot_positions(plan)
    if plan.edge_perm is not None:
        edge_val = edge_val[jnp.asarray(plan.edge_perm)]
    mask = plan.slot_mask()
    safe = jnp.minimum(pos, max(plan.num_edges - 1, 0))
    return jnp.where(mask, edge_val[safe], 0.0)


def _slot_pos_flat(plan: AggregationPlan):
    """(scheduled-edge position, count, slot-id) per FLAT slot [nt_p*B] —
    the 1-D form of slot_positions/slot_mask (a materialized [nt, B<128]
    2-D temp is (8,128)-tiled and pays a 128/B lane-padding factor)."""
    count = jnp.asarray(plan.count)
    cum = jnp.cumsum(count) - count  # exclusive
    b = plan.block_size
    slot = jnp.arange(
        plan.num_tasks_padded * b, dtype=count.dtype
    ) % b
    return jnp.repeat(cum, b) + slot, jnp.repeat(count, b), slot


def slots_from_edge_values_flat(
    plan: AggregationPlan, edge_val: jnp.ndarray
):
    """slots_from_edge_values with FLAT [nt_p*B] output (1-D pipeline)."""
    pos, cnt_rep, slot = _slot_pos_flat(plan)
    if plan.edge_perm is not None:
        edge_val = edge_val[jnp.asarray(plan.edge_perm)]
    safe = jnp.minimum(pos, max(plan.num_edges - 1, 0))
    return jnp.where(slot < cnt_rep, edge_val[safe], 0.0)


def edge_values_from_slots_flat(
    plan: AggregationPlan, slot_val_flat: jnp.ndarray
):
    """edge_values_from_slots with FLAT [nt_p*B] input (1-D pipeline)."""
    pos, cnt_rep, slot = _slot_pos_flat(plan)
    flat_pos = jnp.where(slot < cnt_rep, pos, plan.num_edges)
    out = jnp.zeros((plan.num_edges,), slot_val_flat.dtype)
    out = out.at[flat_pos].set(slot_val_flat, mode="drop")
    if plan.edge_perm is not None:
        inv = jnp.zeros((plan.num_edges,), jnp.int32)
        inv = inv.at[jnp.asarray(plan.edge_perm)].set(
            jnp.arange(plan.num_edges, dtype=jnp.int32)
        )
        out = out[inv]
    return out


def edge_values_from_slots(plan: AggregationPlan, slot_val: jnp.ndarray):
    """Inverse of slots_from_edge_values: collect [nt, B] slot values back to
    per-edge original CSR order (for ops that *produce* edge values, e.g.
    SDDMM / GAT attention scores)."""
    pos = slot_positions(plan)
    mask = plan.slot_mask()
    flat_pos = jnp.where(mask, pos, plan.num_edges)  # pads -> dropped
    out = jnp.zeros((plan.num_edges,), slot_val.dtype)
    out = out.at[flat_pos.reshape(-1)].set(
        slot_val.reshape(-1), mode="drop"
    )
    if plan.edge_perm is not None:
        inv = jnp.zeros((plan.num_edges,), jnp.int32)
        inv = inv.at[jnp.asarray(plan.edge_perm)].set(
            jnp.arange(plan.num_edges, dtype=jnp.int32)
        )
        out = out[inv]
    return out


def _resolve_val(plan: AggregationPlan, val) -> jnp.ndarray:
    """Slot values as a FLAT [nt_p * B] vector (accepts [nt_p, B] too —
    device plans store val flat, see AggregationPlan.src_flat)."""
    if val is None:
        assert plan.val is not None, "plan has no edge values"
        return jnp.asarray(plan.val).reshape(-1)
    val = jnp.asarray(val)
    want = (plan.num_tasks_padded, plan.block_size)
    assert val.shape in (want, (want[0] * want[1],)), (
        f"val must be in slot layout {want} (or flat), got {val.shape}; "
        f"use slots_from_edge_values for per-edge vals"
    )
    return val.reshape(-1)


# ------------------------------------------------------------- XLA strategies
def weighted_task_sums(
    plan: AggregationPlan, h: jnp.ndarray, v: jnp.ndarray,
    gather_dtype=None,
) -> jnp.ndarray:
    """[nt, f] per-task weighted sums: sum_b v[t,b] * h[src[t,b]].

    Written in the exact form XLA fuses end-to-end on TPU: a FLAT row
    gather multiplied elementwise, reshaped, and reduced — no [nt, B, f]
    HBM intermediate, no edge-granular scatter.

    gather_dtype: the gather is row-issue-bound and WIDTH-INDEPENDENT
    within a dtype, and 16-bit rows issue ~3x faster than f32 rows
    (PERF_NOTES.md).  Options:
      None           — gather h as-is (f32: exact, slowest).
      'f16_split2'   — gather ONE [n, 2f] f16 table of residue chunks
                       (hi = f16(h), lo = f16(h - hi): 21 mantissa bits,
                       ~5e-7 rel — exact for ALL inputs incl. signed
                       cancellation) and reconstruct hi+lo in f32.  Rides
                       the 16-bit fast gather path while 2f <= 128 lanes
                       (f <= 64); above that the wide-row slow path loses
                       to plain f32.
      'bf16_split2'  — same with bf16 chunks (16 mantissa bits, ~6e-6
                       rel); same width caveat.
      a dtype        — gather h cast to that dtype (bf16/f16: fastest
                       rows; single-rounding ~4e-4 (f16)/~4e-3 (bf16)
                       relative — safe ONLY for non-cancelling sums, e.g.
                       nonnegative operands under nonnegative weights).
    """
    nt, b = plan.num_tasks_padded, plan.block_size
    f = h.shape[-1]
    src_flat = plan.src_flat()
    v = v.reshape(-1)  # accept [nt, B] or flat
    if gather_dtype in ("bf16_split2", "f16_split2"):
        if gather_dtype == "f16_split2":
            hf = h.astype(jnp.float32)
            hi = jax.lax.reduce_precision(hf, 5, 10).astype(jnp.float16)
            lo = (hf - hi.astype(jnp.float32)).astype(jnp.float16)
        else:
            from gnn_computing_tpu.ops.pallas_bcsr import (
                bf16_residue_chunks,
            )

            hi, lo = bf16_residue_chunks(h.astype(jnp.float32), 2)
        hh = jnp.concatenate([hi, lo], axis=1)  # [n, 2f] 16-bit
        g = jnp.take(hh, src_flat, axis=0)
        rec = g[:, :f].astype(jnp.float32) + g[:, f:].astype(jnp.float32)
        msg = rec * v.astype(jnp.float32)[:, None]
        return msg.reshape(nt, b, f).sum(axis=1, dtype=h.dtype)
    hh = h.astype(gather_dtype) if gather_dtype is not None else h
    msg = jnp.take(hh, src_flat, axis=0) * v.astype(hh.dtype)[:, None]
    return msg.reshape(nt, b, f).sum(axis=1, dtype=h.dtype)


# Above this many gathered ELEMENTS (slots x lane-padded f), XLA stops
# fusing the flat gather->reduce and materializes the [slots, f]
# intermediate in HBM (measured OOM at products scale: f32[62.5M, 128] =
# 32 GB); chunk the task axis with the output as a scan carry instead.
# f counts LANE-PADDED width: HBM arrays are (8,128)-tiled, so a
# materialized [62.5M, 32] intermediate still allocates 128 lanes
# (measured: "Allocation (size=32031539200)" for an 8 GB logical shape).
_SPMM_FUSE_ELEMS = 1 << 30


def _spmm_xla_chunked(
    plan: AggregationPlan,
    h: jnp.ndarray,
    v: jnp.ndarray,
    gather_dtype=None,
    chunk_tasks: int = None,
) -> jnp.ndarray:
    """spmm_xla over task chunks: carry = the [n, f] accumulator, each
    chunk does the fused gather->reduce->segment_sum at bounded size.
    Costs one carry read+write per chunk (~2.5 GB at products scale) on
    top of the gather — acceptable where the unchunked form is a 32 GB
    HBM intermediate.  Tasks are dst-sorted, so per-chunk segment_sums
    just add disjoint-ish row ranges."""
    import dataclasses

    nt, bsz = plan.num_tasks_padded, plan.block_size
    f = h.shape[-1]
    if chunk_tasks is None:
        # size chunks by SLOTS (the gathered [slots, f] chunk buffer is
        # what must fit): ~2M slots => ~1 GB f32 at f<=128
        chunk_tasks = max(8, (1 << 21) // bsz)
    n_chunks = -(-nt // chunk_tasks)
    nt_pad = n_chunks * chunk_tasks
    # ALL slot arrays handled flat: a [nt, B<128] 2-D form (even as a pad
    # temp) is (8,128)-tiled and pays a 128/B lane-padding factor
    src = plan.src_flat()
    dst = jnp.asarray(plan.dst)
    cnt = jnp.asarray(plan.count)
    if nt_pad != nt:
        src = jnp.pad(src, (0, (nt_pad - nt) * bsz))
        dst = jnp.pad(dst, (0, nt_pad - nt))  # pad tasks hit row 0 with v=0
        cnt = jnp.pad(cnt, (0, nt_pad - nt))
        v = jnp.pad(v, (0, (nt_pad - nt) * bsz))

    def body(out, c):
        src_c, dst_c, cnt_c, v_c = c
        sub = dataclasses.replace(
            plan,
            src=src_c,
            dst=dst_c,
            count=cnt_c,
            val=None,
            edge_perm=None,
            num_tasks=chunk_tasks,
            sorted_by_dst=True,
        )
        task = weighted_task_sums(sub, h, v_c, gather_dtype=gather_dtype)
        out = out + jax.ops.segment_sum(
            task, dst_c, num_segments=plan.num_nodes,
            indices_are_sorted=plan.sorted_by_dst,
        )
        return out, None

    out0 = match_varying(jnp.zeros((plan.num_nodes, f), h.dtype), h)
    out, _ = lax.scan(
        body,
        out0,
        (
            src.reshape(n_chunks, chunk_tasks * bsz),
            dst.reshape(n_chunks, chunk_tasks),
            cnt.reshape(n_chunks, chunk_tasks),
            v.reshape(n_chunks, chunk_tasks * bsz),
        ),
    )
    return out


def spmm_xla(
    plan: AggregationPlan, h: jnp.ndarray, val=None, gather_dtype=None
) -> jnp.ndarray:
    """Fused gather -> per-task weighted reduce -> one task-level segment-sum
    (the deterministic TPU replacement for atomicAdd, aggr_gcn.h:78-114).
    Plans whose gathered volume exceeds _SPMM_FUSE_ELEMS go through the
    task-chunked scan form (see _spmm_xla_chunked)."""
    v = _resolve_val(plan, val)
    nt, bsz = plan.num_tasks_padded, plan.block_size
    f_pad = -(-max(h.shape[-1], 128) // 128) * 128
    if nt * bsz * f_pad > _SPMM_FUSE_ELEMS:
        return _spmm_xla_chunked(plan, h, v, gather_dtype=gather_dtype)
    task = weighted_task_sums(plan, h, v, gather_dtype=gather_dtype)
    return jax.ops.segment_sum(
        task,
        jnp.asarray(plan.dst),
        num_segments=plan.num_nodes,
        indices_are_sorted=plan.sorted_by_dst,
    )


def spmm_transpose_xla(
    plan: AggregationPlan, g_out: jnp.ndarray, val=None
) -> jnp.ndarray:
    """A^T @ g_out using the forward plan: scatter slot contributions to
    sources.  out[s] = sum_{(t,b): src=s} val[t,b] * g_out[dst[t]]."""
    v = _resolve_val(plan, val)
    nt, b = plan.num_tasks_padded, plan.block_size
    dst_rows = jnp.take(g_out, jnp.asarray(plan.dst), axis=0)  # [nt, f]
    v2 = v.reshape(nt, b)
    contrib = dst_rows[:, None, :] * v2[:, :, None].astype(g_out.dtype)
    return jax.ops.segment_sum(
        contrib.reshape(-1, g_out.shape[-1]),
        plan.src_flat(),
        num_segments=plan.n_src,
    )


def sddmm_slots_xla(
    plan: AggregationPlan, a: jnp.ndarray, b: jnp.ndarray,
    gather_dtype=None,
) -> jnp.ndarray:
    """Per-slot dot products: out[t, s] = <a[src[t, s]], b[dst[t]]>, zero in
    pad slots.  Semantics of reference aggr_sddmm (aggr_sddmm.h:5-43).
    Flat-gather form for XLA fusion (PERF_NOTES.md).

    gather_dtype: same ladder as weighted_task_sums — the per-slot source
    gather is the cost (the dst side is a per-TASK take); '*_split2' gathers
    one [n, 2f] 16-bit residue table and reconstructs in f32 before the dot
    (fast-path while 2f <= 128 lanes).  The dot CANCELS, which amplifies
    residue rounding: f16_split2 (21 mantissa bits) passes the 1e-2/1e-5
    gate; bf16_split2 (16 bits) does NOT reliably (measured 14/300k bad on
    TPU with N(0,1) inputs) — use f16_split2 for validated paths."""
    nt, bsz = plan.num_tasks_padded, plan.block_size
    f = a.shape[-1]
    src_flat = plan.src_flat()
    if gather_dtype in ("bf16_split2", "f16_split2"):
        if gather_dtype == "f16_split2":
            af = a.astype(jnp.float32)
            hi = jax.lax.reduce_precision(af, 5, 10).astype(jnp.float16)
            lo = (af - hi.astype(jnp.float32)).astype(jnp.float16)
        else:
            from gnn_computing_tpu.ops.pallas_bcsr import (
                bf16_residue_chunks,
            )

            hi, lo = bf16_residue_chunks(a.astype(jnp.float32), 2)
        aa = jnp.concatenate([hi, lo], axis=1)  # [n, 2f] 16-bit
        g = jnp.take(aa, src_flat, axis=0)
        ga = g[:, :f].astype(jnp.float32) + g[:, f:].astype(jnp.float32)
    elif gather_dtype is not None:
        ga = jnp.take(a.astype(gather_dtype), src_flat, axis=0)
    else:
        ga = jnp.take(a, src_flat, axis=0)  # [nt*B, f]
    gb = jnp.take(b, jnp.asarray(plan.dst), axis=0)  # [nt, f]
    out = (
        ga.reshape(nt, bsz, f).astype(b.dtype) * gb[:, None, :]
    ).sum(axis=-1)
    return jnp.where(plan.slot_mask(), out, 0.0)


def sddmm_slots_chunked(
    plan: AggregationPlan,
    a: jnp.ndarray,
    b: jnp.ndarray,
    gather_dtype=None,
    chunk_tasks: int = 1 << 18,
) -> jnp.ndarray:
    """sddmm_slots_xla in task-axis chunks via lax.map.

    The '*_split2' reconstruct (hi/lo slice-add) MATERIALIZES the gathered
    [slots, 2f] table (PERF_NOTES: the two slices are two consumers), which
    at reddit scale (118M slots) is a 30 GB intermediate — OOM.  Chunking
    bounds the peak at [chunk_tasks*B, 2f] while keeping each chunk's
    gather fused; use for full-edge-set SDDMM on large graphs."""
    nt, bsz = plan.num_tasks_padded, plan.block_size
    f = a.shape[-1]
    if nt <= chunk_tasks:
        return sddmm_slots_xla(plan, a, b, gather_dtype=gather_dtype)
    n_chunks = -(-nt // chunk_tasks)
    nt_pad = n_chunks * chunk_tasks
    src = plan.src_flat()
    dst = jnp.asarray(plan.dst)
    count = jnp.asarray(plan.count)
    if nt_pad != nt:
        src = jnp.pad(src, (0, (nt_pad - nt) * bsz))
        dst = jnp.pad(dst, (0, nt_pad - nt))
        count = jnp.pad(count, (0, nt_pad - nt))

    if gather_dtype in ("bf16_split2", "f16_split2"):
        if gather_dtype == "f16_split2":
            af = a.astype(jnp.float32)
            hi = jax.lax.reduce_precision(af, 5, 10).astype(jnp.float16)
            lo = (af - hi.astype(jnp.float32)).astype(jnp.float16)
        else:
            from gnn_computing_tpu.ops.pallas_bcsr import (
                bf16_residue_chunks,
            )

            hi, lo = bf16_residue_chunks(a.astype(jnp.float32), 2)
        tbl = jnp.concatenate([hi, lo], axis=1)  # [n, 2f]

        def chunk(args):
            s, d, c = args
            g = jnp.take(tbl, s, axis=0)
            ga = g[:, :f].astype(jnp.float32) + g[:, f:].astype(
                jnp.float32
            )
            gbk = jnp.take(b, d, axis=0)
            o = (
                ga.reshape(chunk_tasks, bsz, f) * gbk[:, None, :]
            ).sum(axis=-1)
            mask = (
                jnp.arange(bsz, dtype=c.dtype)[None, :] < c[:, None]
            )
            return jnp.where(mask, o, 0.0)

    else:
        aa = a.astype(gather_dtype) if gather_dtype is not None else a

        def chunk(args):
            s, d, c = args
            ga = jnp.take(aa, s, axis=0)
            gbk = jnp.take(b, d, axis=0)
            o = (
                ga.reshape(chunk_tasks, bsz, f).astype(b.dtype)
                * gbk[:, None, :]
            ).sum(axis=-1)
            mask = (
                jnp.arange(bsz, dtype=c.dtype)[None, :] < c[:, None]
            )
            return jnp.where(mask, o, 0.0)

    out = jax.lax.map(
        chunk,
        (
            src.reshape(n_chunks, chunk_tasks * bsz),
            dst.reshape(n_chunks, chunk_tasks),
            count.reshape(n_chunks, chunk_tasks),
        ),
    )
    return out.reshape(nt_pad, bsz)[:nt]


# ------------------------------------------- transposed-plan backward (fast)
@jax.custom_vjp
def spmm_bidir(
    plan: AggregationPlan,
    plan_t: AggregationPlan,
    h: jnp.ndarray,
    val: Optional[jnp.ndarray],
    val_t: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """SpMM whose backward aggregates over a TRANSPOSED plan.

    The autodiff transpose of a gather is an edge-granular scatter (slow on
    TPU, PERF_NOTES.md); with the transposed graph scheduled like the forward
    one, dH = A^T @ dOut becomes another fused fast SpMM — the same insight
    as the reference's hand-written backward (aggr_gat.h:222-294).

    ``val_t`` must hold the same edge values as ``val`` in the transposed
    plan's slot layout (see Aggregator.transposed_val); it is treated as
    non-differentiable — gradients flow through ``val``.
    """
    return spmm_xla(plan, h, val)


def _spmm_bidir_fwd(plan, plan_t, h, val, val_t):
    return spmm_xla(plan, h, val), (plan, plan_t, h, val, val_t)


def _spmm_bidir_bwd(res, ct):
    plan, plan_t, h, val, val_t = res
    dh = spmm_xla(plan_t, ct, val_t)
    dval = None
    if val is not None:
        dval = sddmm_slots_xla(plan, h, ct).astype(val.dtype)
    return (None, None, dh, dval, None)


spmm_bidir.defvjp(_spmm_bidir_fwd, _spmm_bidir_bwd)


# ------------------------------------------------------- public op (dispatch)
def spmm(
    plan: AggregationPlan,
    h: jnp.ndarray,
    val: Optional[jnp.ndarray] = None,
    strategy: str = "auto",
) -> jnp.ndarray:
    """Aggregate neighbor features: out[n, f] = A_plan @ h.

    ``val``: optional [num_tasks_padded, B] slot-layout edge values overriding
    the plan's (differentiable).  ``strategy``: 'auto' | 'xla' (both the
    same path; a Pallas gather kernel was probed and rejected — XLA's
    gather is already at the hardware random-row limit, see module doc).

    The XLA strategy is autodiff-native: its derived VJP is exactly
    (A^T-gather-scatter, slot-SDDMM) — the operator pair the reference
    hand-writes for GAT backward (aggr_gat.h:222-294).
    """
    del strategy
    return spmm_xla(plan, h, val)
