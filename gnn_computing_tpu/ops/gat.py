"""GAT edge-attention operators: fused and split-kernel pipelines.

Fused path — semantics of reference ``aggr_gat`` / ``aggr_gat_fine`` +
``scaleArray`` (aggr_gat.h:116-213): per edge (j -> i)

    score_e = exp(leakyrelu(att[i, 0] + att[j, 1], slope))
    out[i]  = (sum_e score_e * h[j]) / (sum_e score_e)     [0-sum rows kept 0]

computed in ONE traced computation — attention, softmax numerator/denominator
and weighted aggregation share the single gather of ``h`` rows; XLA fuses the
elementwise pipeline into the aggregation exactly where the reference fuses
kernels.  The two-phase denominator (task partial sums -> segment-sum ->
divide) mirrors the reference's scalar/scaleArray design.

Split path — the reference's un-fused "base" pipeline used by the Figure 10a
fusion ablation and by our.py's ``gat_layer_our`` (aggr_gat.h:33-92,395-425):
``u_add_v`` -> exp(leakyrelu) -> ``add_to_center`` -> ``each_div`` -> weighted
SpMM, each a separate op here.

Numerical note: the reference applies exp without max-subtraction; pass
``stabilize=True`` for the max-subtracted (mathematically identical) form
needed when attention logits are large.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gnn_computing_tpu.schedule.plan import AggregationPlan
from gnn_computing_tpu.ops.spmm import spmm

DEFAULT_SLOPE = 0.2  # reference run() calls, aggr_gat.h:339,347


def leaky_relu(x, slope: float = DEFAULT_SLOPE):
    """max(x, slope * x) — reference __expf(max(tmpsum, tmpsum*relu_l))
    inner form (aggr_gat.h:143)."""
    return jnp.maximum(x, x * slope)


def _att_slots(
    plan: AggregationPlan, att: jnp.ndarray, gather_dtype=None
):
    """z[t, s] = att[dst_t, 0] + att[src_{t,s}, 1] on valid slots.

    ``att`` is the reference's 2-wide per-node attention tensor
    (``transform[v*2]`` = dst part, ``transform[v*2+1]`` = src part,
    aggr_gat.h:125,138).  gather_dtype='f16_split2' stores the src half
    as an exact two-chunk f16 table ([n, 2], 21 mantissa bits) that rides
    the fast 16-bit gather row path (PERF_NOTES.md)."""
    nt, b = plan.num_tasks_padded, plan.block_size
    a_dst = jnp.take(att[:, 0], jnp.asarray(plan.dst))  # [nt]
    src_flat = plan.src_flat()
    if gather_dtype == "f16_split2":
        asv = att[:, 1].astype(jnp.float32)
        hi = jax.lax.reduce_precision(asv, 5, 10).astype(jnp.float16)
        lo = (asv - hi.astype(jnp.float32)).astype(jnp.float16)
        tbl = jnp.stack([hi, lo], axis=1)  # [n, 2] f16
        g = jnp.take(tbl, src_flat, axis=0)
        a_src = (
            g[:, 0].astype(jnp.float32) + g[:, 1].astype(jnp.float32)
        ).reshape(nt, b)
    elif gather_dtype is not None:
        a_src = jnp.take(
            att[:, 1].astype(gather_dtype), src_flat
        ).astype(jnp.float32).reshape(nt, b)
    else:
        a_src = jnp.take(att[:, 1], src_flat).reshape(nt, b)
    return a_dst[:, None] + a_src


def _att_slots_flat(
    plan: AggregationPlan, att: jnp.ndarray, gather_dtype=None
):
    """_att_slots in FLAT [nt_p * B] form (no 2-D [nt, B] intermediates —
    lane-padding economics, see AggregationPlan.src_flat)."""
    nt, b = plan.num_tasks_padded, plan.block_size
    a_dst = jnp.repeat(
        jnp.take(att[:, 0], jnp.asarray(plan.dst)), b
    )  # [nt*B]
    src_flat = plan.src_flat()
    if gather_dtype == "f16_split2":
        asv = att[:, 1].astype(jnp.float32)
        hi = jax.lax.reduce_precision(asv, 5, 10).astype(jnp.float16)
        lo = (asv - hi.astype(jnp.float32)).astype(jnp.float16)
        tbl = jnp.stack([hi, lo], axis=1)  # [n, 2] f16
        g = jnp.take(tbl, src_flat, axis=0)
        a_src = g[:, 0].astype(jnp.float32) + g[:, 1].astype(jnp.float32)
    elif gather_dtype is not None:
        a_src = jnp.take(
            att[:, 1].astype(gather_dtype), src_flat
        ).astype(jnp.float32)
    else:
        a_src = jnp.take(att[:, 1], src_flat)
    return a_dst + a_src


def gat_aggregate_parts(
    plan: AggregationPlan,
    h: jnp.ndarray,
    att: jnp.ndarray,
    relu_slope: float = DEFAULT_SLOPE,
    stabilize: bool = False,
    packed: Optional[bool] = None,
    att_gather_dtype=None,
    h_gather_dtype=None,
    row_shift=None,
):
    """Un-normalized fused attention aggregation: returns
    (numerator [n, f], denominator [n], slot_scores) — the pieces the
    two-phase reference design accumulates before scaleArray
    (aggr_gat.h:167-213).  Exposed so hybrid (dense-tile + residual)
    aggregation can merge partial sums before the final division.

    packed: gather ONE [n, f+1] table ([h | att_src]) instead of two
    separate row gathers.  MEASURED WORSE in every regime: the gathered
    array feeds two consumers (score and message), so XLA materializes
    the [slots, f+1] intermediate in HBM, and a MATERIALIZING gather
    runs ~20 ns/row vs ~7 fused (PERF_NOTES.md) — the saved row issues
    never pay for the slowdown.  Kept as an explicit option for
    reproducing that measurement; default off.

    att_gather_dtype / h_gather_dtype: gather modes for the two fused
    gathers (see ops.spmm.weighted_task_sums).  'f16_split2' att tables
    ([n, 4] <= 128 lanes) are exact to 21 bits and ride the fast 16-bit
    row path; same for h while 2f <= 128 lanes.
    """
    mask = plan.slot_mask()
    dst = jnp.asarray(plan.dst)
    f = h.shape[-1]
    nt, b = plan.num_tasks_padded, plan.block_size
    if packed is None:
        packed = False
    if row_shift is not None and not stabilize:
        # caller-provided per-destination softmax shift (the hybrid path
        # shares ONE shift across tiles + residual so the partial
        # denominators stay commensurate): ride the FLAT pipeline with
        # the shift subtracted per slot — the 2-D internal-stabilize
        # branch pays 32x lane padding on every materialized [nt, B<128]
        # temp (the reddit GAT TRAIN step runs this path every layer)
        zf = leaky_relu(
            _att_slots_flat(plan, att, gather_dtype=att_gather_dtype),
            relu_slope,
        )
        zf = zf - jnp.repeat(
            jnp.take(row_shift.astype(jnp.float32), dst), b
        )
        slot_iota = jnp.arange(nt * b, dtype=jnp.int32) % b
        cnt_flat = jnp.repeat(jnp.asarray(plan.count), b)
        score_flat = jnp.where(slot_iota < cnt_flat, jnp.exp(zf), 0.0)

        from gnn_computing_tpu.ops.spmm import weighted_task_sums

        num_task = weighted_task_sums(
            plan, h, score_flat, gather_dtype=h_gather_dtype
        )
        denom_task = score_flat.reshape(nt, b).sum(axis=1)
        if f < 128:
            both = jax.ops.segment_sum(
                jnp.concatenate(
                    [num_task, denom_task[:, None]], axis=1
                ),
                dst, num_segments=plan.num_nodes,
                indices_are_sorted=plan.sorted_by_dst,
            )
            return both[:, :f], both[:, f], score_flat.reshape(nt, b)
        num = jax.ops.segment_sum(
            num_task, dst, num_segments=plan.num_nodes,
            indices_are_sorted=plan.sorted_by_dst,
        )
        denom = jax.ops.segment_sum(
            denom_task, dst, num_segments=plan.num_nodes,
            indices_are_sorted=plan.sorted_by_dst,
        )
        return num, denom, score_flat.reshape(nt, b)
    if row_shift is not None:
        stabilize = True
    if packed and not stabilize:
        src_flat = plan.src_flat()
        tbl = jnp.concatenate(
            [h, att[:, 1:2].astype(h.dtype)], axis=1
        )
        g = jnp.take(tbl, src_flat, axis=0)  # [nt*b, f+1] (materialized)
        a_dst = jnp.take(att[:, 0], dst)  # [nt]
        z = a_dst[:, None] + g[:, f].reshape(nt, b).astype(jnp.float32)
        score = jnp.where(mask, jnp.exp(leaky_relu(z, relu_slope)), 0.0)
        msg = g[:, :f].astype(jnp.float32) * score.reshape(-1)[:, None]
        # [msg | score] in one task reduce + ONE segment sum (f+1 lanes)
        task = jnp.concatenate(
            [
                msg.reshape(nt, b, f).sum(axis=1),
                score.sum(axis=1, keepdims=True),
            ],
            axis=1,
        )
        seg = jax.ops.segment_sum(
            task, dst, num_segments=plan.num_nodes,
            indices_are_sorted=plan.sorted_by_dst,
        )
        return seg[:, :f].astype(h.dtype), seg[:, f], score
    if not stabilize:
        # FLAT score pipeline: every [nt*B] intermediate is 1-D, so a
        # buffer the compiler chooses to materialize costs its logical
        # size — a materialized 2-D [nt, B=4] temp is (8,128)-tiled and
        # pays 32x lane padding (see AggregationPlan.src_flat)
        zf = leaky_relu(
            _att_slots_flat(plan, att, gather_dtype=att_gather_dtype),
            relu_slope,
        )
        slot_iota = jnp.arange(nt * b, dtype=jnp.int32) % b
        cnt_flat = jnp.repeat(jnp.asarray(plan.count), b)
        score_flat = jnp.where(slot_iota < cnt_flat, jnp.exp(zf), 0.0)

        from gnn_computing_tpu.ops.spmm import weighted_task_sums

        num_task = weighted_task_sums(  # fused gather+reduce
            plan, h, score_flat, gather_dtype=h_gather_dtype
        )
        denom_task = score_flat.reshape(nt, b).sum(axis=1)
        if f < 128:
            # fold the denominator into the numerator's segment_sum as an
            # extra lane: at f+1 <= 128 the [nt, f] sum already pads to
            # 128 lanes, so the extra column is free and the second
            # ~0.5M-task segment_sum disappears.  At f >= 128 the concat
            # would pad 129 -> 256 lanes and LOSE (measured, PERF_NOTES)
            # — keep two sums there.
            both = jax.ops.segment_sum(
                jnp.concatenate([num_task, denom_task[:, None]], axis=1),
                dst, num_segments=plan.num_nodes,
                indices_are_sorted=plan.sorted_by_dst,
            )
            return both[:, :f], both[:, f], score_flat.reshape(nt, b)
        num = jax.ops.segment_sum(
            num_task, dst, num_segments=plan.num_nodes,
            indices_are_sorted=plan.sorted_by_dst,
        )
        denom = jax.ops.segment_sum(
            denom_task, dst, num_segments=plan.num_nodes,
            indices_are_sorted=plan.sorted_by_dst,
        )
        return num, denom, score_flat.reshape(nt, b)
    z = _att_slots(plan, att, gather_dtype=att_gather_dtype)
    z = leaky_relu(z, relu_slope)
    if row_shift is not None:
        row_max = row_shift.astype(jnp.float32)
    else:
        task_max = jnp.max(jnp.where(mask, z, -jnp.inf), axis=1)
        row_max = jax.ops.segment_max(
            task_max,
            dst,
            num_segments=plan.num_nodes,
            indices_are_sorted=plan.sorted_by_dst,
        )
        row_max = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
    z = z - row_max[dst][:, None]
    score = jnp.where(mask, jnp.exp(z), 0.0)  # [nt, B]
    # (An optimization_barrier here — forcing the score to materialize
    # between the att gather and the h gather — was measured ~4-8% SLOWER:
    # XLA already keeps the two gather loops separate; the barrier only
    # added the [nt, B] round-trip.)

    from gnn_computing_tpu.ops.spmm import weighted_task_sums

    num_task = weighted_task_sums(  # fused gather+reduce
        plan, h, score, gather_dtype=h_gather_dtype
    )
    denom_task = jnp.sum(score, axis=1)
    num = jax.ops.segment_sum(
        num_task, dst, num_segments=plan.num_nodes,
        indices_are_sorted=plan.sorted_by_dst,
    )
    denom = jax.ops.segment_sum(
        denom_task, dst, num_segments=plan.num_nodes,
        indices_are_sorted=plan.sorted_by_dst,
    )
    return num, denom, score


def gat_aggregate(
    plan: AggregationPlan,
    h: jnp.ndarray,
    att: jnp.ndarray,
    relu_slope: float = DEFAULT_SLOPE,
    stabilize: bool = False,
    return_scores: bool = False,
):
    """Fused attention + softmax + aggregation (reference aggr_gat_fine)."""
    num, denom, score = gat_aggregate_parts(
        plan, h, att, relu_slope=relu_slope, stabilize=stabilize
    )
    # scaleArray: divide only where the denominator is nonzero
    # (aggr_gat.h:207-213).
    safe = jnp.where(denom == 0.0, 1.0, denom)
    out = num / safe[:, None].astype(num.dtype)
    if return_scores:
        return out, score, denom
    return out


# ------------------------------------------------- split-kernel GAT pipeline
def u_add_v(plan: AggregationPlan, att: jnp.ndarray) -> jnp.ndarray:
    """Edge score = att[dst, 0] + att[src, 1], slot layout (reference
    ``u_add_v``, aggr_gat.h:33-48)."""
    return jnp.where(plan.slot_mask(), _att_slots(plan, att), 0.0)


def add_to_center(
    plan: AggregationPlan, slot_val: jnp.ndarray
) -> jnp.ndarray:
    """Per-destination sum of edge values (reference ``add_to_center``,
    aggr_gat.h:50-74)."""
    task = jnp.sum(jnp.where(plan.slot_mask(), slot_val, 0.0), axis=1)
    return jax.ops.segment_sum(
        task,
        jnp.asarray(plan.dst),
        num_segments=plan.num_nodes,
        indices_are_sorted=plan.sorted_by_dst,
    )


def div_each(
    plan: AggregationPlan, slot_val: jnp.ndarray, node_val: jnp.ndarray
) -> jnp.ndarray:
    """Edge value /= its destination's node value (reference ``each_div``,
    aggr_gat.h:76-92). Zero node values divide to zero rather than inf."""
    d = jnp.take(node_val, jnp.asarray(plan.dst))[:, None]
    safe = jnp.where(d == 0.0, 1.0, d)
    return jnp.where(plan.slot_mask(), slot_val / safe, 0.0)


def att_gat(
    plan: AggregationPlan,
    att: jnp.ndarray,
    relu_slope: float = DEFAULT_SLOPE,
) -> jnp.ndarray:
    """The "adapter" kernel (reference ``attGat``, aggr_gat.h:5-31): fused
    u_add_v + exp(leakyrelu) + row-sum + normalize, producing normalized
    per-edge attention in slot layout ready for a weighted SpMM."""
    mask = plan.slot_mask()
    score = jnp.where(
        mask, jnp.exp(leaky_relu(_att_slots(plan, att), relu_slope)), 0.0
    )
    denom = add_to_center(plan, score)
    return div_each(plan, score, denom)


def gat_split_forward(
    plan: AggregationPlan,
    h: jnp.ndarray,
    att: jnp.ndarray,
    relu_slope: float = DEFAULT_SLOPE,
    use_adapter: bool = False,
) -> jnp.ndarray:
    """The Figure-10a "base"/"adapter" pipelines: compute normalized attention
    with split ops (or the attGat adapter), then weighted-SpMM with the edge
    values swapped in (reference gat_layer_our, our.py:138-157)."""
    if use_adapter:
        a = att_gat(plan, att, relu_slope)
    else:
        z = u_add_v(plan, att)
        score = jnp.where(
            plan.slot_mask(), jnp.exp(leaky_relu(z, relu_slope)), 0.0
        )
        denom = add_to_center(plan, score)
        a = div_each(plan, score, denom)
    return spmm(plan, h, val=a)
