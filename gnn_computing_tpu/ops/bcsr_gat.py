"""GAT attention aggregation over dense MXU tiles (hybrid with residual).

The fused GAT math (reference aggr_gat_fine, aggr_gat.h:167-213) on the
block-sparse tile plan, via an exact factorization: leaky-relu is piecewise
linear, so each attention score is multiplicatively separable on each
branch,

  exp(lrelu(a_i + a_j)) = e^{a_i} e^{a_j}            if a_i + a_j > 0
                        = e^{s a_i} e^{s a_j}        otherwise (slope s)

=> score tile S = C  *  [ I * u1 v1^T  +  (1-I) * u2 v2^T ]

with C the (exact, bf16) count tile, I the sign indicator computed
in-kernel (one broadcast add + compare), and u*/v* per-NODE exponentials
precomputed once per layer.  The tile contribution becomes two MXU dots
against pre-scaled feature operands with the denominator column packed in:

  [num | den] += u1 * (C*I) @ [v1*h | v1]  +  u2 * (C*(1-I)) @ [v2*h | v2]

so GAT rides the same BCSR machinery as GCN — no per-edge score tensor,
no gather.  Normalization (scaleArray) happens after merging with the
residual gather part (ops.gat.gat_aggregate_parts); partial denominators
stay commensurate because every part either uses the un-stabilized
reference form (default) or folds the SAME per-destination shift into its
dst exponentials (stabilize=True, _hybrid_row_shift).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from gnn_computing_tpu.schedule.plan import AggregationPlan
from gnn_computing_tpu.schedule.tiles import TilePlan
from gnn_computing_tpu.ops.gat import DEFAULT_SLOPE, gat_aggregate_parts


def _node_factors(att: jnp.ndarray, slope: float, row_shift=None):
    """(u1, u2, v1, v2): exp of dst/src attention halves on both branches.
    ``row_shift`` (per-destination softmax stabilizer M_i) folds into the
    DST exponentials: exp(z - M) = exp(ad - M) exp(as) on branch 1 and
    exp(s*ad - M) exp(s*as) on branch 2 — a pure row-side rescale, so the
    tile kernels and residual parts stay denominator-commensurate as long
    as every part uses the SAME shift."""
    ad = att[:, 0].astype(jnp.float32)
    asrc = att[:, 1].astype(jnp.float32)
    sh = 0.0 if row_shift is None else row_shift.astype(jnp.float32)
    return (
        jnp.exp(ad - sh),
        jnp.exp(slope * ad - sh),
        jnp.exp(asrc),
        jnp.exp(slope * asrc),
    )


def _pad_to(x: jnp.ndarray, size: int):
    if x.shape[0] == size:
        return x
    pad = [(0, size - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def gat_bcsr_xla(
    tp: TilePlan,
    h: jnp.ndarray,
    att: jnp.ndarray,
    relu_slope: float = DEFAULT_SLOPE,
    chunk: int = 256,
    row_shift=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(numerator [n, f], denominator [n]) of the dense-tile edges."""
    tr, tc = tp.tile_rows, tp.tile_cols
    f = h.shape[-1]
    nct, nrt = tp.num_col_tiles, tp.num_row_tiles
    u1, u2, v1, v2 = _node_factors(att, relu_slope, row_shift)

    ad = _pad_to(att[:, 0].astype(jnp.float32), nrt * tr).reshape(nrt, tr)
    asrc = _pad_to(att[:, 1].astype(jnp.float32), nct * tc).reshape(nct, tc)
    u1 = _pad_to(u1, nrt * tr).reshape(nrt, tr)
    u2 = _pad_to(u2, nrt * tr).reshape(nrt, tr)
    hp = _pad_to(h.astype(jnp.float32), nct * tc)
    v1p = _pad_to(v1, nct * tc)
    v2p = _pad_to(v2, nct * tc)
    # [nct, tc, f+1] packed (v*h | v)
    hv1 = jnp.concatenate([hp * v1p[:, None], v1p[:, None]], axis=1)
    hv2 = jnp.concatenate([hp * v2p[:, None], v2p[:, None]], axis=1)
    hv1 = hv1.reshape(nct, tc, f + 1)
    hv2 = hv2.reshape(nct, tc, f + 1)

    t = tp.a.shape[0]
    chunk = min(chunk, max(t, 1))
    # A stays IN PLACE in its storage dtype: the scan dynamic-slices
    # chunks out of the original buffer and converts per chunk.  Earlier
    # forms materialized multi-GB A temps at reddit r512 (measured OOMs
    # in the GAT training backward, which ADs through this function):
    # a whole-array astype (32.6 GB f32), then — with A as scan xs — a
    # pad-to-chunk-multiple temp plus XLA's scan-xs layout copy (2x
    # 7.6 GB int8).
    a = jnp.asarray(tp.a)
    col = jnp.asarray(tp.tile_col)
    row = jnp.asarray(tp.tile_row)
    a_rows = tr // 8 if tp.bits else tr
    nfull = t // chunk
    rem = t - nfull * chunk

    def chunk_contrib(acc, a_c, col_c, row_c):
        out_t, den_t = acc
        if tp.bits:  # plane-major bit unpack (tiles.pack_bit_tiles)
            w = a_c.astype(jnp.int32)
            a_c = jnp.concatenate(
                [(w >> b) & 1 for b in range(8)], axis=1
            ).astype(jnp.float32)
        else:
            a_c = a_c.astype(jnp.float32)
        ad_c = jnp.take(ad, row_c, axis=0)  # [chunk, tr]
        as_c = jnp.take(asrc, col_c, axis=0)  # [chunk, tc]
        pos = (ad_c[:, :, None] + as_c[:, None, :]) > 0
        a1 = jnp.where(pos, a_c, 0.0)
        a2 = a_c - a1
        p1 = jnp.einsum(
            "tij,tjf->tif",
            a1,
            jnp.take(hv1, col_c, axis=0),
            precision=lax.Precision.HIGHEST,
        )
        p2 = jnp.einsum(
            "tij,tjf->tif",
            a2,
            jnp.take(hv2, col_c, axis=0),
            precision=lax.Precision.HIGHEST,
        )
        u1_c = jnp.take(u1, row_c, axis=0)[:, :, None]
        u2_c = jnp.take(u2, row_c, axis=0)[:, :, None]
        p = u1_c * p1 + u2_c * p2  # [chunk, tr, f+1]
        out_t = out_t.at[row_c].add(p[:, :, :f])
        den_t = den_t.at[row_c].add(p[:, :, f])
        return (out_t, den_t)

    def body(acc, c):
        start, col_c, row_c = c
        a_c = lax.dynamic_slice(
            a, (start, 0, 0), (chunk, a_rows, tc)
        )
        return chunk_contrib(acc, a_c, col_c, row_c), None

    from gnn_computing_tpu.ops.spmm import match_varying

    out_t = match_varying(jnp.zeros((nrt, tr, f), jnp.float32), h)
    den_t = match_varying(jnp.zeros((nrt, tr), jnp.float32), h)
    # checkpoint per step: AD through the scan otherwise SAVES the
    # per-step [chunk, tr, tc] f32 branch tiles (a1/a2) for every one of
    # the ~500 steps (~16 GB at reddit r512).  Rematerializing trades one
    # extra forward pass per step for O(step) memory; pure forward calls
    # are unaffected (no tangents, no remat).
    if nfull:
        starts = jnp.arange(nfull, dtype=jnp.int32) * chunk
        (out_t, den_t), _ = lax.scan(
            jax.checkpoint(body),
            (out_t, den_t),
            (
                starts,
                col[: nfull * chunk].reshape(nfull, chunk),
                row[: nfull * chunk].reshape(nfull, chunk),
            ),
        )
    if rem:  # static remainder tail — no padding of the big array
        out_t, den_t = chunk_contrib(
            (out_t, den_t),
            a[nfull * chunk :],
            col[nfull * chunk :],
            row[nfull * chunk :],
        )
    return (
        out_t.reshape(nrt * tr, f)[: tp.num_nodes],
        den_t.reshape(nrt * tr)[: tp.num_nodes],
    )


def gat_bcsr(
    tp,
    h: jnp.ndarray,
    att: jnp.ndarray,
    relu_slope: float = DEFAULT_SLOPE,
    strategy: str = "auto",
    row_shift=None,
):
    """``tp``: one TilePlan or a tuple (mixed bitmask/int8 parts); partial
    (numerator, denominator) sums merge exactly."""
    if isinstance(tp, (tuple, list)):
        parts = [p for p in tp if p is not None and p.num_tiles]
        num, den = gat_bcsr(
            parts[0], h, att, relu_slope, strategy, row_shift
        )
        for p in parts[1:]:
            n2, d2 = gat_bcsr(p, h, att, relu_slope, strategy, row_shift)
            num, den = num + n2, den + d2
        return num, den
    if strategy in ("auto", "pallas"):
        from gnn_computing_tpu.ops import pallas_bcsr

        if pallas_bcsr.supported(tp, h) and strategy in ("auto", "pallas"):
            try:
                # 'maxdot': exact single-dot form — measured fastest AND
                # f32-exact at wide logits (PERF_NOTES.md)
                return pallas_bcsr.gat_bcsr_pallas(
                    tp, h, att, relu_slope=relu_slope, mode="maxdot",
                    row_shift=row_shift,
                )
            except NotImplementedError:
                pass
    return gat_bcsr_xla(tp, h, att, relu_slope, row_shift=row_shift)


def _hybrid_row_shift(tp, plan, att, relu_slope):
    """Shared per-destination softmax stabilizer for a hybrid schedule:
    M_i = lrelu(ad_i + max over in-neighbors j of as_j) — the exact
    per-row max of the attention logits (lrelu is monotone), computed
    over BOTH the dense tiles (bcsr_rowmax) and the residual plan
    (segment_max over slots).  One shift shared by every part keeps the
    partial denominators commensurate; it cancels in num/den, so it only
    prevents overflow (reference aggr_gat.h:116-164 has no stabilizer —
    wide logits overflow there)."""
    from gnn_computing_tpu.ops.bcsr import bcsr_rowmax
    from gnn_computing_tpu.ops.gat import leaky_relu

    asrc = att[:, 1].astype(jnp.float32)
    parts = tp if isinstance(tp, (tuple, list)) else (tp,)
    mx = None
    for p in parts:
        if p is None or not p.num_tiles:
            continue
        r = bcsr_rowmax(p, asrc)
        mx = r if mx is None else jnp.maximum(mx, r)
    if plan is not None and plan.num_edges:
        src_flat = plan.src_flat()
        nt, b = plan.num_tasks_padded, plan.block_size
        slot_iota = jnp.arange(nt * b, dtype=jnp.int32) % b
        cnt_flat = jnp.repeat(jnp.asarray(plan.count), b)
        a_slots = jnp.where(
            slot_iota < cnt_flat, jnp.take(asrc, src_flat), -jnp.inf
        )
        task_max = a_slots.reshape(nt, b).max(axis=1)
        rm = jax.ops.segment_max(
            task_max,
            jnp.asarray(plan.dst),
            num_segments=plan.num_nodes,
            indices_are_sorted=plan.sorted_by_dst,
        )
        mx = rm if mx is None else jnp.maximum(mx, rm)
    ad = att[:, 0].astype(jnp.float32)
    m = leaky_relu(ad + mx, relu_slope)
    # rows with no edges: num = den = 0 regardless; pin the shift to 0 so
    # the exponentials stay finite
    return jnp.where(jnp.isfinite(m), m, 0.0)


def _hybrid_gat_impl(
    tp, plan, h, att, relu_slope, strategy,
    att_gather_dtype=None, h_gather_dtype=None, stabilize=False,
):
    # stop_gradient: the shift cancels exactly in num/den (softmax shift
    # invariance), so its true gradient contribution is zero — and without
    # this, AD would traverse bcsr_rowmax's scan over the full tile array
    # (a second multi-GB A traversal in the backward, plus max
    # subgradient noise).
    row_shift = (
        jax.lax.stop_gradient(
            _hybrid_row_shift(tp, plan, att, relu_slope)
        )
        if stabilize
        else None
    )
    num, den = gat_bcsr(
        tp, h, att, relu_slope, strategy, row_shift=row_shift
    )
    if plan is not None and plan.num_edges:
        nr, dr, _ = gat_aggregate_parts(
            plan, h, att, relu_slope=relu_slope, stabilize=False,
            att_gather_dtype=att_gather_dtype,
            h_gather_dtype=h_gather_dtype,
            row_shift=row_shift,
        )
        num = num + nr
        den = den + dr
    safe = jnp.where(den == 0.0, 1.0, den)
    return (num / safe[:, None]).astype(h.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _hybrid_gat(
    tp, plan, h, att, relu_slope, strategy, att_gather_dtype,
    h_gather_dtype, stabilize,
):
    return _hybrid_gat_impl(
        tp, plan, h, att, relu_slope, strategy,
        att_gather_dtype, h_gather_dtype, stabilize,
    )


def _hybrid_gat_fwd(
    tp, plan, h, att, relu_slope, strategy, att_gather_dtype,
    h_gather_dtype, stabilize,
):
    return _hybrid_gat_impl(
        tp, plan, h, att, relu_slope, strategy,
        att_gather_dtype, h_gather_dtype, stabilize,
    ), (
        tp,
        plan,
        h,
        att,
    )


def _hybrid_gat_bwd(
    relu_slope, strategy, att_gather_dtype, h_gather_dtype, stabilize,
    res, ct,
):
    # Differentiate the pure-XLA formulation (scan + scatter-add — fully
    # AD-able) with EXACT gather modes; the Pallas forward kernel itself
    # is not differentiable.  The row shift is recomputed inside and is a
    # CONSTANT w.r.t. (h, att) for AD purposes — it cancels in num/den,
    # so its (piecewise) dependence on att contributes zero gradient;
    # stop_gradient makes that explicit.
    tp, plan, h, att = res

    # computed OUTSIDE the vjp trace: a stop_gradient on the OUTPUT would
    # still evaluate the rowmax pallas_call on JVP tracers, which has no
    # jvp rule (NotImplementedError); as a closed-over concrete array the
    # shift is a true AD constant
    shift = (
        _hybrid_row_shift(tp, plan, att, relu_slope) if stabilize else None
    )

    def f(hh, aa):
        num, den = gat_bcsr(
            tp, hh, aa, relu_slope, "xla", row_shift=shift
        )
        if plan is not None and plan.num_edges:
            nr, dr, _ = gat_aggregate_parts(
                plan, hh, aa, relu_slope=relu_slope, row_shift=shift
            )
            num, den = num + nr, den + dr
        safe = jnp.where(den == 0.0, 1.0, den)
        return (num / safe[:, None]).astype(hh.dtype)

    _, vjp = jax.vjp(f, h, att)
    dh, datt = vjp(ct)
    return (None, None, dh, datt)


_hybrid_gat.defvjp(_hybrid_gat_fwd, _hybrid_gat_bwd)


def hybrid_gat(
    tp: TilePlan,
    plan: Optional[AggregationPlan],
    h: jnp.ndarray,
    att: jnp.ndarray,
    relu_slope: float = DEFAULT_SLOPE,
    strategy: str = "auto",
    att_gather_dtype=None,
    h_gather_dtype=None,
    stabilize: bool = False,
) -> jnp.ndarray:
    """Fused GAT forward over a hybrid (dense tiles + residual) schedule.

    Requires count tiles (unweighted densification) — attention provides
    the edge weights.  stabilize=False (default, bench parity) uses the
    un-stabilized reference form (aggr_gat.h:167-213) — wide attention
    logits overflow exactly as they do in the reference.  stabilize=True
    computes ONE exact per-destination shift over tiles+residual
    (_hybrid_row_shift) and folds it into the dst exponentials of every
    part, so the partial denominators still merge exactly while |z| up to
    ~80 stays finite — costs one extra A-stream + att-gather pass per
    layer.  Differentiable in (h, att): backward re-derives the VJP
    through the XLA formulation regardless of the forward strategy."""
    for p in tp if isinstance(tp, (tuple, list)) else (tp,):
        assert p.scale_dst is None and p.scale_src is None, (
            "hybrid GAT needs raw count tiles (no factored scales)"
        )
    return _hybrid_gat(
        tp, plan, h, att, relu_slope, strategy,
        att_gather_dtype, h_gather_dtype, stabilize,
    )
