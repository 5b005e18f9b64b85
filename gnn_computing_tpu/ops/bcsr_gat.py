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


def _branch_factors(att, slope: float, row_shift=None):
    """([n, 2] dst-branch exponentials u, [n, 2] src-branch v)."""
    u1, u2, v1, v2 = _node_factors(att, slope, row_shift)
    return jnp.stack([u1, u2], axis=1), jnp.stack([v1, v2], axis=1)


# ------------------------------------------- streaming backward (XLA forms)
#
# Derivation (out_i = num_i / den_i, num_i = sum_j s_ij h_j,
# den_i = sum_j s_ij, s_ij = cnt_ij exp(lrelu(ad_i + as_j) - M_i),
# M stop-gradient).  With gbar_i = ct_i / den_i and
# c_i = <ct_i, out_i> / den_i:
#
#   d s_ij  = <gbar_i, h_j> - c_i
#   dh_j    = sum_i s_ij gbar_i                       (transposed SpMM)
#   d ad_i  = sum_j lrelu'(z_ij) s_ij (<gbar_i, h_j> - c_i)   (row sums)
#   d as_j  = sum_i lrelu'(z_ij) s_ij (<gbar_i, h_j> - c_i)   (col sums)
#
# On the maxdot factorization s = cnt * max(u1 v1, u2 v2) the branch test
# z > 0 is equivalent to u1 v1 >= u2 v2 (slope < 1), so the kernels need
# only the four per-node exponentials.  Row-side outputs (d_ad) stream
# the FORWARD plan; col-side outputs (dh, d_as) stream the TRANSPOSED
# plan — each output accumulates across its row runs exactly like the
# forward kernels, so the backward's working set is one tile pass (the
# reference hand-writes the same split: d_feat scatter + per-edge d_att,
# aggr_gat.h:222-294).  AD-through-scan, by contrast, saved the per-step
# [chunk, tr, tc] branch tiles and OOM'd at reddit scale (VERDICT r3 #1).


def gat_bwd_dad_xla(
    tp: TilePlan, h, gbar, c, u12, v12, relu_slope: float, chunk: int = 256
):
    """d_att_dst over the forward tile plan (portable scan form)."""
    tr, tc = tp.tile_rows, tp.tile_cols
    nct, nrt = tp.num_col_tiles, tp.num_row_tiles
    u12p = _pad_to(u12.astype(jnp.float32), nrt * tr).reshape(nrt, tr, 2)
    cp = _pad_to(c.astype(jnp.float32), nrt * tr).reshape(nrt, tr)
    gb = _pad_to(gbar.astype(jnp.float32), nrt * tr).reshape(
        nrt, tr, -1
    )
    v12p = _pad_to(v12.astype(jnp.float32), nct * tc).reshape(nct, tc, 2)
    hp = _pad_to(h.astype(jnp.float32), nct * tc).reshape(nct, tc, -1)

    a = jnp.asarray(tp.a)
    col = jnp.asarray(tp.tile_col)
    row = jnp.asarray(tp.tile_row)
    t = a.shape[0]
    chunk = min(chunk, max(t, 1))
    a_rows = tr // 8 if tp.bits else tr
    nfull = t // chunk
    rem = t - nfull * chunk

    def chunk_contrib(acc, a_c, col_c, row_c):
        if tp.bits:
            w = a_c.astype(jnp.int32)
            a_c = jnp.concatenate(
                [(w >> b) & 1 for b in range(8)], axis=1
            ).astype(jnp.float32)
        else:
            a_c = a_c.astype(jnp.float32)
        u = jnp.take(u12p, row_c, axis=0)  # [ch, tr, 2]
        v = jnp.take(v12p, col_c, axis=0)  # [ch, tc, 2]
        b1 = u[:, :, None, 0] * v[:, None, :, 0]
        b2 = u[:, :, None, 1] * v[:, None, :, 1]
        # mask BEFORE the multiply: for cnt == 0 cells the branch
        # exponentials are unbounded (z of a NON-edge can exceed the
        # per-destination max M by any amount at wide logits), and
        # 0 * inf = NaN; real cells have z <= M, so b <= 1 there
        s = jnp.where(a_c > 0, a_c * jnp.maximum(b1, b2), 0.0)
        lp = jnp.where(b1 >= b2, 1.0, relu_slope)
        p = jnp.einsum(
            "tif,tjf->tij",
            jnp.take(gb, row_c, axis=0),
            jnp.take(hp, col_c, axis=0),
            precision=lax.Precision.HIGHEST,
        )
        tt = lp * s * (p - jnp.take(cp, row_c, axis=0)[:, :, None])
        return acc.at[row_c].add(tt.sum(axis=2))

    def body(acc, cargs):
        return chunk_contrib(acc, *cargs), None

    from gnn_computing_tpu.ops.spmm import match_varying

    acc = match_varying(jnp.zeros((nrt, tr), jnp.float32), h)
    if nfull:
        acc, _ = lax.scan(
            body,
            acc,
            (
                a[: nfull * chunk].reshape(nfull, chunk, a_rows, tc),
                col[: nfull * chunk].reshape(nfull, chunk),
                row[: nfull * chunk].reshape(nfull, chunk),
            ),
        )
    if rem:
        acc = chunk_contrib(
            acc, a[nfull * chunk :], col[nfull * chunk :],
            row[nfull * chunk :],
        )
    return acc.reshape(nrt * tr)[: tp.num_nodes]


def gat_bwd_dh_das_xla(
    tp_t: TilePlan, h, gbar, c, u12, v12, relu_slope: float,
    chunk: int = 256,
):
    """(dh, d_att_src) over the TRANSPOSED tile plan (portable scan)."""
    tr, tc = tp_t.tile_rows, tp_t.tile_cols
    nct, nrt = tp_t.num_col_tiles, tp_t.num_row_tiles
    f = h.shape[-1]
    v12p = _pad_to(v12.astype(jnp.float32), nrt * tr).reshape(nrt, tr, 2)
    hp = _pad_to(h.astype(jnp.float32), nrt * tr).reshape(nrt, tr, f)
    u12p = _pad_to(u12.astype(jnp.float32), nct * tc).reshape(nct, tc, 2)
    cp = _pad_to(c.astype(jnp.float32), nct * tc).reshape(nct, tc)
    gb = _pad_to(gbar.astype(jnp.float32), nct * tc).reshape(nct, tc, f)

    a = jnp.asarray(tp_t.a)
    col = jnp.asarray(tp_t.tile_col)
    row = jnp.asarray(tp_t.tile_row)
    t = a.shape[0]
    chunk = min(chunk, max(t, 1))
    a_rows = tr // 8 if tp_t.bits else tr
    nfull = t // chunk
    rem = t - nfull * chunk

    def chunk_contrib(acc, a_c, col_c, row_c):
        acch, accs = acc
        if tp_t.bits:
            w = a_c.astype(jnp.int32)
            a_c = jnp.concatenate(
                [(w >> b) & 1 for b in range(8)], axis=1
            ).astype(jnp.float32)
        else:
            a_c = a_c.astype(jnp.float32)
        v = jnp.take(v12p, row_c, axis=0)  # [ch, tr, 2]
        u = jnp.take(u12p, col_c, axis=0)  # [ch, tc, 2]
        b1 = v[:, :, None, 0] * u[:, None, :, 0]
        b2 = v[:, :, None, 1] * u[:, None, :, 1]
        # cnt mask before multiply — see gat_bwd_dad_xla (0 * inf = NaN)
        s = jnp.where(a_c > 0, a_c * jnp.maximum(b1, b2), 0.0)
        lp = jnp.where(b1 >= b2, 1.0, relu_slope)
        gbc = jnp.take(gb, col_c, axis=0)  # [ch, tc, f]
        acch = acch.at[row_c].add(
            jnp.einsum(
                "tij,tjf->tif", s, gbc,
                precision=lax.Precision.HIGHEST,
            )
        )
        p = jnp.einsum(
            "tif,tjf->tij",
            jnp.take(hp, row_c, axis=0),
            gbc,
            precision=lax.Precision.HIGHEST,
        )
        tt = lp * s * (p - jnp.take(cp, col_c, axis=0)[:, None, :])
        accs = accs.at[row_c].add(tt.sum(axis=2))
        return (acch, accs)

    def body(acc, cargs):
        return chunk_contrib(acc, *cargs), None

    from gnn_computing_tpu.ops.spmm import match_varying

    acc = (
        match_varying(jnp.zeros((nrt, tr, f), jnp.float32), h),
        match_varying(jnp.zeros((nrt, tr), jnp.float32), h),
    )
    if nfull:
        acc, _ = lax.scan(
            jax.checkpoint(body),
            acc,
            (
                a[: nfull * chunk].reshape(nfull, chunk, a_rows, tc),
                col[: nfull * chunk].reshape(nfull, chunk),
                row[: nfull * chunk].reshape(nfull, chunk),
            ),
        )
    if rem:
        acc = chunk_contrib(
            acc, a[nfull * chunk :], col[nfull * chunk :],
            row[nfull * chunk :],
        )
    acch, accs = acc
    return (
        acch.reshape(nrt * tr, f)[: tp_t.num_nodes],
        accs.reshape(nrt * tr)[: tp_t.num_nodes],
    )


def gat_bwd_dad(
    tp, h, gbar, c, u12, v12, relu_slope, strategy="auto",
    dot_mode="exact",
):
    from gnn_computing_tpu.ops import pallas_bcsr

    if strategy in ("auto", "pallas") and pallas_bcsr.supported(tp, h):
        return pallas_bcsr.gat_bwd_dad_pallas(
            tp, h, gbar, c, u12, v12, relu_slope, dot_mode=dot_mode
        )
    return gat_bwd_dad_xla(tp, h, gbar, c, u12, v12, relu_slope)


def gat_bwd_dh_das(
    tp_t, h, gbar, c, u12, v12, relu_slope, strategy="auto",
    dot_mode="exact",
):
    from gnn_computing_tpu.ops import pallas_bcsr

    if strategy in ("auto", "pallas") and pallas_bcsr.supported(tp_t, h):
        return pallas_bcsr.gat_bwd_dh_das_pallas(
            tp_t, h, gbar, c, u12, v12, relu_slope, dot_mode=dot_mode
        )
    return gat_bwd_dh_das_xla(tp_t, h, gbar, c, u12, v12, relu_slope)


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
    dot_mode: str = "exact",
):
    """``tp``: one TilePlan or a tuple (mixed bitmask/int8 parts); partial
    (numerator, denominator) sums merge exactly.  dot_mode='default'
    single-rounds the maxdot score/h operands (1 bf16 MXU pass instead of
    ~6) — a measured time/accuracy trade, Pallas path only."""
    if isinstance(tp, (tuple, list)):
        parts = [p for p in tp if p is not None and p.num_tiles]
        num, den = gat_bcsr(
            parts[0], h, att, relu_slope, strategy, row_shift, dot_mode
        )
        for p in parts[1:]:
            n2, d2 = gat_bcsr(
                p, h, att, relu_slope, strategy, row_shift, dot_mode
            )
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
                    row_shift=row_shift, dot_mode=dot_mode,
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


def _global_bound_shift(att, relu_slope):
    """O(n) overflow bound: sh_i = max(ad_i + A, s*ad_i + s*A) with
    A = max_j as_j guarantees every branch product exp(b*(ad_i+as_j) -
    sh_i) <= 1 (b in {1, s}) WITHOUT streaming the adjacency — the
    exact per-destination rowmax (_hybrid_row_shift) costs one full
    A-pass per layer (measured 48.3 ms/layer at reddit train scale,
    ~1/10 of the whole step).  Trade-off: rows whose actual neighbor
    max is far below the global A under-scale num AND den equally (the
    shift cancels), so the result is exact unless den underflows —
    which needs a logit gap > ~80, far outside trained-GAT ranges; the
    exact rowmax stays available as stabilize='exact'."""
    ad = att[:, 0].astype(jnp.float32)
    a_max = jnp.max(att[:, 1].astype(jnp.float32))
    m = jnp.maximum(ad + a_max, relu_slope * (ad + a_max))
    return jnp.where(jnp.isfinite(m), m, 0.0)


def _resolve_shift(tp, plan, att, relu_slope, stabilize):
    if stabilize == "bound":
        return jax.lax.stop_gradient(
            _global_bound_shift(att, relu_slope)
        )
    return jax.lax.stop_gradient(
        _hybrid_row_shift(tp, plan, att, relu_slope)
    )


def _hybrid_gat_impl(
    tp, plan, h, att, relu_slope, strategy,
    att_gather_dtype=None, h_gather_dtype=None, stabilize=False,
    with_den=False, row_shift=None, dot_mode="exact",
):
    # stop_gradient: the shift cancels exactly in num/den (softmax shift
    # invariance), so its true gradient contribution is zero — and without
    # this, AD would traverse bcsr_rowmax's scan over the full tile array
    # (a second multi-GB A traversal in the backward, plus max
    # subgradient noise).
    if stabilize and row_shift is None:
        row_shift = _resolve_shift(tp, plan, att, relu_slope, stabilize)
    num, den = gat_bcsr(
        tp, h, att, relu_slope, strategy, row_shift=row_shift,
        dot_mode=dot_mode,
    )
    score = None
    if plan is not None and plan.num_edges:
        nr, dr, score = gat_aggregate_parts(
            plan, h, att, relu_slope=relu_slope, stabilize=False,
            att_gather_dtype=att_gather_dtype,
            h_gather_dtype=h_gather_dtype,
            row_shift=row_shift,
        )
        num = num + nr
        den = den + dr
    safe = jnp.where(den == 0.0, 1.0, den)
    out = (num / safe[:, None]).astype(h.dtype)
    if with_den:
        return out, den, score
    return out


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12)
)
def _hybrid_gat(
    tp, plan, tp_t, plan_t, edge_map_t, h, att, relu_slope, strategy,
    att_gather_dtype, h_gather_dtype, stabilize, dot_mode,
):
    return _hybrid_gat_impl(
        tp, plan, h, att, relu_slope, strategy,
        att_gather_dtype, h_gather_dtype, stabilize, dot_mode=dot_mode,
    )


def _hybrid_gat_fwd(
    tp, plan, tp_t, plan_t, edge_map_t, h, att, relu_slope, strategy,
    att_gather_dtype, h_gather_dtype, stabilize, dot_mode,
):
    # shift computed HERE and saved: the backward reuses it instead of
    # re-streaming the whole A array through the rowmax kernel
    shift = (
        _resolve_shift(tp, plan, att, relu_slope, stabilize)
        if stabilize
        else None
    )
    out, den, score = _hybrid_gat_impl(
        tp, plan, h, att, relu_slope, strategy,
        att_gather_dtype, h_gather_dtype, stabilize, with_den=True,
        row_shift=shift, dot_mode=dot_mode,
    )
    # residual slot scores saved FLAT (a [nt, B<128] 2-D residual would
    # rest at 128/B lane padding); only kept when the hand-written
    # residual backward can consume them
    score_flat = (
        score.reshape(-1)
        if score is not None and plan_t is not None
        else None
    )
    return out, (
        tp, plan, tp_t, plan_t, edge_map_t, h, att, out, den, shift,
        score_flat,
    )


def _hybrid_gat_bwd(
    relu_slope, strategy, att_gather_dtype, h_gather_dtype, stabilize,
    dot_mode, res, ct,
):
    """Tile-streaming backward (see the derivation above gat_bwd_dad_xla).

    With transposed tile plans available (tp_t), the tile gradients
    stream the same BCSR machinery as the forward — d_ad over the
    forward plan, (dh, d_as) over the transposed one — and only the
    RESIDUAL part goes through jax.vjp.  Without tp_t (legacy callers),
    the whole backward falls back to AD through the XLA formulation.

    The row shift is a saved forward residual, concrete w.r.t. any vjp
    trace (a stop_gradient on the output would still evaluate the rowmax
    pallas_call on JVP tracers, which has no jvp rule); it cancels in
    num/den, so it is a true AD constant."""
    (
        tp, plan, tp_t, plan_t, edge_map_t, h, att, out, den, shift,
        score_flat,
    ) = res

    if tp_t is None:
        # legacy AD-through-XLA backward (no transposed plans): correct
        # at small scale, OOMs at reddit scale (saved scan branch tiles)
        def f(hh, aa):
            num, dd = gat_bcsr(
                tp, hh, aa, relu_slope, "xla", row_shift=shift
            )
            if plan is not None and plan.num_edges:
                nr, dr, _ = gat_aggregate_parts(
                    plan, hh, aa, relu_slope=relu_slope, row_shift=shift
                )
                num, dd = num + nr, dd + dr
            safe = jnp.where(dd == 0.0, 1.0, dd)
            return (num / safe[:, None]).astype(hh.dtype)

        _, vjp = jax.vjp(f, h, att)
        dh, datt = vjp(ct)
        return (None, None, None, None, None, dh, datt)

    safe = jnp.where(den == 0.0, 1.0, den)
    ctf = ct.astype(jnp.float32)
    gbar = ctf / safe[:, None]
    c = jnp.sum(ctf * out.astype(jnp.float32), axis=1) / safe
    u12, v12 = _branch_factors(att, relu_slope, shift)

    parts = tp if isinstance(tp, (tuple, list)) else (tp,)
    parts_t = tp_t if isinstance(tp_t, (tuple, list)) else (tp_t,)
    dh = jnp.zeros(h.shape, jnp.float32)
    d_ad = jnp.zeros(att.shape[0], jnp.float32)
    d_as = jnp.zeros(att.shape[0], jnp.float32)
    # 'default' is a forward-only timing mode; gradients use the exact
    # kernels there (split2 stays split2 — same 2^-16 error class as fwd)
    bwd_dot = "split2" if dot_mode == "split2" else "exact"
    for p in parts:
        if p is None or not p.num_tiles:
            continue
        d_ad = d_ad + gat_bwd_dad(
            p, h, gbar, c, u12, v12, relu_slope, strategy,
            dot_mode=bwd_dot,
        )
    for p in parts_t:
        if p is None or not p.num_tiles:
            continue
        dht, dast = gat_bwd_dh_das(
            p, h, gbar, c, u12, v12, relu_slope, strategy,
            dot_mode=bwd_dot,
        )
        dh = dh + dht
        d_as = d_as + dast

    if plan is not None and plan.num_edges:
        if (
            plan_t is not None
            and edge_map_t is not None
            and score_flat is not None
        ):
            dh_r, dad_r, das_r = _residual_bwd_flat(
                plan, plan_t, edge_map_t, h, gbar, c, score_flat,
                shift, relu_slope,
            )
            dh = dh + dh_r
            d_ad = d_ad + dad_r
            d_as = d_as + das_r
        else:
            # fallback: AD with cotangents (gbar on num, -c on den) —
            # the exact chain-rule split of ct through out = num/den.
            # The vjp SAVES the gathered [slots, f] rows (lane-padded 4x
            # at f=32) — measured as the 19.9 GB OOM driver at reddit
            # scale; the flat hand-written form above avoids it.
            def res_fn(hh, aa):
                nr, dr, _ = gat_aggregate_parts(
                    plan, hh, aa, relu_slope=relu_slope, row_shift=shift
                )
                return nr, dr

            _, vjp = jax.vjp(res_fn, h, att)
            dh_r, datt_r = vjp((gbar.astype(h.dtype), -c))
            dh = dh + dh_r.astype(jnp.float32)
            d_ad = d_ad + datt_r[:, 0].astype(jnp.float32)
            d_as = d_as + datt_r[:, 1].astype(jnp.float32)

    datt = jnp.stack([d_ad, d_as], axis=1).astype(att.dtype)
    return (None, None, None, None, None, dh.astype(h.dtype), datt)


def _residual_bwd_flat(
    plan, plan_t, edge_map_t, h, gbar, c, score_flat, shift, relu_slope
):
    """Hand-written residual backward, every slot temp FLAT 1-D.

    Same math as the tile backward: dz_e = lrelu' s_e (<gbar_i, h_j> -
    c_i); d_ad by task/destination segment sums on the forward plan;
    dh = sum_i s_ij gbar_i and d_as by the TRANSPOSED residual plan
    (slot values carried over via the edge map — the reference's
    val/edge correspondence).  The branch test recovers from the saved
    score itself: z > 0  <=>  s = exp(z - M) > exp(-M).
    """
    from gnn_computing_tpu.ops.spmm import (
        _spmm_xla_chunked,
        edge_values_from_slots_flat,
        sddmm_slots_chunked,
        slots_from_edge_values_flat,
    )

    nt, b = plan.num_tasks_padded, plan.block_size
    dst = jnp.asarray(plan.dst)
    s_flat = score_flat.astype(jnp.float32)
    # per-slot <gbar[dst], h[src]> through the CHUNKED slot-SDDMM: the
    # unchunked [slots, f] gather-dot failed to fuse in this (AD-traced)
    # context and materialized lane-padded multi-GB temps — measured as
    # the 20.1 GB reddit train OOM; chunking bounds the peak per chunk
    p_flat = sddmm_slots_chunked(
        plan, h.astype(jnp.float32), gbar
    ).reshape(-1)
    c_rep = jnp.repeat(jnp.take(c, dst), b)
    dsz = s_flat * (p_flat - c_rep)
    # z > 0 <=> exp(z - M) > exp(-M); pad slots have s = 0 -> slope
    # branch, but dsz = 0 there so the value is irrelevant
    thr = (
        jnp.repeat(jnp.exp(-jnp.take(shift, dst)), b)
        if shift is not None
        else 1.0
    )
    dz = jnp.where(s_flat > thr, 1.0, relu_slope) * dsz
    # d_ad via a 1-D slot->task segment sum (a reshape(nt, b).sum(1)
    # materializes [nt, B<128] at 128/B lane padding — 469 MB measured)
    task_ids = (
        jnp.arange(nt * b, dtype=jnp.int32) // b
    )
    d_ad = jax.ops.segment_sum(
        jax.ops.segment_sum(dz, task_ids, num_segments=nt,
                            indices_are_sorted=True),
        dst,
        num_segments=plan.num_nodes,
        indices_are_sorted=plan.sorted_by_dst,
    )
    # d_as: direct 1-D scatter over sources (pad slots carry dz = 0 and
    # point at row 0 — harmless adds)
    d_as = jnp.zeros((plan.n_src,), jnp.float32).at[
        plan.src_flat()
    ].add(dz)
    # dh over the transposed plan, FORCED chunked: the full-size
    # [slots, f] gather refuses to fuse in this backward context and
    # materialized 1.8 GB lane-padded (measured OOM contributor)
    perm = jnp.asarray(edge_map_t)
    s_t = slots_from_edge_values_flat(
        plan_t, edge_values_from_slots_flat(plan, s_flat)[perm]
    )
    dh = _spmm_xla_chunked(plan_t, gbar, s_t)
    return dh, d_ad, d_as


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
    tp_t=None,
    plan_t=None,
    edge_map_t=None,
    dot_mode: str = "exact",
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
    layer.

    Differentiable in (h, att).  With ``tp_t`` (transposed tile plans,
    Aggregator.tile_parts_t) the backward STREAMS the tile gradients
    through the same BCSR kernels as the forward (one tile pass per
    output — fits reddit-scale HBM); with ``plan_t``/``edge_map_t``
    (transposed residual plan + edge correspondence) the RESIDUAL
    backward is hand-written too, all-flat (the AD fallback saves
    lane-padded [slots, f] gather temps — the measured reddit OOM
    driver).  Without them the backward falls back to AD through the
    XLA formulation (small scale only)."""
    for p in tp if isinstance(tp, (tuple, list)) else (tp,):
        assert p.scale_dst is None and p.scale_src is None, (
            "hybrid GAT needs raw count tiles (no factored scales)"
        )
    return _hybrid_gat(
        tp, plan, tp_t, plan_t, edge_map_t, h, att, relu_slope,
        strategy, att_gather_dtype, h_gather_dtype, stabilize, dot_mode,
    )
