"""Block-sparse (BCSR) aggregation on the MXU + the hybrid dense/sparse op.

``bcsr_spmm``: out = A_dense @ H where A_dense is a TilePlan — each dense
adjacency tile is one [R, C] @ [C, f] matmul on the systolic array.  This
is the TPU-native replacement for the reference's locality-scheduled gather
kernels (graph_schedule.h:17-89 + aggr_gcn.h): instead of keeping gathered
rows cache-resident, dense regions of A are lifted onto the MXU where each
H tile read serves R destination rows.

Factored plans (TilePlan.scale_dst/src) compute
``s_dst * (A @ (s_src * h))`` — the diagonal scaling around an exact
integer-count tile matrix (GCN normalization), keeping bf16 tile storage
numerically exact.

``hybrid_spmm``: dense tiles + residual gather plan, with a custom VJP that
aggregates the cotangent over pre-built transposed plans (fast backward —
the same trick as ops.spmm.spmm_bidir).

Strategies:
  * xla    — lax.scan over tile chunks: gather H tiles, batched einsum,
             tile-granular scatter-add.  Portable (CPU tests).
  * pallas — ops.pallas_bcsr scalar-prefetch kernel: no HBM intermediates,
             output tiles accumulated in VMEM across same-row runs.

Precision: default jax.lax.Precision.HIGH (bf16x3, ~f32-accurate) — the
single-pass bf16 default breaks the framework's 1e-2 validation gate
(measured: 1.3% relative error on U(0,1) edge values), while HIGHEST (6
passes) turns the HBM-bound kernel compute-bound.  With bf16-stored factored
tiles (exact integer counts) the only rounding left is the 3-pass split of
H, ~1e-6 relative.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from gnn_computing_tpu.schedule.plan import AggregationPlan
from gnn_computing_tpu.schedule.tiles import TilePlan
from gnn_computing_tpu.ops.spmm import match_varying, spmm_xla

DEFAULT_PRECISION = lax.Precision.HIGHEST


def _pad_rows(h: jnp.ndarray, n_padded: int) -> jnp.ndarray:
    if h.shape[0] == n_padded:
        return h
    return jnp.pad(h, ((0, n_padded - h.shape[0]), (0, 0)))


def _pre_scale(tp: TilePlan, h: jnp.ndarray) -> jnp.ndarray:
    if tp.scale_src is not None:
        h = h * jnp.asarray(tp.scale_src)[:, None].astype(h.dtype)
    return h


def _post_scale(tp: TilePlan, out: jnp.ndarray) -> jnp.ndarray:
    if tp.scale_dst is not None:
        out = out * jnp.asarray(tp.scale_dst)[:, None].astype(out.dtype)
    return out


def bcsr_spmm_xla(
    tp: TilePlan,
    h: jnp.ndarray,
    chunk: int = 256,
    precision=DEFAULT_PRECISION,
) -> jnp.ndarray:
    """Tile-chunked scan: bounds the [chunk, R, f] HBM intermediates."""
    tr, tc = tp.tile_rows, tp.tile_cols
    f = h.shape[-1]
    nct, nrt = tp.num_col_tiles, tp.num_row_tiles
    h = _pre_scale(tp, h)
    h_t = _pad_rows(h, nct * tc).reshape(nct, tc, f)

    t = tp.a.shape[0]
    chunk = min(chunk, max(t, 1))
    t_pad = -(-t // chunk) * chunk
    a = jnp.asarray(tp.a)
    col = jnp.asarray(tp.tile_col)
    row = jnp.asarray(tp.tile_row)
    if t_pad != t:
        a = jnp.pad(a, ((0, t_pad - t), (0, 0), (0, 0)))
        col = jnp.pad(col, (0, t_pad - t))
        row = jnp.pad(row, (0, t_pad - t))  # zero tiles -> no-op adds to row 0

    a_rows = tr // 8 if tp.bits else tr
    a = a.reshape(t_pad // chunk, chunk, a_rows, tc)
    col = col.reshape(t_pad // chunk, chunk)
    row = row.reshape(t_pad // chunk, chunk)

    def body(out_t, c):
        a_c, col_c, row_c = c
        if tp.bits:  # plane-major bit unpack (see tiles.pack_bit_tiles)
            w = a_c.astype(jnp.int32)
            a_c = jnp.concatenate(
                [(w >> b) & 1 for b in range(8)], axis=1
            )
        g = jnp.take(h_t, col_c, axis=0)  # [chunk, C, f]
        p = jnp.einsum(
            "tij,tjf->tif",
            a_c.astype(h.dtype),
            g,
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        return out_t.at[row_c].add(p.astype(out_t.dtype)), None

    out_t = match_varying(jnp.zeros((nrt, tr, f), h.dtype), h)
    out_t, _ = lax.scan(body, out_t, (a, col, row))
    out = out_t.reshape(nrt * tr, f)[: tp.num_nodes]
    return _post_scale(tp, out)


def bcsr_spmm(
    tp,
    h: jnp.ndarray,
    strategy: str = "auto",
    precision=DEFAULT_PRECISION,
    h_mode: str = "auto",
) -> jnp.ndarray:
    """``tp`` may be one TilePlan or a tuple of them (mixed bitmask/int8
    plans from tiles.split_bit_tiles — each part covers every output row,
    so the partial outputs just add)."""
    if isinstance(tp, (tuple, list)):
        parts = [p for p in tp if p is not None and p.num_tiles]
        out = bcsr_spmm(parts[0], h, strategy, precision, h_mode)
        for p in parts[1:]:
            out = out + bcsr_spmm(p, h, strategy, precision, h_mode)
        return out
    if strategy in ("auto", "pallas"):
        from gnn_computing_tpu.ops import pallas_bcsr

        if (strategy == "pallas" and pallas_bcsr.supported(tp, h)) or (
            strategy == "auto" and pallas_bcsr.preferred(tp, h)
        ):
            return pallas_bcsr.bcsr_spmm_pallas(
                tp, h, precision=precision, h_mode=h_mode
            )
    # XLA fallback emulates the Pallas h_modes' rounding so validation
    # results transfer between strategies
    if h_mode == "bf16":
        h = lax.reduce_precision(h, 8, 7)
    elif h_mode == "split":
        from gnn_computing_tpu.ops.pallas_bcsr import bf16_residue_chunks

        hi, lo = bf16_residue_chunks(h.astype(jnp.float32), 2)
        h = (hi.astype(jnp.float32) + lo.astype(jnp.float32)).astype(
            h.dtype
        )
    return bcsr_spmm_xla(tp, h, precision=precision)


def bcsr_rowmax(tp: TilePlan, col_vals: jnp.ndarray, chunk: int = 256):
    from gnn_computing_tpu.ops import pallas_bcsr

    if pallas_bcsr.supported_rowmax(tp):
        # the XLA scan below duplicates A in HBM (pad temp + scan-xs
        # layout copy — measured OOM at reddit r512 in the stabilized
        # GAT train step); the kernel streams A with zero extra HBM
        return pallas_bcsr.rowmax_bcsr_pallas(tp, col_vals)
    return _bcsr_rowmax_xla(tp, col_vals, chunk)


def _bcsr_rowmax_xla(tp: TilePlan, col_vals: jnp.ndarray, chunk: int = 256):
    """Per-destination-row max of ``col_vals[src]`` over the plan's dense
    edges: out[i] = max over tile cells (i, j) with count > 0 of
    col_vals[j]; -inf where the tiles give row i no edge.  Feeds the GAT
    softmax stabilizer (max of att_src per destination) — an XLA scan,
    not a Pallas kernel: the stabilized path is an opt-in numeric-safety
    mode, not the bench default."""
    tr, tc = tp.tile_rows, tp.tile_cols
    nct, nrt = tp.num_col_tiles, tp.num_row_tiles
    v = _pad_rows(
        col_vals.astype(jnp.float32)[:, None], nct * tc
    ).reshape(nct, 1, tc)

    t = tp.a.shape[0]
    chunk = min(chunk, max(t, 1))
    t_pad = -(-t // chunk) * chunk
    a = jnp.asarray(tp.a)
    col = jnp.asarray(tp.tile_col)
    row = jnp.asarray(tp.tile_row)
    if t_pad != t:
        a = jnp.pad(a, ((0, t_pad - t), (0, 0), (0, 0)))
        col = jnp.pad(col, (0, t_pad - t))
        row = jnp.pad(row, (0, t_pad - t))
    a_rows = tr // 8 if tp.bits else tr
    a = a.reshape(t_pad // chunk, chunk, a_rows, tc)
    col = col.reshape(t_pad // chunk, chunk)
    row = row.reshape(t_pad // chunk, chunk)

    def body(out_t, c):
        a_c, col_c, row_c = c
        if tp.bits:
            w = a_c.astype(jnp.int32)
            a_c = jnp.concatenate(
                [(w >> b) & 1 for b in range(8)], axis=1
            )
        vc = jnp.take(v, col_c, axis=0)  # [chunk, 1, tc]
        masked = jnp.where(a_c > 0, vc, -jnp.inf)
        tmax = masked.max(axis=2)  # [chunk, tr]
        return out_t.at[row_c].max(tmax), None

    out_t = match_varying(
        jnp.full((nrt, tr), -jnp.inf, jnp.float32), col_vals
    )
    out_t, _ = lax.scan(body, out_t, (a, col, row))
    return out_t.reshape(nrt * tr)[: tp.num_nodes]


# ------------------------------------------------------------------- hybrid
@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def hybrid_spmm(
    tp: TilePlan,
    tp_t: Optional[TilePlan],
    plan: Optional[AggregationPlan],
    plan_t: Optional[AggregationPlan],
    h: jnp.ndarray,
    strategy: str = "auto",
    residual_gather_dtype=None,
    tile_h_mode: str = "auto",
) -> jnp.ndarray:
    """out = (A_dense + A_residual) @ h with transposed-plan backward.

    Edge values live inside the plans (non-differentiable here — the GCN
    normalization case; differentiable edge values go through ops.spmm /
    the masked GAT path).

    residual_gather_dtype: gather the residual's h rows in this mode (see
    ops.spmm.weighted_task_sums — 16-bit rows issue ~3x faster; split2
    modes are exact to 16/21 bits).  tile_h_mode: the dense-tile operand
    decomposition (see ops.pallas_bcsr.bcsr_spmm_pallas).  Both only
    perturb the FORWARD value; backward always runs the exact default
    modes (cotangents are signed/cancellation-prone).
    """
    out = bcsr_spmm(tp, h, strategy, h_mode=tile_h_mode)
    if plan is not None:
        out = out + spmm_xla(
            plan, h, gather_dtype=residual_gather_dtype
        )
    return out


def _hybrid_fwd(
    tp, tp_t, plan, plan_t, h, strategy, residual_gather_dtype, tile_h_mode
):
    return hybrid_spmm(
        tp, tp_t, plan, plan_t, h, strategy, residual_gather_dtype,
        tile_h_mode,
    ), (
        tp,
        tp_t,
        plan,
        plan_t,
    )


def _hybrid_bwd(strategy, residual_gather_dtype, tile_h_mode, res, ct):
    tp, tp_t, plan, plan_t = res
    assert tp_t is not None, (
        "hybrid_spmm backward needs a transposed tile plan "
        "(build with with_transpose=True)"
    )
    dh = bcsr_spmm(tp_t, ct, strategy)
    if plan is not None:
        assert plan_t is not None
        dh = dh + spmm_xla(plan_t, ct)
    return (None, None, None, None, dh)


hybrid_spmm.defvjp(_hybrid_fwd, _hybrid_bwd)
