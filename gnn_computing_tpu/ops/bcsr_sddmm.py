"""SDDMM over dense MXU tiles (hybrid with the residual slot gather).

Reference semantics (aggr_sddmm.h:5-83): ``val[e] = <a[src_e], b[dst_e]>``
for every edge, run through the SAME schedule as every other op.  The pure
per-edge gather formulation costs the full random-row rate on ALL edges
(measured 719.9 ms at reddit f=32 — 0.027x the V100 anchor); but for every
edge inside a dense adjacency tile the dot is one CELL of a per-tile
outer-product matmul:

    P = B_blk @ A_blk^T      # [tr, f] @ [f, tc] -> [tr, tc], one MXU dot

masked by the count tile — identical traffic shape to the GCN BCSR kernel
(VERDICT r3 #3).  Only residual edges pay the per-slot gather.

Output layout: the dense part is returned as PER-CELL values
``[num_tiles, tr, tc]`` (0 where the tile has no edge) parallel to
``TilePlan.a`` — the MXU-native edge-value layout; duplicate edges in a
multigraph cell share one dot value (they are the same (src, dst) pair).
The residual part stays in the gather plan's slot layout.  Together they
materialize every edge's value exactly once — the hybrid analog of the
reference's on-edge ``newval`` buffer — and feed a weighted hybrid SpMM
via ``tileplan_with_values`` (the updateval chain, aggr_gcn.h:540-548).

Per-cell bf16 output is the cost: at reddit r256/t24 ~10.6 GB of cells
serve 111.7M dense edges (~46 cells/edge, ~0.15 ns/edge at the measured
640 GB/s streaming rate) vs ~6.3 ns/edge for the per-slot gather — the
20x win that makes this the right layout despite the fill amplification.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gnn_computing_tpu.schedule.plan import AggregationPlan
from gnn_computing_tpu.schedule.tiles import TilePlan


def sddmm_bcsr_xla(
    tp: TilePlan,
    a: jnp.ndarray,
    b: jnp.ndarray,
    out_dtype=jnp.bfloat16,
    chunk: int = 256,
) -> jnp.ndarray:
    """Portable scan form (CPU tests / unsupported plans): per-cell dot
    values [num_tiles, tr, tc] in ``out_dtype``, 0 where count == 0."""
    tr, tc = tp.tile_rows, tp.tile_cols
    f = a.shape[-1]
    nct, nrt = tp.num_col_tiles, tp.num_row_tiles

    def pad_rows(x, size):
        if x.shape[0] == size:
            return x
        return jnp.pad(x, ((0, size - x.shape[0]), (0, 0)))

    a_t = pad_rows(a.astype(jnp.float32), nct * tc).reshape(nct, tc, f)
    b_t = pad_rows(b.astype(jnp.float32), nrt * tr).reshape(nrt, tr, f)

    t = tp.a.shape[0]
    chunk = min(chunk, max(t, 1))
    t_pad = -(-t // chunk) * chunk
    aa = jnp.asarray(tp.a)
    col = jnp.asarray(tp.tile_col)
    row = jnp.asarray(tp.tile_row)
    if t_pad != t:
        aa = jnp.pad(aa, ((0, t_pad - t), (0, 0), (0, 0)))
        col = jnp.pad(col, (0, t_pad - t))
        row = jnp.pad(row, (0, t_pad - t))

    a_rows = tr // 8 if tp.bits else tr
    aa = aa.reshape(t_pad // chunk, chunk, a_rows, tc)
    col = col.reshape(t_pad // chunk, chunk)
    row = row.reshape(t_pad // chunk, chunk)

    def body(_, c):
        a_c, col_c, row_c = c
        if tp.bits:
            w = a_c.astype(jnp.int32)
            a_c = jnp.concatenate(
                [(w >> bb) & 1 for bb in range(8)], axis=1
            )
        ga = jnp.take(a_t, col_c, axis=0)  # [chunk, tc, f]
        gb = jnp.take(b_t, row_c, axis=0)  # [chunk, tr, f]
        p = jnp.einsum(
            "tif,tjf->tij", gb, ga,
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
        return None, jnp.where(a_c > 0, p, 0.0).astype(out_dtype)

    _, out = lax.scan(body, None, (aa, col, row))
    return out.reshape(t_pad, tr, tc)[:t]


def sddmm_bcsr_pallas(
    tp: TilePlan,
    a: jnp.ndarray,
    b: jnp.ndarray,
    out_dtype=jnp.bfloat16,
    pack: int = None,
    dot_mode: str = "exact",
) -> jnp.ndarray:
    """Per-cell SDDMM values via MXU dots per tile.

    Unlike the aggregation kernels there is no run residency: each grid
    step OWNS its output block ([K, tr, tc] at grid index i), so the
    kernel is a pure stream — A tile in, scored tile out.  The a-side
    operand is pre-transposed ONCE in XLA ([f, n] blocks [f, tc]) so the
    in-kernel dot is a plain [tr, f] @ [f, tc] contraction.

    dot_mode:
      'split23' (opt-in) — both operands split into 2 bf16 residue
        chunks and ALL four cross products computed as TWO packed
        [tr, 2f] @ [2f, tc] dots (dot1: [bh|bl] @ [ah;ah] = bh.ah +
        bl.ah; dot2: [bh|bl] @ [al;al] = bh.al + bl.al) — EXACT to the
        split's 16 mantissa bits per chunk (sum == f32 product), 4 bf16
        MXU passes vs HIGHEST's 6.  NOT the default: 16-bit split
        chunks intrinsically miss the strict 1e-2/1e-5 gate on ~1e-6 of
        cells (catastrophic cancellation near zero — numpy reproduces
        the same failures; a 3-dot variant dropping bl@al is worse).
      'split33' — 3 bf16 residue chunks per operand (24 mantissa bits
        each == f32-grade, the SpMM split3 accuracy class), exploiting
        MXU K-dim padding: at f=32 the contraction depth pads 32 -> 128
        anyway, so FOUR chunk cross-products ride ONE bf16 pass free.
        The 6 significant terms (a1b1; a2b1/a1b2; a3b1/a2b2/a1b3 —
        dropped terms are <= 2^-32 relative) pack into TWO dots:
          dot1: [b1|b1|b1|b2] @ [a1;a2;a3;a1]
          dot2: [b2|b3]       @ [a2;a1]
        2 MXU passes vs HIGHEST's 6-at-4x-padding (measured-class ~255
        ns/tile -> ~85): the f=32 SDDMM dot is pass-bound, not
        byte-bound.  Needs 4f <= 128.
      'exact' (default) — single HIGHEST f32 dot, 0 bad elements.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from gnn_computing_tpu.ops.pallas_bcsr import (
        bf16_residue_chunks,
        decode_bit_tile,
        out_struct,
    )

    tr, tc = tp.tile_rows, tp.tile_cols
    f = a.shape[-1]
    nct, nrt = tp.num_col_tiles, tp.num_row_tiles

    a_f = a.astype(jnp.float32)
    if a_f.shape[0] != nct * tc:
        a_f = jnp.pad(a_f, ((0, nct * tc - a_f.shape[0]), (0, 0)))
    b_f = b.astype(jnp.float32)
    if b_f.shape[0] != nrt * tr:
        b_f = jnp.pad(b_f, ((0, nrt * tr - b_f.shape[0]), (0, 0)))

    arr = jnp.asarray(tp.a)
    num_t = arr.shape[0]
    c_bits = max(int(nct - 1).bit_length(), 1)
    cmod = 1 << c_bits
    rc = jnp.asarray(tp.tile_row) * cmod + jnp.asarray(tp.tile_col)

    K = pack if pack is not None else (getattr(tp, "pack", 1) or 1)
    assert num_t % K == 0
    steps = num_t // K

    a_rows = tr // 8 if tp.bits else tr
    a_spec = pl.BlockSpec((K, a_rows, tc), lambda i, rc: (i, 0, 0))

    if dot_mode == "split33":
        assert 4 * f <= 128, "split33 needs 4f <= 128 (K-pad packing)"
        b1, b2, b3 = bf16_residue_chunks(b_f, 3)
        a1, a2, a3 = bf16_residue_chunks(a_f, 3)
        b_op1 = jnp.concatenate([b1, b1, b1, b2], axis=1)  # [rows, 4f]
        b_op2 = jnp.concatenate([b2, b3], axis=1)  # [rows, 2f]
        a_op1 = jnp.concatenate(
            [a1.T, a2.T, a3.T, a1.T], axis=0
        )  # [4f, cols]
        a_op2 = jnp.concatenate([a2.T, a1.T], axis=0)  # [2f, cols]

        def b_spec_w(w):
            return pl.BlockSpec(
                (tr, w), lambda i, rc: (rc[K * i] // cmod, 0)
            )

        def a_spec_w(w, k):
            return pl.BlockSpec(
                (w, tc), lambda i, rc: (0, rc[K * i + k] % cmod)
            )

        def kernel(rc_ref, a_ref, b1_ref, b2_ref, *refs):
            a1_refs = refs[:K]
            a2_refs = refs[K : 2 * K]
            out_ref = refs[2 * K]
            for k in range(K):
                if tp.bits:
                    cnt = decode_bit_tile(a_ref[k], jnp.float32)
                else:
                    cnt = a_ref[k].astype(jnp.float32)
                p = jnp.dot(
                    b1_ref[...],
                    a1_refs[k][...],
                    preferred_element_type=jnp.float32,
                ) + jnp.dot(
                    b2_ref[...],
                    a2_refs[k][...],
                    preferred_element_type=jnp.float32,
                )
                out_ref[k] = jnp.where(cnt > 0.0, p, 0.0).astype(
                    out_dtype
                )

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(steps,),
            in_specs=[a_spec, b_spec_w(4 * f), b_spec_w(2 * f)]
            + [a_spec_w(4 * f, k) for k in range(K)]
            + [a_spec_w(2 * f, k) for k in range(K)],
            out_specs=pl.BlockSpec((K, tr, tc), lambda i, rc: (i, 0, 0)),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_struct((num_t, tr, tc), out_dtype, a),
        )(rc, arr, b_op1, b_op2, *([a_op1] * K), *([a_op2] * K))

    if dot_mode == "split23":
        bh, bl = bf16_residue_chunks(b_f, 2)
        b_op = jnp.concatenate([bh, bl], axis=1)  # [nrt*tr, 2f] bf16
        ah, al = bf16_residue_chunks(a_f, 2)
        # [2f, nct*tc] each: chunk stacked twice -> each dot against
        # [bh|bl] yields BOTH products with that chunk
        a_top = jnp.concatenate([ah.T, ah.T], axis=0)
        a_bot = jnp.concatenate([al.T, al.T], axis=0)
        b_spec = pl.BlockSpec(
            (tr, 2 * f), lambda i, rc: (rc[K * i] // cmod, 0)
        )

        def a_top_spec(k):
            return pl.BlockSpec(
                (2 * f, tc), lambda i, rc: (0, rc[K * i + k] % cmod)
            )

        def a_bot_spec(k):
            return pl.BlockSpec(
                (2 * f, tc), lambda i, rc: (0, rc[K * i + k] % cmod)
            )

        def kernel(rc_ref, a_ref, b_ref, *refs):
            at_refs = refs[:K]
            ab_refs = refs[K : 2 * K]
            out_ref = refs[2 * K]
            for k in range(K):
                if tp.bits:
                    cnt = decode_bit_tile(a_ref[k], jnp.float32)
                else:
                    cnt = a_ref[k].astype(jnp.float32)
                p = jnp.dot(
                    b_ref[...],
                    at_refs[k][...],
                    preferred_element_type=jnp.float32,
                ) + jnp.dot(
                    b_ref[...],
                    ab_refs[k][...],
                    preferred_element_type=jnp.float32,
                )
                out_ref[k] = jnp.where(cnt > 0.0, p, 0.0).astype(
                    out_dtype
                )

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(steps,),
            in_specs=[a_spec, b_spec]
            + [a_top_spec(k) for k in range(K)]
            + [a_bot_spec(k) for k in range(K)],
            out_specs=pl.BlockSpec((K, tr, tc), lambda i, rc: (i, 0, 0)),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_struct((num_t, tr, tc), out_dtype, a),
        )(rc, arr, b_op, *([a_top] * K), *([a_bot] * K))

    a_tr = a_f.T  # [f, nct*tc]
    b_spec = pl.BlockSpec((tr, f), lambda i, rc: (rc[K * i] // cmod, 0))

    def at_spec(k):
        return pl.BlockSpec(
            (f, tc), lambda i, rc: (0, rc[K * i + k] % cmod)
        )

    def kernel(rc_ref, a_ref, b_ref, *refs):
        at_refs = refs[:K]
        out_ref = refs[K]
        for k in range(K):
            if tp.bits:
                cnt = decode_bit_tile(a_ref[k], jnp.float32)
            else:
                cnt = a_ref[k].astype(jnp.float32)
            p = jnp.dot(
                b_ref[...],
                at_refs[k][...],
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )
            out_ref[k] = jnp.where(cnt > 0.0, p, 0.0).astype(out_dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=[a_spec, b_spec] + [at_spec(k) for k in range(K)],
        out_specs=pl.BlockSpec((K, tr, tc), lambda i, rc: (i, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_struct((num_t, tr, tc), out_dtype, a),
    )(rc, arr, b_f, *([a_tr] * K))


def sddmm_bcsr(
    tp: TilePlan,
    a: jnp.ndarray,
    b: jnp.ndarray,
    strategy: str = "auto",
    out_dtype=jnp.bfloat16,
    dot_mode: str = "exact",
) -> jnp.ndarray:
    from gnn_computing_tpu.ops import pallas_bcsr

    if strategy in ("auto", "pallas") and pallas_bcsr.supported(tp, a):
        if dot_mode == "split33" and 4 * a.shape[-1] > 128:
            dot_mode = "exact"
        return sddmm_bcsr_pallas(
            tp, a, b, out_dtype=out_dtype, dot_mode=dot_mode
        )
    return sddmm_bcsr_xla(tp, a, b, out_dtype=out_dtype)


def hybrid_sddmm(
    tp,
    plan: Optional[AggregationPlan],
    a: jnp.ndarray,
    b: jnp.ndarray,
    strategy: str = "auto",
    gather_dtype=None,
    out_dtype=jnp.bfloat16,
    dot_mode: str = "exact",
) -> Tuple[tuple, Optional[jnp.ndarray]]:
    """SDDMM over a hybrid schedule: (per-part cell values, residual slot
    values).  ``tp`` is one TilePlan or a tuple (mixed bit/int8 parts);
    cell arrays parallel each part's ``a``.  Residual via the chunked slot
    gather (ops.spmm.sddmm_slots_chunked)."""
    from gnn_computing_tpu.ops.spmm import (
        _SPMM_FUSE_ELEMS,
        sddmm_slots_chunked,
        sddmm_slots_xla,
    )

    parts = tuple(
        p for p in (tp if isinstance(tp, (tuple, list)) else (tp,))
        if p is not None and p.num_tiles
    )
    cells = tuple(
        sddmm_bcsr(
            p, a, b, strategy, out_dtype=out_dtype, dot_mode=dot_mode
        )
        for p in parts
    )
    res = None
    if plan is not None and plan.num_edges:
        # unchunked while the gathered volume fits XLA's fusion bound
        # (measured: unchunked f32 37.5 ms vs chunked 75.8 at the reddit
        # r256 residual — chunking is a fits-vs-fast fallback only)
        f_pad = -(-max(a.shape[-1], 128) // 128) * 128
        slots = plan.num_tasks_padded * plan.block_size
        if slots * f_pad <= _SPMM_FUSE_ELEMS:
            res = sddmm_slots_xla(plan, a, b, gather_dtype=gather_dtype)
        else:
            res = sddmm_slots_chunked(
                plan, a, b, gather_dtype=gather_dtype
            )
    return cells, res


def tileplan_with_values(
    tp: TilePlan, cell_vals: jnp.ndarray
) -> TilePlan:
    """Weighted TilePlan from per-cell values: a'[t,i,j] =
    count[t,i,j] * cell_vals[t,i,j] — the hybrid analog of the
    reference's ``updateval`` (swap SDDMM/attention output in as edge
    weights for a subsequent weighted aggregation, aggr_gcn.h:540-548).
    Duplicate edges in a cell share the value, so count * value is the
    exact per-cell sum of per-edge weights."""
    import dataclasses

    cnt = jnp.asarray(tp.a)
    if tp.bits:
        from gnn_computing_tpu.ops.pallas_bcsr import decode_bit_tile

        w = cnt.astype(jnp.int32)
        cnt = jnp.concatenate(
            [(w >> bb) & 1 for bb in range(8)], axis=1
        )
    a = cnt.astype(jnp.float32) * cell_vals.astype(jnp.float32)
    return dataclasses.replace(tp, a=a, bits=False)
