"""Pallas BCSR aggregation kernel (scalar-prefetch block-sparse matmul).

One grid step per dense adjacency tile: the A tile ([R, C]) and the H tile
it selects ([C, f], chosen by the prefetched ``tile_col`` scalars) stream
through VMEM double-buffered by the Pallas pipeline; the output tile (chosen
by ``tile_row``) stays VMEM-resident across the consecutive run of tiles
sharing a destination tile-row (tiles are sorted by row; the kernel zeroes
the accumulator at each run start).  No HBM intermediates at all — the XLA
strategy's [chunk, R, f] gather/product buffers disappear.

The kernel is HBM-bound on (A + H) tile traffic (PERF_NOTES.md), which is
why TilePlan defaults to tall [256 x 128] tiles (one H read serves 256
destination rows) and why factored plans store bf16-exact integer tiles.

This kernel plays the role of the reference's fused scheduled aggregation
kernels (aggr_gcn.h:78-114): tile == neighbor group, VMEM accumulator ==
shared-memory staging, run-boundary zeroing == the memset before atomicAdd
accumulation — but the inner loop is a systolic-array matmul instead of
warp-level gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from gnn_computing_tpu.schedule.tiles import TilePlan

_PALLAS_OK = None


def bf16_residue_chunks(x: jnp.ndarray, n: int) -> list:
    """Decompose f32 ``x`` into ``n`` bf16 chunks with sum(chunks) == x to
    n*8 mantissa bits.  MUST go through lax.reduce_precision: a plain
    ``x.astype(bf16).astype(f32)`` round-trip is deleted by XLA's
    excess-precision pass under jit (the rounding is the whole point), which
    silently degenerates the decomposition to [x, 0, 0]."""
    chunks = []
    rem = x
    for _ in range(n):
        c = lax.reduce_precision(rem, exponent_bits=8, mantissa_bits=7)
        chunks.append(c.astype(jnp.bfloat16))
        rem = rem - c
    return chunks


def _tpu_available() -> bool:
    global _PALLAS_OK
    if _PALLAS_OK is None:
        try:
            d = jax.devices()[0]
            _PALLAS_OK = "TPU" in (getattr(d, "device_kind", "") or "") or (
                d.platform in ("tpu",)
            )
        except Exception:  # pragma: no cover - no backend at all
            _PALLAS_OK = False
    return _PALLAS_OK


def supported(tp: TilePlan, h) -> bool:
    return (
        _tpu_available()
        and h.ndim == 2
        and tp.tile_rows % 8 == 0
        and tp.tile_cols % 128 == 0
        and h.shape[-1] >= 8
    )


def preferred(tp: TilePlan, h) -> bool:
    return supported(tp, h)


def bcsr_spmm_pallas(
    tp: TilePlan,
    h: jnp.ndarray,
    precision=lax.Precision.HIGHEST,
    h_mode: str = "auto",
) -> jnp.ndarray:
    """h_mode:
      'auto'   — 'split3' for f32 h with bf16 tiles, else 'native'.
      'split'  — h decomposed into 2 bf16 residue chunks (16 mantissa
                 bits); exact bf16 MXU dots summed in f32.  Fast but can
                 miss the 1e-2 gate on heavy-cancellation rows.
      'split3' — 3 bf16 residue chunks (24 mantissa bits == f32): full f32
                 accuracy from exact bf16 dots over bf16-exact tiles.
      'native' — single dot in the operand dtype; f32 operands run at
                 ``precision`` (HIGHEST: Mosaic only lowers
                 DEFAULT/HIGHEST), bf16 operands multiply exactly.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if precision in (lax.Precision.HIGH, lax.Precision.HIGHEST):
        precision = lax.Precision.HIGHEST

    tr, tc = tp.tile_rows, tp.tile_cols
    f = h.shape[-1]
    nct, nrt = tp.num_col_tiles, tp.num_row_tiles
    out_dtype = h.dtype

    a = jnp.asarray(tp.a)
    if h_mode == "auto":
        h_mode = (
            "split3"
            if h.dtype == jnp.float32
            and a.dtype in (jnp.bfloat16, jnp.int8)
            else "native"
        )

    if tp.scale_src is not None:
        h = h * jnp.asarray(tp.scale_src)[:, None].astype(h.dtype)
    n_pad = nct * tc
    if h.shape[0] != n_pad:
        h = jnp.pad(h, ((0, n_pad - h.shape[0]), (0, 0)))

    num_t = a.shape[0]
    row = jnp.asarray(tp.tile_row)
    col = jnp.asarray(tp.tile_col)

    # Accumulate each tile-row run in a VMEM scratch and write the output
    # block ONCE at run end — reading o_ref back per step costs a measured
    # ~20% in HBM round-trips (PERF_NOTES.md).
    def _run_bounds(row_ref):
        i = pl.program_id(0)
        prev = row_ref[jnp.maximum(i - 1, 0)]
        nxt = row_ref[jnp.minimum(i + 1, num_t - 1)]
        first = (i == 0) | (row_ref[i] != prev)
        last = (i == num_t - 1) | (row_ref[i] != nxt)
        return first, last

    h_index = lambda i, row, col: (col[i], 0)
    a_spec = pl.BlockSpec((1, tr, tc), lambda i, row, col: (i, 0, 0))
    h_spec = pl.BlockSpec((tc, f), h_index)
    out_spec = pl.BlockSpec((tr, f), lambda i, row, col: (row[i], 0))
    scratch = [pltpu.VMEM((tr, f), jnp.float32)]

    if h_mode in ("split", "split3"):
        nchunks = 2 if h_mode == "split" else 3
        chunks = bf16_residue_chunks(h, nchunks)
        # pack residue chunks side by side: ONE [tc, nchunks*f] block per
        # step (one DMA, one wide MXU dot) instead of nchunks operands
        h_packed = jnp.concatenate(chunks, axis=1)

        def kernel(row_ref, col_ref, a_ref, h_ref, o_ref, acc_ref):
            first, last = _run_bounds(row_ref)

            @pl.when(first)
            def _zero():
                acc_ref[...] = jnp.zeros_like(acc_ref)

            a_blk = a_ref[0]
            if a_blk.dtype != h_ref.dtype:  # int8 count tiles upcast free
                a_blk = a_blk.astype(h_ref.dtype)
            p = jnp.dot(
                a_blk, h_ref[...], preferred_element_type=jnp.float32
            )
            acc = acc_ref[...]
            for k in range(nchunks):
                acc += p[:, k * f : (k + 1) * f]
            acc_ref[...] = acc

            @pl.when(last)
            def _write():
                o_ref[...] = acc_ref[...]

        in_specs = [a_spec, pl.BlockSpec((tc, nchunks * f), h_index)]
        operands = (row, col, a, h_packed)
    else:

        def kernel(row_ref, col_ref, a_ref, h_ref, o_ref, acc_ref):
            first, last = _run_bounds(row_ref)

            @pl.when(first)
            def _zero():
                acc_ref[...] = jnp.zeros_like(acc_ref)

            a_blk = a_ref[0]
            h_blk = h_ref[...]
            if a_blk.dtype != h_blk.dtype:
                a_blk = a_blk.astype(h_blk.dtype)
            acc_ref[...] += jnp.dot(
                a_blk,
                h_blk,
                preferred_element_type=jnp.float32,
                precision=precision,
            )

            @pl.when(last)
            def _write():
                o_ref[...] = acc_ref[...]

        in_specs = [a_spec, h_spec]
        operands = (row, col, a, h)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_t,),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch,
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nrt * tr, f), jnp.float32),
    )(*operands)
    out = out[: tp.num_nodes]
    if tp.scale_dst is not None:
        out = out * jnp.asarray(tp.scale_dst)[:, None]
    return out.astype(out_dtype)



def gat_bcsr_pallas(
    tp: TilePlan,
    h: jnp.ndarray,
    att: jnp.ndarray,
    relu_slope: float = 0.2,
    mode: str = "twodot",
):
    """Factored fused-GAT over dense tiles (see ops/bcsr_gat.py for the
    math).  Returns (numerator [n, f], denominator [n]) accumulated across
    each tile-row run exactly like the GCN kernel.

    Both modes keep the packed MXU operand width a multiple of 128 lanes
    (measured: a 258-wide operand pads to 384 and costs ~27% per tile) by
    computing the softmax DENOMINATOR as an in-kernel VPU row-reduction of
    the scored tile instead of packing a denominator column into the dot.

    mode='twodot' (default): one broadcast-compare builds the branch
    indicator; per branch b, an exact-bf16 masked count tile multiplies the
    [tc, 2f] packed operand split2(v_b * h); per-destination exponentials
    u_b apply as row post-scales.  Tile entries stay EXACT (integer counts)
    — all rounding is the 16-bit split of v*h products.

    mode='merged' (~25% faster, looser): fold branch 2 into the tile via
    the rank-1 rescale
        score = u1[i] v1[j] * (z > 0 ? cnt : cnt * q[i] r[j]),
        q = u2/u1 = exp((s-1) ad),  r = v2/v1 = exp((s-1) as),
    so ONE dot against split2(v1 * h) suffices.  Branch-2 tile entries are
    bf16-rounded and branch magnitudes mix inside one f32 accumulation —
    fine for small attention logits (|z| <~ 1), can exceed the 1e-2 gate
    for wide ones.  Like the reference's unstabilized exp
    (aggr_gat.h:116-164), large |z| overflows — same exposure class.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tr, tc = tp.tile_rows, tp.tile_cols
    f = h.shape[-1]
    nct, nrt = tp.num_col_tiles, tp.num_row_tiles

    def pad_to(x, size):
        if x.shape[0] == size:
            return x
        p = [(0, size - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, p)

    ad = pad_to(att[:, 0].astype(jnp.float32), nrt * tr)[:, None]
    asv = pad_to(att[:, 1].astype(jnp.float32), nct * tc)
    # [nct, 1, tc] so the (1, 1, tc) block's last two dims match the array
    asrc = asv.reshape(nct, 1, tc)
    u1 = jnp.exp(ad)
    u2 = jnp.exp(relu_slope * ad)
    hp = pad_to(h.astype(jnp.float32), nct * tc)
    v1 = jnp.exp(asv)[:, None]
    v2 = jnp.exp(relu_slope * asv)[:, None]
    v1b = v1.reshape(nct, 1, tc)
    v2b = v2.reshape(nct, 1, tc)

    # packed [tc, 2f] operand(s): v_b*h split into 2 bf16 residue chunks
    # (16 mantissa bits; single-chunk bf16 rounding fails the 1e-2 gate on
    # cancellation-heavy rows)
    hv1 = jnp.concatenate(bf16_residue_chunks(hp * v1, 2), axis=1)

    a = jnp.asarray(tp.a)
    num_t = a.shape[0]
    row = jnp.asarray(tp.tile_row)
    col = jnp.asarray(tp.tile_col)

    def run_bounds(row_ref):
        i = pl.program_id(0)
        prev = row_ref[jnp.maximum(i - 1, 0)]
        nxt = row_ref[jnp.minimum(i + 1, num_t - 1)]
        first = (i == 0) | (row_ref[i] != prev)
        last = (i == num_t - 1) | (row_ref[i] != nxt)
        return first, last

    a_spec = pl.BlockSpec((1, tr, tc), lambda i, row, col: (i, 0, 0))
    rowb = lambda i, row, col: (row[i], 0)
    colb = lambda i, row, col: (col[i], 0, 0)
    row_spec = pl.BlockSpec((tr, 1), rowb)
    col_spec = pl.BlockSpec((1, 1, tc), colb)
    hv_spec = pl.BlockSpec((tc, 2 * f), lambda i, row, col: (col[i], 0))
    out_specs = [
        pl.BlockSpec((tr, f), rowb),
        pl.BlockSpec((tr, 1), rowb),
    ]
    scratch = [
        pltpu.VMEM((tr, f), jnp.float32),
        pltpu.VMEM((tr, 1), jnp.float32),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((nrt * tr, f), jnp.float32),
        jax.ShapeDtypeStruct((nrt * tr, 1), jnp.float32),
    ]

    if mode == "merged":
        q = u2 / u1
        r = (v2 / v1).reshape(nct, 1, tc)

        def kernel(
            row_ref, col_ref, a_ref, ad_ref, u1_ref, q_ref, as_ref, r_ref,
            v1_ref, hv_ref, num_ref, den_ref, accn_ref, accd_ref,
        ):
            first, last = run_bounds(row_ref)

            @pl.when(first)
            def _zero():
                accn_ref[...] = jnp.zeros_like(accn_ref)
                accd_ref[...] = jnp.zeros_like(accd_ref)

            cnt = a_ref[0].astype(jnp.float32)
            z = ad_ref[...] + as_ref[0]  # [tr,1]+[1,tc] -> [tr,tc]
            a_m = jnp.where(z > 0.0, cnt, cnt * (q_ref[...] * r_ref[0]))
            p = jnp.dot(
                a_m.astype(jnp.bfloat16),
                hv_ref[...],
                preferred_element_type=jnp.float32,
            )
            accn_ref[...] += u1_ref[...] * (p[:, :f] + p[:, f:])
            # denominator: VPU row-reduction of the scored tile (exact f32)
            accd_ref[...] += u1_ref[...] * jnp.sum(
                a_m * v1_ref[0], axis=1, keepdims=True
            )

            @pl.when(last)
            def _write():
                num_ref[...] = accn_ref[...]
                den_ref[...] = accd_ref[...]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_t,),
            in_specs=[
                a_spec, row_spec, row_spec, row_spec,
                col_spec, col_spec, col_spec, hv_spec,
            ],
            out_specs=out_specs,
            scratch_shapes=scratch,
        )
        num, den = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape
        )(row, col, a, ad, u1, q, asrc, r, v1b, hv1)
        return num[: tp.num_nodes], den[: tp.num_nodes, 0]

    hv2 = jnp.concatenate(bf16_residue_chunks(hp * v2, 2), axis=1)

    def kernel(
        row_ref, col_ref, a_ref, ad_ref, u1_ref, u2_ref, as_ref,
        v1_ref, v2_ref, hv1_ref, hv2_ref, num_ref, den_ref,
        accn_ref, accd_ref,
    ):
        first, last = run_bounds(row_ref)

        @pl.when(first)
        def _zero():
            accn_ref[...] = jnp.zeros_like(accn_ref)
            accd_ref[...] = jnp.zeros_like(accd_ref)

        cnt = a_ref[0].astype(jnp.float32)
        z = ad_ref[...] + as_ref[0]
        pos = z > 0.0
        a1 = jnp.where(pos, cnt, 0.0)
        a2 = cnt - a1
        p1 = jnp.dot(
            a1.astype(jnp.bfloat16),
            hv1_ref[...],
            preferred_element_type=jnp.float32,
        )
        p2 = jnp.dot(
            a2.astype(jnp.bfloat16),
            hv2_ref[...],
            preferred_element_type=jnp.float32,
        )
        accn_ref[...] += u1_ref[...] * (p1[:, :f] + p1[:, f:]) + u2_ref[
            ...
        ] * (p2[:, :f] + p2[:, f:])
        accd_ref[...] += u1_ref[...] * jnp.sum(
            a1 * v1_ref[0], axis=1, keepdims=True
        ) + u2_ref[...] * jnp.sum(a2 * v2_ref[0], axis=1, keepdims=True)

        @pl.when(last)
        def _write():
            num_ref[...] = accn_ref[...]
            den_ref[...] = accd_ref[...]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_t,),
        in_specs=[
            a_spec, row_spec, row_spec, row_spec,
            col_spec, col_spec, col_spec, hv_spec, hv_spec,
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    num, den = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape
    )(row, col, a, ad, u1, u2, asrc, v1b, v2b, hv1, hv2)
    return num[: tp.num_nodes], den[: tp.num_nodes, 0]
