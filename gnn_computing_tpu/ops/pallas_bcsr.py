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
import numpy as np
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


# bit-tile decode variant (probe-tunable): 'concat_i32' = widen to int32,
# 8 shift+mask, sublane concat, one wide convert; 'sign_i8' = arithmetic
# int8 left-shifts put bit b in the sign position, compare-to-zero planes,
# one wide select.  sign_i8 is REJECTED by Mosaic ("Invalid relayout ...
# vector<512x128xi1>" on the plane concat — measured 2026-08-19); and the
# measured per-tile times (bits 239.7/157/157 ns at f=128/64/32 vs int8
# 237.8) show the decode eats exactly the A-DMA saving — bit tiles are a
# MEMORY lever (A 7.9 -> 2.8 GB), not a time lever, on this part.
BITS_DECODE = "mxu_ladder"  # bcsr_spmm only; other kernels need the
# decoded tile for VPU scoring and read the concat_i32 path below


def decode_bit_tile(blk: jnp.ndarray, out_dtype) -> jnp.ndarray:
    """Plane-major bit-packed tile [R//8, C] uint8 -> [R, C] 0/1 in
    ``out_dtype`` (schedule.tiles.pack_bit_tiles layout: bit b of
    blk[i, c] is cell (b*(R//8) + i, c)).  Constant-shift planes + ONE
    sublane concatenation — no lane relayout."""
    if BITS_DECODE == "sign_i8":
        w = lax.bitcast_convert_type(blk, jnp.int8)
        planes = [(w << (7 - b)) < 0 for b in range(8)]
        bits = jnp.concatenate(planes, axis=0)
        return jnp.where(
            bits,
            jnp.ones((), out_dtype),
            jnp.zeros((), out_dtype),
        )
    w = blk.astype(jnp.int32)
    planes = [((w >> b) & 1) for b in range(8)]
    return jnp.concatenate(planes, axis=0).astype(out_dtype)


def out_struct(shape, dtype, ref):
    """ShapeDtypeStruct whose varying-mesh-axes (vma) match ``ref`` — a
    pallas_call inside shard_map(check_vma=True) must declare how its
    outputs vary over the manual mesh axes."""
    try:
        vma = jax.typeof(ref).vma
    except Exception:
        vma = None
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


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


# SMEM is 1 MiB; the packed (row, col) scalar-prefetch array costs 4 B per
# tile, so plans beyond ~260k tiles cannot compile (measured: 530k tiles ->
# "Allocation (size=2121728) would exceed memory (size=1048576)" in smem).
# Leave headroom for Mosaic's own SMEM use.
SMEM_TILE_LIMIT = 245_760


def supported(tp: TilePlan, h) -> bool:
    return (
        _tpu_available()
        and h.ndim == 2
        and tp.tile_rows % 8 == 0
        and tp.tile_cols % 128 == 0
        and h.shape[-1] >= 8
        and tp.a.shape[0] <= SMEM_TILE_LIMIT
        # bit-packed A blocks are uint8 [R//8, C]; Mosaic's minimum int8
        # tile is (32, 128) sublanes x lanes — blocks shorter than 32
        # sublanes load GARBAGE silently (measured: transposed r128 bit
        # plans returned ~5% wrong elements).  Keep bits plans on the
        # Pallas path only when R//8 >= 32; shorter ones fall back to the
        # XLA scan (or get unpacked to int8 by the schedule layer).
        and (not tp.bits or tp.tile_rows >= 256)
    )


def preferred(tp: TilePlan, h) -> bool:
    return supported(tp, h)


def supported_rowmax(tp: TilePlan) -> bool:
    """rowmax_bcsr_pallas applicability: the tp-side conditions of
    supported() (its operand is a 1-D col_vals, not an [n, f] h)."""
    return (
        _tpu_available()
        and tp.tile_rows % 8 == 0
        and tp.tile_cols % 128 == 0
        and tp.a.shape[0] <= SMEM_TILE_LIMIT
        and (not tp.bits or tp.tile_rows >= 256)
    )


def cap_pack(K: int, tr: int, tc: int, cell_budget: int) -> int:
    """Clamp tiles-per-grid-step by the Mosaic VMEM *stack* budget.

    Mosaic stack-allocates the temporaries of every unrolled tile
    iteration simultaneously, so a kernel's working set scales with
    K * tr * tc cells; ``cell_budget`` is the largest K*tr*tc measured
    to fit for the kernel's per-tile temp footprint (e.g. GAT split2 at
    K=16 [512, 128] tiles measured 18.9 MB > the 16 MB limit; K=8 fits
    => budget 8*512*128).  The result still divides any pad_runs(8/16)
    run length (kept a divisor of K)."""
    k = min(K, max(1, cell_budget // (tr * tc)))
    while K % k:
        k -= 1
    return max(k, 1)


def detect_pack(tile_row, candidates=(8, 4, 2)) -> int:
    """Largest K for which every tile-row run's length is a multiple of K
    (i.e. the plan went through TilePlan.pad_runs(K)); 1 otherwise."""
    import numpy as _np

    rows = _np.asarray(tile_row)
    if len(rows) == 0:
        return 1
    change = _np.flatnonzero(rows[1:] != rows[:-1]) + 1
    bounds = _np.concatenate([[0], change, [len(rows)]])
    lens = _np.diff(bounds)
    for k in candidates:
        if len(rows) % k == 0 and (lens % k == 0).all():
            return int(k)
    return 1


def bcsr_spmm_pallas(
    tp: TilePlan,
    h: jnp.ndarray,
    precision=lax.Precision.HIGHEST,
    h_mode: str = "auto",
    pack: int = None,
    w_epilogue: jnp.ndarray = None,
) -> jnp.ndarray:
    """w_epilogue: optional [f, f_out] dense weight applied to the
    run-final accumulator tile IN KERNEL (one HIGHEST dot per tile-row
    run, on the VMEM-resident [tr, f] accumulator) — the honest analog of
    the reference's fused aggregate+GEMM (aggr_gcn_nn stages W in shared
    memory inside the aggregation kernel, aggr_gcn.h:304-359).  Returns
    (aggregated, transformed) instead of just aggregated; requires an
    unfactored plan (scale_dst would have to apply between the
    accumulation and the GEMM).

    h_mode:
      'auto'   — 'split3' for f32 h with bf16 tiles, else 'native'.
      'split'  — h decomposed into 2 bf16 residue chunks (16 mantissa
                 bits); exact bf16 MXU dots summed in f32.  Fast but can
                 miss the 1e-2 gate on heavy-cancellation rows.
      'split3' — 3 bf16 residue chunks (24 mantissa bits == f32): full f32
                 accuracy from exact bf16 dots over bf16-exact tiles.
      'bf16'   — h cast to ONE bf16 chunk ([tc, f] operand — the minimum
                 HBM traffic mode; ~4e-3 single-rounding relative, safe
                 only for non-cancelling aggregations).
      'native' — single dot in the operand dtype; f32 operands run at
                 ``precision`` (HIGHEST: Mosaic only lowers
                 DEFAULT/HIGHEST), bf16 operands multiply exactly.
    pack: K tiles per grid step (plan must come from TilePlan.pad_runs(K));
      None auto-detects from the run lengths.
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
            and (tp.bits or a.dtype in (jnp.bfloat16, jnp.int8))
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
    if pack is None:
        # static metadata set by TilePlan.pad_runs; detect_pack only for
        # plans built outside the standard path (concrete arrays only)
        pack = getattr(tp, "pack", 1) or 1
        if pack == 1 and isinstance(tp.tile_row, np.ndarray):
            pack = detect_pack(tp.tile_row)
    # K=16 at [512, 128] measured fine for this kernel's temp footprint
    pack = cap_pack(pack, tr, tc, 16 * 512 * 128)
    assert num_t % pack == 0

    if h_mode in ("split", "split3"):
        nchunks = 2 if h_mode == "split" else 3
        chunks = bf16_residue_chunks(h, nchunks)
        # pack residue chunks side by side: ONE [tc, nchunks*f] block per
        # step (one DMA, one wide MXU dot) instead of nchunks operands
        h_op = jnp.concatenate(chunks, axis=1)
        w = nchunks * f
    elif h_mode == "bf16":
        nchunks = 1
        h_op = h.astype(jnp.bfloat16)
        w = f
    else:
        nchunks = 1
        h_op = h
        w = f

    K = pack
    steps = num_t // K

    # (row, col) packed into ONE int32 scalar-prefetch array: SMEM is only
    # 1 MiB and dense plans reach ~150k+ tiles — two separate int32 arrays
    # exceed it (measured OOM at reddit-scale threshold 24).  col < 2^C_BITS
    # by construction (nct tile columns).
    c_bits = max(int(nct - 1).bit_length(), 1)
    cmod = 1 << c_bits
    rc = row * cmod + col

    # Accumulate each tile-row run in a VMEM scratch and write the output
    # block ONCE at run end — reading o_ref back per step costs a measured
    # ~20% in HBM round-trips.  With pack K, K tiles (same destination run,
    # guaranteed by TilePlan.pad_runs) process per grid step: the ~180-300ns
    # per-step fixed cost amortizes K-fold (measured: 454 -> 175 ns/tile at
    # K=8, PERF_NOTES.md).
    f_out = None if w_epilogue is None else w_epilogue.shape[-1]

    def kernel(rc_ref, a_ref, *refs):
        h_refs = refs[:K]
        if w_epilogue is None:
            o_ref = refs[K]
            acc_ref = refs[K + 1]
        else:
            w_ref = refs[K]
            o_ref = refs[K + 1]
            ot_ref = refs[K + 2]
            acc_ref = refs[K + 3]
        i = pl.program_id(0)
        first = (i == 0) | (
            rc_ref[K * i] // cmod
            != rc_ref[jnp.maximum(K * i - 1, 0)] // cmod
        )
        last = (i == steps - 1) | (
            rc_ref[K * i + K - 1] // cmod
            != rc_ref[jnp.minimum(K * i + K, num_t - 1)] // cmod
        )

        @pl.when(first)
        def _zero():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        def one(k):
            a_blk = a_ref[k]
            h_blk = h_refs[k][...]
            if tp.bits and BITS_DECODE == "mxu_ladder":
                # decode-free bit-tile dot: with the plane-major packing
                # (bit b of w[i, c] = cell (b*R/8 + i, c)) and the shift
                # ladder s_b = w >> b, the plane identity
                #   plane_b = s_b - 2*s_{b+1}
                # moves the decode ONTO the MXU: 8 short dots t_b =
                # s_b @ H (same total streamed rows as the decoded
                # [R, C] dot; s_b <= 255 is exact in bf16) and the
                # [R, w]-sized output fixup replaces the 8-plane
                # shift+mask+concat+convert of the VPU decode — the
                # measured term that ate the bit tiles' 8x A-DMA saving.
                s0 = a_blk.astype(jnp.int32)
                ts = []
                for b in range(8):
                    sb = (s0 >> b).astype(h_blk.dtype)
                    ts.append(
                        jnp.dot(
                            sb,
                            h_blk,
                            preferred_element_type=jnp.float32,
                        )
                    )
                parts = [ts[b] - 2.0 * ts[b + 1] for b in range(7)]
                parts.append(ts[7])
                return jnp.concatenate(parts, axis=0)
            if tp.bits:
                a_blk = decode_bit_tile(a_blk, h_blk.dtype)
            elif a_blk.dtype != h_blk.dtype:  # int8 count tiles upcast free
                a_blk = a_blk.astype(h_blk.dtype)
            # Mosaic rejects non-DEFAULT precision on bf16 operands ("Bad
            # lhs type"); precision only applies to native-f32 dots.
            kw = (
                {"precision": precision}
                if h_blk.dtype == jnp.float32
                else {}
            )
            return jnp.dot(
                a_blk,
                h_blk,
                preferred_element_type=jnp.float32,
                **kw,
            )

        p = one(0)
        for k in range(1, K):
            p += one(k)
        acc = acc_ref[...]
        for k in range(nchunks):
            acc += p[:, k * f : (k + 1) * f]
        acc_ref[...] = acc

        @pl.when(last)
        def _write():
            o_ref[...] = acc_ref[...]
            if w_epilogue is not None:
                # the fused-GEMM epilogue: transform the VMEM-resident
                # run accumulator before it ever reaches HBM (reference
                # aggr_gcn_nn's shared-memory W, aggr_gcn.h:304-359)
                ot_ref[...] = jnp.dot(
                    acc_ref[...],
                    w_ref[...],
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST,
                )

    def h_index(k):
        return lambda i, rc: (rc[K * i + k] % cmod, 0)

    a_rows = tr // 8 if tp.bits else tr
    w_specs = []
    w_args = []
    out_spec = pl.BlockSpec((tr, f), lambda i, rc: (rc[K * i] // cmod, 0))
    out_specs = out_spec
    out_shapes = out_struct((nrt * tr, f), jnp.float32, h)
    if w_epilogue is not None:
        assert tp.scale_dst is None, (
            "w_epilogue needs an unfactored plan (scale_dst applies "
            "between accumulation and the GEMM)"
        )
        w_specs = [pl.BlockSpec((f, f_out), lambda i, rc: (0, 0))]
        w_args = [w_epilogue.astype(jnp.float32)]
        out_specs = [
            out_spec,
            pl.BlockSpec(
                (tr, f_out), lambda i, rc: (rc[K * i] // cmod, 0)
            ),
        ]
        out_shapes = [
            out_shapes,
            out_struct((nrt * tr, f_out), jnp.float32, h),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((K, a_rows, tc), lambda i, rc: (i, 0, 0))
        ]
        + [pl.BlockSpec((tc, w), h_index(k)) for k in range(K)]
        + w_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((tr, f), jnp.float32)],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
    )(rc, a, *([h_op] * K), *w_args)
    if w_epilogue is not None:
        agg, tr_out = out
        agg = agg[: tp.num_nodes]
        if tp.scale_src is not None:
            # scale_src folded into h above — consistent for both outputs
            pass
        return agg.astype(out_dtype), tr_out[: tp.num_nodes]
    out = out[: tp.num_nodes]
    if tp.scale_dst is not None:
        out = out * jnp.asarray(tp.scale_dst)[:, None]
    return out.astype(out_dtype)



def gat_bcsr_pallas(
    tp: TilePlan,
    h: jnp.ndarray,
    att: jnp.ndarray,
    relu_slope: float = 0.2,
    mode: str = "maxdot",
    pack: int = None,
    hv_chunks: int = 2,
    row_shift=None,
    dot_mode: str = "exact",
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

    mode='maxdot': exact single-dot form via the identity
        exp(lrelu(ad+as)) = max(e^{ad} e^{as}, e^{s ad} e^{s as})
    (for slope s<1 the two branch products cross exactly at ad+as=0).
    The scored tile a_s = cnt * max(u1 v1^T, u2 v2^T) is built in f32 on
    the VPU (exact: integer counts times 1-ulp products) and multiplied
    against the RAW f32 h block with a HIGHEST-precision dot — f32-grade
    accuracy with ONE dot, one [tc, f] f32 operand (half the twodot DMA),
    and no compare/cast chain.

    mode='merged' (~25% faster than twodot, looser): fold branch 2 into
    the tile via the rank-1 rescale
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
    # per-destination softmax stabilizer folds into the DST exponentials
    # only (exp(z - M) = exp(ad - M) exp(as)); the in-kernel branch tests
    # and the q = u2/u1 ratio use raw ad and are shift-invariant
    sh = (
        0.0
        if row_shift is None
        else pad_to(row_shift.astype(jnp.float32), nrt * tr)[:, None]
    )
    u1 = jnp.exp(ad - sh)
    u2 = jnp.exp(relu_slope * ad - sh)
    hp = pad_to(h.astype(jnp.float32), nct * tc)
    v1 = jnp.exp(asv)[:, None]
    v2 = jnp.exp(relu_slope * asv)[:, None]
    v1b = v1.reshape(nct, 1, tc)
    v2b = v2.reshape(nct, 1, tc)

    # packed [tc, hv_chunks*f] operand(s): v_b*h as bf16 residue chunks.
    # hv_chunks=2 (16 mantissa bits) is the exact default; hv_chunks=1
    # single-rounds the operand (~4e-3) — halves the dot work + DMA bytes,
    # for callers that accept the looser score-weighted sums.
    def hv_op(x):
        if hv_chunks == 1:
            return x.astype(jnp.bfloat16)
        return jnp.concatenate(bf16_residue_chunks(x, hv_chunks), axis=1)

    hv1 = hv_op(hp * v1)

    a = jnp.asarray(tp.a)
    num_t = a.shape[0]
    # packed (row, col) scalar prefetch — see bcsr_spmm_pallas (SMEM is
    # 1 MiB; dense plans exceed it with two int32 arrays)
    c_bits = max(int(nct - 1).bit_length(), 1)
    cmod = 1 << c_bits
    rc = jnp.asarray(tp.tile_row) * cmod + jnp.asarray(tp.tile_col)

    K = pack if pack is not None else (getattr(tp, "pack", 1) or 1)
    # Mosaic stack-allocates the temporaries of ALL K unrolled tile
    # iterations; split2's extra per-k split chunks push K=16 @ [512,128]
    # to 18.9 MB > the 16 MB VMEM limit (measured); K=8 fits.  The other
    # modes fit at 16.
    K = cap_pack(
        K, tr, tc,
        8 * 512 * 128 if dot_mode == "split2" else 16 * 512 * 128,
    )
    assert num_t % K == 0
    steps = num_t // K

    # Within a grid step all K tiles share one destination run (pad_runs
    # contract), so the row-side blocks (ad/u/q) are fetched ONCE per step.
    def bounds(rc_ref, i):
        first = (i == 0) | (
            rc_ref[K * i] // cmod
            != rc_ref[jnp.maximum(K * i - 1, 0)] // cmod
        )
        last = (i == steps - 1) | (
            rc_ref[K * i + K - 1] // cmod
            != rc_ref[jnp.minimum(K * i + K, num_t - 1)] // cmod
        )
        return first, last

    a_rows = tr // 8 if tp.bits else tr
    a_spec = pl.BlockSpec((K, a_rows, tc), lambda i, rc: (i, 0, 0))

    def cnt_of(a_ref, k):
        if tp.bits:
            return decode_bit_tile(a_ref[k], jnp.float32)
        return a_ref[k].astype(jnp.float32)

    rowb = lambda i, rc: (rc[K * i] // cmod, 0)
    row_spec = pl.BlockSpec((tr, 1), rowb)

    def col_spec(k):
        return pl.BlockSpec(
            (1, 1, tc), lambda i, rc: (rc[K * i + k] % cmod, 0, 0)
        )

    wv = hv_chunks * f

    def hv_spec(k):
        return pl.BlockSpec(
            (tc, wv), lambda i, rc: (rc[K * i + k] % cmod, 0)
        )

    out_specs = [
        pl.BlockSpec((tr, f), rowb),
        pl.BlockSpec((tr, 1), rowb),
    ]
    scratch = [
        pltpu.VMEM((tr, f), jnp.float32),
        pltpu.VMEM((tr, 1), jnp.float32),
    ]
    out_shape = [
        out_struct((nrt * tr, f), jnp.float32, h),
        out_struct((nrt * tr, 1), jnp.float32, h),
    ]

    if mode == "maxdot":
        # pack (v1, v2) into ONE [nct, 2, tc] col operand and (u1, u2)
        # into ONE [nrt*tr, 2] row operand: the kernel is bound by
        # per-step fixed costs (~3K+4 operand DMAs at pack K), so halving
        # the small-block count matters more than VPU passes (measured:
        # u1-factoring alone changed nothing).
        v12 = jnp.concatenate([v1b, v2b], axis=1)  # [nct, 2, tc]
        u12 = jnp.concatenate([u1, u2], axis=1)  # [nrt*tr, 2]

        # dot_mode='split2': the h operand is the packed 16-mantissa-bit
        # residue pair [tc, 2f] bf16 (exact to 2^-17, exactly the GCN
        # dense default); same DMA bytes as the raw f32 block.
        if dot_mode == "split2":
            h_dot_op = jnp.concatenate(bf16_residue_chunks(hp, 2), axis=1)
            h_dot_w = 2 * f
        else:
            h_dot_op = hp
            h_dot_w = f

        def kernel(rc_ref, a_ref, u12_ref, *refs):
            v12_refs = refs[:K]
            h_refs = refs[K : 2 * K]
            num_ref, den_ref, accn_ref, accd_ref = refs[2 * K :]
            i = pl.program_id(0)
            first, last = bounds(rc_ref, i)

            @pl.when(first)
            def _zero():
                accn_ref[...] = jnp.zeros_like(accn_ref)
                accd_ref[...] = jnp.zeros_like(accd_ref)

            accn = accn_ref[...]
            accd = accd_ref[...]
            u1v = u12_ref[:, :1]
            # factor the per-destination u1 OUT of the max:
            #   max(u1 v1, u2 v2) = u1 * max(v1, q v2),  q = u2/u1 > 0
            # u1 then applies as a row post-scale on dot result + row-sum
            q = u12_ref[:, 1:2] / u1v
            for k in range(K):
                cnt = cnt_of(a_ref, k)
                a_s = cnt * jnp.maximum(
                    v12_refs[k][0, 0], q * v12_refs[k][0, 1]
                )
                if dot_mode == "split2":
                    # asymmetric score-split: a_s = hi + lo + O(2^-17),
                    # both chunks exact bf16.  hi multiplies the exact
                    # [tc, 2f] h residue pair (2 bf16 MXU passes); lo —
                    # already 2^-9 small — needs only the single-rounded
                    # hi h chunk (1 pass).  3 bf16-dot units total vs the
                    # HIGHEST f32 form's ~6 (measured 371 ns/tile), at
                    # ~2^-16 relative error — the same class as the
                    # gate-passing twodot split2 mode.
                    # bf16 via explicit casts: lax.reduce_precision has
                    # no Pallas TPU lowering, and Mosaic keeps explicit
                    # converts (the astype-round-trip deletion is an XLA
                    # HLO excess-precision pass, which never sees kernel
                    # bodies) — correctness asserted on-chip by
                    # probes/gat_dot_split2.py (a deleted round-trip
                    # would put ~2.2% of elements outside the gate, the
                    # measured dot_mode='default' signature).
                    hi32 = a_s.astype(jnp.bfloat16).astype(jnp.float32)
                    lo = (a_s - hi32).astype(jnp.bfloat16)
                    hb = h_refs[k][...]
                    p1 = jnp.dot(
                        hi32.astype(jnp.bfloat16),  # exact (already bf16)
                        hb,
                        preferred_element_type=jnp.float32,
                    )
                    p2 = jnp.dot(
                        lo,
                        hb[:, :f],
                        preferred_element_type=jnp.float32,
                    )
                    accn += u1v * (p1[:, :f] + p1[:, f:] + p2)
                else:
                    # dot_mode='default': ONE bf16 MXU pass instead of
                    # the exact form's ~6 (measured 152 vs 371 ns/tile)
                    # — both operands single-round to bf16; the
                    # denominator row-sum stays exact f32, so score
                    # rounding perturbs only the numerator weights
                    # (nonneg, non-cancelling in den).
                    accn += u1v * jnp.dot(
                        a_s,
                        h_refs[k][...],
                        preferred_element_type=jnp.float32,
                        precision=(
                            lax.Precision.DEFAULT
                            if dot_mode == "default"
                            else lax.Precision.HIGHEST
                        ),
                    )
                accd += u1v * jnp.sum(a_s, axis=1, keepdims=True)
            accn_ref[...] = accn
            accd_ref[...] = accd

            @pl.when(last)
            def _write():
                num_ref[...] = accn_ref[...]
                den_ref[...] = accd_ref[...]

        def hraw_spec(k):
            return pl.BlockSpec(
                (tc, h_dot_w), lambda i, rc: (rc[K * i + k] % cmod, 0)
            )

        def v12_spec(k):
            return pl.BlockSpec(
                (1, 2, tc), lambda i, rc: (rc[K * i + k] % cmod, 0, 0)
            )

        u12_spec = pl.BlockSpec(
            (tr, 2), lambda i, rc: (rc[K * i] // cmod, 0)
        )

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(steps,),
            in_specs=[a_spec, u12_spec]
            + [v12_spec(k) for k in range(K)]
            + [hraw_spec(k) for k in range(K)],
            out_specs=out_specs,
            scratch_shapes=scratch,
        )
        num, den = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape
        )(
            rc, a, u12, *([v12] * K), *([h_dot_op] * K),
        )
        return num[: tp.num_nodes], den[: tp.num_nodes, 0]

    if mode == "merged":
        # q = u2/u1 computed shift-free (the u's may carry a row_shift;
        # the ratio is shift-invariant but 0/0s if both underflow)
        q = jnp.exp((relu_slope - 1.0) * ad)
        r = (v2 / v1).reshape(nct, 1, tc)

        def kernel(rc_ref, a_ref, ad_ref, u1_ref, q_ref, *refs):
            as_refs = refs[:K]
            r_refs = refs[K : 2 * K]
            v1_refs = refs[2 * K : 3 * K]
            hv_refs = refs[3 * K : 4 * K]
            num_ref, den_ref, accn_ref, accd_ref = refs[4 * K :]
            i = pl.program_id(0)
            first, last = bounds(rc_ref, i)

            @pl.when(first)
            def _zero():
                accn_ref[...] = jnp.zeros_like(accn_ref)
                accd_ref[...] = jnp.zeros_like(accd_ref)

            accn = accn_ref[...]
            accd = accd_ref[...]
            for k in range(K):
                cnt = cnt_of(a_ref, k)
                z = ad_ref[...] + as_refs[k][0]  # [tr,1]+[1,tc]
                a_m = jnp.where(
                    z > 0.0, cnt, cnt * (q_ref[...] * r_refs[k][0])
                )
                p = jnp.dot(
                    a_m.astype(jnp.bfloat16),
                    hv_refs[k][...],
                    preferred_element_type=jnp.float32,
                )
                pn = p[:, :f]
                for c in range(1, hv_chunks):
                    pn = pn + p[:, c * f : (c + 1) * f]
                accn += u1_ref[...] * pn
                # denominator: VPU row-reduction of the scored tile
                accd += u1_ref[...] * jnp.sum(
                    a_m * v1_refs[k][0], axis=1, keepdims=True
                )
            accn_ref[...] = accn
            accd_ref[...] = accd

            @pl.when(last)
            def _write():
                num_ref[...] = accn_ref[...]
                den_ref[...] = accd_ref[...]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(steps,),
            in_specs=[a_spec, row_spec, row_spec, row_spec]
            + [col_spec(k) for k in range(K)]
            + [col_spec(k) for k in range(K)]
            + [col_spec(k) for k in range(K)]
            + [hv_spec(k) for k in range(K)],
            out_specs=out_specs,
            scratch_shapes=scratch,
        )
        num, den = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape
        )(
            rc, a, ad, u1, q,
            *([asrc] * K), *([r] * K), *([v1b] * K), *([hv1] * K),
        )
        return num[: tp.num_nodes], den[: tp.num_nodes, 0]

    hv2 = hv_op(hp * v2)

    def kernel(rc_ref, a_ref, ad_ref, u1_ref, u2_ref, *refs):
        as_refs = refs[:K]
        v1_refs = refs[K : 2 * K]
        v2_refs = refs[2 * K : 3 * K]
        hv1_refs = refs[3 * K : 4 * K]
        hv2_refs = refs[4 * K : 5 * K]
        num_ref, den_ref, accn_ref, accd_ref = refs[5 * K :]
        i = pl.program_id(0)
        first, last = bounds(rc_ref, i)

        @pl.when(first)
        def _zero():
            accn_ref[...] = jnp.zeros_like(accn_ref)
            accd_ref[...] = jnp.zeros_like(accd_ref)

        accn = accn_ref[...]
        accd = accd_ref[...]
        for k in range(K):
            cnt = cnt_of(a_ref, k)
            z = ad_ref[...] + as_refs[k][0]
            pos = z > 0.0
            a1 = jnp.where(pos, cnt, 0.0)
            a2 = cnt - a1
            p1 = jnp.dot(
                a1.astype(jnp.bfloat16),
                hv1_refs[k][...],
                preferred_element_type=jnp.float32,
            )
            p2 = jnp.dot(
                a2.astype(jnp.bfloat16),
                hv2_refs[k][...],
                preferred_element_type=jnp.float32,
            )
            def rec(p):
                out = p[:, :f]
                for c in range(1, hv_chunks):
                    out = out + p[:, c * f : (c + 1) * f]
                return out

            accn += u1_ref[...] * rec(p1) + u2_ref[...] * rec(p2)
            accd += u1_ref[...] * jnp.sum(
                a1 * v1_refs[k][0], axis=1, keepdims=True
            ) + u2_ref[...] * jnp.sum(
                a2 * v2_refs[k][0], axis=1, keepdims=True
            )
        accn_ref[...] = accn
        accd_ref[...] = accd

        @pl.when(last)
        def _write():
            num_ref[...] = accn_ref[...]
            den_ref[...] = accd_ref[...]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=[a_spec, row_spec, row_spec, row_spec]
        + [col_spec(k) for k in range(K)]
        + [col_spec(k) for k in range(K)]
        + [col_spec(k) for k in range(K)]
        + [hv_spec(k) for k in range(K)]
        + [hv_spec(k) for k in range(K)],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    num, den = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape
    )(
        rc, a, ad, u1, u2,
        *([asrc] * K), *([v1b] * K), *([v2b] * K),
        *([hv1] * K), *([hv2] * K),
    )
    return num[: tp.num_nodes], den[: tp.num_nodes, 0]


def gat_bwd_dad_pallas(
    tp: TilePlan,
    h: jnp.ndarray,
    gbar: jnp.ndarray,
    c: jnp.ndarray,
    u12: jnp.ndarray,
    v12: jnp.ndarray,
    relu_slope: float,
    pack: int = None,
    dot_mode: str = "exact",
):
    """d_att_dst of the dense-tile GAT edges, streamed over the FORWARD
    plan (row-run output residency like every aggregation kernel).

    Math (see ops/bcsr_gat.py streaming-backward derivation): per tile
    cell (i, j) with branch products b1 = u1_i v1_j, b2 = u2_i v2_j,

        s_ij   = cnt * max(b1, b2)          (the exact forward score)
        lrelu' = 1 if b1 >= b2 else slope   (b1 >= b2  <=>  z_ij > 0)
        d_ad_i = sum_j lrelu' * s_ij * (<gbar_i, h_j> - c_i)

    The <gbar, h> inner products of the whole tile are ONE MXU dot
    gbar_blk [tr, f] @ hT_blk [f, tc] — the SDDMM shape.  This replaces
    AD-through-the-scan, whose saved [chunk, tr, tc] branch tiles OOM'd
    at reddit scale (the reference hand-writes this backward for the same
    reason, aggr_gat.h:222-294)."""
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

    u12p = pad_to(u12.astype(jnp.float32), nrt * tr)
    cp = pad_to(c.astype(jnp.float32)[:, None], nrt * tr)
    gb = pad_to(gbar.astype(jnp.float32), nrt * tr)
    # [nct, 2, tc] col-operand layout (block (1, 2, tc) per tile)
    v12b = (
        pad_to(v12.astype(jnp.float32), nct * tc)
        .reshape(nct, tc, 2)
        .transpose(0, 2, 1)
    )
    if dot_mode == "split2":
        # 16-bit residue pairs for both <gbar, h> SDDMM operands: the
        # exact-to-2^-17 product is 3 bf16 dots (g1t1 + g2t1 + g1t2;
        # the dropped g2t2 term is 2^-18) vs HIGHEST's ~6 passes.  Same
        # DMA bytes as the f32 forms.
        gb = jnp.concatenate(bf16_residue_chunks(gb, 2), axis=1)
        hc = bf16_residue_chunks(
            pad_to(h.astype(jnp.float32), nct * tc), 2
        )
        ht = jnp.concatenate([hc[0].T, hc[1].T], axis=0)  # [2f, nct*tc]
    else:
        ht = pad_to(h.astype(jnp.float32), nct * tc).T  # [f, nct*tc]

    a = jnp.asarray(tp.a)
    num_t = a.shape[0]
    c_bits = max(int(nct - 1).bit_length(), 1)
    cmod = 1 << c_bits
    rc = jnp.asarray(tp.tile_row) * cmod + jnp.asarray(tp.tile_col)

    K = pack if pack is not None else (getattr(tp, "pack", 1) or 1)
    # measured fit: K=16 over the r256/c128 training plans (see cap_pack);
    # split2 carries extra per-k chunk temps -> half budget
    K = cap_pack(
        K, tr, tc,
        8 * 256 * 128 if dot_mode == "split2" else 16 * 256 * 128,
    )
    assert num_t % K == 0
    steps = num_t // K

    def bounds(rc_ref, i):
        first = (i == 0) | (
            rc_ref[K * i] // cmod
            != rc_ref[jnp.maximum(K * i - 1, 0)] // cmod
        )
        last = (i == steps - 1) | (
            rc_ref[K * i + K - 1] // cmod
            != rc_ref[jnp.minimum(K * i + K, num_t - 1)] // cmod
        )
        return first, last

    a_rows = tr // 8 if tp.bits else tr
    a_spec = pl.BlockSpec((K, a_rows, tc), lambda i, rc: (i, 0, 0))
    rowb = lambda i, rc: (rc[K * i] // cmod, 0)

    def v12_spec(k):
        return pl.BlockSpec(
            (1, 2, tc), lambda i, rc: (rc[K * i + k] % cmod, 0, 0)
        )

    fw = 2 * f if dot_mode == "split2" else f

    def ht_spec(k):
        return pl.BlockSpec(
            (fw, tc), lambda i, rc: (0, rc[K * i + k] % cmod)
        )

    def kernel(rc_ref, a_ref, u12_ref, c_ref, gbar_ref, *refs):
        v12_refs = refs[:K]
        ht_refs = refs[K : 2 * K]
        out_ref, acc_ref = refs[2 * K :]
        i = pl.program_id(0)
        first, last = bounds(rc_ref, i)

        @pl.when(first)
        def _zero():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc = acc_ref[...]
        u1 = u12_ref[:, :1]
        u2 = u12_ref[:, 1:2]
        for k in range(K):
            if tp.bits:
                cnt = decode_bit_tile(a_ref[k], jnp.float32)
            else:
                cnt = a_ref[k].astype(jnp.float32)
            b1 = u1 * v12_refs[k][0, 0]
            b2 = u2 * v12_refs[k][0, 1]
            # cnt mask BEFORE multiply: non-edge cells can have
            # unbounded branch exponentials at wide logits (0*inf=NaN)
            s = jnp.where(cnt > 0.0, cnt * jnp.maximum(b1, b2), 0.0)
            lp = jnp.where(b1 >= b2, 1.0, relu_slope)
            if dot_mode == "split2":
                g12 = gbar_ref[...]
                t12 = ht_refs[k][...]
                dk = lambda a_, b_: jnp.dot(
                    a_, b_, preferred_element_type=jnp.float32
                )
                p = (
                    dk(g12[:, :f], t12[:f])
                    + dk(g12[:, f:], t12[:f])
                    + dk(g12[:, :f], t12[f:])
                )
            else:
                p = jnp.dot(
                    gbar_ref[...],
                    ht_refs[k][...],
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST,
                )
            t = lp * s * (p - c_ref[...])
            acc += jnp.sum(t, axis=1, keepdims=True)
        acc_ref[...] = acc

        @pl.when(last)
        def _write():
            out_ref[...] = acc_ref[...]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=[
            a_spec,
            pl.BlockSpec((tr, 2), rowb),
            pl.BlockSpec((tr, 1), rowb),
            pl.BlockSpec((tr, fw), rowb),
        ]
        + [v12_spec(k) for k in range(K)]
        + [ht_spec(k) for k in range(K)],
        out_specs=[pl.BlockSpec((tr, 1), rowb)],
        scratch_shapes=[pltpu.VMEM((tr, 1), jnp.float32)],
    )
    (out,) = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[out_struct((nrt * tr, 1), jnp.float32, h)],
    )(rc, a, u12p, cp, gb, *([v12b] * K), *([ht] * K))
    return out[: tp.num_nodes, 0]


def gat_bwd_dh_das_pallas(
    tp_t: TilePlan,
    h: jnp.ndarray,
    gbar: jnp.ndarray,
    c: jnp.ndarray,
    u12: jnp.ndarray,
    v12: jnp.ndarray,
    relu_slope: float,
    pack: int = None,
    dot_mode: str = "exact",
):
    """(dh, d_att_src) of the dense-tile GAT edges, streamed over the
    TRANSPOSED plan (rows = source nodes, so both outputs accumulate in
    row runs).  Per transposed tile cell (j, i):

        s_ij  = cnt * max(v1_j u1_i, v2_j u2_i)
        dh_j  = sum_i s_ij gbar_i              -> S_t @ gbar  (MXU)
        d_as_j = sum_i lrelu' s_ij (<gbar_i, h_j> - c_i)
                                               -> h @ gbarT (MXU) + VPU

    ``h`` / ``v12`` index the transposed plan's ROWS (original sources);
    ``gbar`` / ``u12`` / ``c`` its COLUMNS (original destinations)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tr, tc = tp_t.tile_rows, tp_t.tile_cols
    f = h.shape[-1]
    nct, nrt = tp_t.num_col_tiles, tp_t.num_row_tiles

    def pad_to(x, size):
        if x.shape[0] == size:
            return x
        p = [(0, size - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, p)

    v12p = pad_to(v12.astype(jnp.float32), nrt * tr)
    hp = pad_to(h.astype(jnp.float32), nrt * tr)
    u12b = (
        pad_to(u12.astype(jnp.float32), nct * tc)
        .reshape(nct, tc, 2)
        .transpose(0, 2, 1)
    )  # [nct, 2, tc]
    cb = pad_to(c.astype(jnp.float32)[:, None], nct * tc).reshape(
        nct, 1, tc
    )
    gb = pad_to(gbar.astype(jnp.float32), nct * tc)
    if dot_mode == "split2":
        # 16-bit residue operands (see gat_bwd_dad_pallas): the s@gbar
        # dot becomes the forward kernel's asymmetric score split (3 bf16
        # units) and the h@gbarT SDDMM becomes the 3-term chunk product.
        gc = bf16_residue_chunks(gb, 2)
        gb = jnp.concatenate(gc, axis=1)  # [nct*tc, 2f] bf16
        gbt = jnp.concatenate([gc[0].T, gc[1].T], axis=0)  # [2f, nct*tc]
        hp = jnp.concatenate(bf16_residue_chunks(hp, 2), axis=1)
    else:
        gbt = gb.T  # [f, nct*tc]

    a = jnp.asarray(tp_t.a)
    num_t = a.shape[0]
    c_bits = max(int(nct - 1).bit_length(), 1)
    cmod = 1 << c_bits
    rc = jnp.asarray(tp_t.tile_row) * cmod + jnp.asarray(tp_t.tile_col)

    K = pack if pack is not None else (getattr(tp_t, "pack", 1) or 1)
    # measured fit: K=16 over the r128/c256 transposed training plans;
    # split2 carries extra per-k chunk temps -> half budget
    K = cap_pack(
        K, tr, tc,
        8 * 256 * 128 if dot_mode == "split2" else 16 * 256 * 128,
    )
    assert num_t % K == 0
    steps = num_t // K

    def bounds(rc_ref, i):
        first = (i == 0) | (
            rc_ref[K * i] // cmod
            != rc_ref[jnp.maximum(K * i - 1, 0)] // cmod
        )
        last = (i == steps - 1) | (
            rc_ref[K * i + K - 1] // cmod
            != rc_ref[jnp.minimum(K * i + K, num_t - 1)] // cmod
        )
        return first, last

    a_rows = tr // 8 if tp_t.bits else tr
    a_spec = pl.BlockSpec((K, a_rows, tc), lambda i, rc: (i, 0, 0))
    rowb = lambda i, rc: (rc[K * i] // cmod, 0)

    fw = 2 * f if dot_mode == "split2" else f

    def colb3(k, shape):
        return pl.BlockSpec(
            shape, lambda i, rc: (rc[K * i + k] % cmod, 0, 0)
        )

    def gbar_spec(k):
        return pl.BlockSpec(
            (tc, fw), lambda i, rc: (rc[K * i + k] % cmod, 0)
        )

    def gbt_spec(k):
        return pl.BlockSpec(
            (fw, tc), lambda i, rc: (0, rc[K * i + k] % cmod)
        )

    def kernel(rc_ref, a_ref, v12_ref, h_ref, *refs):
        u12_refs = refs[:K]
        c_refs = refs[K : 2 * K]
        gbar_refs = refs[2 * K : 3 * K]
        gbt_refs = refs[3 * K : 4 * K]
        dh_ref, das_ref, acch_ref, accs_ref = refs[4 * K :]
        i = pl.program_id(0)
        first, last = bounds(rc_ref, i)

        @pl.when(first)
        def _zero():
            acch_ref[...] = jnp.zeros_like(acch_ref)
            accs_ref[...] = jnp.zeros_like(accs_ref)

        acch = acch_ref[...]
        accs = accs_ref[...]
        v1 = v12_ref[:, :1]
        v2 = v12_ref[:, 1:2]
        for k in range(K):
            if tp_t.bits:
                cnt = decode_bit_tile(a_ref[k], jnp.float32)
            else:
                cnt = a_ref[k].astype(jnp.float32)
            b1 = v1 * u12_refs[k][0, 0]
            b2 = v2 * u12_refs[k][0, 1]
            # cnt mask before multiply (0 * inf = NaN at non-edge cells)
            s = jnp.where(cnt > 0.0, cnt * jnp.maximum(b1, b2), 0.0)
            lp = jnp.where(b1 >= b2, 1.0, relu_slope)
            if dot_mode == "split2":
                dk = lambda a_, b_: jnp.dot(
                    a_, b_, preferred_element_type=jnp.float32
                )
                s_hi32 = s.astype(jnp.bfloat16).astype(jnp.float32)
                s_lo = (s - s_hi32).astype(jnp.bfloat16)
                g12 = gbar_refs[k][...]  # [tc, 2f] bf16
                ph = dk(s_hi32.astype(jnp.bfloat16), g12)
                acch += ph[:, :f] + ph[:, f:] + dk(s_lo, g12[:, :f])
                h12 = h_ref[...]  # [tr, 2f] bf16
                t12 = gbt_refs[k][...]  # [2f, tc] bf16
                p = (
                    dk(h12[:, :f], t12[:f])
                    + dk(h12[:, f:], t12[:f])
                    + dk(h12[:, :f], t12[f:])
                )
            else:
                acch += jnp.dot(
                    s,
                    gbar_refs[k][...],
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST,
                )
                p = jnp.dot(
                    h_ref[...],
                    gbt_refs[k][...],
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST,
                )
            t = lp * s * (p - c_refs[k][0])
            accs += jnp.sum(t, axis=1, keepdims=True)
        acch_ref[...] = acch
        accs_ref[...] = accs

        @pl.when(last)
        def _write():
            dh_ref[...] = acch_ref[...]
            das_ref[...] = accs_ref[...]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=[
            a_spec,
            pl.BlockSpec((tr, 2), rowb),
            pl.BlockSpec((tr, fw), rowb),
        ]
        + [colb3(k, (1, 2, tc)) for k in range(K)]
        + [colb3(k, (1, 1, tc)) for k in range(K)]
        + [gbar_spec(k) for k in range(K)]
        + [gbt_spec(k) for k in range(K)],
        out_specs=[
            pl.BlockSpec((tr, f), rowb),
            pl.BlockSpec((tr, 1), rowb),
        ],
        scratch_shapes=[
            pltpu.VMEM((tr, f), jnp.float32),
            pltpu.VMEM((tr, 1), jnp.float32),
        ],
    )
    dh, das = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[
            out_struct((nrt * tr, f), jnp.float32, h),
            out_struct((nrt * tr, 1), jnp.float32, h),
        ],
    )(
        rc, a, v12p, hp,
        *([u12b] * K), *([cb] * K), *([gb] * K), *([gbt] * K),
    )
    return dh[: tp_t.num_nodes], das[: tp_t.num_nodes, 0]


def rowmax_bcsr_pallas(
    tp: TilePlan,
    col_vals: jnp.ndarray,
    pack: int = None,
):
    """Per-destination-row max of ``col_vals`` over tile cells with
    count > 0 (-inf for rows the tiles give no edge): the GAT softmax
    stabilizer's dense part (ops.bcsr.bcsr_rowmax), as a Pallas kernel.

    Exists because the XLA-scan formulation duplicates A in HBM (a pad
    temp + a scan-xs layout copy, 2x 7.6 GB at reddit r512 — measured
    OOM in the stabilized GAT training step); this kernel streams the
    SAME A blocks as the aggregation kernels with zero extra HBM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tr, tc = tp.tile_rows, tp.tile_cols
    nct, nrt = tp.num_col_tiles, tp.num_row_tiles

    v = col_vals.astype(jnp.float32)
    if v.shape[0] != nct * tc:
        v = jnp.pad(
            v, (0, nct * tc - v.shape[0]), constant_values=-jnp.inf
        )
    vb = v.reshape(nct, 1, tc)

    a = jnp.asarray(tp.a)
    num_t = a.shape[0]
    c_bits = max(int(nct - 1).bit_length(), 1)
    cmod = 1 << c_bits
    rc = jnp.asarray(tp.tile_row) * cmod + jnp.asarray(tp.tile_col)

    K = pack if pack is not None else (getattr(tp, "pack", 1) or 1)
    assert num_t % K == 0
    steps = num_t // K

    def bounds(rc_ref, i):
        first = (i == 0) | (
            rc_ref[K * i] // cmod
            != rc_ref[jnp.maximum(K * i - 1, 0)] // cmod
        )
        last = (i == steps - 1) | (
            rc_ref[K * i + K - 1] // cmod
            != rc_ref[jnp.minimum(K * i + K, num_t - 1)] // cmod
        )
        return first, last

    a_rows = tr // 8 if tp.bits else tr
    a_spec = pl.BlockSpec((K, a_rows, tc), lambda i, rc: (i, 0, 0))
    rowb = lambda i, rc: (rc[K * i] // cmod, 0)

    def col_spec(k):
        return pl.BlockSpec(
            (1, 1, tc), lambda i, rc: (rc[K * i + k] % cmod, 0, 0)
        )

    def kernel(rc_ref, a_ref, *refs):
        v_refs = refs[:K]
        out_ref, acc_ref = refs[K:]
        i = pl.program_id(0)
        first, last = bounds(rc_ref, i)

        @pl.when(first)
        def _init():
            acc_ref[...] = jnp.full_like(acc_ref, -jnp.inf)

        acc = acc_ref[...]
        for k in range(K):
            if tp.bits:
                cnt = decode_bit_tile(a_ref[k], jnp.float32)
            else:
                cnt = a_ref[k].astype(jnp.float32)
            masked = jnp.where(cnt > 0.0, v_refs[k][0], -jnp.inf)
            acc = jnp.maximum(acc, masked.max(axis=1, keepdims=True))
        acc_ref[...] = acc

        @pl.when(last)
        def _write():
            out_ref[...] = acc_ref[...]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=[a_spec] + [col_spec(k) for k in range(K)],
        out_specs=[pl.BlockSpec((tr, 1), rowb)],
        scratch_shapes=[pltpu.VMEM((tr, 1), jnp.float32)],
    )
    (out,) = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[out_struct((nrt * tr, 1), jnp.float32, col_vals)],
    )(rc, a, *([vb] * K))
    return out[: tp.num_nodes, 0]
