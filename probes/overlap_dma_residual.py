"""Probe: residual gather as manual in-kernel DMAs — NEGATIVE RESULT.

Question was: can a Pallas kernel issue the residual plan's random-row
gathers itself (per-row make_async_copy, indices streamed to SMEM per
grid step) so they overlap with the DMA/MXU-bound dense tile work?

Answer: NO, for a structural reason (PERF_NOTES.md session 6).  TPU HBM
arrays are stored (8,128)-TILED and Mosaic DMA slices must be
tile-aligned — a single [1, f] row is sub-tile and cannot be DMAed
("Slice shape along dimension 0 must be aligned to tiling (8), but is
1"; 1-D views tile at 1024 elements, so flat [idx*f : idx*f+f] slices
are equally illegal).  Only whole [8, f]-block fetches exist, which is
precisely what XLA's own gather pays: measured gather rates match
tile-bytes/bandwidth (f32 4 KB -> 5.4 ns/slot skewed, 16-bit 2 KB ->
2.45 ns, sub-2 KB floored at ~2.5 ns by descriptor issue).  The gather
is therefore BANDWIDTH-bound like the dense tiles — overlapping two
phases that share the one HBM bottleneck has no headroom.

Kept for the record and for the SMEM-streamed-index/DMA machinery
(working up to the point of the tiling rejection).
"""

import argparse
import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnn_computing_tpu.ops.pallas_bcsr import bf16_residue_chunks


def dma_task_sums(
    h: jnp.ndarray,          # [n, f] f32 (lives in HBM, never blocked)
    idx_steps: jnp.ndarray,  # [steps, TPB*B] int32 slot source rows
    val: jnp.ndarray,        # [steps*TPB, B] f32 slot values
    tpb: int,
    block: int,
) -> jnp.ndarray:
    """[steps*TPB, f] task sums: sum_b val[t, b] * h[idx[t, b]]."""
    steps = idx_steps.shape[0]
    rows = tpb * block
    f = h.shape[-1]

    def kernel(idx_hbm, h_hbm, val_ref, out_ref,
               idx_smem, buf, sem_idx, sem_rows):
        i = pl.program_id(0)
        slot = lax.rem(i, 2)
        nxt = lax.rem(i + 1, 2)

        def idx_dma(sl, step):
            return pltpu.make_async_copy(
                idx_hbm.at[pl.ds(step * rows, rows)],
                idx_smem.at[sl],
                sem_idx.at[sl],
            )

        # warm-up: the very first step starts its own index DMA
        @pl.when(i == 0)
        def _first():
            idx_dma(slot, i).start()

        # prefetch next step's indices while this step works
        @pl.when(i + 1 < steps)
        def _prefetch():
            idx_dma(nxt, i + 1).start()

        idx_dma(slot, i).wait()

        # slot-major buffer layout: slot b of task t lands at row
        # (b*tpb + t) so each slot's rows are CONTIGUOUS [tpb, f] chunks
        # (summable with static slices; Mosaic cannot 1D->3D shape-cast)
        def row_dma(j, idx):
            dst = (lax.rem(j, block) * tpb + j // block) * f
            return pltpu.make_async_copy(
                h_hbm.at[pl.ds(idx * f, f)],
                buf.at[pl.ds(dst, f)],
                sem_rows,
            )

        def start_one(j, _):
            row_dma(j, idx_smem[slot, j]).start()
            return 0

        lax.fori_loop(0, rows, start_one, 0)

        def wait_one(j, _):
            row_dma(j, idx_smem[slot, j]).wait()
            return 0

        lax.fori_loop(0, rows, wait_one, 0)

        vv = val_ref[...]
        acc = vv[:, 0:1] * buf[pl.ds(0, tpb * f)].reshape(tpb, f)
        for b in range(1, block):
            acc = acc + vv[:, b:b + 1] * buf[
                pl.ds(b * tpb * f, tpb * f)
            ].reshape(tpb, f)
        out_ref[...] = acc

    return pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # idx
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # h
            pl.BlockSpec((tpb, block), lambda i: (i, 0)),  # val
        ],
        out_specs=pl.BlockSpec((tpb, f), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((steps * tpb, f), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((2, rows), jnp.int32),
            pltpu.VMEM((rows * f,), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(idx_steps.reshape(-1), h.reshape(-1), val)


def fused_hybrid(
    tp,                      # TilePlan (int8/bf16 counts, packed runs)
    h: jnp.ndarray,          # [n, f] f32 raw features
    idx_steps: jnp.ndarray,  # [steps, TPB*B] residual slot source rows
    val: jnp.ndarray,        # [steps*TPB, B] residual slot values
    tpb: int,
    block: int,
    h_mode: str = "split",
):
    """BCSR dense tiles + in-kernel residual DMA gather, one pallas_call.

    Returns (dense_out [nrt*tr, f] f32, task_sums [steps*TPB, f] f32).
    The residual work is spread uniformly over the tile grid steps; its
    row DMAs fly while the MXU chews the K dense tiles of the step, so
    the hybrid's two phases overlap instead of serializing.
    """
    tr, tc = tp.tile_rows, tp.tile_cols
    f = h.shape[-1]
    nct, nrt = tp.num_col_tiles, tp.num_row_tiles

    a = jnp.asarray(tp.a)
    num_t = a.shape[0]
    K = getattr(tp, "pack", 1) or 1
    steps = num_t // K
    assert idx_steps.shape[0] == steps, (idx_steps.shape, steps)
    rows = tpb * block

    hp = h
    if tp.scale_src is not None:
        hp = hp * jnp.asarray(tp.scale_src)[:, None].astype(h.dtype)
    n_pad = nct * tc
    if hp.shape[0] != n_pad:
        hp = jnp.pad(hp, ((0, n_pad - hp.shape[0]), (0, 0)))
    if h_mode == "split":
        chunks = bf16_residue_chunks(hp, 2)
        h_op = jnp.concatenate(chunks, axis=1)
        nchunks = 2
    else:
        chunks = bf16_residue_chunks(hp, 3)
        h_op = jnp.concatenate(chunks, axis=1)
        nchunks = 3
    w = nchunks * f

    c_bits = max(int(nct - 1).bit_length(), 1)
    cmod = 1 << c_bits
    rc = jnp.asarray(tp.tile_row) * cmod + jnp.asarray(tp.tile_col)

    def kernel(rc_ref, idx_hbm, h_hbm, a_ref, *refs):
        h_refs = refs[:K]
        val_ref = refs[K]
        o_ref, ts_ref = refs[K + 1], refs[K + 2]
        acc_ref, idx_smem, buf, sem_idx, sem_rows = refs[K + 3:]
        i = pl.program_id(0)
        slot = lax.rem(i, 2)
        nxt = lax.rem(i + 1, 2)

        def idx_dma(sl, step):
            return pltpu.make_async_copy(
                idx_hbm.at[pl.ds(step * rows, rows)],
                idx_smem.at[sl],
                sem_idx.at[sl],
            )

        @pl.when(i == 0)
        def _first():
            idx_dma(slot, i).start()

        @pl.when(i + 1 < steps)
        def _prefetch():
            idx_dma(nxt, i + 1).start()

        idx_dma(slot, i).wait()

        # slot-major buffer layout: slot b of task t lands at row
        # (b*tpb + t) so each slot's rows are CONTIGUOUS [tpb, f] chunks
        # (summable with static slices; Mosaic cannot 1D->3D shape-cast)
        def row_dma(j, idx):
            dst = (lax.rem(j, block) * tpb + j // block) * f
            return pltpu.make_async_copy(
                h_hbm.at[pl.ds(idx * f, f)],
                buf.at[pl.ds(dst, f)],
                sem_rows,
            )

        def start_one(j, _):
            row_dma(j, idx_smem[slot, j]).start()
            return 0

        lax.fori_loop(0, rows, start_one, 0)

        # ---- dense tile work (identical to bcsr_spmm_pallas) ----
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
            if a_blk.dtype != h_blk.dtype:
                a_blk = a_blk.astype(h_blk.dtype)
            return jnp.dot(
                a_blk, h_blk, preferred_element_type=jnp.float32
            )

        p = one(0)
        for k in range(1, K):
            p += one(k)
        acc = acc_ref[...]
        for k in range(nchunks):
            acc += p[:, k * f: (k + 1) * f]
        acc_ref[...] = acc

        @pl.when(last)
        def _write():
            o_ref[...] = acc_ref[...]

        # ---- residual consume (rows have been flying during the dots) ----
        def wait_one(j, _):
            row_dma(j, idx_smem[slot, j]).wait()
            return 0

        lax.fori_loop(0, rows, wait_one, 0)
        vv = val_ref[...]
        racc = vv[:, 0:1] * buf[pl.ds(0, tpb * f)].reshape(tpb, f)
        for b in range(1, block):
            racc = racc + vv[:, b:b + 1] * buf[
                pl.ds(b * tpb * f, tpb * f)
            ].reshape(tpb, f)
        ts_ref[...] = racc

    rowb = lambda i, rc: (rc[K * i] // cmod, 0)
    dense_out, task_sums = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # idx_steps
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # h (residual)
                pl.BlockSpec((K, tr, tc), lambda i, rc: (i, 0, 0)),
            ]
            + [
                pl.BlockSpec(
                    (tc, w),
                    (lambda k: lambda i, rc: (rc[K * i + k] % cmod, 0))(k),
                )
                for k in range(K)
            ]
            + [pl.BlockSpec((tpb, block), lambda i, rc: (i, 0))],
            out_specs=[
                pl.BlockSpec((tr, f), rowb),
                pl.BlockSpec((tpb, f), lambda i, rc: (i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((tr, f), jnp.float32),
                pltpu.SMEM((2, rows), jnp.int32),
                pltpu.VMEM((rows * f,), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((nrt * tr, f), jnp.float32),
            jax.ShapeDtypeStruct((steps * tpb, f), jnp.float32),
        ],
    )(rc, idx_steps.reshape(-1), h.reshape(-1), a, *([h_op] * K), val)
    out = dense_out[: tp.num_nodes]
    if tp.scale_dst is not None:
        out = out * jnp.asarray(tp.scale_dst)[:, None]
    return out, task_sums


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--f", type=int, default=128)
    ap.add_argument("--tpb", type=int, default=128, help="tasks per step")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--small", action="store_true")
    ap.add_argument(
        "--mode", default="standalone", choices=["standalone", "fused"]
    )
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    import bench as B
    from gnn_computing_tpu.utils.timing import benchmark_chained
    from gnn_computing_tpu.ops.spmm import spmm_xla
    from gnn_computing_tpu.graph.synthetic import normal_features

    n, m = (
        (1 << 16, 1 << 22) if args.small else (B.REDDIT_N, B.REDDIT_M)
    )
    g = B.build_graph(n, m, kind="rmat")
    agg = B.build_hybrid((lambda: g), n, m, 24, 256, 4, tile_dtype="int8", pack=16)
    plan = agg.plan
    nt_p, blk = plan.src.shape
    f = args.f

    if args.mode == "fused":
        K = agg.tile.pack
        steps = agg.tile.a.shape[0] // K
        tpb = -(-nt_p // steps)
    else:
        tpb = args.tpb
        steps = -(-nt_p // tpb)
    pad = steps * tpb - nt_p
    src = np.pad(np.asarray(plan.src), ((0, pad), (0, 0)))
    valp = np.pad(np.asarray(plan.val), ((0, pad), (0, 0)))
    idx_steps = jnp.asarray(
        src.reshape(steps, tpb * blk).astype(np.int32)
    )
    val = jnp.asarray(valp)

    h = jnp.asarray(normal_features(n, f, seed=1) * 0.1)

    if args.mode == "fused":
        from gnn_computing_tpu.ops.bcsr import hybrid_spmm

        tile = agg.tile.device_put()
        plan_dev = plan.device_put()
        fused = jax.jit(
            functools.partial(fused_hybrid, tpb=tpb, block=blk)
        )
        print(
            f"fused: steps={steps} tpb={tpb} rows/step={tpb*blk} "
            f"tiles={agg.tile.a.shape[0]} K={K}",
            file=sys.stderr,
        )
        dense, ts = fused(tile, h, idx_steps, val)
        out_fused = dense + jax.ops.segment_sum(
            ts[:nt_p], jnp.asarray(plan.dst),
            num_segments=plan.num_nodes, indices_are_sorted=True,
        )
        ref = jax.jit(
            lambda t, p, hh: hybrid_spmm(t, None, p, None, hh)
        )(tile, plan_dev, h)
        err = np.abs(np.asarray(out_fused) - np.asarray(ref))
        den = np.abs(np.asarray(ref)) + 1e-6
        print(
            f"fused vs hybrid: max abs {err.max():.3e} "
            f"rel {(err/den).max():.3e}",
            file=sys.stderr,
        )

        def run_fused(hh, t, ii, vv, dd):
            d, t_s = fused(t, hh, ii, vv)
            return d + jax.ops.segment_sum(
                t_s[:nt_p], dd, num_segments=plan.num_nodes,
                indices_are_sorted=True,
            )

        r = benchmark_chained(
            run_fused, h, tile, idx_steps, val, jnp.asarray(plan.dst),
            iters=args.iters, reps=3,
        )
        print(
            f"FUSED hybrid pass (f={f}): {r.min_s*1e3:.2f} ms",
            file=sys.stderr,
        )
        rs = benchmark_chained(
            lambda hh, t, p: hybrid_spmm(t, None, p, None, hh),
            h, tile, plan_dev, iters=args.iters, reps=3,
        )
        print(
            f"sequential hybrid pass (f={f}): {rs.min_s*1e3:.2f} ms",
            file=sys.stderr,
        )
        return
    print(
        f"plan: nt_p={nt_p} blk={blk} slots={nt_p*blk/1e6:.2f}M "
        f"steps={steps} tpb={tpb}",
        file=sys.stderr,
    )

    # correctness vs the XLA residual
    plan_dev = plan.device_put()
    kern = jax.jit(
        functools.partial(dma_task_sums, tpb=tpb, block=blk)
    )
    ts = kern(h, idx_steps, val)
    out_dma = jax.ops.segment_sum(
        ts[:nt_p], jnp.asarray(plan.dst), num_segments=plan.num_nodes,
        indices_are_sorted=True,
    )
    out_xla = jax.jit(spmm_xla)(plan_dev, h)
    err = np.abs(np.asarray(out_dma) - np.asarray(out_xla))
    rel = err / (np.abs(np.asarray(out_xla)) + 1e-6)
    print(f"max abs err vs XLA: {err.max():.3e}  rel {rel.max():.3e}",
          file=sys.stderr)

    # timing: kernel only (task sums), then XLA full residual for context
    r = benchmark_chained(
        lambda hh, ii, vv: kern(hh, ii, vv), h, idx_steps, val,
        iters=args.iters, reps=3,
    )
    slots = nt_p * blk
    print(
        f"DMA task-sums: {r.min_s*1e3:.2f} ms = "
        f"{r.min_s/slots*1e9:.2f} ns/slot",
        file=sys.stderr,
    )

    rx = benchmark_chained(
        lambda hh, p: spmm_xla(p, hh), h, plan_dev,
        iters=args.iters, reps=3,
    )
    print(
        f"XLA residual full (gather+mul+segsum): {rx.min_s*1e3:.2f} ms = "
        f"{rx.min_s/slots*1e9:.2f} ns/slot",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
