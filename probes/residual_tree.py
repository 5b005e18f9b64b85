"""Probe 4: kill the residual pipeline's non-gather overhead.

residual_pipeline.py decomposed the f=64 residual pass (3.84M slots):
  f32:    take+sum 20.9 | +val/task-sums 25.5 | +segment_sum 32.9 ms
  f16s2:  27.8 ms total (gather floor 9.4 => ~18.4 ms overhead, of which
          ~6 ms is the hi/lo SLICE reconstruct materializing the gather)
Candidates measured here on the production t24 plan:
  A. split2 with reshape-reconstruct: gathered [s, 2f] -> [s, 2, f].sum(1)
     (one consumer, no slice pair) — does it keep the gather fused?
  B. segment_sum -> fixed-shape take-TREE: tasks of a row are contiguous,
     so each reduction level is a take of ascending indices (streaming)
     + reshape-sum, ending in a [rows, B] grid.  Scatter-free.
  C. A + B combined (the candidate l2/l3 residual).
  D. f32 + B (the candidate l1 residual at f=128).

Run: PYTHONPATH=/root/repo python probes/residual_tree.py [F] [treeB]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gnn_computing_tpu.utils.timing import benchmark_chained

N = 232_965
PLAN = "data/bench_cache/hybrid_n232965_m114615891_t24_r256_b4_int8.npz"


def reduce_tree_grids(task_dst, nrows, B):
    """Grids of index levels reducing contiguous same-row runs to [nrows, B].

    Each level's grid holds indices into the previous level's array (pad =
    prev_len, to be masked).  Indices within a level are ascending.
    """
    grids = []
    cur_dst = np.asarray(task_dst, np.int64)
    cur_n = len(cur_dst)
    while True:
        row_start = np.searchsorted(cur_dst, np.arange(nrows), "left")
        counts = (
            np.searchsorted(cur_dst, np.arange(nrows), "right") - row_start
        )
        if counts.max() <= B:
            k = np.arange(B, dtype=np.int64)[None, :]
            grid = np.where(
                k < counts[:, None], row_start[:, None] + k, cur_n
            )
            grids.append(grid.astype(np.int32))
            return grids
        pos_in_row = np.arange(cur_n) - row_start[cur_dst]
        gcounts = (counts + B - 1) // B
        goffset = np.concatenate([[0], np.cumsum(gcounts)[:-1]])
        gid = goffset[cur_dst] + pos_in_row // B
        ngroups = int(gcounts.sum())
        grid = np.full((ngroups, B), cur_n, np.int64)
        grid[gid, pos_in_row % B] = np.arange(cur_n)
        grids.append(grid.astype(np.int32))
        cur_dst = np.repeat(np.arange(nrows), gcounts)
        cur_n = ngroups


def tree_reduce(task, grids):
    """Apply reduce_tree_grids levels: masked streaming takes."""
    out = task
    for grid in grids:
        g, b = grid.shape
        n_prev = out.shape[0]
        idx = jnp.asarray(grid).reshape(-1)
        safe = jnp.minimum(idx, n_prev - 1)
        mask = (idx < n_prev).astype(out.dtype)[:, None]
        rows = jnp.take(out, safe, axis=0) * mask
        out = rows.reshape(g, b, out.shape[-1]).sum(axis=1)
    return out


def main():
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    treeB = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    z = np.load(PLAN)
    src = jnp.asarray(np.ascontiguousarray(z["p_src"]))
    dst_np = np.ascontiguousarray(z["p_dst"])
    dst = jnp.asarray(dst_np)
    val = jnp.asarray(np.ascontiguousarray(z["p_val"]))
    nt, b = src.shape
    nslots = nt * b
    grids = reduce_tree_grids(dst_np, N, treeB)
    print(
        f"F={F} treeB={treeB} levels={[g.shape for g in grids]}",
        file=sys.stderr,
    )
    grids_j = [jnp.asarray(g) for g in grids]
    h = jnp.asarray(
        np.random.default_rng(0).standard_normal((N, F), dtype=np.float32)
    )

    def rate(name, fn, iters=8):
        r = benchmark_chained(fn, h, src, dst, val, iters=iters)
        print(
            f"F={F} {name:32s} {r.min_s * 1e3:8.2f} ms "
            f"{r.min_s / nslots * 1e9:6.2f} ns/slot",
            flush=True,
        )

    def split2_tables(hh):
        hi = jax.lax.reduce_precision(hh, 5, 10).astype(jnp.float16)
        lo = (hh - hi.astype(jnp.float32)).astype(jnp.float16)
        return hi, lo

    def task_sums_slice(hh, s, v):  # current form
        hi, lo = split2_tables(hh)
        g = jnp.take(jnp.concatenate([hi, lo], 1), s.reshape(-1), axis=0)
        rec = g[:, :F].astype(jnp.float32) + g[:, F:].astype(jnp.float32)
        msg = rec * v.reshape(-1)[:, None]
        return msg.reshape(nt, b, F).sum(axis=1)

    def task_sums_reshape(hh, s, v):  # candidate A (interleave-free:
        # table layout [n, 2, f] flattened — hi block then lo block per row)
        hi, lo = split2_tables(hh)
        tbl = jnp.concatenate([hi, lo], 1)
        g = jnp.take(tbl, s.reshape(-1), axis=0)
        rec = g.reshape(-1, 2, F).astype(jnp.float32).sum(axis=1)
        msg = rec * v.reshape(-1)[:, None]
        return msg.reshape(nt, b, F).sum(axis=1)

    def task_sums_f32(hh, s, v):
        msg = jnp.take(hh, s.reshape(-1), axis=0) * v.reshape(-1)[:, None]
        return msg.reshape(nt, b, F).sum(axis=1)

    def seg(t, d):
        return jax.ops.segment_sum(
            t, d, num_segments=N, indices_are_sorted=True
        )

    rate(
        "A: split2-reshape + segsum",
        lambda hh, s, d, v: seg(task_sums_reshape(hh, s, v), d),
    )
    rate(
        "B: f32 + tree",
        lambda hh, s, d, v: tree_reduce(task_sums_f32(hh, s, v), grids_j),
    )
    rate(
        "C: split2-reshape + tree",
        lambda hh, s, d, v: tree_reduce(task_sums_reshape(hh, s, v), grids_j),
    )
    rate(
        "C': split2-slice + tree",
        lambda hh, s, d, v: tree_reduce(task_sums_slice(hh, s, v), grids_j),
    )


if __name__ == "__main__":
    main()
