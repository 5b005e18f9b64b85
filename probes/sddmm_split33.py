"""On-chip probe: SDDMM tile dot_mode ladder (exact / split33 / split23).

Validates per-cell outputs against a per-tile f64 numpy oracle on the
quick-scale hybrid plan, then times each mode.  split33 is the round-5
candidate: 3-chunk residue cross-products packed into the MXU K-dim
padding — 2 bf16 passes at f=32 vs HIGHEST's 6-at-4x-pad (f32-grade
accuracy expected, the SpMM split3 class).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python probes/sddmm_split33.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_hybrid, lazy_graph
from gnn_computing_tpu.graph.synthetic import normal_features
from gnn_computing_tpu.ops.bcsr_sddmm import sddmm_bcsr_pallas
from gnn_computing_tpu.utils.timing import benchmark_chained

N, M, F = 65536, 4194304, 32

g_fn = lazy_graph(N, M, "rmat")
sched = build_hybrid(
    g_fn, N, M, 24, 512, 4, tile_dtype="int8", pack=16,
    reorder="degree", graph_kind="rmat",
)
tp = sched.tile_parts()[0]
print(f"tiles={tp.num_tiles} ({tp.tile_rows}x{tp.tile_cols})")

a = normal_features(N, F, seed=3) * 0.1
b = normal_features(N, F, seed=4) * 0.1

# f64 oracle per cell (chunked): p[t,i,j] = <b[row_t*tr+i], a[col_t*tc+j]>
tr, tc = tp.tile_rows, tp.tile_cols
nct, nrt = tp.num_col_tiles, tp.num_row_tiles
a64 = np.zeros((nct * tc, F)); a64[:N] = a
b64 = np.zeros((nrt * tr, F)); b64[:N] = b
a64 = a64.reshape(nct, tc, F)
b64 = b64.reshape(nrt, tr, F)
rows = np.asarray(tp.tile_row)
cols = np.asarray(tp.tile_col)
cnt = np.asarray(tp.a)

t0 = time.time()
want = np.zeros((tp.num_tiles, tr, tc))
CH = 512
for s in range(0, tp.num_tiles, CH):
    e = min(s + CH, tp.num_tiles)
    want[s:e] = np.einsum(
        "tif,tjf->tij", b64[rows[s:e]], a64[cols[s:e]]
    )
mask = cnt > 0
print(f"oracle: {time.time()-t0:.0f}s  edges_cells={int(mask.sum())}")

sched = sched.device_put()
aj, bj = jnp.asarray(a), jnp.asarray(b)
tpd = sched.tile_parts()[0]

for mode in ("exact", "split33", "split23"):
    out = np.asarray(
        jax.jit(
            lambda x, t, y, _m=mode: sddmm_bcsr_pallas(
                t, x, y, dot_mode=_m
            )
        )(aj, tpd, bj)
    ).astype(np.float64)
    bad = int(
        (
            np.abs(out - want)[mask]
            > 1e-2 * np.abs(want)[mask] + 1e-5
        ).sum()
    )
    r = benchmark_chained(
        lambda x, t, y, _m=mode: sddmm_bcsr_pallas(
            t, x, y, dot_mode=_m
        ).ravel()[:8].astype(jnp.float32),
        aj, tpd, bj, iters=8, reps=2,
    )
    per_tile = r.min_s / tp.num_tiles * 1e9
    print(
        f"mode={mode:8s} bad={bad}/{int(mask.sum())} "
        f"t={r.min_s*1e3:.2f} ms ({per_tile:.0f} ns/tile)"
    )
