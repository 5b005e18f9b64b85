"""On-chip probe: GAT maxdot dot_mode ladder (exact / split2 / default).

Validates the full 3-layer GAT forward (bench fast config) against the f64
edge-based oracle on the quick-scale hybrid plan, then times each mode with
the chained harness.  The split2 mode is the round-5 candidate: asymmetric
hi/lo bf16 score chunks against the [tc, 2f] h residue pair — 3 bf16 MXU
passes per tile vs HIGHEST's ~6, expected ~2^-16 relative (the twodot
error class that passed the 1e-2/1e-5 gate with 11/1.02M marginal).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python probes/gat_dot_split2.py
"""

import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_hybrid, lazy_graph, _cache_dir
from gnn_computing_tpu.models.gat import (
    BENCH_DIMS,
    gat_forward,
    init_gat_params,
)
from gnn_computing_tpu.graph.synthetic import normal_features
from gnn_computing_tpu.ops import reference as ref
from gnn_computing_tpu.ops.validate import relative_error_count
from gnn_computing_tpu.utils.timing import benchmark_chained

N, M = 65536, 4194304

g_fn = lazy_graph(N, M, "rmat")
sched = build_hybrid(
    g_fn, N, M, 24, 512, 4, tile_dtype="int8", pack=16,
    reorder="degree", graph_kind="rmat",
)
ntiles = sum(p.num_tiles for p in sched.tile_parts())
print(f"tiles={ntiles} residual_edges={sched.plan.num_edges}")

params = init_gat_params(jax.random.key(0), BENCH_DIMS)
h0 = normal_features(N, BENCH_DIMS[0], seed=123) * 0.1

# ---- f64 oracle on the REORDERED graph (the plan's row order)
perm = np.load(
    os.path.join(_cache_dir(), f"perm_rmat_n{N}_m{M}_degree.npy")
)
g2 = g_fn().reorder(perm)
hh = np.asarray(h0, np.float64)
for p in params:
    f2 = hh @ np.asarray(p.w, np.float64)
    att = f2 @ np.asarray(p.w_att, np.float64)
    hh, _, _ = ref.gat_aggregate_dense(g2, f2, att[:, 0], att[:, 1])
ref_out = hh
print("oracle done")

sched = sched.device_put()
h = jnp.asarray(h0)

for mode in ("exact", "split2", "default"):
    fwd = jax.jit(
        lambda s, p, x, _m=mode: gat_forward(s, p, x, fast=True, dot_mode=_m)
    )
    out = np.asarray(fwd(sched, params, h))
    bad = relative_error_count(out, ref_out)
    r = benchmark_chained(
        lambda x, s, p, _m=mode: gat_forward(
            s, p, x, fast=True, dot_mode=_m
        ),
        h, sched, params, iters=8, reps=2,
    )
    print(
        f"mode={mode:7s} bad={bad}/{out.size} "
        f"fwd={r.min_s * 1e3:.2f} ms "
        f"({3 * M / r.min_s / 1e9:.2f} Ge/s)"
    )
