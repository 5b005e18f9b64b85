"""On-chip probe: fused aggregate+GEMM Pallas epilogue (O5 analog).

Validates hybrid_spmm_nn's (agg, agg @ W) against the f64 oracle on the
quick-scale hybrid plan and times fused vs split.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python probes/fused_nn_epilogue.py
"""

import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_hybrid, lazy_graph, _cache_dir
from gnn_computing_tpu.graph.synthetic import normal_features
from gnn_computing_tpu.ops import reference as ref
from gnn_computing_tpu.ops.fused_nn import hybrid_spmm_nn
from gnn_computing_tpu.ops.validate import relative_error_count
from gnn_computing_tpu.utils.timing import benchmark_chained

N, M, F = 65536, 4194304, 32

g_fn = lazy_graph(N, M, "rmat")
sched = build_hybrid(
    g_fn, N, M, 24, 512, 4, tile_dtype="int8", pack=16,
    reorder="degree", graph_kind="rmat",
).device_put()

h = jnp.asarray(normal_features(N, F, seed=1) * 0.1)
w = jnp.asarray(normal_features(F, 32, seed=2) * 0.1)

agg, trans = jax.jit(lambda s, x, ww: hybrid_spmm_nn(s, x, ww))(
    sched, h, w
)
perm = np.load(
    os.path.join(_cache_dir(), f"perm_rmat_n{N}_m{M}_degree.npy")
)
g2 = g_fn().reorder(perm)
want_agg = ref.spmm_dense(g2, np.asarray(h))
bad_a = relative_error_count(np.asarray(agg), want_agg)
bad_t = relative_error_count(
    np.asarray(trans), want_agg @ np.asarray(w, np.float64)
)
print(f"agg bad={bad_a}  transformed bad={bad_t}")

r_f = benchmark_chained(
    lambda x, s, ww: hybrid_spmm_nn(s, x, ww)[1],
    h, sched, w, iters=8, reps=2,
)
r_s = benchmark_chained(
    lambda x, s, ww: jnp.dot(
        s.run(x), ww, precision=jax.lax.Precision.HIGHEST
    ),
    h, sched, w, iters=8, reps=2,
)
print(
    f"fused={r_f.min_s*1e3:.2f} ms  split={r_s.min_s*1e3:.2f} ms "
    f"speedup={r_s.min_s/r_f.min_s:.2f}x"
)
