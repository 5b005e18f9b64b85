"""On-chip probe: decode-free bit-tile SpMM (the MXU shift ladder).

Validates the bcsr_spmm mxu_ladder bits path vs the f64 oracle on a
quick-scale bit-split plan and times bits-ladder vs int8 on the same
graph.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python probes/bits_mxu_ladder.py
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
from gnn_computing_tpu.ops.validate import relative_error_count
from gnn_computing_tpu.utils.timing import benchmark_chained

N, M, F = 65536, 4194304, 128

g_fn = lazy_graph(N, M, "rmat")
h = jnp.asarray(normal_features(N, F, seed=1) * 0.1)
perm = np.load(
    os.path.join(_cache_dir(), f"perm_rmat_n{N}_m{M}_degree.npy")
)
want = ref.spmm_dense(g_fn().reorder(perm), np.asarray(h))

for bt in (False, True):
    sched = build_hybrid(
        g_fn, N, M, 24, 512, 4, tile_dtype="int8", pack=16,
        reorder="degree", graph_kind="rmat", bit_tiles=bt,
    ).device_put()
    out = np.asarray(
        jax.jit(lambda s, x: s.run(x, tile_h_mode="split"))(sched, h)
    )
    bad = relative_error_count(out, want)
    r = benchmark_chained(
        lambda x, s: s.run(x, tile_h_mode="split"),
        h, sched, iters=8, reps=2,
    )
    nt = sum(p.num_tiles for p in sched.tile_parts())
    print(
        f"bits={bt} tiles={nt} bad={bad}/{out.size} "
        f"pass={r.min_s*1e3:.2f} ms"
    )
