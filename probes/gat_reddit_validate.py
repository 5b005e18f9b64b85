"""Reddit-scale GAT forward validation: split2 dot mode vs the f64 oracle
(VERDICT r4 #1 "Done" criterion: 0 bad elements at reddit scale).

The oracle is the full 3-layer GAT forward in f64 on the reordered reddit
graph, with the attention softmax as a scipy CSR matmul (np.add.at over
114.6M edges is ~100x slower); cached to npz keyed by the param seed.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python probes/gat_reddit_validate.py
"""

import argparse
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument(
    "--phase", choices=["oracle", "chip", "both"], default="both",
    help="oracle = CPU-only f64 forward (never opens the TPU tunnel — "
    "safe to run while another chip client is live); chip = validate "
    "the cached oracle on the TPU",
)
args = ap.parse_args()

if args.phase == "oracle":
    import jax

    jax.config.update("jax_platforms", "cpu")

import bench
from gnn_computing_tpu.graph.synthetic import normal_features
from gnn_computing_tpu.models.gat import BENCH_DIMS, init_gat_params
from gnn_computing_tpu.ops.validate import relative_error_count

N, M = bench.REDDIT_N, bench.REDDIT_M
ORACLE = os.path.join(bench._cache_dir(), "gat3_reddit_oracle_seed0.npz")

h0 = normal_features(N, BENCH_DIMS[0], seed=123) * 0.1

if args.phase in ("oracle", "both") and not os.path.exists(ORACLE):
    import jax
    from scipy.sparse import csr_matrix

    params = init_gat_params(jax.random.key(0), BENCH_DIMS)
    g = bench.lazy_graph(N, M, "rmat")()
    perm = np.load(
        os.path.join(bench._cache_dir(), f"perm_rmat_n{N}_m{M}_degree.npy")
    )
    g = g.reorder(perm)
    indptr = np.asarray(g.indptr, np.int64)
    indices = np.asarray(g.indices, np.int64)
    dst = np.asarray(g.dst_per_edge, np.int64)

    hh = np.asarray(h0, np.float64)
    for li, p in enumerate(params):
        f2 = hh @ np.asarray(p.w, np.float64)
        att = f2 @ np.asarray(p.w_att, np.float64)
        z = att[dst, 0] + att[indices, 1]
        z = np.where(z > 0, z, 0.2 * z)
        score = np.exp(z)
        s = csr_matrix((score, indices, indptr), shape=(N, N))
        num = s @ f2
        den = np.asarray(s.sum(axis=1)).ravel()
        safe = np.where(den == 0.0, 1.0, den)
        hh = num / safe[:, None]
        print(f"oracle layer {li} done", flush=True)
    bench._atomic_savez(ORACLE, out=hh.astype(np.float64))
    print(f"wrote {ORACLE}")
else:
    print("oracle cached (or skipped)")

if args.phase == "oracle":
    sys.exit(0)

# ---- chip forward
import jax
import jax.numpy as jnp

from gnn_computing_tpu.models.gat import gat_forward

want = np.load(ORACLE)["out"]
params = init_gat_params(jax.random.key(0), BENCH_DIMS)
g = bench.lazy_graph(N, M, "rmat")
sched = bench.build_hybrid(
    g, N, M, 24, 512, 4, tile_dtype="int8", pack=16,
    reorder="degree", graph_kind="rmat",
).device_put()
for mode in ("split2",):
    out = np.asarray(
        jax.jit(
            lambda s, p, x, _m=mode: gat_forward(
                s, p, x, fast=True, dot_mode=_m
            )
        )(sched, params, jnp.asarray(h0))
    )
    bad = relative_error_count(out, want)
    print(f"reddit gat3 dot_mode={mode}: bad={bad}/{out.size}")
