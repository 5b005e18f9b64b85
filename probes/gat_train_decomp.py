"""GAT training-step phase decomposition (VERDICT r4 #3: find where the
~1.7-1.9 s goes).

Measures, on the cached square train plans (r256/c256 bits):
  fwd_plain     — 3-layer GAT forward, unstabilized
  fwd_stab      — with the per-destination rowmax shift (the train form)
  rowmax        — the stabilizer's A-stream alone (per layer at f=128)
  dad           — d_att_dst streaming kernel over the forward plan
  dh_das        — (dh, d_as) streaming kernel over the transposed plan
  res_bwd       — the hand-written flat residual backward
  grad          — full value_and_grad of the train loss (no optimizer)
  step          — grad + adam update (the bench's number)

Run: PYTHONPATH=/root/repo:$PYTHONPATH python probes/gat_train_decomp.py \
    [--threshold 48]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import bench
import jax
import jax.numpy as jnp
import optax

from gnn_computing_tpu.graph.synthetic import normal_features
from gnn_computing_tpu.models.gat import (
    BENCH_DIMS,
    gat_forward,
    init_gat_params,
)
from gnn_computing_tpu.ops.bcsr_gat import (
    _branch_factors,
    _hybrid_row_shift,
    gat_bwd_dad,
    gat_bwd_dh_das,
    _residual_bwd_flat,
)
from gnn_computing_tpu.utils.timing import benchmark_chained

ap = argparse.ArgumentParser()
ap.add_argument("--threshold", type=int, default=48)
ap.add_argument("--tile-rows", type=int, default=256)
ap.add_argument("--tile-cols", type=int, default=256)
ap.add_argument("--dot-mode", default="split2")
ap.add_argument("--iters", type=int, default=8)
args = ap.parse_args()

n, m = bench.REDDIT_N, bench.REDDIT_M
tag = bench.hybrid_tag(
    n, m, args.threshold, args.tile_rows, 4, "int8", "rmat", "degree",
    True, args.tile_cols,
)
g = bench.lazy_graph(n, m, "rmat")
sched = bench.build_hybrid(
    g, n, m, args.threshold, args.tile_rows, 4, tile_dtype="int8",
    pack=16, reorder="degree", graph_kind="rmat", bit_tiles=True,
    tile_cols=args.tile_cols,
)
sched = bench.add_transpose(sched, 16, cache_tag=tag)
sched = sched.device_put()
params = init_gat_params(jax.random.key(0), BENCH_DIMS)
h = jnp.asarray(normal_features(n, BENCH_DIMS[0], seed=123) * 0.1)

results = {}


def measure(name, fn, *a):
    r = benchmark_chained(fn, *a, iters=args.iters, reps=3)
    results[name] = round(r.min_s * 1e3, 2)
    print(
        f"{name:12s} {r.min_s * 1e3:8.2f} ms"
        f"{'  (noise floor)' if r.noise_floor else ''}"
        f"   [compile {r.compile_s:.0f}s]",
        flush=True,
    )


measure(
    "fwd_plain",
    lambda hh, s, p: gat_forward(
        s, p, hh, fast=False, dot_mode=args.dot_mode
    ),
    h, sched, params,
)
measure(
    "fwd_stab",
    lambda hh, s, p: gat_forward(
        s, p, hh, fast=False, stabilize=True, dot_mode=args.dot_mode
    ),
    h, sched, params,
)

# per-kernel pieces at f=128 (layer-0 scale — the widest layer)
f = 128
ho = jnp.asarray(normal_features(n, f, seed=20) * 0.05)
att = jnp.asarray(
    np.stack(
        [
            normal_features(n, 1, seed=30)[:, 0],
            normal_features(n, 1, seed=40)[:, 0],
        ],
        axis=1,
    )
    * 0.3
)
gbar = jnp.asarray(normal_features(n, f, seed=50) * 0.02)
c = jnp.asarray(normal_features(n, 1, seed=60)[:, 0] * 0.02)

measure(
    "rowmax(128)",
    lambda aa, s: _hybrid_row_shift(s.tile_parts(), s.plan, aa, 0.2),
    att, sched,
)


def tile_dad(hh, s, aa, gb, cc):
    u12, v12 = _branch_factors(aa, 0.2)
    out = jnp.zeros(aa.shape[0], jnp.float32)
    for p in s.tile_parts():
        out = out + gat_bwd_dad(
            p, hh, gb, cc, u12, v12, 0.2, dot_mode=args.dot_mode
        )
    return out


def tile_dhdas(hh, s, aa, gb, cc):
    u12, v12 = _branch_factors(aa, 0.2)
    dh = jnp.zeros(hh.shape, jnp.float32)
    das = jnp.zeros(aa.shape[0], jnp.float32)
    for p in s.tile_parts_t():
        a_, b_ = gat_bwd_dh_das(
            p, hh, gb, cc, u12, v12, 0.2, dot_mode=args.dot_mode
        )
        dh = dh + a_
        das = das + b_
    return dh + das[:, None]


measure("dad(128)", tile_dad, ho, sched, att, gbar, c)
measure("dh_das(128)", tile_dhdas, ho, sched, att, gbar, c)


def res_bwd(hh, s, gb, cc, score):
    dh, dad, das = _residual_bwd_flat(
        s.plan, s.plan_t, s.edge_map_t, hh, gb, cc, score, None, 0.2
    )
    return dh + dad[:, None] + das[:, None]


nslots = sched.plan.num_tasks_padded * sched.plan.block_size
score = jnp.abs(
    jnp.asarray(
        normal_features(1, nslots, seed=70).reshape(-1) * 0.1
    )
)
measure("res_bwd(128)", res_bwd, ho, sched, gbar, c, score)

ncls = BENCH_DIMS[-1]
labels = jnp.asarray(np.random.default_rng(7).integers(0, ncls, n))
opt = optax.adam(1e-3)
opt_state = opt.init(params)


def loss_fn(pp, hh, s, yy):
    logits = gat_forward(
        s, pp, hh, fast=False, stabilize=True, dot_mode=args.dot_mode
    )
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.take_along_axis(logp, yy[:, None], axis=1))


def grad_only(hh, s, p, yy):
    _, grads = jax.value_and_grad(loss_fn)(p, hh, s, yy)
    return sum(
        jnp.sum(w) for w in jax.tree_util.tree_leaves(grads)
    )[None]


measure("grad", grad_only, h, sched, params, labels)

phase_est = (
    results["fwd_stab"]
    + 3 * (results["dad(128)"] + results["dh_das(128)"])
    + 3 * results["res_bwd(128)"]
)
print(
    f"\nfwd_stab + 3*(dad+dh_das+res_bwd) = {phase_est:.0f} ms "
    f"vs grad = {results['grad']:.0f} ms"
)
out = os.path.join(
    "/root/repo", "benchmarks", "results", "gat_train_decomp.json"
)
with open(out, "w") as fh:
    json.dump(
        {"config": vars(args), "results_ms": results,
         "ts": time.strftime("%Y-%m-%d %H:%M:%S")},
        fh, indent=1,
    )
print(f"wrote {out}")
