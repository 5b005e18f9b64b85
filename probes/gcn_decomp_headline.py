"""Probe: measured per-layer, per-phase decomposition of the headline
GCN forward (reddit r512/t24, fast layer config) — VERDICT r3 #3: the
threshold model says ~98 ms, the bench measures ~124; find the ~26 ms.

Phases per layer i (512->128->64->32, transform-first):
  transform_i  — [n, f_in] @ [f_in, f_out] HIGHEST GEMM
  dense_i      — Pallas tile pass at f_out (tile_h_mode='split')
  residual_i   — full residual pipeline at f_out (f16_split2 on f<=64)
  layer_i      — transform + hybrid run + relu (the real layer)
  total        — the full 3-layer forward (gcn_forward_bench, fast opts)

Run on the real chip: PYTHONPATH=/root/repo:$PYTHONPATH python
probes/gcn_decomp_headline.py [--tile-rows 512]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gnn_computing_tpu.graph.synthetic import normal_features
from gnn_computing_tpu.models import BENCH_DIMS, init_gcn_params
from gnn_computing_tpu.models.gcn import fast_layer_opts, gcn_forward_bench
from gnn_computing_tpu.ops.bcsr import bcsr_spmm
from gnn_computing_tpu.ops.spmm import spmm_xla
from gnn_computing_tpu.utils.timing import benchmark_chained

ap = argparse.ArgumentParser()
ap.add_argument("--tile-rows", type=int, default=512)
ap.add_argument("--threshold", type=int, default=24)
ap.add_argument("--iters", type=int, default=8)
args = ap.parse_args()

n, m = bench.REDDIT_N, bench.REDDIT_M
g = bench.lazy_graph(n, m, "rmat")
sched = bench.build_hybrid(
    g, n, m, args.threshold, args.tile_rows, 4,
    tile_dtype="int8", pack=16, reorder="degree", graph_kind="rmat",
)
sched = sched.device_put()
params = init_gcn_params(jax.random.key(0), BENCH_DIMS)
opts = fast_layer_opts(BENCH_DIMS)

results = {}


def measure(name, fn, *a):
    t0 = time.time()
    r = benchmark_chained(fn, *a, iters=args.iters, reps=3)
    results[name] = round(r.min_s * 1e3, 2)
    print(
        f"{name:18s} {r.min_s * 1e3:8.2f} ms"
        f"{'  (noise floor)' if r.noise_floor else ''}"
        f"   [compile {r.compile_s:.0f}s]",
        flush=True,
    )


# simulated per-layer inputs: the real forward's activations are
# relu(agg(...)) — nonneg, ~0.03 scale; use matching magnitudes
dims = BENCH_DIMS
hs = [
    jnp.asarray(np.abs(normal_features(n, dims[i], seed=10 + i)) * 0.05)
    for i in range(3)
]

for i in range(3):
    f_in, f_out = dims[i], dims[i + 1]
    o = opts[i]
    w = jnp.asarray(params[i])
    hi = hs[i]
    ho = jnp.asarray(
        np.abs(normal_features(n, f_out, seed=20 + i)) * 0.05
    )
    measure(
        f"transform_{i}(->{f_out})",
        lambda hh, ww: jnp.dot(
            hh, ww, precision=jax.lax.Precision.HIGHEST
        ),
        hi, w,
    )
    measure(
        f"dense_{i}({f_out})",
        lambda hh, t: bcsr_spmm(t, hh, h_mode=o.tile_h_mode),
        ho, sched.tile_parts(),
    )
    measure(
        f"residual_{i}({f_out})",
        lambda hh, p: spmm_xla(
            p, hh, gather_dtype=o.residual_gather_dtype
        ),
        ho, sched.plan,
    )
    measure(
        f"layer_{i}",
        lambda hh, s, ww: jax.nn.relu(
            s.run(
                jnp.dot(hh, ww, precision=jax.lax.Precision.HIGHEST),
                residual_gather_dtype=o.residual_gather_dtype,
                tile_h_mode=o.tile_h_mode,
            )
        ),
        hi, sched, w,
    )

h0 = jnp.asarray(normal_features(n, dims[0], seed=123) * 0.1)
measure(
    "total_fwd",
    lambda hh, s, p: gcn_forward_bench(
        s, p, hh, layer_opts=opts
    ),
    h0, sched, params,
)

phase_sum = sum(
    v for k, v in results.items()
    if k.startswith(("transform_", "dense_", "residual_"))
)
layer_sum = sum(v for k, v in results.items() if k.startswith("layer_"))
print(f"\nsum(phases) = {phase_sum:.1f} ms   sum(layers) = "
      f"{layer_sum:.1f} ms   total = {results['total_fwd']:.1f} ms")
out = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..",
    "benchmarks", "results", "gcn_decomp_headline.json",
)
with open(out, "w") as fh:
    json.dump(
        dict(results, tile_rows=args.tile_rows,
             threshold=args.threshold, ts=time.time()),
        fh, indent=1,
    )
print("wrote", os.path.abspath(out))
