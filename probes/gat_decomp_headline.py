"""Probe: per-layer, per-phase decomposition of the headline GAT forward
(reddit r512/t24, fast config, dot_mode split2) — VERDICT r4 #1: run the
GCN-style phase decomposition on GAT and attack the next term.

Phases per layer i (512->128->64->32, transform-first):
  transform_i — h @ W HIGHEST + att projection
  tiles_i     — gat_bcsr over the dense tile parts (num, den)
  residual_i  — gat_aggregate_parts over the residual plan (fast modes)
  combine_i   — num/den merge + division (on precomputed parts)
  layer_i     — the real full layer
  total_fwd   — 3-layer gat_forward (fast, split2)

Run: PYTHONPATH=/root/repo:$PYTHONPATH python probes/gat_decomp_headline.py
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
from gnn_computing_tpu.models.gat import (
    BENCH_DIMS,
    gat_forward,
    gat_layer,
    init_gat_params,
)
from gnn_computing_tpu.ops.bcsr_gat import gat_bcsr
from gnn_computing_tpu.ops.gat import gat_aggregate_parts
from gnn_computing_tpu.utils.timing import benchmark_chained

ap = argparse.ArgumentParser()
ap.add_argument("--tile-rows", type=int, default=512)
ap.add_argument("--tile-cols", type=int, default=128)
ap.add_argument("--threshold", type=int, default=24)
ap.add_argument("--dot-mode", default="split2")
ap.add_argument("--iters", type=int, default=8)
args = ap.parse_args()

n, m = bench.REDDIT_N, bench.REDDIT_M
g = bench.lazy_graph(n, m, "rmat")
sched = bench.build_hybrid(
    g, n, m, args.threshold, args.tile_rows, 4,
    tile_dtype="int8", pack=16, reorder="degree", graph_kind="rmat",
    tile_cols=args.tile_cols,
)
sched = sched.device_put()
params = init_gat_params(jax.random.key(0), BENCH_DIMS)

results = {}


def measure(name, fn, *a):
    r = benchmark_chained(fn, *a, iters=args.iters, reps=3)
    results[name] = round(r.min_s * 1e3, 2)
    print(
        f"{name:18s} {r.min_s * 1e3:8.2f} ms"
        f"{'  (noise floor)' if r.noise_floor else ''}"
        f"   [compile {r.compile_s:.0f}s]",
        flush=True,
    )


dims = BENCH_DIMS
hs = [
    jnp.asarray(normal_features(n, dims[i], seed=10 + i) * 0.05)
    for i in range(3)
]

for i in range(3):
    f_in, f_out = dims[i], dims[i + 1]
    p = params[i]
    hi = hs[i]
    # layer-i aggregation inputs: transformed feat + att at f_out
    ho = jnp.asarray(normal_features(n, f_out, seed=20 + i) * 0.05)
    att = jnp.asarray(
        np.stack(
            [
                normal_features(n, 1, seed=30 + i)[:, 0],
                normal_features(n, 1, seed=40 + i)[:, 0],
            ],
            axis=1,
        )
        * 0.3
    )
    agd = "f16_split2"
    hgd = "f16_split2" if f_out <= 64 else None

    measure(
        f"transform_{i}(->{f_out})",
        lambda hh, pp: jnp.dot(
            jnp.dot(hh, pp.w, precision=jax.lax.Precision.HIGHEST),
            pp.w_att, precision=jax.lax.Precision.HIGHEST,
        ),
        hi, p,
    )
    measure(
        f"tiles_{i}({f_out})",
        lambda hh, t, aa: sum(
            x.ravel()[:1]
            for x in gat_bcsr(t, hh, aa, dot_mode=args.dot_mode)
        ),
        ho, sched.tile_parts(), att,
    )
    measure(
        f"residual_{i}({f_out})",
        lambda hh, pl, aa, _agd=agd, _hgd=hgd: sum(
            x.ravel()[:1]
            for x in gat_aggregate_parts(
                pl, hh, aa, att_gather_dtype=_agd, h_gather_dtype=_hgd
            )[:2]
        ),
        ho, sched.plan, att,
    )
    measure(
        f"layer_{i}",
        lambda hh, s, pp, _agd=agd, _hgd=hgd: gat_layer(
            s, hh, pp, att_gather_dtype=_agd, h_gather_dtype=_hgd,
            dot_mode=args.dot_mode,
        ),
        hi, sched, p,
    )

h0 = jnp.asarray(normal_features(n, dims[0], seed=123) * 0.1)
measure(
    "total_fwd",
    lambda hh, s, pp: gat_forward(
        s, pp, hh, fast=True, dot_mode=args.dot_mode
    ),
    h0, sched, params,
)

phase_sum = sum(
    v for k, v in results.items()
    if k.startswith(("transform_", "tiles_", "residual_"))
)
layer_sum = sum(v for k, v in results.items() if k.startswith("layer_"))
print(
    f"\nsum(phases) = {phase_sum:.1f} ms   sum(layers) = "
    f"{layer_sum:.1f} ms   total = {results['total_fwd']:.1f} ms"
)
out = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks", "results", "gat_decomp_headline.json",
)
with open(out, "w") as fh:
    json.dump(
        {
            "config": vars(args),
            "results_ms": results,
            "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        },
        fh, indent=1,
    )
print(f"wrote {out}")
