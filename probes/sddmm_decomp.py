"""Probe: decompose the hybrid SDDMM pass (bench --model sddmm measured
90 ms at reddit r256/t24 vs a ~45 ms byte-model estimate — find the 2x).

Phases: cells per tile part (bit / int8), residual slot gather, and the
full hybrid.  Run on the real chip after `python bench.py --model sddmm
--phase build` has cached the plan.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gnn_computing_tpu.graph.synthetic import normal_features
from gnn_computing_tpu.ops.bcsr_sddmm import hybrid_sddmm, sddmm_bcsr
from gnn_computing_tpu.ops.spmm import sddmm_slots_chunked
from gnn_computing_tpu.utils.timing import benchmark_chained

n, m, f = bench.REDDIT_N, bench.REDDIT_M, 32
g = bench.lazy_graph(n, m, "rmat")
sched = bench.build_hybrid(
    g, n, m, 24, 256, 4, tile_dtype="int8", pack=16,
    reorder="degree", graph_kind="rmat", bit_tiles=True,
).device_put()
a = jnp.asarray(normal_features(n, f, seed=3) * 0.1)
b = jnp.asarray(normal_features(n, f, seed=4) * 0.1)


def run(name, fn, *args):
    r = benchmark_chained(fn, *args, iters=8, reps=3)
    print(f"{name:22s} {r.min_s * 1e3:8.2f} ms  [compile "
          f"{r.compile_s:.0f}s]", flush=True)


for i, tp in enumerate(sched.tile_parts()):
    run(
        f"cells[{i}] ({'bits' if tp.bits else 'int8'}, "
        f"{tp.a.shape[0]} tiles)",
        lambda aa, t, bb: sddmm_bcsr(t, aa, bb).ravel()[:1],
        a, tp, b,
    )
run(
    "residual (f16_split2)",
    lambda aa, p, bb: sddmm_slots_chunked(
        p, aa, bb, gather_dtype="f16_split2"
    ).ravel()[:1],
    a, sched.plan, b,
)
run(
    "residual (f32)",
    lambda aa, p, bb: sddmm_slots_chunked(p, aa, bb).ravel()[:1],
    a, sched.plan, b,
)


def full(aa, s, bb):
    cells, res = hybrid_sddmm(
        s.tile_parts(), s.plan, aa, bb, gather_dtype="f16_split2"
    )
    probe = sum(c.ravel()[:1].astype(jnp.float32) for c in cells)
    return probe + res.ravel()[:1].astype(jnp.float32)


run("full hybrid", full, a, sched, b)
