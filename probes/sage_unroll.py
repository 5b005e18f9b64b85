"""Probe: SAGE-LSTM scan unroll — can step t+1's gate gather hide under
step t's GEMM/gate math?  Only the (h, c) recurrence is sequential; the
gathers are independent across steps.

Run on the real chip (reddit-scale cached presample from bench.py):
  PYTHONPATH=/root/repo:$PYTHONPATH python probes/sage_unroll.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gnn_computing_tpu.graph.synthetic import normal_features
from gnn_computing_tpu.ops.lstm import init_lstm_params, lstm_aggregate
from gnn_computing_tpu.utils.timing import benchmark_chained

N, K, F = 232_965, 16, 32
spath = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data", "bench_cache", f"sample{K}_rmat_n{N}_m114615891.npz",
)
if not os.path.exists(spath):
    from bench import build_graph
    from gnn_computing_tpu.graph.sample import presample_fixed_neighbors

    g = build_graph(N, 114_615_891, kind="rmat")
    t0 = time.time()
    nbr_np = presample_fixed_neighbors(g, k=K, seed=2)
    print(f"presample: {time.time() - t0:.1f}s", file=sys.stderr)
    os.makedirs(os.path.dirname(spath), exist_ok=True)
    from bench import _atomic_savez

    _atomic_savez(spath, nbr=nbr_np)
nbr = jnp.asarray(np.load(spath)["nbr"])
x = jnp.asarray(normal_features(N, F, seed=3) * 0.1)
params = init_lstm_params(jax.random.key(0), F, F)

for gdt in (jnp.float16,):
    for unroll in (1, 2, 4, 16):
        r = benchmark_chained(
            lambda xx, p, nb: lstm_aggregate(
                p, xx, nb, "redundancy_bypass",
                gate_gather_dtype=gdt, unroll=unroll,
            ),
            x, params, nbr, iters=8, reps=3,
        )
        print(
            f"gdt={jnp.dtype(gdt).name} unroll={unroll:2d}: "
            f"{r.min_s * 1e3:.2f} ms  (compile {r.compile_s:.0f}s)",
            flush=True,
        )
