"""On-chip decomposition of the bit-tile vs int8 reddit plans: where did
the 5 GB A-byte saving go?  (bench measured 127.2 ms bit vs 123.7 int8.)

Run on the real chip from cached plans, fresh process.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

import bench as B
from gnn_computing_tpu.graph.synthetic import normal_features
from gnn_computing_tpu.ops.bcsr import bcsr_spmm
from gnn_computing_tpu.utils.timing import benchmark_chained

n, m = B.REDDIT_N, B.REDDIT_M
g = B.build_graph(n, m, kind="rmat")
f = int(sys.argv[1]) if len(sys.argv) > 1 else 128
h = jnp.asarray(normal_features(n, f, seed=123) * 0.1)

for bit in (True, False):
    agg = B.build_hybrid(
        (lambda: g), n, m, 24, 512, 4, tile_dtype="int8", pack=16,
        reorder="degree", graph_kind="rmat", bit_tiles=bit,
    ).device_put()
    parts = agg.tile_parts()
    print(f"--- bit_tiles={bit}: parts="
          f"{[(p.bits, p.num_tiles) for p in parts]}")
    for name, tps in [("all", parts)] + [
        (f"part{i}_bits={p.bits}", (p,)) for i, p in enumerate(parts)
    ]:
        r = benchmark_chained(
            lambda hh, t: bcsr_spmm(t, hh, h_mode="split"),
            h, tps, iters=8, reps=3,
        )
        nt = sum(p.num_tiles for p in tps)
        print(f"  dense[{name}]: {r.min_s*1e3:8.2f} ms  "
              f"{r.min_s/nt*1e9:6.1f} ns/tile  ({nt} tiles)"
              + (" NOISE" if r.noise_floor else ""))
    r = benchmark_chained(
        lambda hh, a: a.run(hh, tile_h_mode="split"), h, agg,
        iters=8, reps=3,
    )
    print(f"  full pass: {r.min_s*1e3:8.2f} ms")
    del agg
