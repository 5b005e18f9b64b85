"""Bit-tile decode variant timing on the real chip (per-tile ns of the
bit part of the cached reddit plan, f=128/64/32), plus cross-variant
correctness.  Decides pallas_bcsr.BITS_DECODE."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp

import bench as B
from gnn_computing_tpu.graph.synthetic import normal_features
from gnn_computing_tpu.ops import pallas_bcsr
from gnn_computing_tpu.ops.bcsr import bcsr_spmm
from gnn_computing_tpu.utils.timing import benchmark_chained

n, m = B.REDDIT_N, B.REDDIT_M
g = B.build_graph(n, m, kind="rmat")
agg = B.build_hybrid(
    (lambda: g), n, m, 24, 512, 4, tile_dtype="int8", pack=16,
    reorder="degree", graph_kind="rmat", bit_tiles=True,
).device_put()
bitp = agg.tile_bits
intp = agg.tile
print("bit tiles:", bitp.num_tiles, " int tiles:", intp.num_tiles)

outs = {}
for mode in ("concat_i32", "sign_i8"):
    pallas_bcsr.BITS_DECODE = mode
    for f in (128, 64, 32):
        h = jnp.asarray(normal_features(n, f, seed=123) * 0.1)
        r = benchmark_chained(
            lambda hh, t: bcsr_spmm(t, hh, h_mode="split"),
            h, bitp, iters=8, reps=3,
        )
        print(f"{mode} f={f}: {r.min_s*1e3:7.2f} ms "
              f"{r.min_s/bitp.num_tiles*1e9:6.1f} ns/tile"
              + (" NOISE" if r.noise_floor else ""))
        if f == 64:
            outs[mode] = np.asarray(
                bcsr_spmm(bitp, h, h_mode="split")
            )
# int part at f=64/32 for the layer model
for f in (64, 32):
    h = jnp.asarray(normal_features(n, f, seed=123) * 0.1)
    r = benchmark_chained(
        lambda hh, t: bcsr_spmm(t, hh, h_mode="split"),
        h, intp, iters=8, reps=3,
    )
    print(f"int8 f={f}: {r.min_s*1e3:7.2f} ms "
          f"{r.min_s/intp.num_tiles*1e9:6.1f} ns/tile")
d = np.abs(outs["concat_i32"] - outs["sign_i8"]).max()
print("variant agreement max abs diff:", d)
assert d == 0.0
print("OK")
