"""On-chip probe: GAT streaming-backward dot_mode ladder (exact/split2).

Validates d(h, att) of the full hybrid GAT layer on the quick-scale plan
against the AD-through-XLA reference (strategy='xla' backward), then
times a full value_and_grad step for each mode.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python probes/gat_bwd_split2.py
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_hybrid, lazy_graph, add_transpose
from gnn_computing_tpu.graph.synthetic import normal_features
from gnn_computing_tpu.ops.bcsr_gat import hybrid_gat
from gnn_computing_tpu.utils.timing import benchmark_chained

N, M = 65536, 4194304

g_fn = lazy_graph(N, M, "rmat")
sched = build_hybrid(
    g_fn, N, M, 24, 512, 4, tile_dtype="int8", pack=16,
    reorder="degree", graph_kind="rmat",
)
sched = add_transpose(sched, 16, cache_tag="hybrid_n65536_m4194304_t24_r512_b4_int8")
sched = sched.device_put()

h = jnp.asarray(normal_features(N, 64, seed=1) * 0.1)
att = jnp.asarray(normal_features(N, 2, seed=2) * 0.3)
ct = jnp.asarray(normal_features(N, 64, seed=3) * 0.1)


def loss(hh, s, aa, dot_mode):
    # s passed as an ARGUMENT: a closure capture embeds the plan arrays
    # as jit constants and blows the tunnel's compile payload limit
    # (measured: HTTP 413 on remote_compile)
    out = hybrid_gat(
        s.tile_parts(), s.plan, hh, aa,
        stabilize=True,
        tp_t=s.tile_parts_t() or None,
        plan_t=s.plan_t,
        edge_map_t=s.edge_map_t,
        dot_mode=dot_mode,
    )
    return jnp.sum(out * ct)


grads = {}
for mode in ("exact", "split2"):
    g_fn_j = jax.jit(
        lambda hh, s, aa, _m=mode: jax.grad(loss, argnums=(0, 2))(
            hh, s, aa, _m
        )
    )
    dh, datt = g_fn_j(h, sched, att)
    grads[mode] = (np.asarray(dh), np.asarray(datt))
    r = benchmark_chained(
        lambda hh, s, aa, _m=mode: jax.grad(loss, argnums=(0, 2))(
            hh, s, aa, _m
        )[0],
        h, sched, att, iters=8, reps=2,
    )
    print(f"mode={mode:7s} grad step {r.min_s*1e3:.2f} ms")

for name, i in (("dh", 0), ("datt", 1)):
    a, b = grads["exact"][i], grads["split2"][i]
    scale = np.abs(a)
    bad = int((np.abs(a - b) > 1e-2 * scale + 1e-5 * np.abs(a).max()).sum())
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-30)
    print(f"{name}: bad={bad}/{a.size}  max_rel_vs_peak={rel:.2e}")
