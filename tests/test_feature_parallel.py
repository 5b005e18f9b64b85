"""Feature-dimension TP (parallel/feature_parallel.py) vs the f64 oracle.

The aggregation runs per feature shard with zero communication; the
transform contracts via one psum per layer.  Validated against the dense
f64 forward with identical layer semantics (aggregate-first — the orders
commute: A @ (h W) == (A @ h) W)."""

import jax
import jax.numpy as jnp
import numpy as np

from gnn_computing_tpu.aggregator import Aggregator
from gnn_computing_tpu.graph.synthetic import normal_features, rmat_graph
from gnn_computing_tpu.ops import reference as ref
from gnn_computing_tpu.ops.validate import assert_valid
from gnn_computing_tpu.parallel.feature_parallel import (
    feature_sharded_gcn_forward,
    shard_features,
    shard_w_rows,
)
from gnn_computing_tpu.parallel.mesh import make_mesh


def test_feature_sharded_gcn_matches_oracle():
    d = 4
    mesh = make_mesh(num_graph=1, num_feature=d)
    g = rmat_graph(1536, 30000, seed=3, with_val=False)
    dims = (64, 32, 16)
    h = normal_features(g.num_nodes, dims[0], seed=1) * 0.1
    rng = np.random.default_rng(0)
    params = [
        (rng.standard_normal((dims[i], dims[i + 1])) * 0.1).astype(
            np.float32
        )
        for i in range(len(dims) - 1)
    ]

    sched = Aggregator.schedule_hybrid(
        g, tile_rows=256, threshold=8, residual_block=4,
        tile_dtype=np.int8, with_transpose=False, device_put=False,
    )

    hj = jax.device_put(jnp.asarray(h), shard_features(mesh))
    ws = [jax.device_put(jnp.asarray(w), shard_w_rows(mesh)) for w in params]
    out = np.asarray(
        jax.jit(
            lambda s, x, *w: feature_sharded_gcn_forward(mesh, s, w, x)
        )(sched.device_put(), hj, *ws)
    )

    # f64 oracle, aggregate-first semantics per layer
    a = ref.dense_adjacency(g)
    x = np.asarray(h, np.float64)
    for i, w in enumerate(params):
        x = (a @ x) @ np.asarray(w, np.float64)
        if i < len(params) - 1:
            x = np.maximum(x, 0.0)
    assert_valid(out, x, what="feature-sharded GCN forward")
