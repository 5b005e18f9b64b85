import jax
import jax.numpy as jnp
import numpy as np

from gnn_computing_tpu.graph.synthetic import normal_features
from gnn_computing_tpu.models import (
    gcn_forward,
    gcn_forward_bench,
    init_gcn_params,
    gat_forward,
    init_gat_params,
    gat_layer,
    init_gat_params as _igp,
)
from gnn_computing_tpu.ops import reference as ref
from gnn_computing_tpu.ops.validate import assert_valid
from gnn_computing_tpu.schedule import neighbor_grouping_plan

DIMS = (24, 16, 8)


def test_gcn_forward_matches_dense(small_rmat):
    g = small_rmat
    plan = neighbor_grouping_plan(g, 8).device_put()
    params = init_gcn_params(jax.random.key(0), DIMS)
    h = normal_features(g.num_nodes, DIMS[0], seed=1) * 0.1

    out = np.asarray(
        jax.jit(lambda p, x: gcn_forward_bench(plan, p, x))(
            params, jnp.asarray(h)
        )
    )
    # dense oracle: relu(A @ (h w)) per layer
    a = ref.dense_adjacency(g)
    x = h.astype(np.float64)
    for w in params:
        x = np.maximum(a @ (x @ np.asarray(w, np.float64)), 0.0)
    assert_valid(out, x, what="gcn3")


def test_gcn_logits_head(small_rmat):
    g = small_rmat
    plan = neighbor_grouping_plan(g, 8).device_put()
    params = init_gcn_params(jax.random.key(0), DIMS)
    h = jnp.asarray(normal_features(g.num_nodes, DIMS[0], seed=1))
    out = gcn_forward(plan, params, h)
    assert out.shape == (g.num_nodes, DIMS[-1])
    # last layer linear: some negatives present
    assert float(jnp.min(out)) < 0


def test_gat_forward_matches_dense(small_rmat):
    g = small_rmat
    plan = neighbor_grouping_plan(g, 8).device_put()
    params = init_gat_params(jax.random.key(1), DIMS)
    h = normal_features(g.num_nodes, DIMS[0], seed=2) * 0.1

    out = np.asarray(
        jax.jit(lambda p, x: gat_forward(plan, p, x))(params, jnp.asarray(h))
    )
    x = h.astype(np.float64)
    for p in params:
        f2 = x @ np.asarray(p.w, np.float64)
        att = f2 @ np.asarray(p.w_att, np.float64)
        x, _, _ = ref.gat_aggregate_dense(g, f2, att[:, 0], att[:, 1])
    assert_valid(out, x, what="gat3")


def test_gat_multihead_shapes(small_uniform):
    g = small_uniform
    plan = neighbor_grouping_plan(g, 8).device_put()
    params = _igp(jax.random.key(2), (12, 6), heads=4)
    h = jnp.asarray(normal_features(g.num_nodes, 12, seed=3))
    out = gat_layer(plan, h, params[0])
    assert out.shape == (g.num_nodes, 24)


def test_models_differentiable(small_uniform):
    g = small_uniform
    plan = neighbor_grouping_plan(g, 8).device_put()
    params = init_gcn_params(jax.random.key(3), DIMS)
    h = jnp.asarray(normal_features(g.num_nodes, DIMS[0], seed=4))

    def loss(params):
        return jnp.mean(gcn_forward(plan, params, h) ** 2)

    grads = jax.grad(loss)(params)
    for gw in grads:
        assert np.isfinite(np.asarray(gw)).all()
        assert float(jnp.abs(gw).sum()) > 0
