import jax
import jax.numpy as jnp
import numpy as np

from gnn_computing_tpu.aggregator import Aggregator
from gnn_computing_tpu.graph.synthetic import normal_features
from gnn_computing_tpu.ops import reference as ref
from gnn_computing_tpu.ops.validate import assert_valid
from gnn_computing_tpu.schedule import Schedule


def test_aggregator_run(small_rmat):
    g = small_rmat
    agg = Aggregator.schedule(g, block_size=8)
    h = jnp.asarray(normal_features(g.num_nodes, 8, seed=1))
    out = np.asarray(jax.jit(lambda a, x: a.run(x))(agg, h))
    assert_valid(out, ref.spmm_dense(g, np.asarray(h)), what="agg.run")


def test_aggregator_bidir_grad(small_uniform):
    """Backward through the transposed plan equals the dense gradient."""
    g = small_uniform
    agg = Aggregator.schedule(g, block_size=8)
    h = jnp.asarray(normal_features(g.num_nodes, 4, seed=2))

    def loss(h):
        return jnp.sum(agg.run(h) ** 2)

    dh = np.asarray(jax.jit(jax.grad(loss))(h))
    a = ref.dense_adjacency(g)
    want = 2 * a.T @ (a @ np.asarray(h, np.float64))
    assert_valid(dh, want, what="bidir dh")


def test_aggregator_val_override_bidir(small_uniform):
    g = small_uniform
    agg = Aggregator.schedule(g, block_size=8)
    h = jnp.asarray(normal_features(g.num_nodes, 4, seed=3))
    ev = jnp.asarray(
        np.random.default_rng(4).standard_normal(g.num_edges).astype(np.float32)
    )
    val = agg.slot_values(ev)
    val_t = agg.transposed_val(ev)
    out = np.asarray(agg.run(h, val=val, val_t=val_t))
    assert_valid(
        out, ref.spmm_dense(g, np.asarray(h), val=np.asarray(ev)),
        what="agg val override",
    )

    # gradient w.r.t. h through custom vjp with values
    def loss(h):
        return jnp.sum(agg.run(h, val=val, val_t=val_t) ** 2)

    dh = np.asarray(jax.grad(loss)(h))
    a = ref.dense_adjacency(g, val=np.asarray(ev))
    want = 2 * a.T @ (a @ np.asarray(h, np.float64))
    assert_valid(dh, want, what="bidir dh with vals")


def test_aggregator_transpose_run(small_uniform):
    g = small_uniform
    agg = Aggregator.schedule(g, block_size=8)
    x = jnp.asarray(normal_features(g.num_nodes, 4, seed=5))
    got = np.asarray(agg.run_transpose(x))
    want = ref.dense_adjacency(g).T @ np.asarray(x, np.float64)
    assert_valid(got, want, what="run_transpose")


def test_aggregator_gat_and_sddmm(small_rmat):
    g = small_rmat
    agg = Aggregator.schedule(g, Schedule.locality_neighbor_grouping,
                              num_partitions=4, block_size=8)
    h = normal_features(g.num_nodes, 8, seed=6)
    att = normal_features(g.num_nodes, 2, seed=7) * 0.3
    out = np.asarray(agg.run_gat(jnp.asarray(h), jnp.asarray(att)))
    want, _, _ = ref.gat_aggregate_dense(g, h, att[:, 0], att[:, 1])
    assert_valid(out, want, what="agg.gat")

    e = np.asarray(agg.run_sddmm(jnp.asarray(h), jnp.asarray(h)))
    assert_valid(e, ref.sddmm_dense(g, h, h), what="agg.sddmm")
