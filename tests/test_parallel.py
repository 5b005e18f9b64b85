import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_computing_tpu.graph.synthetic import normal_features
from gnn_computing_tpu.models import init_gcn_params
from gnn_computing_tpu.ops import reference as ref
from gnn_computing_tpu.ops.validate import assert_valid
from gnn_computing_tpu.parallel import (
    build_ring_plan,
    make_mesh,
    ring_spmm,
    ring_gcn_forward,
    shard_rows,
    shard_ring_plan,
)

needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _setup(g, d, seed=None):
    mesh = make_mesh(num_graph=d)
    ring, gp, perm = build_ring_plan(g, d, block_size=8, shuffle_seed=seed)
    ring = ring.device_put(shard_ring_plan(mesh))
    return mesh, ring, gp, perm


@needs_8
@pytest.mark.parametrize("d", [2, 8])
def test_ring_spmm_matches_dense(small_rmat, d):
    g = small_rmat
    mesh, ring, gp, _ = _setup(g, d)
    h = normal_features(gp.num_nodes, 16, seed=1)
    hs = jax.device_put(jnp.asarray(h), shard_rows(mesh))
    out = np.asarray(jax.jit(lambda r, x: ring_spmm(mesh, r, x))(ring, hs))
    want = ref.spmm_dense(gp, h)
    assert_valid(out, want, what=f"ring_spmm d={d}")


@needs_8
def test_ring_spmm_shuffled(small_rmat):
    """With load-balance shuffling, output rows follow the permutation."""
    g = small_rmat
    d = 4
    mesh, ring, gp, perm = _setup(g, d, seed=9)
    assert perm is not None
    h = normal_features(gp.num_nodes, 8, seed=2)
    hs = jax.device_put(jnp.asarray(h), shard_rows(mesh))
    out = np.asarray(ring_spmm(mesh, ring, hs))
    want = ref.spmm_dense(gp, h)  # gp is already permuted
    assert_valid(out, want, what="ring shuffled")


@needs_8
def test_ring_gcn_forward_and_grad(small_rmat):
    g = small_rmat
    d = 8
    mesh, ring, gp, _ = _setup(g, d)
    dims = (24, 16, 8)
    params = init_gcn_params(jax.random.key(0), dims)
    h = normal_features(gp.num_nodes, dims[0], seed=3) * 0.1
    hs = jax.device_put(jnp.asarray(h), shard_rows(mesh))

    fwd = jax.jit(lambda p, x: ring_gcn_forward(mesh, ring, p, x))
    out = np.asarray(fwd(params, hs))

    a = ref.dense_adjacency(gp)
    x = h.astype(np.float64)
    for i, w in enumerate(params):
        x = a @ (x @ np.asarray(w, np.float64))
        if i < len(params) - 1:
            x = np.maximum(x, 0.0)
    assert_valid(out, x, what="ring gcn fwd")

    # weight gradients are replicated psum-reduced values; check vs single-dev
    def loss_dist(p):
        return jnp.mean(ring_gcn_forward(mesh, ring, p, hs) ** 2)

    gd = jax.jit(jax.grad(loss_dist))(params)
    for gw in gd:
        assert np.isfinite(np.asarray(gw)).all()

    from gnn_computing_tpu.aggregator import Aggregator
    from gnn_computing_tpu.models import gcn_forward

    agg = Aggregator.schedule(gp, block_size=8, with_transpose=True)

    def loss_single(p):
        return jnp.mean(gcn_forward(agg.plan, p, jnp.asarray(h)) ** 2)

    gs = jax.grad(loss_single)(params)
    for a_, b_ in zip(gd, gs):
        assert_valid(np.asarray(a_), np.asarray(b_), what="dist grad parity")


@needs_8
def test_ring_plan_stats(small_rmat):
    ring, gp, _ = build_ring_plan(small_rmat, 4, block_size=8)
    s = ring.stats()
    assert s["edges"] == small_rmat.num_edges
    assert 0 <= s["local_edge_fraction"] <= 1


def test_feature_axis_tensor_parallel(small_rmat):
    """TP: shard the dense-layer weight on the feature axis of a
    graph x feature mesh; matches the unsharded computation (SURVEY.md
    §2e tensor-parallel row)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gnn_computing_tpu.parallel.mesh import make_mesh
    from gnn_computing_tpu.ops.spmm import spmm_xla
    from gnn_computing_tpu.schedule import neighbor_grouping_plan

    g = small_rmat
    mesh = make_mesh(num_graph=4, num_feature=2)
    plan = neighbor_grouping_plan(g, 8).device_put()
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(g.num_nodes, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))

    want = spmm_xla(plan, h @ w)

    w_sharded = jax.device_put(
        w, NamedSharding(mesh, P(None, "feature"))
    )
    h_repl = jax.device_put(h, NamedSharding(mesh, P()))

    @jax.jit
    def fwd(plan, h, w):
        return spmm_xla(plan, h @ w)

    got = fwd(plan, h_repl, w_sharded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


@needs_8
@pytest.mark.parametrize("d", [2, 4])
def test_ring_hybrid_matches_dense(small_rmat, d):
    """Distributed hybrid (BCSR tiles + residual gather on one ring)."""
    from gnn_computing_tpu.parallel.ring_tiles import (
        build_ring_hybrid,
        ring_hybrid_spmm,
    )

    g = small_rmat
    mesh = make_mesh(num_graph=d)
    rtp, ring, gp = build_ring_hybrid(
        g, d, tile_rows=16, tile_cols=16, threshold=2, residual_block=8
    )
    assert rtp.num_dense_edges > 0 and ring.num_edges > 0
    assert rtp.num_dense_edges + ring.num_edges == g.num_edges
    rtp = rtp.device_put(shard_ring_plan(mesh))
    ring = ring.device_put(shard_ring_plan(mesh))
    h = normal_features(gp.num_nodes, 16, seed=4)
    hs = jax.device_put(jnp.asarray(h), shard_rows(mesh))
    out = np.asarray(
        jax.jit(lambda t, r, x: ring_hybrid_spmm(mesh, t, r, x))(rtp, ring, hs)
    )
    assert_valid(out, ref.spmm_dense(gp, h), what=f"ring_hybrid d={d}")


@needs_8
def test_ring_hybrid_gcn_forward(small_rmat):
    from gnn_computing_tpu.parallel.ring_tiles import (
        build_ring_hybrid,
        ring_hybrid_gcn_forward,
    )

    d = 4
    mesh = make_mesh(num_graph=d)
    rtp, ring, gp = build_ring_hybrid(
        small_rmat, d, tile_rows=16, tile_cols=16, threshold=2
    )
    rtp = rtp.device_put(shard_ring_plan(mesh))
    ring = ring.device_put(shard_ring_plan(mesh))
    dims = (24, 16, 8)
    params = init_gcn_params(jax.random.key(0), dims)
    h = normal_features(gp.num_nodes, dims[0], seed=5) * 0.1
    hs = jax.device_put(jnp.asarray(h), shard_rows(mesh))
    out = np.asarray(
        jax.jit(lambda p, x: ring_hybrid_gcn_forward(mesh, rtp, ring, p, x))(
            params, hs
        )
    )
    a = ref.dense_adjacency(gp)
    x = h.astype(np.float64)
    for i, w in enumerate(params):
        x = a @ (x @ np.asarray(w, np.float64))
        if i < len(params) - 1:
            x = np.maximum(x, 0.0)
    assert_valid(out, x, what="ring hybrid gcn fwd")


@needs_8
def test_ring_hybrid_gat_matches_dense(small_rmat):
    """Distributed fused GAT over the hybrid ring vs the f64 oracle."""
    from gnn_computing_tpu.parallel.ring_tiles import (
        build_ring_hybrid,
        ring_hybrid_gat,
    )
    from gnn_computing_tpu.ops.reference import gat_aggregate_dense

    from gnn_computing_tpu.graph.synthetic import rmat_graph

    d = 4
    # GAT needs raw COUNT tiles: attention supplies the edge weights
    g = rmat_graph(200, 2000, seed=7, with_val=False)
    mesh = make_mesh(num_graph=d)
    rtp, ring, gp = build_ring_hybrid(
        g, d, tile_rows=16, tile_cols=16, threshold=2
    )
    rtp = rtp.device_put(shard_ring_plan(mesh))
    ring = ring.device_put(shard_ring_plan(mesh))
    h = normal_features(gp.num_nodes, 16, seed=6)
    att = normal_features(gp.num_nodes, 2, seed=7) * 0.3
    hs = jax.device_put(jnp.asarray(h), shard_rows(mesh))
    ats = jax.device_put(jnp.asarray(att), shard_rows(mesh))
    out = np.asarray(
        jax.jit(lambda t, r, x, a: ring_hybrid_gat(mesh, t, r, x, a))(
            rtp, ring, hs, ats
        )
    )
    want, _, _ = gat_aggregate_dense(gp, h, att[:, 0], att[:, 1])
    assert_valid(out, want, what="ring hybrid gat")


@needs_8
def test_multihead_gat_training_edge_partitioned():
    """North-star config (BASELINE.json): multi-head GAT full-graph
    TRAINING, edge-partitioned across devices — one optax step through
    the distributed fused-GAT forward, loss decreasing and grads finite."""
    import optax

    from gnn_computing_tpu.graph.synthetic import rmat_graph
    from gnn_computing_tpu.parallel.ring_tiles import (
        build_ring_hybrid,
        ring_hybrid_gat,
    )

    d, heads, f_in, f_out, ncls = 2, 2, 16, 8, 4
    g = rmat_graph(200, 2000, seed=9, with_val=False)
    mesh = make_mesh(num_graph=d)
    rtp, ring, gp = build_ring_hybrid(
        g, d, tile_rows=16, tile_cols=16, threshold=2
    )
    rtp = rtp.device_put(shard_ring_plan(mesh))
    ring = ring.device_put(shard_ring_plan(mesh))
    n = gp.num_nodes
    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(normal_features(n, f_in, seed=1) * 0.1),
        shard_rows(mesh),
    )
    labels = jnp.asarray(rng.integers(0, ncls, n))

    params = {
        "w": jnp.asarray(rng.standard_normal((f_in, f_out)) * 0.2,
                         jnp.float32),
        "w_att": jnp.asarray(
            rng.standard_normal((heads, f_out, 2)) * 0.3, jnp.float32
        ),
        "w_cls": jnp.asarray(
            rng.standard_normal((heads * f_out, ncls)) * 0.2, jnp.float32
        ),
    }

    def forward(p, xx):
        feat = jnp.dot(xx, p["w"],
                       precision=jax.lax.Precision.HIGHEST)
        outs = []
        for hidx in range(heads):  # static head loop over the ring op
            att = jnp.dot(feat, p["w_att"][hidx],
                          precision=jax.lax.Precision.HIGHEST)
            outs.append(ring_hybrid_gat(mesh, rtp, ring, feat, att))
        hcat = jnp.concatenate(outs, axis=-1)
        return jnp.dot(hcat, p["w_cls"],
                       precision=jax.lax.Precision.HIGHEST)

    def loss_fn(p, xx, yy):
        logits = forward(p, xx)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, yy[:, None], axis=1))

    opt = optax.adam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(p, s, xx, yy):
        loss, grads = jax.value_and_grad(loss_fn)(p, xx, yy)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss, grads

    losses = []
    for _ in range(5):
        params, state, loss, grads = step(params, state, x, labels)
        losses.append(float(loss))
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(gg)).all() for gg in flat)
    assert losses[-1] < losses[0], losses
