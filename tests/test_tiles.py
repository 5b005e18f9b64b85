"""Tile densification + BCSR/hybrid aggregation correctness."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnn_computing_tpu.graph.synthetic import rmat_graph
from gnn_computing_tpu.graph.reorder import degree_sort, cluster_reorder
from gnn_computing_tpu.schedule import neighbor_grouping_plan
from gnn_computing_tpu.schedule.tiles import densify
from gnn_computing_tpu.ops.bcsr import bcsr_spmm_xla, hybrid_spmm
from gnn_computing_tpu.ops.reference import spmm_dense
from gnn_computing_tpu.ops.spmm import spmm_xla


def _graph(n=512, m=4096, seed=3):
    g = rmat_graph(n, m, seed=seed, with_val=True)
    return g


def test_densify_partitions_edges():
    g = _graph()
    tp, res = densify(g, tile_size=64, threshold=8)
    assert tp.num_dense_edges + res.num_edges == g.num_edges
    # every dense tile (except coverage pads) has >= threshold edges
    a = np.asarray(tp.a)
    nz = (a != 0).reshape(a.shape[0], -1).sum(axis=1)
    real = nz[nz > 0]
    assert (real >= 1).all()
    # coverage: every destination tile-row appears
    assert set(range(tp.num_row_tiles)) <= set(np.asarray(tp.tile_row))
    # rows sorted
    assert (np.diff(tp.tile_row) >= 0).all()


@pytest.mark.parametrize("threshold", [1, 8, 10**9])
def test_hybrid_matches_dense(threshold):
    g = _graph()
    tp, res = densify(g, tile_size=64, threshold=threshold)
    plan = neighbor_grouping_plan(res, 16) if res.num_edges else None
    h = jnp.asarray(
        np.random.default_rng(0).normal(size=(g.num_nodes, 48)).astype(
            np.float32
        )
    )
    want = spmm_dense(g, np.asarray(h))
    got = hybrid_spmm(tp, None, plan, None, h, "xla")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_bcsr_only_matches_plan_path():
    g = _graph()
    tp, res = densify(g, tile_size=64, threshold=1)  # everything dense
    assert res.num_edges == 0
    h = jnp.asarray(
        np.random.default_rng(1).normal(size=(g.num_nodes, 32)).astype(
            np.float32
        )
    )
    plan = neighbor_grouping_plan(g, 16)
    np.testing.assert_allclose(
        bcsr_spmm_xla(tp, h), spmm_xla(plan, h), rtol=1e-4, atol=1e-4
    )


def test_hybrid_grad_matches_xla_grad():
    g = _graph()
    tp, res = densify(g, tile_size=64, threshold=8)
    tp_t = tp.transpose()
    plan = neighbor_grouping_plan(res, 16)
    gt, _ = res.transpose_with_map()
    plan_t = neighbor_grouping_plan(gt, 16)
    full_plan = neighbor_grouping_plan(g, 16)

    h = jnp.asarray(
        np.random.default_rng(2).normal(size=(g.num_nodes, 24)).astype(
            np.float32
        )
    )

    def loss_hybrid(h):
        return jnp.sum(hybrid_spmm(tp, tp_t, plan, plan_t, h, "xla") ** 2)

    def loss_plain(h):
        return jnp.sum(spmm_xla(full_plan, h) ** 2)

    g1 = jax.grad(loss_hybrid)(h)
    g2 = jax.grad(loss_plain)(h)
    np.testing.assert_allclose(g1, g2, rtol=1e-3, atol=1e-3)


def test_tile_transpose_roundtrip():
    g = _graph()
    tp, _ = densify(g, tile_size=64, threshold=4)
    tp_t = tp.transpose()
    h = jnp.asarray(
        np.random.default_rng(3).normal(size=(g.num_nodes, 16)).astype(
            np.float32
        )
    )
    # A^T computed two ways: tile transpose vs dense reference on gt
    dense = np.zeros((g.num_nodes, g.num_nodes), np.float32)
    a = np.asarray(tp.a)
    tr, tc = tp.tile_rows, tp.tile_cols
    for t in range(a.shape[0]):
        r, c = int(tp.tile_row[t]) * tr, int(tp.tile_col[t]) * tc
        blk = a[t]
        rr = min(tr, g.num_nodes - r)
        cc = min(tc, g.num_nodes - c)
        dense[r : r + rr, c : c + cc] += blk[:rr, :cc]
    want = jnp.asarray(dense.T) @ h
    got = bcsr_spmm_xla(tp_t, h)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_degree_sort_improves_tile_concentration():
    g = rmat_graph(2048, 32768, seed=5)
    tp0, res0 = densify(g, tile_size=64, threshold=16)
    g2 = g.reorder(degree_sort(g))
    tp1, res1 = densify(g2, tile_size=64, threshold=16)
    assert tp1.num_dense_edges >= tp0.num_dense_edges


def test_cluster_reorder_is_permutation():
    g = rmat_graph(1024, 8192, seed=7)
    perm = cluster_reorder(g, num_perm=16, bands=4)
    assert sorted(perm.tolist()) == list(range(g.num_nodes))
    g2 = g.reorder(perm)
    assert g2.num_edges == g.num_edges


def test_reordered_aggregation_consistent():
    """validReordered semantics (spmm.h:71-91): aggregate on the reordered
    graph, map rows back, compare against the unreordered result."""
    g = _graph(n=300, m=2400, seed=9)
    perm = degree_sort(g)
    g2 = g.reorder(perm)
    h = np.random.default_rng(4).normal(size=(g.num_nodes, 20)).astype(
        np.float32
    )
    plan = neighbor_grouping_plan(g, 16)
    plan2 = neighbor_grouping_plan(g2, 16)
    out1 = np.asarray(spmm_xla(plan, jnp.asarray(h)))
    out2 = np.asarray(spmm_xla(plan2, jnp.asarray(h[perm])))
    np.testing.assert_allclose(out2, out1[perm], rtol=1e-4, atol=1e-4)


def test_rect_tiles_and_factored_norm():
    """Rectangular [R x C] tiles + factored GCN normalization:
    s_dst * (A_count @ (s_src * h)) must equal aggregating with
    val = 1/sqrt(deg_dst*deg_src) (csr.gcn_norm_val semantics)."""
    from gnn_computing_tpu.schedule.tiles import densify_gcn_norm

    g = rmat_graph(700, 9000, seed=11)
    val = g.gcn_norm_val()
    tp, res = densify_gcn_norm(g, tile_rows=128, tile_cols=64, threshold=4)
    assert tp.scale_dst is not None and tp.scale_src is not None
    plan = neighbor_grouping_plan(res, 16) if res.num_edges else None
    h = jnp.asarray(
        np.random.default_rng(12).normal(size=(g.num_nodes, 40)).astype(
            np.float32
        )
    )
    got = hybrid_spmm(tp, None, plan, None, h, "xla")
    want = spmm_dense(g, np.asarray(h), val=val)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # transposed factored plan: A^T with swapped scales
    tp_t = tp.transpose()
    gt, emap = g.transpose_with_map()
    val_t = val[emap]
    plan_t = (
        neighbor_grouping_plan(res.transpose_with_map()[0], 16)
        if res.num_edges
        else None
    )
    got_t = hybrid_spmm(tp_t, None, plan_t, None, h, "xla")
    want_t = spmm_dense(gt, np.asarray(h), val=val_t)
    np.testing.assert_allclose(got_t, want_t, rtol=1e-4, atol=1e-4)


def test_hybrid_gat_matches_dense_oracle():
    """Factored fused-GAT on tiles + residual == dense reference
    (gat_aggregate_dense, aggr_gat.h:116-164 math)."""
    from gnn_computing_tpu.ops.bcsr_gat import hybrid_gat
    from gnn_computing_tpu.ops.reference import gat_aggregate_dense

    g = rmat_graph(600, 6000, seed=21, with_val=False)  # count tiles
    tp, res = densify(g, tile_rows=128, tile_cols=64, threshold=6)
    plan = neighbor_grouping_plan(res, 16) if res.num_edges else None
    rng = np.random.default_rng(22)
    h = jnp.asarray(rng.normal(size=(g.num_nodes, 24)).astype(np.float32))
    att = rng.normal(size=(g.num_nodes, 2)).astype(np.float32) * 0.5
    got = hybrid_gat(tp, plan, h, jnp.asarray(att), strategy="xla")
    want, _, _ = gat_aggregate_dense(g, np.asarray(h), att[:, 0], att[:, 1])
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_hybrid_gat_via_aggregator():
    from gnn_computing_tpu.aggregator import Aggregator
    from gnn_computing_tpu.ops.reference import gat_aggregate_dense

    g = rmat_graph(400, 3000, seed=23, with_val=False)
    agg = Aggregator.schedule_hybrid(
        g, tile_rows=64, tile_cols=64, threshold=4, with_transpose=False
    )
    rng = np.random.default_rng(24)
    h = jnp.asarray(rng.normal(size=(g.num_nodes, 16)).astype(np.float32))
    att = rng.normal(size=(g.num_nodes, 2)).astype(np.float32) * 0.5
    got = agg.run_gat(h, jnp.asarray(att))
    want, _, _ = gat_aggregate_dense(g, np.asarray(h), att[:, 0], att[:, 1])
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_hybrid_gcn_via_aggregator_grad():
    from gnn_computing_tpu.aggregator import Aggregator
    from gnn_computing_tpu.ops.reference import spmm_dense

    g = rmat_graph(400, 3000, seed=25, with_val=True)
    agg = Aggregator.schedule_hybrid(
        g, tile_rows=64, tile_cols=64, threshold=4, with_transpose=True
    )
    rng = np.random.default_rng(26)
    h = jnp.asarray(rng.normal(size=(g.num_nodes, 16)).astype(np.float32))
    out = agg.run(h)
    np.testing.assert_allclose(
        out, spmm_dense(g, np.asarray(h)), rtol=1e-4, atol=1e-4
    )
    gr = jax.grad(lambda x: jnp.sum(agg.run(x) ** 2))(h)
    assert np.isfinite(np.asarray(gr)).all()


def test_int8_tiles_overflow_spill():
    """int8 count tiles: cells with multiplicity > 127 spill the excess
    duplicates to the residual; hybrid result stays exact."""
    # graph with a single hot cell: 200 duplicate edges 0<-1 plus noise
    dst = np.concatenate([np.zeros(200, np.int64), [1, 2, 3] * 4])
    src = np.concatenate([np.ones(200, np.int64), [0, 1, 2] * 4]).astype(
        np.int32
    )
    from gnn_computing_tpu.graph.csr import CSRGraph

    g = CSRGraph.from_edges(dst, src, 8)
    tp, res = densify(g, tile_rows=8, tile_cols=8, threshold=1, dtype=np.int8)
    assert np.asarray(tp.a).max() == 127
    assert tp.num_dense_edges + res.num_edges == g.num_edges
    assert res.num_edges >= 200 - 127
    h = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 16)).astype(np.float32)
    )
    plan = neighbor_grouping_plan(res, 4)
    got = hybrid_spmm(tp, None, plan, None, h, "xla")
    np.testing.assert_allclose(
        got, spmm_dense(g, np.asarray(h)), rtol=1e-4, atol=1e-4
    )


def test_hybrid_gat_grad_matches_gather_path():
    """hybrid GAT custom VJP: gradients w.r.t. (h, att) match the plain
    gather-path GAT gradients (same math, different schedule)."""
    from gnn_computing_tpu.aggregator import Aggregator
    from gnn_computing_tpu.ops.gat import gat_aggregate

    g = rmat_graph(400, 3000, seed=27, with_val=False)
    agg = Aggregator.schedule_hybrid(
        g, tile_rows=64, tile_cols=64, threshold=4, with_transpose=False
    )
    full_plan = neighbor_grouping_plan(g, 8).device_put()
    rng = np.random.default_rng(28)
    h = jnp.asarray(rng.normal(size=(g.num_nodes, 16)).astype(np.float32))
    att = jnp.asarray(rng.normal(size=(g.num_nodes, 2)).astype(np.float32) * 0.1)

    def loss_hybrid(h, att):
        return jnp.sum(agg.run_gat(h, att) ** 2)

    def loss_gather(h, att):
        return jnp.sum(gat_aggregate(full_plan, h, att) ** 2)

    gh1, ga1 = jax.grad(loss_hybrid, argnums=(0, 1))(h, att)
    gh2, ga2 = jax.grad(loss_gather, argnums=(0, 1))(h, att)
    np.testing.assert_allclose(np.asarray(gh1), np.asarray(gh2), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga1), np.asarray(ga2), rtol=1e-3, atol=1e-3)


def test_residual_gather_modes_pass_gate():
    """16-bit residual gather modes stay within the reference 1e-2 gate:
    split2 modes are exact to 16/21 bits for arbitrary signed operands."""
    from gnn_computing_tpu.ops.validate import assert_valid

    g = rmat_graph(600, 6000, seed=31, with_val=True)
    plan = neighbor_grouping_plan(g, 8)
    rng = np.random.default_rng(32)
    h = jnp.asarray(rng.normal(size=(g.num_nodes, 32)).astype(np.float32))
    want = spmm_dense(g, np.asarray(h))
    for mode in ("f16_split2", "bf16_split2"):
        got = spmm_xla(plan, h, gather_dtype=mode)
        assert_valid(got, want, what=mode)


def test_layer_opts_aggregate_first_equivalence():
    """relu(agg(h)@W) == relu(agg(h@W)) by linearity; exercised through
    the hybrid aggregator + LayerOpts plumbing."""
    from gnn_computing_tpu.aggregator import Aggregator
    from gnn_computing_tpu.models.gcn import LayerOpts, gcn_layer

    g = rmat_graph(400, 3000, seed=27, with_val=True)
    agg = Aggregator.schedule_hybrid(
        g, tile_rows=64, tile_cols=64, threshold=4, with_transpose=False
    )
    rng = np.random.default_rng(28)
    h = jnp.asarray(
        np.abs(rng.normal(size=(g.num_nodes, 16))).astype(np.float32)
    )
    w = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
    ref = gcn_layer(agg, h, w, strategy="xla")
    got = gcn_layer(
        agg, h, w, strategy="xla", opts=LayerOpts(aggregate_first=True)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_fast_layer_opts_forward_passes_gate():
    """The measured-best bench numeric config (models.gcn.fast_layer_opts)
    must pass the validation gate against the f64 dense oracle on the full
    3-layer forward."""
    from gnn_computing_tpu.aggregator import Aggregator
    from gnn_computing_tpu.models.gcn import (
        fast_layer_opts,
        gcn_forward_bench,
        init_gcn_params,
    )
    from gnn_computing_tpu.ops.validate import assert_valid
    from gnn_computing_tpu.graph.csr import CSRGraph

    g = rmat_graph(512, 8000, seed=29, with_val=False)
    # GCN-normalized values like the bench
    from gnn_computing_tpu.schedule.tiles import densify_gcn_norm  # noqa

    agg = Aggregator.schedule_hybrid(
        g, tile_rows=64, tile_cols=64, threshold=4, with_transpose=False
    )
    dims = (48, 24, 16, 8)
    params = init_gcn_params(jax.random.key(0), dims)
    rng = np.random.default_rng(30)
    h = jnp.asarray(rng.normal(size=(g.num_nodes, dims[0])).astype(np.float32) * 0.1)

    # f64 oracle: dense adjacency forward with identical layer semantics
    a = np.zeros((g.num_nodes, g.num_nodes))
    np.add.at(a, (g.dst_per_edge, g.indices), 1.0)
    ref = np.asarray(h, np.float64)
    for w in params:
        ref = np.maximum(a @ (ref @ np.asarray(w, np.float64)), 0.0)

    got = gcn_forward_bench(
        agg, params, h, strategy="xla", layer_opts=fast_layer_opts(dims)
    )
    assert_valid(got, ref, what="fast_layer_opts forward")


def test_bench_add_transpose_grads_match():
    """bench.add_transpose reconstructs the residual edge list from the
    slot grid and attaches transposed plans; gradients through it must
    match an aggregator built directly with with_transpose=True."""
    import bench as bench_mod

    from gnn_computing_tpu.aggregator import Aggregator

    g = rmat_graph(400, 3000, seed=33, with_val=False)
    direct = Aggregator.schedule_hybrid(
        g, tile_rows=64, tile_cols=64, threshold=4, residual_block=4,
        tile_dtype=np.int8, with_transpose=True, pack=8,
    )
    fwd_only = Aggregator.schedule_hybrid(
        g, tile_rows=64, tile_cols=64, threshold=4, residual_block=4,
        tile_dtype=np.int8, with_transpose=False, pack=8,
    )
    patched = bench_mod.add_transpose(fwd_only, pack=8).device_put()
    rng = np.random.default_rng(34)
    h = jnp.asarray(rng.normal(size=(g.num_nodes, 16)).astype(np.float32))
    g1 = jax.grad(lambda x: jnp.sum(direct.run(x) ** 2))(h)
    g2 = jax.grad(lambda x: jnp.sum(patched.run(x) ** 2))(h)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               rtol=1e-4, atol=1e-4)


def test_hybrid_spmm_nn_matches_split():
    """Fused aggregate+GEMM (O5 analog): (agg, agg @ w) == dense oracle.

    On CPU the dense parts take the portable split fallback; the Pallas
    epilogue itself is validated on-chip (probes / verify drives)."""
    import jax
    import numpy as np

    from gnn_computing_tpu.aggregator import Aggregator
    from gnn_computing_tpu.graph.synthetic import (
        normal_features,
        rmat_graph,
    )
    from gnn_computing_tpu.ops import reference as ref
    from gnn_computing_tpu.ops.fused_nn import hybrid_spmm_nn
    from gnn_computing_tpu.ops.validate import assert_valid

    g = rmat_graph(2048, 40000, seed=5, with_val=False)
    sched = Aggregator.schedule_hybrid(
        g, tile_rows=256, threshold=8, residual_block=4,
        tile_dtype=np.int8, with_transpose=False,
    )
    h = normal_features(g.num_nodes, 32, seed=1) * 0.1
    w = normal_features(32, 32, seed=2) * 0.1
    agg, trans = jax.jit(
        lambda s, x, ww: hybrid_spmm_nn(s, x, ww)
    )(sched, jnp.asarray(h), jnp.asarray(w))
    want_agg = ref.spmm_dense(g, h)
    assert_valid(np.asarray(agg), want_agg, what="fused agg")
    assert_valid(
        np.asarray(trans),
        want_agg @ np.asarray(w, np.float64),
        what="fused transform",
    )
