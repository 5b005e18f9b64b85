import numpy as np
import pytest

from gnn_computing_tpu.graph import (
    CSRGraph,
    rmat_graph,
    uniform_graph,
    fixed_degree_graph,
    load_graph,
    save_graph,
)
from gnn_computing_tpu.graph.io import save_reorder


def test_from_edges_roundtrip():
    dst = np.array([2, 0, 1, 0, 2, 2])
    src = np.array([1, 2, 0, 1, 0, 1])
    g = CSRGraph.from_edges(dst, src, 3)
    assert g.num_nodes == 3 and g.num_edges == 6
    assert g.degrees.tolist() == [2, 1, 3]
    # row 0 edges: srcs {2, 1}; row 2: {1, 0, 1}
    assert sorted(g.indices[g.indptr[0] : g.indptr[1]].tolist()) == [1, 2]
    np.testing.assert_array_equal(g.dst_per_edge, [0, 0, 1, 2, 2, 2])


def test_reorder_matches_naive(small_rmat):
    g = small_rmat
    n = g.num_nodes
    rng = np.random.default_rng(0)
    rows = rng.permutation(n)
    g2 = g.reorder(rows)
    assert g2.num_edges == g.num_edges
    # naive check per row (reference reorderCSR semantics, src/data.cu:4-29)
    reverse = np.empty(n, dtype=np.int64)
    reverse[rows] = np.arange(n)
    for i in rng.integers(0, n, size=20):
        old = rows[i]
        want = reverse[g.indices[g.indptr[old] : g.indptr[old + 1]]]
        got = g2.indices[g2.indptr[i] : g2.indptr[i + 1]]
        np.testing.assert_array_equal(got, want)


def test_transpose_involution(small_uniform):
    g = small_uniform
    gt = g.transpose()
    gtt = gt.transpose()
    # same multiset of (dst, src) edges
    def canon(gr):
        return sorted(zip(gr.dst_per_edge.tolist(), gr.indices.tolist()))

    assert canon(gtt) == canon(g)
    assert gt.num_edges == g.num_edges


def test_fixed_degree():
    g = fixed_degree_graph(50, 16, seed=3)
    assert g.num_edges == 800
    assert (g.degrees == 16).all()


def test_io_roundtrip(tmp_path, small_rmat):
    save_graph(str(tmp_path), "toy", small_rmat)
    g, rows = load_graph(str(tmp_path), "toy")
    np.testing.assert_array_equal(g.indptr, small_rmat.indptr)
    np.testing.assert_array_equal(g.indices, small_rmat.indices)
    assert rows is None
    # second load uses the npz cache
    assert (tmp_path / "toy.graph.npz").exists()
    g2, _ = load_graph(str(tmp_path), "toy")
    np.testing.assert_array_equal(g2.indices, g.indices)


def test_io_reorder(tmp_path, small_rmat):
    save_graph(str(tmp_path), "toy", small_rmat)
    rng = np.random.default_rng(5)
    perm = rng.permutation(small_rmat.num_nodes)
    save_reorder(str(tmp_path), "toy", "_test", perm)
    g, rows = load_graph(str(tmp_path), "toy", reorder_subfix="_test")
    np.testing.assert_array_equal(rows, perm)
    want = small_rmat.reorder(perm)
    np.testing.assert_array_equal(g.indptr, want.indptr)
    np.testing.assert_array_equal(g.indices, want.indices)


def test_gcn_norm_val(small_uniform):
    g = small_uniform
    v = g.gcn_norm_val()
    assert v.shape == (g.num_edges,)
    assert (v > 0).all() and np.isfinite(v).all()


@pytest.mark.parametrize("gen", [rmat_graph, uniform_graph])
def test_generators_deterministic(gen):
    g1 = gen(100, 500, seed=42)
    g2 = gen(100, 500, seed=42)
    np.testing.assert_array_equal(g1.indices, g2.indices)
    np.testing.assert_array_equal(g1.indptr, g2.indptr)


def test_plan_and_tile_cost_models():
    """utils.profiling analytic cost models (Fig8/Fig9 analog diagnostics)."""
    from gnn_computing_tpu.graph.synthetic import rmat_graph
    from gnn_computing_tpu.schedule import neighbor_grouping_plan
    from gnn_computing_tpu.schedule.tiles import densify
    from gnn_computing_tpu.utils.profiling import plan_cost, tile_cost

    g = rmat_graph(512, 4096, seed=1, with_val=False)
    plan = neighbor_grouping_plan(g, 16)
    c = plan_cost(plan, 64)
    assert c["valid_edges"] == g.num_edges
    assert 0 < c["slot_occupancy"] <= 1
    assert c["flops"] == 2 * g.num_edges * 64

    tp, _ = densify(g, tile_rows=64, tile_cols=64, threshold=4)
    t = tile_cost(tp, 64)
    assert t["edges_covered"] == tp.num_dense_edges
    assert t["a_bytes"] > 0 and t["bytes_per_edge"] > 0


def test_community_graph_stats_and_determinism():
    from gnn_computing_tpu.graph.synthetic import community_graph

    g1 = community_graph(3000, 90_000, seed=9, min_comm=256, max_comm=1024)
    g2 = community_graph(3000, 90_000, seed=9, min_comm=256, max_comm=1024)
    assert g1.num_nodes == 3000 and g1.num_edges == 90_000
    np.testing.assert_array_equal(g1.indptr, g2.indptr)
    np.testing.assert_array_equal(g1.indices, g2.indices)
    # symmetric half-edges: in-degree ~ out-degree per node
    out_deg = np.bincount(g1.indices, minlength=3000)
    assert abs(out_deg.sum() - g1.degrees.sum()) < 2


def test_label_propagation_recovers_planted_communities():
    """LPA reorder must make planted communities contiguous again after a
    random relabeling (the property the MXU tile path needs)."""
    from gnn_computing_tpu.graph.reorder import label_propagation_reorder
    from gnn_computing_tpu.graph.synthetic import community_graph

    n = 3000
    g = community_graph(
        n, 120_000, seed=11, min_comm=256, max_comm=1024,
        p_within=0.9, shuffle=False,
    )
    # planted community id per (unshuffled) node: reconstruct from sizes
    # by regenerating the size sequence
    rng = np.random.default_rng(11)
    sizes, covered = [], 0
    while covered < n:
        u = rng.random()
        s = int(256 * (1.0 - u) ** -0.8)
        s = min(s, 1024, n - covered)
        sizes.append(s)
        covered += s
    planted = np.repeat(np.arange(len(sizes)), sizes)

    shuffle = np.random.default_rng(5).permutation(n)
    gs = g.reorder(shuffle)  # scrambled ids
    perm = label_propagation_reorder(gs, degree_sort_within=False)
    # position of each scrambled vertex in the recovered order
    pos = np.empty(n, np.int64)
    pos[perm] = np.arange(n)
    # planted community of scrambled vertex v is planted[shuffle[v]]
    comm_of_scrambled = planted[shuffle]
    spans = []
    for c in range(len(sizes)):
        p = np.sort(pos[comm_of_scrambled == c])
        if len(p) < 10:
            continue
        # 90% of members inside a window <= 1.5x community size
        lo, hi = p[int(0.05 * len(p))], p[int(0.95 * len(p)) - 1]
        spans.append((hi - lo) / max(len(p), 1))
    assert np.median(spans) < 1.5, spans
