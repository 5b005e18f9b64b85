"""Reference-faithful exact-Jaccard clustering (cluster2.py:108-153
semantics: exact-Jaccard-ranked PQ agglomeration, lazy root re-enqueue,
cluster-size cap) — native gs_jaccard_cluster + cluster_reorder_exact."""

import numpy as np

from gnn_computing_tpu import native
from gnn_computing_tpu.graph.csr import CSRGraph
from gnn_computing_tpu.graph.reorder import cluster_reorder_exact
from gnn_computing_tpu.graph.synthetic import rmat_graph


def test_jaccard_cluster_merges_duplicates():
    if not native.available():
        import pytest

        pytest.skip("native lib unavailable")
    # 3 groups of near-identical rows + isolated vertices
    rows = {
        0: [10, 11, 12, 13],
        1: [10, 11, 12, 13],
        2: [10, 11, 12, 14],
        3: [20, 21],
        4: [20, 21],
        5: [30],
        6: [],
        7: [40, 41, 42],
    }
    n = 50
    dst = np.concatenate(
        [np.full(len(v), k, np.int64) for k, v in rows.items()]
    )
    src = np.concatenate([np.asarray(v, np.int32) for v in rows.values()])
    g = CSRGraph.from_edges(dst, src, n)
    pairs = np.array([[0, 1], [1, 2], [3, 4], [5, 7], [0, 3]], np.int64)
    root = native.jaccard_cluster(g.indptr, g.indices, pairs, cap=64)
    assert root is not None
    # identical rows merge; transitive closure via re-enqueue puts 2 with
    # 0/1 (J(0,2) = 0.6 > J(0,3) = 0)
    assert root[0] == root[1] == root[2]
    assert root[3] == root[4]
    # reference semantics: NO similarity threshold in the merge loop —
    # J=0 pairs merge too (they just pop last), so root[0] may equal
    # root[3] via the explicit (0, 3) candidate


def test_jaccard_cluster_respects_cap():
    if not native.available():
        import pytest

        pytest.skip("native lib unavailable")
    # 10 identical rows, cap 4: no cluster may exceed ~2*cap-1 members
    # (reference semantics: merge first, retire at >= cap)
    n = 20
    dst = np.repeat(np.arange(10, dtype=np.int64), 3)
    src = np.tile(np.array([15, 16, 17], np.int32), 10)
    g = CSRGraph.from_edges(dst, src, n)
    pairs = np.array(
        [[i, j] for i in range(10) for j in range(i + 1, 10)], np.int64
    )
    root = native.jaccard_cluster(g.indptr, g.indices, pairs, cap=4)
    sizes = np.bincount(root[:10])
    assert sizes.max() <= 7  # merge of two (cap-1) clusters then retire


def test_cluster_reorder_exact_is_permutation():
    g = rmat_graph(2000, 30000, seed=5, with_val=False)
    perm = cluster_reorder_exact(g, num_perm=32, bands=8)
    if perm is None:
        import pytest

        pytest.skip("native lib unavailable")
    assert sorted(perm.tolist()) == list(range(g.num_nodes))


def test_exact_groups_near_duplicate_rows_contiguously():
    # block graph: vertices within a block share the SAME neighbor set ->
    # exact Jaccard 1.0; the reorder must make blocks contiguous
    rng = np.random.default_rng(3)
    n, blocks, per = 512, 16, 8
    dst, src = [], []
    ids = rng.permutation(n)[: blocks * per].reshape(blocks, per)
    for b in range(blocks):
        nbrs = rng.choice(n, 12, replace=False)
        for v in ids[b]:
            dst.append(np.full(12, v, np.int64))
            src.append(nbrs.astype(np.int32))
    g = CSRGraph.from_edges(
        np.concatenate(dst), np.concatenate(src), n
    )
    perm = cluster_reorder_exact(g, num_perm=64, bands=16, max_cluster=per)
    if perm is None:
        import pytest

        pytest.skip("native lib unavailable")
    pos = np.empty(n, np.int64)
    pos[perm] = np.arange(n)
    spread = 0
    for b in range(blocks):
        p = np.sort(pos[ids[b]])
        spread += int(p[-1] - p[0])
    # perfectly contiguous blocks give spread = blocks*(per-1); allow 2x
    assert spread <= 2 * blocks * (per - 1), spread
