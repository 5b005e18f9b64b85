"""Native C++ host library: build, bind, and agree with numpy fallbacks."""

import os
import tempfile

import numpy as np
import pytest

from gnn_computing_tpu import native
from gnn_computing_tpu.graph.synthetic import rmat_graph
from gnn_computing_tpu.schedule.neighbor_grouping import chunk_runs

HAVE = native.available()
needs_native = pytest.mark.skipif(not HAVE, reason="no native toolchain")


@needs_native
def test_parse_ints_matches_python():
    with tempfile.NamedTemporaryFile("w", suffix=".graph", delete=False) as f:
        f.write("0 3 5\n7 1 2\n  9\t10 11\n")
        path = f.name
    try:
        arr = native.parse_ints(path)
        np.testing.assert_array_equal(
            arr, [0, 3, 5, 7, 1, 2, 9, 10, 11]
        )
    finally:
        os.unlink(path)


@needs_native
def test_ng_schedule_matches_numpy():
    g = rmat_graph(512, 8192, seed=1)
    for block in (4, 16, 33):
        start, count, dst = native.ng_schedule(g.indptr, block)
        s2, c2, d2, _ = chunk_runs(
            g.indptr[:-1].astype(np.int64),
            g.degrees.astype(np.int64),
            np.arange(g.num_nodes, dtype=np.int64),
            block,
        )
        np.testing.assert_array_equal(start, s2)
        np.testing.assert_array_equal(count, c2)
        np.testing.assert_array_equal(dst, d2)


@needs_native
def test_union_find_merge_semantics():
    # chain 0-1, 1-2 with cap 2: only the first merge lands
    pairs = np.array([[0, 1], [1, 2]], dtype=np.int64)
    root = native.union_find_merge(4, pairs, cap=2)
    assert root[0] == root[1]
    assert root[2] != root[0]
    assert root[3] == 3
    # cap 3 merges all three
    root = native.union_find_merge(4, pairs, cap=3)
    assert root[0] == root[1] == root[2]


@needs_native
def test_subgraph_compact_matches_filter():
    g = rmat_graph(256, 2048, seed=2)
    active = np.zeros(g.num_nodes, dtype=np.uint8)
    vertices = np.arange(0, g.num_nodes, 2, dtype=np.int32)  # evens active
    active[vertices] = 1
    renum = np.full(g.num_nodes, -1, dtype=np.int64)
    renum[vertices] = np.arange(len(vertices))
    src, dst, rowptr = native.subgraph_compact(
        vertices, g.indptr, g.indices, active, renum
    )
    # oracle
    want_src, want_dst = [], []
    for i, v in enumerate(vertices):
        row = g.indices[g.indptr[v] : g.indptr[v + 1]]
        row = row[active[row] == 1]
        want_src.extend(renum[row].tolist())
        want_dst.extend([i] * len(row))
    np.testing.assert_array_equal(src, want_src)
    np.testing.assert_array_equal(dst, want_dst)
    assert rowptr[-1] == len(want_src)


@needs_native
def test_subgraph_compact_cap():
    g = rmat_graph(256, 4096, seed=3)
    active = np.ones(g.num_nodes, dtype=np.uint8)
    vertices = np.arange(g.num_nodes, dtype=np.int32)
    renum = np.arange(g.num_nodes, dtype=np.int64)
    src, dst, rowptr = native.subgraph_compact(
        vertices, g.indptr, g.indices, active, renum, cap=4, seed=7
    )
    counts = np.diff(rowptr)
    assert (counts <= 4).all()
    # each kept edge exists in the original row
    for i in range(g.num_nodes):
        row = set(g.indices[g.indptr[i] : g.indptr[i + 1]].tolist())
        assert set(src[rowptr[i] : rowptr[i + 1]].tolist()) <= row


@needs_native
def test_expand_frontier():
    g = rmat_graph(128, 1024, seed=4)
    active = np.zeros(g.num_nodes, dtype=np.uint8)
    active[0] = 1
    new = native.expand_frontier(
        np.array([0], np.int32), g.indptr, g.indices, active
    )
    want = np.unique(g.indices[g.indptr[0] : g.indptr[1]])
    want = want[want != 0]
    np.testing.assert_array_equal(np.sort(new), want)
    assert (active[want] == 1).all()
