"""Unit tests for the fig8/fig9 harness math (VERDICT r4 #10 — the
benchmark harnesses had no tests; timing itself is chip-bound, but the
balance/coverage arithmetic is pure and testable)."""

import numpy as np

from gnn_computing_tpu.graph.synthetic import rmat_graph
from gnn_computing_tpu.graph.reorder import degree_sort
from gnn_computing_tpu.schedule import neighbor_grouping_plan, nop_plan
from gnn_computing_tpu.schedule.tiles import densify


def test_fig8_nop_occupancy_matches_analytic():
    """The 'base' schedule's slot occupancy IS the reference's imbalance
    figure: valid slots / issued slots == m / (n * max_degree) for the
    true nop (warp-per-row) grid."""
    g = rmat_graph(512, 4000, seed=2, with_val=False)
    plan = nop_plan(g)
    occ = plan.stats()["slot_occupancy"]
    # stats() occupancy = valid slots / (real tasks * block); nop tasks
    # cover exactly the nonzero-degree rows at block = max_degree
    want = g.num_edges / (plan.num_tasks * plan.block_size)
    assert abs(occ - want) < 1e-9
    assert plan.block_size == max(g.max_degree(), 1)
    nonzero_rows = int((np.diff(np.asarray(g.indptr)) > 0).sum())
    assert plan.num_tasks == nonzero_rows
    # balanced bound: occupancy <= 1, so balanced = actual * occ <= actual
    assert 0.0 < occ <= 1.0


def test_fig8_base_plan_block_cap():
    from benchmarks.fig8_balance import base_plan

    g = rmat_graph(512, 4000, seed=2, with_val=False)
    quick = base_plan(g, True)
    assert quick.block_size == max(g.max_degree(), 1)
    capped = base_plan(g, False)
    assert capped.block_size == min(max(g.max_degree(), 1), 128)
    # every edge still scheduled exactly once
    assert capped.num_edges == g.num_edges


def test_fig8_ng_occupancy_beats_nop():
    """NG's whole point (graph_schedule.h:91-154): equal-work groups ->
    higher slot occupancy than warp-per-row on a skewed graph."""
    g = rmat_graph(512, 8000, seed=3, with_val=False)
    occ_nop = nop_plan(g).stats()["slot_occupancy"]
    occ_ng = neighbor_grouping_plan(g, 8).stats()["slot_occupancy"]
    assert occ_ng > occ_nop


def test_fig9_coverage_accounting():
    """dense_coverage + residual fraction == 1 (edge conservation), and
    the degree reorder must not change the edge total."""
    g = rmat_graph(1024, 20000, seed=4, with_val=False)
    g2 = g.reorder(degree_sort(g))
    assert g2.num_edges == g.num_edges
    tp, res = densify(g2, tile_rows=256, tile_cols=128, threshold=8)
    cov = tp.num_dense_edges / g2.num_edges
    assert 0.0 <= cov <= 1.0
    assert tp.num_dense_edges + res.num_edges == g2.num_edges
    # reorder permutes edges but conserves per-plan accounting too
    tp0, res0 = densify(g, tile_rows=256, tile_cols=128, threshold=8)
    assert tp0.num_dense_edges + res0.num_edges == g.num_edges
