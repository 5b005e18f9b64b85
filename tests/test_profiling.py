"""Measured per-phase profiling API (reference O6 analog: per-block clocks,
aggr_gcn.h:116-248 / Figure8/main.cu:81-201).  Functional coverage on CPU —
the numbers are only meaningful on the real chip, but the API must run
everywhere the bench suite does."""

import jax.numpy as jnp

from gnn_computing_tpu.aggregator import Aggregator
from gnn_computing_tpu.graph.synthetic import normal_features, rmat_graph
from gnn_computing_tpu.utils.profiling import decompose, plan_cost, tile_cost


def _agg(n=2000, m=30000):
    g = rmat_graph(n, m, seed=5)
    return g, Aggregator.schedule_hybrid(
        g, tile_rows=64, tile_cols=128, threshold=8, residual_block=4,
        with_transpose=False,
    )


def test_decompose_gcn_phases():
    g, agg = _agg()
    h = jnp.asarray(normal_features(g.num_nodes, 32, seed=1) * 0.1)
    out = decompose(agg, h, iters=2, reps=2)
    for phase in ("dense", "residual", "residual_floor", "transform",
                  "total"):
        assert phase in out, phase
        assert out[phase]["ms"] >= 0.0
        assert isinstance(out[phase]["noise_floor"], bool)
    ana = out["analytic"]
    assert sum(t["num_tiles"] for t in ana["tile"]) == sum(
        p.num_tiles for p in agg.tile_parts()
    )
    assert ana["plan"]["valid_edges"] == agg.plan.num_edges


def test_decompose_gat_phases():
    g, agg = _agg()
    h = jnp.asarray(normal_features(g.num_nodes, 32, seed=1) * 0.1)
    att = jnp.asarray(normal_features(g.num_nodes, 2, seed=2) * 0.1)
    out = decompose(agg, h, model="gat", att=att, iters=2, reps=2)
    assert "dense" in out and "residual" in out
    assert out["dense"]["ms"] >= 0.0


def test_analytic_costs_consistent():
    g, agg = _agg()
    pc = plan_cost(agg.plan, 32)
    assert pc["valid_edges"] == agg.plan.num_edges
    assert pc["slots_issued"] >= pc["valid_edges"]
    tc = tile_cost(agg.tile, 32)
    assert tc["edges_covered"] == agg.tile.num_dense_edges
    assert tc["a_bytes"] > 0
