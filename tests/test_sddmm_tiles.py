"""Tile-dense SDDMM (ops/bcsr_sddmm.py) vs dense oracles.

Validates the per-cell output layout: for every tile cell with count > 0
the value must equal <a[src], b[dst]> (duplicate edges share the cell);
cells with no edge must be exactly 0.  Residual slots validated through
the existing slot-gather path, and the combined hybrid output must cover
every edge exactly once (cells for dense edges, slots for the rest).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gnn_computing_tpu.graph import rmat_graph
from gnn_computing_tpu.graph.synthetic import normal_features
from gnn_computing_tpu.ops import reference as ref
from gnn_computing_tpu.ops.bcsr_sddmm import (
    hybrid_sddmm,
    sddmm_bcsr,
    tileplan_with_values,
)
from gnn_computing_tpu.ops.spmm import edge_values_from_slots
from gnn_computing_tpu.ops.validate import assert_valid
from gnn_computing_tpu.schedule import Schedule, make_plan
from gnn_computing_tpu.schedule.tiles import densify, split_bit_tiles


def dense_cell_oracle(tp, a, b):
    """Expected [T, tr, tc] cell values from the f64 dense score matrix."""
    s = np.asarray(b, np.float64) @ np.asarray(a, np.float64).T  # [n, n]
    tr, tc = tp.tile_rows, tp.tile_cols
    cnt = np.asarray(tp.unpack_bits().a)
    out = np.zeros_like(cnt, dtype=np.float64)
    for t in range(tp.num_tiles):
        r0 = int(tp.tile_row[t]) * tr
        c0 = int(tp.tile_col[t]) * tc
        blk = np.zeros((tr, tc))
        rows = min(tr, s.shape[0] - r0)
        cols = min(tc, s.shape[1] - c0)
        if rows > 0 and cols > 0:
            blk[:rows, :cols] = s[r0 : r0 + rows, c0 : c0 + cols]
        out[t] = np.where(cnt[t] > 0, blk, 0.0)
    return out


@pytest.fixture(scope="module")
def setup():
    g = rmat_graph(600, 20000, seed=3, with_val=False)
    tp, res = densify(
        g, tile_rows=16, tile_cols=128, threshold=4, dtype=np.int8
    )
    plan = make_plan(res, Schedule.neighbor_grouping, block_size=8)
    f = 16
    a = normal_features(g.num_nodes, f, seed=1)
    b = normal_features(g.num_nodes, f, seed=2)
    return g, tp, res, plan, a, b


def test_cells_match_dense_oracle(setup):
    g, tp, res, plan, a, b = setup
    assert tp.num_dense_edges > 0 and res.num_edges > 0
    cells = np.asarray(
        sddmm_bcsr(tp, jnp.asarray(a), jnp.asarray(b), strategy="xla",
                   out_dtype=jnp.float32)
    )
    want = dense_cell_oracle(tp, a, b)
    assert_valid(cells, want, what="sddmm cells")
    # empty cells must be exactly zero
    cnt = np.asarray(tp.a)
    assert np.all(cells[cnt == 0] == 0.0)


def test_bit_part_cells(setup):
    g, tp, res, plan, a, b = setup
    bit_p, int_p = split_bit_tiles(tp)
    checked = 0
    for p in (bit_p, int_p):
        if p is None or not p.num_tiles:
            continue
        cells = np.asarray(
            sddmm_bcsr(p, jnp.asarray(a), jnp.asarray(b), strategy="xla",
                       out_dtype=jnp.float32)
        )
        assert_valid(
            cells, dense_cell_oracle(p, a, b), what="sddmm bit cells"
        )
        checked += 1
    assert checked


def test_hybrid_covers_every_edge(setup):
    g, tp, res, plan, a, b = setup
    cells, slots = hybrid_sddmm(
        tp, plan, jnp.asarray(a), jnp.asarray(b), strategy="xla",
        out_dtype=jnp.float32,
    )
    # residual slots -> per-edge values of the residual graph
    edge_vals = np.asarray(edge_values_from_slots(plan, slots))
    want = ref.sddmm_dense(res, a, b)
    assert_valid(edge_vals, want, what="sddmm residual edges")
    # edge accounting: dense + residual = all edges
    assert tp.num_dense_edges + res.num_edges == g.num_edges


def test_updateval_chain(setup):
    """SDDMM cells -> weighted TilePlan -> SpMM == dense (S*A) @ h —
    the reference's SDDMM -> updateval -> weighted-run chain."""
    from gnn_computing_tpu.ops.bcsr import bcsr_spmm

    g, tp, res, plan, a, b = setup
    cells = sddmm_bcsr(
        tp, jnp.asarray(a), jnp.asarray(b), strategy="xla",
        out_dtype=jnp.float32,
    )
    wtp = tileplan_with_values(tp, cells)
    h = normal_features(g.num_nodes, 8, seed=5)
    got = np.asarray(bcsr_spmm(wtp, jnp.asarray(h), strategy="xla"))
    # oracle: dense-edge-only weighted aggregation
    adj = ref.dense_adjacency(g) - ref.dense_adjacency(res)
    s = np.asarray(b, np.float64) @ np.asarray(a, np.float64).T
    want = (adj * s) @ np.asarray(h, np.float64)
    assert_valid(got, want, what="sddmm updateval spmm")
