"""All-gather hybrid distribution (parallel/allgather_tiles.py): full
single-chip kernel reuse behind one collective.  Correctness vs the dense
oracle at small scale, vs the single-chip hybrid at >=1M edges (the
VERDICT-mandated beyond-toy scale), and a plan-build time budget."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_computing_tpu.graph.synthetic import normal_features, rmat_graph
from gnn_computing_tpu.ops import reference as ref
from gnn_computing_tpu.ops.validate import assert_valid
from gnn_computing_tpu.parallel.allgather_tiles import (
    allgather_hybrid_gcn_forward,
    allgather_hybrid_spmm,
    build_allgather_hybrid,
)
from gnn_computing_tpu.parallel.mesh import make_mesh, shard_ring_plan, shard_rows


def _shard(mesh, plan, h):
    plan = plan.device_put(shard_ring_plan(mesh))
    hs = jax.device_put(jnp.asarray(h), shard_rows(mesh))
    return plan, hs


@pytest.mark.parametrize("d", [2, 8])
def test_allgather_hybrid_matches_dense(d):
    g = rmat_graph(3000, 60000, seed=7, with_val=False)
    plan, gp = build_allgather_hybrid(
        g, d, tile_rows=64, tile_cols=128, threshold=4, residual_block=4,
    )
    h = np.zeros((gp.num_nodes, 16), np.float32)
    h[: g.num_nodes] = normal_features(g.num_nodes, 16, seed=1) * 0.1
    mesh = make_mesh(num_graph=d)
    plan, hs = _shard(mesh, plan, h)
    out = np.asarray(
        jax.jit(lambda p, x: allgather_hybrid_spmm(mesh, p, x))(plan, hs)
    )
    assert_valid(
        out[: g.num_nodes],
        ref.spmm_dense(g, h[: g.num_nodes]),
        what="allgather hybrid spmm",
    )


def test_allgather_bit_tiles_groups():
    g = rmat_graph(3000, 80000, seed=9, with_val=False)  # multigraph
    plan, gp = build_allgather_hybrid(
        g, 4, tile_rows=64, tile_cols=128, threshold=4, bit_tiles=True,
    )
    assert any(grp.bits for grp in plan.groups)
    h = np.zeros((gp.num_nodes, 32), np.float32)
    h[: g.num_nodes] = normal_features(g.num_nodes, 32, seed=2) * 0.1
    mesh = make_mesh(num_graph=4)
    plan, hs = _shard(mesh, plan, h)
    out = np.asarray(allgather_hybrid_spmm(mesh, plan, hs))
    assert_valid(
        out[: g.num_nodes],
        ref.spmm_dense(g, h[: g.num_nodes]),
        what="allgather bit tiles",
    )


def test_allgather_gcn_forward():
    g = rmat_graph(2000, 40000, seed=3, with_val=False)
    plan, gp = build_allgather_hybrid(
        g, 8, tile_rows=64, tile_cols=128, threshold=4,
    )
    mesh = make_mesh(num_graph=8)
    dims = (16, 16, 8)
    key = jax.random.key(0)
    params = []
    for i in range(len(dims) - 1):
        key, sub = jax.random.split(key)
        params.append(
            jax.random.normal(sub, (dims[i], dims[i + 1]), jnp.float32) * 0.2
        )
    h = np.zeros((gp.num_nodes, dims[0]), np.float32)
    h[: g.num_nodes] = normal_features(g.num_nodes, dims[0], seed=5) * 0.1
    plan, hs = _shard(mesh, plan, h)
    out = np.asarray(
        jax.jit(
            lambda p, ps, x: allgather_hybrid_gcn_forward(mesh, p, ps, x)
        )(plan, params, hs)
    )
    # single-process oracle: same math sequentially
    hh = np.asarray(h[: g.num_nodes], np.float64)
    for i, w in enumerate(params):
        z = hh @ np.asarray(w, np.float64)
        z = ref.spmm_dense(g, z)
        hh = np.maximum(z, 0.0) if i < len(params) - 1 else z
    assert_valid(out[: g.num_nodes], hh, what="allgather gcn forward")


def test_allgather_million_edge_scale():
    """Beyond-toy distributed correctness (arxiv scale: 1.2M edges) +
    plan-build time budget.  Oracle = the single-chip hybrid aggregator
    (itself oracle-validated at small scale)."""
    from gnn_computing_tpu.aggregator import Aggregator

    n, m = 169_343, 1_166_243  # ogbn-arxiv scale (util.py:24/:88)
    g = rmat_graph(n, m, seed=11, with_val=False)
    t0 = time.process_time()
    plan, gp = build_allgather_hybrid(
        g, 8, tile_rows=256, tile_cols=128, threshold=16,
        residual_block=4, pack=8,
    )
    build_s = time.process_time() - t0
    # Guard against quadratic plan-build blowup (the ring form's failure
    # mode), not absolute speed.  CPU time, not wall time: concurrent
    # host load inflated the wall measurement 2.5x (152s vs ~60s clean),
    # and a wall budget loose enough to absorb that would also pass a
    # real 2-4x regression.  process_time is contention-immune, so the
    # budget can sit at ~2.5x the clean build.
    assert build_s < 150.0, f"plan build took {build_s:.0f}s CPU (budget 150)"
    mesh = make_mesh(num_graph=8)
    f = 32
    h = np.zeros((gp.num_nodes, f), np.float32)
    h[:n] = normal_features(n, f, seed=6) * 0.1
    plan, hs = _shard(mesh, plan, h)
    out = np.asarray(allgather_hybrid_spmm(mesh, plan, hs))

    single = Aggregator.schedule_hybrid(
        g, tile_rows=256, tile_cols=128, threshold=16, residual_block=4,
        tile_dtype=np.int8, bit_tiles=True, with_transpose=False,
    )
    expect = np.asarray(
        jax.jit(lambda a, x: a.run(x))(single, jnp.asarray(h[:n]))
    )
    np.testing.assert_allclose(
        out[:n], expect, rtol=2e-3, atol=1e-5
    )
