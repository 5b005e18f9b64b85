import numpy as np
import pytest

from gnn_computing_tpu.schedule import (
    Schedule,
    make_plan,
    neighbor_grouping_plan,
    locality_plan,
    nop_plan,
)


def reconstruct_edges(plan):
    """Expand a plan back to a (dst, src, val) edge multiset."""
    out = []
    for t in range(plan.num_tasks):
        c = int(plan.count[t])
        for b in range(c):
            out.append(
                (
                    int(plan.dst[t]),
                    int(plan.src[t, b]),
                    float(plan.val[t, b]) if plan.val is not None else 1.0,
                )
            )
    return sorted(out)


def graph_edges(g):
    val = g.val if g.val is not None else np.ones(g.num_edges, np.float32)
    return sorted(
        zip(
            g.dst_per_edge.tolist(),
            g.indices.tolist(),
            np.asarray(val, float).tolist(),
        )
    )


@pytest.mark.parametrize("block", [4, 16, 32])
def test_ng_preserves_edges(small_rmat, block):
    plan = neighbor_grouping_plan(small_rmat, block)
    assert reconstruct_edges(plan) == pytest.approx(graph_edges(small_rmat))
    # every task fits the cap and rows with degree > B are split
    counts = plan.count[: plan.num_tasks]
    assert counts.max() <= block
    assert counts.min() >= 1
    # group count per row matches reference formula ceil(deg/B)
    deg = small_rmat.degrees
    want_tasks = int(np.ceil(deg[deg > 0] / block).sum())
    assert plan.num_tasks == want_tasks
    assert plan.sorted_by_dst


@pytest.mark.parametrize("parts,block", [(4, 8), (7, 32), (1, 16)])
def test_locality_preserves_edges(small_rmat, parts, block):
    plan = locality_plan(small_rmat, parts, block)
    assert reconstruct_edges(plan) == pytest.approx(graph_edges(small_rmat))
    # tasks are partition-major: sources of tasks in partition p fall in its
    # range (graph_schedule.h:24-37 semantics)
    width = max(small_rmat.n_src // parts, 1)
    for p in range(plan.num_partitions):
        lo, hi = plan.partition_starts[p], plan.partition_starts[p + 1]
        for t in range(lo, min(hi, plan.num_tasks)):
            c = int(plan.count[t])
            srcs = plan.src[t, :c]
            pid = np.minimum(srcs // width, parts - 1)
            assert (pid == p).all()


def test_locality_pure_las(small_rmat):
    # block_size=None -> one task per (partition, row) run
    plan = locality_plan(small_rmat, 4, block_size=None)
    assert reconstruct_edges(plan) == pytest.approx(graph_edges(small_rmat))


def test_nop_plan(small_uniform):
    plan = nop_plan(small_uniform)
    deg = small_uniform.degrees
    assert plan.num_tasks == int((deg > 0).sum())
    assert plan.block_size == deg.max()


def test_edge_perm_valid(small_rmat):
    plan = locality_plan(small_rmat, 4, 16)
    perm = plan.edge_perm
    assert sorted(perm.tolist()) == list(range(small_rmat.num_edges))


def test_make_plan_dispatch(small_rmat):
    for sched, kw in [
        (Schedule.neighbor_grouping, dict(block_size=8)),
        (Schedule.locality, dict(num_partitions=4)),
        (Schedule.locality_neighbor_grouping, dict(num_partitions=4, block_size=8)),
        (Schedule.nop, dict()),
    ]:
        plan = make_plan(small_rmat, sched, **kw)
        assert reconstruct_edges(plan) == pytest.approx(
            graph_edges(small_rmat)
        )


def test_stats(small_rmat):
    plan = neighbor_grouping_plan(small_rmat, 16)
    s = plan.stats()
    assert s["num_edges"] == small_rmat.num_edges
    assert 0 < s["slot_occupancy"] <= 1.0
    assert s["max_task"] <= 16


def test_autotune_picks_a_schedule():
    """utils.autotune sweeps gather + hybrid configs and returns a working
    Aggregator (the reference's external --nei sweep as a first-class API)."""
    import jax.numpy as jnp
    from gnn_computing_tpu.graph.synthetic import rmat_graph
    from gnn_computing_tpu.ops.reference import spmm_dense
    from gnn_computing_tpu.ops.validate import assert_valid
    from gnn_computing_tpu.utils.autotune import tune

    g = rmat_graph(512, 4096, seed=11, with_val=False)
    r = tune(g, feature_len=16, iters=2)
    assert r.best_config["strategy"] in ("gather", "hybrid")
    assert len(r.table) >= 4
    import numpy as np

    h = jnp.asarray(
        np.random.default_rng(1).normal(size=(512, 16)).astype(np.float32)
    )
    assert_valid(np.asarray(r.best.run(h)), spmm_dense(g, h), what="tuned agg")
