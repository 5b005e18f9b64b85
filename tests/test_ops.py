import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_computing_tpu.graph.synthetic import normal_features
from gnn_computing_tpu.ops import (
    spmm,
    spmm_xla,
    spmm_transpose_xla,
    sddmm,
    gat_aggregate,
    gat_split_forward,
    slots_from_edge_values,
    edge_values_from_slots,
)
from gnn_computing_tpu.ops import reference as ref
from gnn_computing_tpu.ops.validate import (
    assert_valid,
    valid,
    valid_reordered,
    relative_error_count,
)
from gnn_computing_tpu.schedule import (
    neighbor_grouping_plan,
    locality_plan,
    nop_plan,
)

PLANS = [
    lambda g: neighbor_grouping_plan(g, 8),
    lambda g: neighbor_grouping_plan(g, 32),
    lambda g: locality_plan(g, 4, 8),
    lambda g: locality_plan(g, 3, block_size=None),
    lambda g: nop_plan(g),
]


@pytest.mark.parametrize("mk", PLANS)
def test_spmm_matches_dense(small_rmat, mk):
    g = small_rmat
    plan = mk(g).device_put()
    h = normal_features(g.num_nodes, 16, seed=1)
    out = np.asarray(spmm_xla(plan, jnp.asarray(h)))
    want = ref.spmm_dense(g, h)
    assert_valid(out, want, what="spmm")


def test_spmm_jit_and_dispatch(small_rmat):
    g = small_rmat
    plan = neighbor_grouping_plan(g, 16).device_put()
    h = jnp.asarray(normal_features(g.num_nodes, 8, seed=2))
    out = jax.jit(lambda p, x: spmm(p, x))(plan, h)
    assert_valid(np.asarray(out), ref.spmm_dense(g, np.asarray(h)))


def test_spmm_transpose(small_uniform):
    g = small_uniform
    plan = neighbor_grouping_plan(g, 8).device_put()
    gout = normal_features(g.num_nodes, 8, seed=3)
    got = np.asarray(spmm_transpose_xla(plan, jnp.asarray(gout)))
    a = ref.dense_adjacency(g)
    want = a.T @ gout
    assert_valid(got, want, what="spmm_T")


def test_spmm_grad_matches_dense(small_uniform):
    g = small_uniform
    plan = neighbor_grouping_plan(g, 8).device_put()
    h = jnp.asarray(normal_features(g.num_nodes, 4, seed=4))

    def loss(h):
        return jnp.sum(spmm_xla(plan, h) ** 2)

    dh = np.asarray(jax.grad(loss)(h))
    a = ref.dense_adjacency(g)
    want = 2 * a.T @ (a @ np.asarray(h, np.float64))
    assert_valid(dh, want, what="dspmm/dh")


def test_spmm_val_override_grad(small_uniform):
    g = small_uniform
    plan = neighbor_grouping_plan(g, 8).device_put()
    h = jnp.asarray(normal_features(g.num_nodes, 4, seed=5))
    # device plans store val FLAT (lane-padding economics, plan.src_flat);
    # the public override layout is [nt, B]
    v0 = jnp.asarray(plan.val).reshape(
        plan.num_tasks_padded, plan.block_size
    )

    def loss(v):
        return jnp.sum(spmm_xla(plan, h, val=v) ** 2)

    dv = jax.grad(loss)(v0)
    # finite-difference spot check on a few valid slots
    rng = np.random.default_rng(0)
    f0 = float(loss(v0))
    for _ in range(5):
        t = int(rng.integers(0, plan.num_tasks))
        b = int(rng.integers(0, max(int(plan.count[t]), 1)))
        eps = 1e-3
        vp = v0.at[t, b].add(eps)
        fd = (float(loss(vp)) - f0) / eps
        assert abs(fd - float(dv[t, b])) < 2e-1 + 0.05 * abs(fd)


@pytest.mark.parametrize(
    "mk", [lambda g: neighbor_grouping_plan(g, 8), lambda g: locality_plan(g, 4, 8)]
)
def test_slot_edge_roundtrip(small_rmat, mk):
    g = small_rmat
    plan = mk(g).device_put()
    ev = jnp.asarray(np.random.default_rng(1).standard_normal(g.num_edges), jnp.float32)
    slots = slots_from_edge_values(plan, ev)
    back = edge_values_from_slots(plan, slots)
    np.testing.assert_allclose(np.asarray(back), np.asarray(ev), rtol=1e-6)


@pytest.mark.parametrize(
    "mk", [lambda g: neighbor_grouping_plan(g, 8), lambda g: locality_plan(g, 4, 8)]
)
def test_sddmm_matches_dense(small_rmat, mk):
    g = small_rmat
    plan = mk(g).device_put()
    a = normal_features(g.n_src, 8, seed=6)
    b = normal_features(g.num_nodes, 8, seed=7)
    got = np.asarray(sddmm(plan, jnp.asarray(a), jnp.asarray(b)))
    want = ref.sddmm_dense(g, a, b)
    assert_valid(got, want, what="sddmm")


@pytest.mark.parametrize("gdt", ["f16_split2"])
def test_sddmm_split2_gather_matches_dense(small_rmat, gdt):
    # the fast-exact source-gather mode (21-bit f16 residue table) must
    # pass the strict gate on SIGNED inputs.  Dots CANCEL: bf16_split2's
    # 16 bits measurably fail the gate on TPU (14/300k bad, N(0,1)
    # inputs) and are not a validated sddmm mode
    g = small_rmat
    plan = neighbor_grouping_plan(g, 8).device_put()
    a = normal_features(g.n_src, 8, seed=6)
    b = normal_features(g.num_nodes, 8, seed=7)
    got = np.asarray(
        sddmm(plan, jnp.asarray(a), jnp.asarray(b), gather_dtype=gdt)
    )
    want = ref.sddmm_dense(g, a, b)
    assert_valid(got, want, what=f"sddmm[{gdt}]")


@pytest.mark.parametrize("gdt", [None, "f16_split2"])
def test_sddmm_chunked_matches_unchunked(small_rmat, gdt):
    # the memory-bounded task-chunked form (used for full-edge-set SDDMM
    # at reddit scale, where the split2 reconstruct would otherwise
    # materialize a 30 GB intermediate) must agree slot-for-slot
    from gnn_computing_tpu.ops.spmm import (
        sddmm_slots_chunked,
        sddmm_slots_xla,
    )

    g = small_rmat
    plan = neighbor_grouping_plan(g, 8).device_put()
    a = jnp.asarray(normal_features(g.n_src, 8, seed=6))
    b = jnp.asarray(normal_features(g.num_nodes, 8, seed=7))
    whole = np.asarray(sddmm_slots_xla(plan, a, b, gather_dtype=gdt))
    chunked = np.asarray(
        sddmm_slots_chunked(plan, a, b, gather_dtype=gdt, chunk_tasks=37)
    )
    # fusion/association differs between the forms: tiny f32 noise only
    np.testing.assert_allclose(chunked, whole, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("gdt", [None, "f16_split2"])
def test_spmm_chunked_matches_unchunked(small_rmat, gdt):
    # huge plans (products scale) route through the task-chunked scan —
    # the unchunked gather materializes a 32 GB intermediate there
    from gnn_computing_tpu.ops.spmm import _resolve_val, _spmm_xla_chunked

    g = small_rmat
    plan = neighbor_grouping_plan(g, 8).device_put()
    h = jnp.asarray(normal_features(g.num_nodes, 8, seed=1))
    whole = np.asarray(spmm_xla(plan, h, gather_dtype=gdt))
    v = _resolve_val(plan, None)
    chunked = np.asarray(
        _spmm_xla_chunked(plan, h, v, gather_dtype=gdt, chunk_tasks=53)
    )
    np.testing.assert_allclose(chunked, whole, rtol=1e-4, atol=1e-6)


def test_gat_aggregate_matches_dense(small_rmat):
    g = small_rmat
    plan = neighbor_grouping_plan(g, 8).device_put()
    h = normal_features(g.num_nodes, 8, seed=8)
    att = normal_features(g.num_nodes, 2, seed=9) * 0.3
    got = np.asarray(
        gat_aggregate(plan, jnp.asarray(h), jnp.asarray(att))
    )
    want, _, _ = ref.gat_aggregate_dense(g, h, att[:, 0], att[:, 1])
    assert_valid(got, want, what="gat_fused")


def test_gat_stabilized_matches_naive(small_rmat):
    g = small_rmat
    plan = neighbor_grouping_plan(g, 8).device_put()
    h = jnp.asarray(normal_features(g.num_nodes, 8, seed=8))
    att = jnp.asarray(normal_features(g.num_nodes, 2, seed=9))
    a = np.asarray(gat_aggregate(plan, h, att, stabilize=False))
    b = np.asarray(gat_aggregate(plan, h, att, stabilize=True))
    assert_valid(a, b, what="gat stabilize")


@pytest.mark.parametrize("use_adapter", [False, True])
def test_gat_split_matches_fused(small_rmat, use_adapter):
    """Figure-10a parity: base / adapter / fused all agree."""
    g = small_rmat
    plan = neighbor_grouping_plan(g, 8).device_put()
    h = jnp.asarray(normal_features(g.num_nodes, 8, seed=10))
    att = jnp.asarray(normal_features(g.num_nodes, 2, seed=11) * 0.3)
    fused = np.asarray(gat_aggregate(plan, h, att))
    split = np.asarray(
        gat_split_forward(plan, h, att, use_adapter=use_adapter)
    )
    assert_valid(split, fused, what=f"gat split adapter={use_adapter}")


def test_gat_grad_finite(small_uniform):
    g = small_uniform
    plan = neighbor_grouping_plan(g, 8).device_put()
    h = jnp.asarray(normal_features(g.num_nodes, 4, seed=12))
    att = jnp.asarray(normal_features(g.num_nodes, 2, seed=13) * 0.1)

    def loss(h, att):
        return jnp.sum(gat_aggregate(plan, h, att, stabilize=True) ** 2)

    dh, datt = jax.grad(loss, argnums=(0, 1))(h, att)
    assert np.isfinite(np.asarray(dh)).all()
    assert np.isfinite(np.asarray(datt)).all()
    assert float(jnp.abs(datt).sum()) > 0


def test_validators():
    y = np.ones((4, 4))
    assert valid(y, y)
    y2 = y.copy()
    y2[0, 0] = 1.5
    assert relative_error_count(y2, y) == 1
    perm = np.array([1, 0, 2, 3])
    yref = np.arange(4, dtype=float)[:, None] * np.ones((1, 3))
    yre = yref[perm]
    assert valid_reordered(yre, yref, perm)


def test_spmm_gather_dtype_modes():
    """Residual gather dtype modes: f32 exact; bf16_split2 ~16-bit;
    f16/bf16 lossy but close (speed modes, see PERF_NOTES)."""
    import jax.numpy as jnp
    from gnn_computing_tpu.graph.synthetic import rmat_graph
    from gnn_computing_tpu.ops.reference import spmm_dense
    from gnn_computing_tpu.ops.spmm import spmm_xla
    from gnn_computing_tpu.schedule import neighbor_grouping_plan

    g = rmat_graph(300, 2500, seed=3, with_val=True)
    plan = neighbor_grouping_plan(g, 8).device_put()
    rng = np.random.default_rng(5)
    h = jnp.asarray(rng.normal(size=(300, 16)).astype(np.float32))
    want = spmm_dense(g, np.asarray(h))
    exact = np.asarray(spmm_xla(plan, h))
    np.testing.assert_allclose(exact, want, rtol=1e-5, atol=1e-5)
    s2 = np.asarray(spmm_xla(plan, h, gather_dtype="bf16_split2"))
    np.testing.assert_allclose(s2, want, rtol=1e-3, atol=1e-3)
    for dt, tol in [(jnp.float16, 2e-2), (jnp.bfloat16, 1e-1)]:
        lossy = np.asarray(spmm_xla(plan, h, gather_dtype=dt))
        np.testing.assert_allclose(lossy, want, rtol=tol, atol=tol)


def test_edge_mlp_chunked_matches_oracle():
    """edge_mlp_chunked (the reddit-scale scan form) == edge_mlp ==
    f64 oracle, including the u = h @ W redundancy-bypass refactor."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gnn_computing_tpu.graph.synthetic import normal_features, rmat_graph
    from gnn_computing_tpu.ops import reference as ref
    from gnn_computing_tpu.ops.edge_mlp import edge_mlp, edge_mlp_chunked
    from gnn_computing_tpu.ops.validate import assert_valid
    from gnn_computing_tpu.schedule import neighbor_grouping_plan

    g = rmat_graph(700, 9000, seed=9, with_val=False)
    plan = neighbor_grouping_plan(g, 8).device_put()
    h = normal_features(g.num_nodes, 16, seed=1) * 0.3
    w = normal_features(16, 16, seed=2) * 0.3
    want = ref.edge_mlp_dense(g, h, w)
    got = np.asarray(
        jax.jit(edge_mlp)(plan, jnp.asarray(h), jnp.asarray(w))
    )
    assert_valid(got, want, what="edge_mlp")
    got_c = np.asarray(
        jax.jit(
            lambda p, x, ww: edge_mlp_chunked(p, x, ww, chunk_tasks=256)
        )(plan, jnp.asarray(h), jnp.asarray(w))
    )
    assert_valid(got_c, want, what="edge_mlp_chunked")
