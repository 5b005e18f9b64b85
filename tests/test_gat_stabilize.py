"""Stabilized hybrid GAT: one shared per-destination softmax shift over
tiles + residual (ops.bcsr_gat._hybrid_row_shift) removes the overflow of
the reference's un-stabilized form (aggr_gat.h:116-164) without breaking
denominator merging — the shift cancels in num/den."""

import jax
import jax.numpy as jnp
import numpy as np

from gnn_computing_tpu.aggregator import Aggregator
from gnn_computing_tpu.graph.synthetic import normal_features, rmat_graph
from gnn_computing_tpu.ops import reference as ref
from gnn_computing_tpu.ops.validate import assert_valid


def _setup(att_scale):
    g = rmat_graph(2000, 30000, seed=21, with_val=False)
    h = jnp.asarray(normal_features(g.num_nodes, 16, seed=1) * 0.1)
    att = jnp.asarray(
        normal_features(g.num_nodes, 2, seed=2) * att_scale
    )
    agg = Aggregator.schedule_hybrid(
        g, tile_rows=64, tile_cols=128, threshold=4, residual_block=4,
        tile_dtype=np.int8, bit_tiles=True, with_transpose=True,
    )
    return g, h, att, agg


def test_stabilized_matches_unstabilized_small_logits():
    g, h, att, agg = _setup(0.1)
    o0 = np.asarray(jax.jit(lambda a, x, t: a.run_gat(x, t))(agg, h, att))
    o1 = np.asarray(
        jax.jit(lambda a, x, t: a.run_gat(x, t, stabilize=True))(agg, h, att)
    )
    np.testing.assert_allclose(o0, o1, rtol=1e-4, atol=1e-6)


def test_stabilized_wide_logits_finite_and_correct():
    # |z| ~ 30: exp(30)^3-layer products overflow f32 un-stabilized
    g, h, att, agg = _setup(15.0)
    o1 = np.asarray(
        jax.jit(lambda a, x, t: a.run_gat(x, t, stabilize=True))(agg, h, att)
    )
    assert np.isfinite(o1).all()
    expect = ref.gat_aggregate_dense(
        g, np.asarray(h), np.asarray(att[:, 0]), np.asarray(att[:, 1])
    )[0]
    assert_valid(o1, expect, what="stabilized hybrid GAT wide logits")


def test_stabilized_grad_finite():
    g, h, att, agg = _setup(15.0)

    def loss(x, t):
        return jnp.sum(agg.run_gat(x, t, stabilize=True) ** 2)

    dh, datt = jax.jit(jax.grad(loss, argnums=(0, 1)))(h, att)
    assert np.isfinite(np.asarray(dh)).all()
    assert np.isfinite(np.asarray(datt)).all()


def test_residual_only_stabilized_wide_logits():
    # pure gather aggregator (no tiles): the pre-existing stabilize path
    g = rmat_graph(1500, 15000, seed=4, with_val=False)
    h = jnp.asarray(normal_features(g.num_nodes, 8, seed=3) * 0.1)
    att = jnp.asarray(normal_features(g.num_nodes, 2, seed=5) * 15.0)
    agg = Aggregator.schedule(g, with_transpose=False, device_put=False)
    out = np.asarray(
        jax.jit(lambda a, x, t: a.run_gat(x, t, stabilize=True))(agg, h, att)
    )
    assert np.isfinite(out).all()
    expect = ref.gat_aggregate_dense(
        g, np.asarray(h), np.asarray(att[:, 0]), np.asarray(att[:, 1])
    )[0]
    assert_valid(out, expect, what="stabilized gather GAT wide logits")


def test_bound_shift_matches_exact_rowmax():
    """stabilize='bound' (O(n) global-bound shift — no A-stream) must
    match stabilize=True (exact per-destination rowmax) and the f64
    oracle, including at wide logits where the unstabilized form
    overflows."""
    for att_scale in (0.1, 15.0):
        g, h, att, agg = _setup(att_scale)
        o_exact = np.asarray(
            jax.jit(lambda a, x, t: a.run_gat(x, t, stabilize=True))(
                agg, h, att
            )
        )
        o_bound = np.asarray(
            jax.jit(lambda a, x, t: a.run_gat(x, t, stabilize="bound"))(
                agg, h, att
            )
        )
        assert np.isfinite(o_bound).all()
        np.testing.assert_allclose(o_exact, o_bound, rtol=1e-4, atol=1e-6)
        want, _, _ = ref.gat_aggregate_dense(
            g, np.asarray(h, np.float64), np.asarray(att[:, 0]),
            np.asarray(att[:, 1]),
        )
        assert_valid(o_bound, want, what=f"bound shift (scale {att_scale})")


def test_bound_shift_grad_matches_exact():
    g, h, att, agg = _setup(0.5)
    ct = jnp.asarray(normal_features(g.num_nodes, 16, seed=5) * 0.1)

    def loss(mode, x, t):
        return jnp.sum(agg.run_gat(x, t, stabilize=mode) * ct)

    gh_e, ga_e = jax.grad(lambda x, t: loss(True, x, t), (0, 1))(h, att)
    gh_b, ga_b = jax.grad(
        lambda x, t: loss("bound", x, t), (0, 1)
    )(h, att)
    np.testing.assert_allclose(
        np.asarray(gh_e), np.asarray(gh_b), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ga_e), np.asarray(ga_b), rtol=1e-4, atol=1e-5
    )
