"""Mixed bitmask/int8 tile plans (tiles.split_bit_tiles): 0/1-only tiles
store 1 bit per cell — 8x less A traffic on the dominant dense-side HBM
cost (PERF_NOTES: A bytes 7.9 -> 2.8 GB at reddit scale).  Correctness:
the split parts must together reproduce the original plan exactly, through
both the XLA and (on TPU) Pallas kernels, forward and backward."""

import jax
import jax.numpy as jnp
import numpy as np

from gnn_computing_tpu.aggregator import Aggregator
from gnn_computing_tpu.graph.synthetic import normal_features, rmat_graph
from gnn_computing_tpu.ops import reference as ref
from gnn_computing_tpu.ops.validate import assert_valid
from gnn_computing_tpu.schedule.tiles import (
    densify,
    pack_bit_tiles,
    split_bit_tiles,
    unpack_bit_tiles,
)


def test_pack_unpack_roundtrip(rng):
    a = (rng.random((5, 16, 128)) < 0.2).astype(np.int8)
    packed = pack_bit_tiles(a)
    assert packed.shape == (5, 2, 128) and packed.dtype == np.uint8
    np.testing.assert_array_equal(unpack_bit_tiles(packed), a)


def test_split_preserves_edges():
    g = rmat_graph(3000, 60000, seed=11, with_val=False)  # multigraph
    tile, res = densify(g, tile_rows=64, tile_cols=128, threshold=4,
                        dtype=np.int8)
    bit_p, int_p = split_bit_tiles(tile)
    assert bit_p is not None and bit_p.bits
    total = 0
    dense = np.zeros((tile.num_row_tiles * 64, tile.num_col_tiles * 128),
                     np.int64)
    for p in (bit_p, int_p):
        if p is None:
            continue
        total += p.num_dense_edges
        a = unpack_bit_tiles(p.a) if p.bits else np.asarray(p.a)
        for t in range(p.num_tiles):
            r, c = int(p.tile_row[t]), int(p.tile_col[t])
            dense[r * 64:(r + 1) * 64, c * 128:(c + 1) * 128] += a[t]
    assert total == tile.num_dense_edges
    # compare against the unsplit plan's dense form
    dense0 = np.zeros_like(dense)
    a0 = np.asarray(tile.a)
    for t in range(tile.num_tiles):
        r, c = int(tile.tile_row[t]), int(tile.tile_col[t])
        dense0[r * 64:(r + 1) * 64, c * 128:(c + 1) * 128] += a0[t]
    np.testing.assert_array_equal(dense, dense0)
    if int_p is not None:
        assert unpack_bit_tiles(bit_p.a).max() <= 1
        multi_max = max(
            int(np.asarray(int_p.a)[t].max()) for t in range(int_p.num_tiles)
        )
        assert multi_max > 1


def test_hybrid_bit_tiles_matches_oracle():
    g = rmat_graph(2500, 50000, seed=3, with_val=False)
    h = normal_features(g.num_nodes, 32, seed=1) * 0.1
    agg = Aggregator.schedule_hybrid(
        g, tile_rows=64, tile_cols=128, threshold=4, residual_block=4,
        tile_dtype=np.int8, bit_tiles=True, with_transpose=False,
    )
    assert agg.tile_bits is not None
    out = np.asarray(jax.jit(lambda a, x: a.run(x))(agg, jnp.asarray(h)))
    assert_valid(out, ref.spmm_dense(g, h), what="hybrid bit tiles")


def test_hybrid_bit_tiles_equals_unsplit():
    g = rmat_graph(2500, 50000, seed=4, with_val=False)
    h = jnp.asarray(normal_features(g.num_nodes, 16, seed=2) * 0.1)
    kw = dict(tile_rows=64, tile_cols=128, threshold=4, residual_block=4,
              tile_dtype=np.int8, with_transpose=False)
    a0 = Aggregator.schedule_hybrid(g, bit_tiles=False, **kw)
    a1 = Aggregator.schedule_hybrid(g, bit_tiles=True, **kw)
    o0 = np.asarray(jax.jit(lambda a, x: a.run(x))(a0, h))
    o1 = np.asarray(jax.jit(lambda a, x: a.run(x))(a1, h))
    np.testing.assert_allclose(o0, o1, rtol=1e-5, atol=1e-6)


def test_hybrid_bit_tiles_backward():
    g = rmat_graph(1500, 20000, seed=6, with_val=False)
    h = jnp.asarray(normal_features(g.num_nodes, 16, seed=3) * 0.1)
    kw = dict(tile_rows=64, tile_cols=128, threshold=4, residual_block=4,
              tile_dtype=np.int8, with_transpose=True)
    a0 = Aggregator.schedule_hybrid(g, bit_tiles=False, **kw)
    a1 = Aggregator.schedule_hybrid(g, bit_tiles=True, **kw)
    # transposed bit part is UNPACKED to int8 below the Pallas bit-kernel's
    # minimum sublane tile (tile_rows 128 < 256 — see pallas_bcsr.supported)
    assert a1.tile_bits_t is not None and not a1.tile_bits_t.bits

    def loss(agg, x):
        return jnp.sum(agg.run(x) ** 2)

    g0 = np.asarray(jax.jit(jax.grad(loss, argnums=1))(a0, h))
    g1 = np.asarray(jax.jit(jax.grad(loss, argnums=1))(a1, h))
    np.testing.assert_allclose(g0, g1, rtol=1e-5, atol=1e-6)
    # and against the dense-oracle gradient: d/dh sum((A h)^2) = 2 A^T A h
    a_dense = ref.adjacency_dense(g) if hasattr(ref, "adjacency_dense") else None
    if a_dense is not None:
        expect = 2.0 * a_dense.T @ (a_dense @ np.asarray(h))
        assert_valid(g1, expect, what="hybrid bit tiles grad")


def test_transpose_restores_row_coverage():
    """Regression: a forward column-block with no tile becomes an
    UNCOVERED transposed row-block; the Pallas kernel leaves uncovered
    output blocks as uninitialized HBM garbage (found as a ~4% backward
    error at reddit scale).  transpose() must append zero filler tiles."""
    g = rmat_graph(3000, 40000, seed=13, with_val=False)
    tile, _ = densify(g, tile_rows=256, tile_cols=128, threshold=8,
                      dtype=np.int8)
    for p in [tile] + [q for q in split_bit_tiles(tile) if q is not None]:
        t = p.transpose()
        nrt_t = -(-t.num_nodes // t.tile_rows)
        covered = np.unique(np.asarray(t.tile_row))
        assert len(covered) == nrt_t, (len(covered), nrt_t)


def test_gat_hybrid_bit_tiles_matches_unsplit():
    g = rmat_graph(1500, 25000, seed=9, with_val=False)
    h = jnp.asarray(normal_features(g.num_nodes, 16, seed=5) * 0.1)
    att = jnp.asarray(normal_features(g.num_nodes, 2, seed=6) * 0.1)
    kw = dict(tile_rows=64, tile_cols=128, threshold=4, residual_block=4,
              tile_dtype=np.int8, with_transpose=False)
    a0 = Aggregator.schedule_hybrid(g, bit_tiles=False, **kw)
    a1 = Aggregator.schedule_hybrid(g, bit_tiles=True, **kw)
    o0 = np.asarray(jax.jit(lambda a, x, t: a.run_gat(x, t))(a0, h, att))
    o1 = np.asarray(jax.jit(lambda a, x, t: a.run_gat(x, t))(a1, h, att))
    np.testing.assert_allclose(o0, o1, rtol=1e-5, atol=1e-6)
