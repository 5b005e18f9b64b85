"""Pallas BCSR aggregation kernel (scalar-prefetch block-sparse matmul).

One grid step per dense adjacency tile: the A tile ([TS, TS]) and the H tile
it selects ([TS, f], chosen by the prefetched ``tile_col`` scalars) stream
through VMEM double-buffered by the Pallas pipeline; the output tile (chosen
by ``tile_row``) stays VMEM-resident across the consecutive run of tiles
sharing a destination tile-row (tiles are sorted by row; the kernel zeroes
the accumulator at each run start).  No HBM intermediates at all — the XLA
strategy's [chunk, TS, f] gather/product buffers disappear.

This kernel plays the role of the reference's fused scheduled aggregation
kernels (aggr_gcn.h:78-114): tile == neighbor group, VMEM accumulator ==
shared-memory staging, run-boundary zeroing == the memset before atomicAdd
accumulation — but the inner loop is a systolic-array matmul instead of
warp-level gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gnn_computing_tpu.schedule.tiles import TilePlan

_PALLAS_OK = None


def _tpu_available() -> bool:
    global _PALLAS_OK
    if _PALLAS_OK is None:
        try:
            d = jax.devices()[0]
            _PALLAS_OK = "TPU" in (getattr(d, "device_kind", "") or "") or (
                d.platform in ("tpu",)
            )
        except Exception:  # pragma: no cover - no backend at all
            _PALLAS_OK = False
    return _PALLAS_OK


def supported(tp: TilePlan, h) -> bool:
    return (
        _tpu_available()
        and h.ndim == 2
        and tp.tile_size % 8 == 0
        and h.shape[-1] >= 8
    )


def preferred(tp: TilePlan, h) -> bool:
    return supported(tp, h)


def bcsr_spmm_pallas(tp: TilePlan, h: jnp.ndarray) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ts = tp.tile_size
    f = h.shape[-1]
    nct, nrt = tp.num_col_tiles, tp.num_row_tiles
    n_pad = nct * ts
    if h.shape[0] != n_pad:
        h = jnp.pad(h, ((0, n_pad - h.shape[0]), (0, 0)))

    a = jnp.asarray(tp.a)
    num_t = a.shape[0]
    row = jnp.asarray(tp.tile_row)
    col = jnp.asarray(tp.tile_col)

    def kernel(row_ref, col_ref, a_ref, h_ref, o_ref):
        i = pl.program_id(0)
        prev = row_ref[jnp.maximum(i - 1, 0)]

        @pl.when((i == 0) | (row_ref[i] != prev))
        def _zero():
            o_ref[...] = jnp.zeros_like(o_ref)

        o_ref[...] += jnp.dot(
            a_ref[0], h_ref[...], preferred_element_type=o_ref.dtype
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_t,),
        in_specs=[
            pl.BlockSpec((1, ts, ts), lambda i, row, col: (i, 0, 0)),
            pl.BlockSpec((ts, f), lambda i, row, col: (col[i], 0)),
        ],
        out_specs=pl.BlockSpec((ts, f), lambda i, row, col: (row[i], 0)),
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nrt * ts, f), jnp.float32),
    )(row, col, a, h)
    return out[: tp.num_nodes].astype(h.dtype)
