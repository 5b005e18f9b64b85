"""Feature-dimension tensor parallelism for wide GNN layers (SURVEY §2e).

Aggregation (A @ H) is feature-wise independent, so sharding H on the
FEATURE axis makes the aggregation itself embarrassingly parallel: every
chip runs the UNMODIFIED single-chip hybrid kernels (Pallas BCSR tiles +
residual gather — both measured width-independent per dtype class,
PERF_NOTES.md) on its [n, f/D] slice with ZERO communication.  The only
collective is the dense transform's contraction: with W row-sharded
[f/D, f_out], each chip's partial (A @ H_shard) @ W_shard psums into the
full [n, f_out] activation — one psum per layer, the canonical TP-matmul
schedule (Megatron-style column/row split, applied graph-side).

This is the deeper TP path VERDICT r4 #5 asked for (the earlier test
sharded only the weight and left everything to GSPMD): here the sharding
is explicit shard_map with the plan replicated, so the per-chip program
is exactly the audited single-chip kernel program.

Layer semantics match models/gcn.py: transform-first
(z = relu(A @ (h W)) needs h replicated for the FIRST transform); this
module instead fuses per layer as out = relu((A @ h_shard) @ W_shard
psum) — aggregate-first on the sharded width, transform contracted.  The
two orders commute mathematically (A @ (h W) == (A @ h) W); numerically
both are HIGHEST-precision and pass the same 1e-2/1e-5 gate
(tests/test_feature_parallel.py validates against the f64 oracle).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnn_computing_tpu.parallel.mesh import FEATURE_AXIS


def shard_features(mesh: Mesh) -> NamedSharding:
    """[n, f] node features split on the feature axis."""
    return NamedSharding(mesh, P(None, FEATURE_AXIS))


def shard_w_rows(mesh: Mesh) -> NamedSharding:
    """[f_in, f_out] weights row-sharded (contraction dim split)."""
    return NamedSharding(mesh, P(FEATURE_AXIS, None))


def feature_sharded_gcn_forward(
    mesh: Mesh,
    sched,
    params: Sequence[jnp.ndarray],
    h: jnp.ndarray,
    residual_gather_dtype=None,
    tile_h_mode: str = "auto",
) -> jnp.ndarray:
    """Multi-layer GCN with feature-dim TP.

    ``h`` enters sharded [n, f0/D] on FEATURE_AXIS; each layer i computes

        out = psum_feature( (A @ h_shard) @ W_i_shard )   [n, f_{i+1}]

    then re-shards the full activation for the next layer (a static
    slice by axis index — XLA lowers the psum+slice pair to
    reduce-scatter when profitable).  Output: the final layer's FULL
    [n, f_L] activations, replicated over the feature axis.
    """
    d = mesh.shape[FEATURE_AXIS]

    def body(sched_rep, h_shard, *ws):
        idx = lax.axis_index(FEATURE_AXIS)
        x = h_shard
        for i, w in enumerate(ws):
            agg = sched_rep.run(
                x,
                residual_gather_dtype=residual_gather_dtype,
                tile_h_mode=tile_h_mode,
            )
            part = jnp.dot(
                agg, w, preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            ).astype(h_shard.dtype)
            full = lax.psum(part, FEATURE_AXIS)
            if i < len(ws) - 1:
                full = jax.nn.relu(full)
                fo = full.shape[-1]
                assert fo % d == 0, (
                    f"layer {i} output width {fo} not divisible by the "
                    f"feature axis ({d})"
                )
                x = lax.dynamic_slice_in_dim(
                    full, idx * (fo // d), fo // d, axis=1
                )
            else:
                x = full
        return x

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(),  # plan replicated
            P(None, FEATURE_AXIS),
            *[P(FEATURE_AXIS, None) for _ in params],
        ),
        out_specs=P(),
    )
    return fn(sched, h, *params)
