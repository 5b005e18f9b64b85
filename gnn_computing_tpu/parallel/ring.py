"""Ring-overlap distributed aggregation (shard_map + ppermute).

out = A @ H over a destination-sharded graph: a D-step ring where each chip
aggregates the edge group sourced from its currently-held feature shard while
``ppermute`` rotates shards around the ICI ring — XLA's latency-hiding
scheduler overlaps the permute with the aggregation compute, realizing the
"halo exchange overlapped with local aggregation" north star (BASELINE.json,
SURVEY.md §5).  Step 0 aggregates the chip's own (local) edges — the
diagonal-dominant part after locality reordering — so most work needs no
communication at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnn_computing_tpu.parallel.mesh import GRAPH_AXIS
from gnn_computing_tpu.parallel.partition import RingPlan


def _local_ring_spmm(src, count, dst, val, h_local, *, num_devices, shard_size):
    """Per-chip body (runs under shard_map).

    src/val: [1, D, nt, B]; count/dst: [1, D, nt]; h_local: [ns, f].
    """
    d = num_devices
    ns, f = h_local.shape
    src, count, dst, val = (x[0] for x in (src, count, dst, val))
    nt, b = src.shape[1], src.shape[2]

    iota = lax.broadcasted_iota(jnp.int32, (nt, b), 0) * 0 + lax.broadcasted_iota(
        jnp.int32, (nt, b), 1
    )

    perm = [(i, (i - 1) % d) for i in range(d)]

    def step(s, carry):
        out, buf = carry
        # kick off the rotation for the next step, then aggregate over the
        # current buffer — XLA overlaps the two.
        nxt = lax.ppermute(buf, GRAPH_AXIS, perm) if d > 1 else buf
        src_s = lax.dynamic_index_in_dim(src, s, 0, keepdims=False)
        val_s = lax.dynamic_index_in_dim(val, s, 0, keepdims=False)
        dst_s = lax.dynamic_index_in_dim(dst, s, 0, keepdims=False)
        # fused flat gather -> task reduce (PERF_NOTES.md form)
        msg = jnp.take(buf, src_s.reshape(-1), axis=0) * val_s.reshape(-1)[
            :, None
        ].astype(buf.dtype)
        task = msg.reshape(nt, b, f).sum(axis=1)
        out = out + jax.ops.segment_sum(
            task, dst_s, num_segments=ns, indices_are_sorted=False
        )
        return (out, nxt)

    # zeros_like keeps the carry "varying" over the manual mesh axis
    out0 = jnp.zeros_like(h_local)
    out, _ = lax.fori_loop(0, d, step, (out0, h_local))
    return out


def ring_spmm(mesh: Mesh, ring: RingPlan, h: jnp.ndarray) -> jnp.ndarray:
    """Distributed SpMM: h is [n_pad, f] row-sharded over the graph axis;
    returns the aggregated output with the same sharding."""
    import functools

    body = jax.shard_map(
        functools.partial(
            _local_ring_spmm,
            num_devices=ring.num_devices,
            shard_size=ring.shard_size,
        ),
        mesh=mesh,
        in_specs=(
            P(GRAPH_AXIS),
            P(GRAPH_AXIS),
            P(GRAPH_AXIS),
            P(GRAPH_AXIS),
            P(GRAPH_AXIS, None),
        ),
        out_specs=P(GRAPH_AXIS, None),
    )
    return body(ring.src, ring.count, ring.dst, ring.val, h)


def ring_gcn_layer(mesh, ring, h, w, activation=jax.nn.relu):
    """Distributed GCN layer: local dense transform (rows sharded, weight
    replicated — the MXU work needs no communication), ring aggregation,
    activation."""
    z = jnp.dot(h, w, preferred_element_type=jnp.float32).astype(h.dtype)
    z = ring_spmm(mesh, ring, z)
    return activation(z) if activation is not None else z


def ring_gcn_forward(mesh, ring, params, h):
    for i, w in enumerate(params):
        act = jax.nn.relu if i < len(params) - 1 else None
        h = ring_gcn_layer(mesh, ring, h, w, activation=act)
    return h
