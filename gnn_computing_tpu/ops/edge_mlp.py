"""Per-edge MLP aggregation (GraphSAGE-MLP style).

Reference semantics (aggr_nn.h COMP macro + aggr_mlp/aggr_mlp_target,
aggr_nn.h:11-288): for every edge (src -> dst),
``out[dst] += relu((h[dst] + h[src]) @ W)`` with a small square W staged in
shared memory.  On TPU the whole edge batch becomes ONE MXU matmul:
the gathered slot features ([nt*B, f] after the src gather + dst broadcast
add) multiply W in a single [m_padded, f] @ [f, fout] GEMM that XLA tiles
onto the systolic array; the relu epilogue fuses in, and the per-task
segment-sum replaces atomicAdd accumulation (same pattern as ops.spmm).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gnn_computing_tpu.schedule.plan import AggregationPlan


def edge_mlp(
    plan: AggregationPlan, h: jnp.ndarray, w: jnp.ndarray
) -> jnp.ndarray:
    """out[i] = sum over edges e=(j->i) of relu((h[i] + h[j]) @ W)."""
    nt, b = plan.num_tasks_padded, plan.block_size
    f = h.shape[-1]
    src_rows = jnp.take(h, plan.src_flat(), axis=0)
    dst_rows = jnp.take(h, jnp.asarray(plan.dst), axis=0)  # [nt, f]
    z = src_rows.reshape(nt, b, f) + dst_rows[:, None, :]
    # full f32 matmul: the single-pass bf16 default breaks the 1e-2
    # validation gate (relu boundary crossings amplify rounding)
    z = jnp.matmul(
        z.reshape(nt * b, f), w, precision=jax.lax.Precision.HIGHEST
    )
    z = jax.nn.relu(z).reshape(nt, b, -1)
    # pad slots contribute relu((h[0]+h[dst])W) != 0 -> mask them out
    z = jnp.where(plan.slot_mask()[:, :, None], z, 0.0)
    task = z.sum(axis=1)
    return jax.ops.segment_sum(
        task,
        jnp.asarray(plan.dst),
        num_segments=plan.num_nodes,
        indices_are_sorted=plan.sorted_by_dst,
    )
