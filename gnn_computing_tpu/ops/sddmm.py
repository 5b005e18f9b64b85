"""SDDMM: sampled dense-dense matmul — per-edge feature dot products.

Semantics of reference aggr_sddmm / aggr_sddmm_target (aggr_sddmm.h:5-120):
``val[e] = dot(vin1[src_e], vin2[dst_e])``.  Output either in slot layout
(feeding fused pipelines / backward) or in original CSR edge order (the
reference's on-edge val buffer).
"""

from __future__ import annotations

import jax.numpy as jnp

from gnn_computing_tpu.schedule.plan import AggregationPlan
from gnn_computing_tpu.ops.spmm import (
    sddmm_slots_xla,
    edge_values_from_slots,
)


def sddmm(
    plan: AggregationPlan,
    a: jnp.ndarray,
    b: jnp.ndarray,
    output: str = "edges",
    strategy: str = "auto",
    gather_dtype=None,
) -> jnp.ndarray:
    """out[e] = <a[src_e], b[dst_e]>.

    output='slots' returns [num_tasks_padded, B] (pad slots zero);
    output='edges' returns [num_edges] in original CSR order.
    gather_dtype: source-gather numeric mode (see sddmm_slots_xla);
    '*_split2' modes are exact 16-bit-table reconstructions.
    """
    slots = sddmm_slots_xla(plan, a, b, gather_dtype=gather_dtype)
    if output == "slots":
        return slots
    assert output == "edges"
    return edge_values_from_slots(plan, slots)
