"""Fused aggregation + dense transform (reference ``aggr_gcn_nn``).

Reference O5 (aggr_gcn.h:304-359 + run_with_nn :491-499): one kernel that
both aggregates (SpMM) and applies the dense layer W, returning BOTH the
aggregated features and the transformed aggregate — the Figure 10b fusion
subject.

On TPU "fusion" means keeping the pipeline inside one jitted computation so
XLA fuses the SpMM's segment-sum epilogue into the GEMM prologue without a
round-trip to HBM for the intermediate; the op exists as a unit so the
Fig10b-analog benchmark can compare it against the split
(SpMM -> separate GEMM) formulation, and so callers get the reference's
two-output contract.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gnn_computing_tpu.schedule.plan import AggregationPlan
from gnn_computing_tpu.ops.spmm import spmm


def spmm_nn(
    plan: AggregationPlan,
    h: jnp.ndarray,
    w: jnp.ndarray,
    val: Optional[jnp.ndarray] = None,
    strategy: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (aggregated, aggregated @ w) — reference run_with_nn's
    (vout, transformed) pair (aggr_gcn.h:304-359)."""
    agg = spmm(plan, h, val=val, strategy=strategy)
    # HIGHEST: TPU DEFAULT dot = bf16 single pass, fails the 1e-2 gate
    return agg, jnp.dot(agg, w, precision=jax.lax.Precision.HIGHEST)


def hybrid_spmm_nn(
    sched,
    h: jnp.ndarray,
    w: jnp.ndarray,
    tile_h_mode: str = "auto",
    residual_gather_dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused aggregate+GEMM over a hybrid Aggregator: the dense parts run
    the Pallas kernel with the W epilogue (one HIGHEST dot on the
    VMEM-resident run accumulator — the engineered analog of the
    reference's in-kernel shared-memory W, aggr_gcn.h:304-359); the
    residual part aggregates then transforms, and the partial transforms
    sum (matmul distributes over the partial aggregates).  Returns the
    reference's (vout, transformed) pair."""
    from gnn_computing_tpu.ops import pallas_bcsr
    from gnn_computing_tpu.ops.bcsr import bcsr_spmm
    from gnn_computing_tpu.ops.spmm import spmm_xla

    agg = None
    trans = None

    def acc(a_p, t_p):
        nonlocal agg, trans
        agg = a_p if agg is None else agg + a_p
        trans = t_p if trans is None else trans + t_p

    for p in sched.tile_parts():
        if pallas_bcsr.supported(p, h):
            a_p, t_p = pallas_bcsr.bcsr_spmm_pallas(
                p, h, h_mode=tile_h_mode, w_epilogue=w
            )
        else:  # portable fallback: split form on this part
            a_p = bcsr_spmm(p, h, h_mode=tile_h_mode)
            t_p = jnp.dot(
                a_p, w, precision=jax.lax.Precision.HIGHEST
            )
        acc(a_p.astype(h.dtype), t_p)
    if sched.plan is not None and sched.plan.num_edges:
        r = spmm_xla(
            sched.plan, h, gather_dtype=residual_gather_dtype
        )
        acc(r, jnp.dot(r, w, precision=jax.lax.Precision.HIGHEST))
    return agg, trans
