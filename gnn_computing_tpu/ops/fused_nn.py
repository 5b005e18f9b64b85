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
