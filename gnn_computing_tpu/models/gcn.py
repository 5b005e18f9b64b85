"""GCN: dense transform -> SpMM aggregation -> ReLU.

Layer semantics of the reference's "ours" GCN (our.py:171-176): transform
FIRST with a dense matmul (shrinking the feature before the expensive
aggregation — the reference's key op-reordering), then aggregate over the
scheduled graph, then ReLU.  The benchmark model is the 3-layer
512 -> 128 -> 64 -> 32 stack (our.py:92-95).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from gnn_computing_tpu.ops.spmm import spmm
from gnn_computing_tpu.schedule.plan import AggregationPlan

BENCH_DIMS = (512, 128, 64, 32)  # reference our.py:92-95


def gcn_layer(
    plan,
    h: jnp.ndarray,
    w: jnp.ndarray,
    val=None,
    activation=jax.nn.relu,
    strategy: str = "auto",
    residual_gather_dtype=None,
) -> jnp.ndarray:
    """``plan`` is an AggregationPlan or an Aggregator (including the
    hybrid MXU-densified kind, aggregator.schedule_hybrid)."""
    z = jnp.dot(h, w, preferred_element_type=jnp.float32).astype(h.dtype)
    if hasattr(plan, "run"):
        kw = (
            {"residual_gather_dtype": residual_gather_dtype}
            if getattr(plan, "tile", None) is not None
            else {}
        )
        z = plan.run(z, strategy=strategy, **kw)
    else:
        z = spmm(plan, z, val=val, strategy=strategy)
    return activation(z) if activation is not None else z


def init_gcn_params(
    key, dims: Sequence[int] = BENCH_DIMS, dtype=jnp.float32
) -> list:
    """Glorot-init weights for each layer; the reference uses plain
    torch.randn (our.py:92-95) — use scale='randn' for exact-parity benches."""
    params = []
    for i in range(len(dims) - 1):
        key, sub = jax.random.split(key)
        fan_in, fan_out = dims[i], dims[i + 1]
        w = jax.random.normal(sub, (fan_in, fan_out), dtype) * jnp.sqrt(
            2.0 / (fan_in + fan_out)
        ).astype(dtype)
        params.append(w)
    return params


def gcn_forward(
    plan: AggregationPlan,
    params: Sequence[jnp.ndarray],
    h: jnp.ndarray,
    strategy: str = "auto",
) -> jnp.ndarray:
    """Multi-layer GCN forward (last layer linear, no activation — logits)."""
    for i, w in enumerate(params):
        act = jax.nn.relu if i < len(params) - 1 else None
        h = gcn_layer(plan, h, w, activation=act, strategy=strategy)
    return h


def gcn_forward_bench(
    plan: AggregationPlan,
    params: Sequence[jnp.ndarray],
    h: jnp.ndarray,
    strategy: str = "auto",
    residual_gather_dtype=None,
) -> jnp.ndarray:
    """Exact reference benchmark semantics: ReLU after every layer
    (our.py:252-255 applies gcn_layer_ours, which ends in relu, 3x)."""
    for w in params:
        h = gcn_layer(
            plan, h, w, activation=jax.nn.relu, strategy=strategy,
            residual_gather_dtype=residual_gather_dtype,
        )
    return h
