"""GCN: dense transform -> SpMM aggregation -> ReLU.

Layer semantics of the reference's "ours" GCN (our.py:171-176): transform
FIRST with a dense matmul (shrinking the feature before the expensive
aggregation — the reference's key op-reordering), then aggregate over the
scheduled graph, then ReLU.  The benchmark model is the 3-layer
512 -> 128 -> 64 -> 32 stack (our.py:92-95).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from gnn_computing_tpu.ops.spmm import spmm
from gnn_computing_tpu.schedule.plan import AggregationPlan

BENCH_DIMS = (512, 128, 64, 32)  # reference our.py:92-95


@dataclasses.dataclass(frozen=True)
class LayerOpts:
    """Per-layer numeric/schedule knobs for hybrid (MXU-densified)
    aggregators.  All default settings are exact-path.

    aggregate_first: compute relu(agg(h) @ W) instead of
      relu(agg(h @ W)) — identical by linearity of the aggregation, but
      the aggregation operand becomes the PREVIOUS layer's (nonnegative,
      post-ReLU) activations, so single-rounded 16-bit operand modes keep
      the AGGREGATION's relative error at the elementwise rounding bound
      (nonnegative sums don't cancel).  The downstream transform still
      crosses relu boundaries, where that rounding shows up near zero:
      measured ~0.2% of final elements exceed the strict gate with bf16
      modes — use for speed, not where bit-validation is required
      (fast_layer_opts sticks to the exact split modes).  Aggregation
      runs at the layer's INPUT width — free for the row-issue-bound
      residual gather, wider tiles on the dense side.
    residual_gather_dtype / tile_h_mode: see ops.spmm.weighted_task_sums
      and ops.pallas_bcsr.bcsr_spmm_pallas.
    """

    aggregate_first: bool = False
    residual_gather_dtype: object = None
    tile_h_mode: str = "auto"


def fast_layer_opts(dims: Sequence[int] = BENCH_DIMS) -> list:
    """Measured-best per-layer numeric modes that keep the 1e-2/1e-5
    validation gate with ZERO bad elements (verified on-TPU vs the f64
    dense oracle, PERF_NOTES.md):

    - dense tiles use 'split' (2 bf16 residue chunks = 16 mantissa bits)
      on every layer — integer-count tiles are exact, so the only
      rounding is the split's ~1.5e-5 relative, well inside the gate
      (the historical 'split2 fails' result was the DEFAULT bf16 matmul
      in the surrounding transform, fixed by Precision.HIGHEST).
    - transform-first layers whose aggregation width f <= 64 use the
      EXACT 'f16_split2' residual table ([n, 2f] <= 128 lanes stays on
      the fast 16-bit gather path; 21 mantissa bits); wider layers keep
      f32 residual rows.
    """
    opts = []
    for i in range(len(dims) - 1):
        f_agg = dims[i + 1]  # transform-first: aggregate at output width
        opts.append(
            LayerOpts(
                residual_gather_dtype=(
                    "f16_split2" if f_agg <= 64 else None
                ),
                tile_h_mode="split",
            )
        )
    return opts


def gcn_layer(
    plan,
    h: jnp.ndarray,
    w: jnp.ndarray,
    val=None,
    activation=jax.nn.relu,
    strategy: str = "auto",
    residual_gather_dtype=None,
    opts: Optional[LayerOpts] = None,
) -> jnp.ndarray:
    """``plan`` is an AggregationPlan or an Aggregator (including the
    hybrid MXU-densified kind, aggregator.schedule_hybrid)."""
    if opts is None:
        opts = LayerOpts(residual_gather_dtype=residual_gather_dtype)
    is_hybrid = hasattr(plan, "run") and (
        getattr(plan, "tile", None) is not None
        or getattr(plan, "tile_bits", None) is not None
    )

    def aggregate(x):
        if is_hybrid:
            return plan.run(
                x,
                strategy=strategy,
                residual_gather_dtype=opts.residual_gather_dtype,
                tile_h_mode=opts.tile_h_mode,
            )
        if hasattr(plan, "run"):
            return plan.run(x, strategy=strategy)
        return spmm(plan, x, val=val, strategy=strategy)

    if opts.aggregate_first:
        z = aggregate(h)
        # explicit HIGHEST: the TPU DEFAULT dot is a single bf16 pass
        # (~2e-2 mean rel error, measured) and breaks the 1e-2 gate
        z = jnp.dot(
            z, w, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(h.dtype)
    else:
        z = jnp.dot(
            h, w, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(h.dtype)
        z = aggregate(z)
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
    layer_opts: Optional[Sequence[LayerOpts]] = None,
) -> jnp.ndarray:
    """Exact reference benchmark semantics: ReLU after every layer
    (our.py:252-255 applies gcn_layer_ours, which ends in relu, 3x).

    ``plan`` may be a sequence of per-layer plans/aggregators: the tile
    crossover threshold scales with the layer's aggregation width (a
    tile's H read costs ~f bytes while a residual slot's gather cost is
    width-independent), so narrow layers profit from DENSER plans."""
    plans = (
        list(plan)
        if isinstance(plan, (list, tuple))
        else [plan] * len(params)
    )
    for i, w in enumerate(params):
        h = gcn_layer(
            plans[i], h, w, activation=jax.nn.relu, strategy=strategy,
            residual_gather_dtype=residual_gather_dtype,
            opts=None if layer_opts is None else layer_opts[i],
        )
    return h
