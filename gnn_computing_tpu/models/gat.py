"""GAT: dense transform -> 2-wide attention projection -> fused aggregation.

Layer semantics of the reference's "ours" GAT (our.py:179-188): feat2 = h @ W,
att = feat2 @ W_lr (an [f, 2] projection producing the dst/src attention
halves), then the fused attention+softmax+aggregate op.  Single-head in the
reference; multi-head supported here by vmapping the fused op over a head
axis.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from gnn_computing_tpu.ops.gat import gat_aggregate, DEFAULT_SLOPE
from gnn_computing_tpu.schedule.plan import AggregationPlan

BENCH_DIMS = (512, 128, 64, 32)  # reference our.py:92-95, weight_lr* :266-268


class GATLayerParams(NamedTuple):
    w: jnp.ndarray  # [f_in, f_out]
    w_att: jnp.ndarray  # [f_out, 2] (dst half, src half) or [heads, f_out, 2]


def gat_layer(
    plan: AggregationPlan,
    h: jnp.ndarray,
    p: GATLayerParams,
    relu_slope: float = DEFAULT_SLOPE,
    stabilize: bool = False,
    att_gather_dtype=None,
    h_gather_dtype=None,
    dot_mode: str = "exact",
) -> jnp.ndarray:
    # HIGHEST: TPU DEFAULT dot is single-pass bf16 and fails the 1e-2 gate
    feat2 = jnp.dot(
        h, p.w, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(h.dtype)
    # plan may be an AggregationPlan or an Aggregator (incl. hybrid)
    if hasattr(plan, "run_gat"):
        agg_fn = lambda f2, att: plan.run_gat(
            f2, att, relu_slope=relu_slope, stabilize=stabilize,
            att_gather_dtype=att_gather_dtype,
            h_gather_dtype=h_gather_dtype,
            dot_mode=dot_mode,
        )
    else:
        agg_fn = lambda f2, att: gat_aggregate(
            plan, f2, att, relu_slope=relu_slope, stabilize=stabilize
        )
    if p.w_att.ndim == 2:
        att = jnp.dot(
            feat2, p.w_att, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return agg_fn(feat2, att)
    # multi-head: independent attention per head over the shared feat2
    def one_head(w_att_h):
        att = jnp.dot(
            feat2, w_att_h, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return agg_fn(feat2, att)

    heads = jax.vmap(one_head)(p.w_att)  # [H, n, f_out]
    hn, n, f = heads.shape
    return heads.transpose(1, 0, 2).reshape(n, hn * f)


def init_gat_params(
    key, dims: Sequence[int] = BENCH_DIMS, heads: int = 1, dtype=jnp.float32
) -> list:
    params = []
    for i in range(len(dims) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        scale = jnp.sqrt(2.0 / (dims[i] + dims[i + 1])).astype(dtype)
        w = jax.random.normal(k1, (dims[i], dims[i + 1]), dtype) * scale
        att_shape = (
            (dims[i + 1], 2) if heads == 1 else (heads, dims[i + 1], 2)
        )
        w_att = jax.random.normal(k2, att_shape, dtype) * scale
        params.append(GATLayerParams(w, w_att))
    return params


def gat_forward(
    plan: AggregationPlan,
    params: Sequence[GATLayerParams],
    h: jnp.ndarray,
    relu_slope: float = DEFAULT_SLOPE,
    stabilize: bool = False,
    fast: bool = False,
    dot_mode: str = "exact",
) -> jnp.ndarray:
    """3-layer benchmark forward (our.py:274-277 — no inter-layer
    nonlinearity beyond the softmax-weighted aggregation, matching the
    reference driver).

    fast=True applies the measured-best EXACT residual gather modes on
    hybrid aggregators (0 bad elements vs the f64 oracle, PERF_NOTES.md):
    att_src always via the [n, 2] f16_split2 table (21-bit exact, 16-bit
    fast row path); h via f16_split2 when the layer's aggregation width
    fits the fast path (2f <= 128 lanes)."""
    for p in params:
        f_out = p.w.shape[-1]
        kw = {}
        if fast:
            kw = dict(
                att_gather_dtype="f16_split2",
                h_gather_dtype="f16_split2" if f_out <= 64 else None,
            )
        h = gat_layer(
            plan, h, p, relu_slope=relu_slope, stabilize=stabilize,
            dot_mode=dot_mode, **kw
        )
    return h
