"""Profiling / tracing helpers (reference auxiliary subsystem, SURVEY.md §5).

The reference instruments kernels with %globaltimer/%smid clocks
(aggr_gcn.h:116-248) and drives nvprof externally (Figure9/run.sh).  On TPU
the equivalents are (a) the XLA profiler trace, wrapped here, and (b) an
analytic cost model per aggregation plan — bytes moved and FLOPs — playing
the role of the L2-hit-rate / balanced-time derivations.
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional

from gnn_computing_tpu.schedule.plan import AggregationPlan
from gnn_computing_tpu.schedule.tiles import TilePlan


@contextlib.contextmanager
def trace(logdir: str = "/tmp/gnn_tpu_trace"):
    """``with trace(dir): run_step()`` — captures an XLA profiler trace
    viewable in TensorBoard/xprof (the nvprof analog)."""
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def plan_cost(
    plan: AggregationPlan, feature_len: int, dtype_bytes: int = 4
) -> dict:
    """Analytic per-pass cost of the gather strategy on a plan.

    bytes_gathered counts EVERY issued slot (pads included) — the balance /
    occupancy loss the reference measures with per-block clocks shows up
    here as the pad fraction.
    """
    slots = plan.num_tasks_padded * plan.block_size
    row_bytes = feature_len * dtype_bytes
    return {
        "slots_issued": int(slots),
        "valid_edges": int(plan.num_edges),
        "slot_occupancy": plan.num_edges / max(slots, 1),
        "bytes_gathered": int(slots) * row_bytes,
        "bytes_output": plan.num_nodes * row_bytes,
        "flops": 2 * plan.num_edges * feature_len,
    }


def decompose(
    agg,
    h,
    model: str = "gcn",
    att=None,
    tile_h_mode: str = "auto",
    residual_gather_dtype=None,
    transform_out: Optional[int] = None,
    iters: int = 8,
    reps: int = 3,
) -> dict:
    """MEASURED per-phase on-chip decomposition of a hybrid aggregation
    pass — the analog of the reference's per-block %globaltimer clocks and
    balanced-time derivation (aggr_gcn.h:116-248, Figure8/main.cu:81-201),
    productized from the ad-hoc probes that produced the PERF_NOTES
    session-3 decompositions.

    Each phase is timed with the hoist-proof chained harness
    (utils.timing.benchmark_chained) on whatever device is default — the
    real chip in production, CPU in tests.  Phases:

      dense          — tile matmul pass (ops.bcsr.bcsr_spmm / GAT kernel)
      residual       — full residual pipeline (gather + val + task-sum +
                       segment-sum), ops.spmm.spmm_xla
      residual_floor — pure fused gather+total-sum over the same slot
                       indices: the hardware random-row bound.  The gap
                       residual - residual_floor is formulation overhead.
      transform      — [n, f] @ [f, f_out] dense GEMM at HIGHEST precision
      total          — the full hybrid pass (phases overlap under XLA
                       fusion, so total <= sum of parts is possible)

    Returns {phase: {"ms": float, "noise_floor": bool}} plus "analytic"
    with the plan/tile byte+flop models (fig8's balance columns).
    """
    import jax.numpy as jnp

    from gnn_computing_tpu.utils.timing import benchmark_chained

    h = jnp.asarray(h)
    f = h.shape[-1]
    out = {}

    def measure(name, fn, *args):
        r = benchmark_chained(fn, h, *args, iters=iters, reps=reps)
        out[name] = {
            "ms": r.min_s * 1e3,
            "noise_floor": bool(r.noise_floor),
        }

    tps = agg.tile_parts()
    if tps:
        from gnn_computing_tpu.ops.bcsr import bcsr_spmm

        if model == "gat":
            from gnn_computing_tpu.ops.bcsr_gat import gat_bcsr

            assert att is not None, "GAT decomposition needs att [n, 2]"
            att = jnp.asarray(att)
            measure(
                "dense",
                lambda hh, t, a: gat_bcsr(t, hh, a)[0],
                tps,
                att,
            )
        else:
            measure(
                "dense",
                lambda hh, t: bcsr_spmm(t, hh, h_mode=tile_h_mode),
                tps,
            )
    plan = agg.plan if agg.plan is not None and agg.plan.num_edges else None
    if plan is not None:
        from gnn_computing_tpu.ops.spmm import spmm_xla

        dplan = plan.device_put() if not hasattr(plan.src, "devices") else plan
        if model == "gat":
            from gnn_computing_tpu.ops.gat import gat_aggregate_parts

            measure(
                "residual",
                lambda hh, p, a: gat_aggregate_parts(p, hh, a)[0],
                dplan,
                att,
            )
        else:
            measure(
                "residual",
                lambda hh, p: spmm_xla(
                    p, hh, gather_dtype=residual_gather_dtype
                ),
                dplan,
            )
        src_flat = dplan.src_flat()
        measure(
            "residual_floor",
            lambda hh, s: jnp.take(hh, s, axis=0).sum(axis=0),
            src_flat,
        )
    if transform_out is None:
        transform_out = f
    import jax

    w = jax.random.normal(
        jax.random.key(0), (f, transform_out), h.dtype
    ) * 0.1
    import jax.lax as lax

    measure(
        "transform",
        lambda hh, ww: jnp.dot(hh, ww, precision=lax.Precision.HIGHEST),
        w,
    )
    if tps and model == "gcn":
        measure("total", lambda hh, a: a.run(hh, tile_h_mode=tile_h_mode), agg)
    out["analytic"] = {
        "plan": plan_cost(plan, f) if plan is not None else None,
        "tile": [tile_cost(t, f) for t in tps] or None,
    }
    return out


def tile_cost(
    tp: TilePlan, feature_len: int, h_bytes_per_elem: int = 2
) -> dict:
    """Analytic per-pass cost of the dense-tile strategy: A-tile stream +
    one H tile per step + one output-tile write per run."""
    a = tp.a
    a_bytes = int(getattr(a, "nbytes", 0))
    t = a.shape[0]
    h_tile_bytes = tp.tile_cols * feature_len * h_bytes_per_elem
    runs = len(set(int(x) for x in tp.tile_row[: tp.num_tiles])) or 1
    return {
        "num_tiles": int(t),
        "a_bytes": a_bytes,
        "h_bytes": int(t) * h_tile_bytes,
        "out_bytes": runs * tp.tile_rows * feature_len * 4,
        "flops_mxu": 2 * int(t) * tp.tile_rows * tp.tile_cols * feature_len,
        "edges_covered": int(tp.num_dense_edges),
        "bytes_per_edge": (
            (a_bytes + t * h_tile_bytes) / max(tp.num_dense_edges, 1)
        ),
    }
