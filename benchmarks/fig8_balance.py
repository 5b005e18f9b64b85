"""Fig8 analog: load balance — actual vs perfectly-balanced aggregation time.

Reference: Figure8/main.cu — per-block GPU clocks compare the measured
kernel time against the perfectly-balanced lower bound (sum of block
durations / parallel capacity), base vs neighbor-grouping.

TPU rendition: the unbalanced baseline is the ``nop`` schedule (one task per
row padded to MAX degree — the analog of warp-per-row, aggr_gcn.h:5-36) vs
the NG schedule; the "balanced" bound is measured_time * slot_occupancy
(valid slots / issued slots — TPU work is slot-proportional, so occupancy
is exactly the balance loss the reference's SM clocks measure).
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from benchmarks import common
from gnn_computing_tpu.graph.synthetic import normal_features
from gnn_computing_tpu.ops.spmm import spmm_xla
from gnn_computing_tpu.schedule import neighbor_grouping_plan, nop_plan


def base_plan(g, quick: bool):
    """The unscheduled warp-per-row analog.  True nop (pad to max degree)
    is only materializable for bounded-degree graphs; on skewed graphs the
    padded slot grid explodes (n * max_degree slots — rmat_arxiv would
    issue 268M slots / 64 GB intermediates, measured device OOM), which
    the GPU never pays (idle warp lanes are not issued work).  Cap the
    materialized base block at 128 and report BOTH the measured occupancy
    of that grid and the analytic occupancy of the true nop grid
    (m / (n * max_degree)) — the latter is the reference's actual
    imbalance figure."""
    if quick:
        return nop_plan(g)
    b = min(max(g.max_degree(), 1), 128)
    return neighbor_grouping_plan(g, b)
from gnn_computing_tpu.utils.timing import benchmark_chained


def main():
    ap = common.parser(__doc__)
    args = ap.parse_args()
    for name, g in common.datasets(args):
        h = jnp.asarray(
            normal_features(g.num_nodes, args.feature_len, seed=1) * 0.1
        )
        for sched, plan in (
            ("base", base_plan(g, args.quick).device_put()),
            ("NG", neighbor_grouping_plan(g, args.nei).device_put()),
        ):
            r = benchmark_chained(lambda hh, p: spmm_xla(p, hh), h, plan, iters=args.iters)
            occ = plan.stats()["slot_occupancy"]
            rec = dict(
                dataset=name,
                schedule=sched,
                actual_s=r.min_s,
                balanced_s=r.min_s * occ,
                slot_occupancy=occ,
                num_tasks=plan.num_tasks,
                block_size=plan.block_size,
            )
            if sched == "base":
                rec["nop_occupancy_analytic"] = g.num_edges / (
                    g.num_nodes * max(g.max_degree(), 1)
                )
            common.emit(
                "fig8",
                rec,
                args,
            )
        # measured per-phase decomposition of the production hybrid
        # schedule (profiling.decompose — the reference's per-block-clock
        # phase columns, Figure8/main.cu:81-201)
        from gnn_computing_tpu.aggregator import Aggregator
        from gnn_computing_tpu.utils.profiling import decompose

        agg = Aggregator.schedule_hybrid(
            g, with_transpose=False, residual_block=4,
        )
        phases = decompose(agg, h, iters=args.iters)
        rec = dict(
            dataset=name,
            schedule="hybrid",
            actual_s=(phases.get("total") or {}).get("ms", 0.0) / 1e3,
        )
        for k in ("dense", "residual", "residual_floor", "transform"):
            if k in phases:
                rec[f"{k}_ms"] = phases[k]["ms"]
                rec[f"{k}_noise_floor"] = phases[k]["noise_floor"]
        common.emit("fig8", rec, args)


if __name__ == "__main__":
    main()
