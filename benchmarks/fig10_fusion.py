"""Fig10 analog: kernel fusion ablations.

10a (reference Figure10/main_a.cu:79-113) — the GAT attention pipeline:
  base    = 4 separate ops: u_add_v -> exp(leakyrelu) -> add_to_center ->
            div_each -> weighted SpMM (aggr_gat.h:33-92 + updateval chain)
  adapter = fused attention scalar kernel (attGat) + weighted SpMM
  fused   = single fused attention+softmax+aggregate (aggr_gat_fine)

10b (reference Figure10/main_b.cu:84-103) — aggregation+GEMM:
  split = SpMM then separate dense transform
  fused = spmm_nn (reference aggr_gcn_nn run_with_nn)

On TPU "fusion" is XLA keeping the pipeline in one computation; these runs
quantify what that is worth against op-at-a-time execution with forced
materialization (device round-trip between ops).
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks import common
from gnn_computing_tpu.graph.synthetic import normal_features
from gnn_computing_tpu.ops import gat as gat_ops
from gnn_computing_tpu.ops.fused_nn import spmm_nn
from gnn_computing_tpu.ops.spmm import spmm_xla
from gnn_computing_tpu.schedule import neighbor_grouping_plan
from gnn_computing_tpu.utils.timing import benchmark_chained


def main():
    ap = common.parser(__doc__)
    args = ap.parse_args()
    for name, g in common.datasets(args):
        plan = neighbor_grouping_plan(g, args.nei).device_put()
        f = args.feature_len
        h = jnp.asarray(normal_features(g.num_nodes, f, seed=1) * 0.1)
        att = jnp.asarray(normal_features(g.num_nodes, 2, seed=2) * 0.1)
        

        # ---- 10a base: split pipeline as separate jitted ops (4 kernels +
        # weighted SpMM, the reference's un-fused pipeline)
        u_add_v_j = jax.jit(gat_ops.u_add_v)
        mask_j = jax.jit(
            lambda p, e: jnp.where(
                p.slot_mask(), jnp.exp(gat_ops.leaky_relu(e)), 0.0
            )
        )
        add_to_center_j = jax.jit(gat_ops.add_to_center)
        div_each_j = jax.jit(gat_ops.div_each)
        spmm_j = jax.jit(spmm_xla)

        import time

        def run_base():
            e = u_add_v_j(plan, att)
            e = mask_j(plan, e)
            s = add_to_center_j(plan, e)
            v = div_each_j(plan, e, s)
            return spmm_j(plan, h, v)

        jax.block_until_ready(run_base())
        times = []
        for _ in range(max(args.iters, 5)):
            t0 = time.perf_counter()
            jax.block_until_ready(run_base())
            times.append(time.perf_counter() - t0)
        base_s = min(times)

        # ---- 10a adapter: fused attention scalars + separate weighted SpMM
        r_ad = benchmark_chained(
            lambda x, p, a: gat_ops.gat_split_forward(
                p, x, a, use_adapter=True
            ),
            h,
            plan,
            att,
            iters=args.iters,
        )

        # ---- 10a fused: one computation
        r_f = benchmark_chained(
            lambda x, p, a: gat_ops.gat_aggregate(p, x, a),
            h,
            plan,
            att,
            iters=args.iters,
        )
        common.emit(
            "fig10a",
            dict(
                dataset=name,
                base_s=base_s,
                adapter_s=r_ad.min_s,
                fused_s=r_f.min_s,
                speedup=base_s / r_f.min_s,
            ),
            args,
        )

        # ---- 10b: SpMM -> GEMM split vs fused
        w = jnp.asarray(normal_features(f, args.outfea, seed=3) * 0.1)

        def split(plan, h, w):
            agg = jax.block_until_ready(spmm_j(plan, h))
            return jnp.dot(agg, w)

        jax.block_until_ready(split(plan, h, w))
        times = []
        for _ in range(max(args.iters, 5)):
            t0 = time.perf_counter()
            jax.block_until_ready(split(plan, h, w))
            times.append(time.perf_counter() - t0)
        split_s = min(times)

        r_fused = benchmark_chained(
            lambda x, p, ww: spmm_nn(p, x, ww)[1],
            h,
            plan,
            w,
            iters=args.iters,
        )
        common.emit(
            "fig10b",
            dict(
                dataset=name,
                split_s=split_s,
                fused_s=r_fused.min_s,
                speedup=split_s / r_fused.min_s,
            ),
            args,
        )

        # ---- 10b Pallas-epilogue row (the engineered O5 analog): hybrid
        # dense tiles with the W GEMM fused into the kernel's run-final
        # accumulator write vs the same hybrid schedule split in two.
        from gnn_computing_tpu.aggregator import Aggregator
        from gnn_computing_tpu.ops.fused_nn import hybrid_spmm_nn

        sched = Aggregator.schedule_hybrid(
            g, tile_rows=256, threshold=24, residual_block=4,
            tile_dtype=__import__("numpy").int8, with_transpose=False,
        )
        if sched.tile_parts():
            def split_h(x, s, ww):
                agg = s.run(x)
                return jnp.dot(
                    agg, ww, precision=jax.lax.Precision.HIGHEST
                )

            r_split_h = benchmark_chained(
                split_h, h, sched, w, iters=args.iters
            )
            r_fused_h = benchmark_chained(
                lambda x, s, ww: hybrid_spmm_nn(s, x, ww)[1],
                h, sched, w, iters=args.iters,
            )
            common.emit(
                "fig10b_pallas",
                dict(
                    dataset=name,
                    split_s=r_split_h.min_s,
                    fused_s=r_fused_h.min_s,
                    speedup=r_split_h.min_s / r_fused_h.min_s,
                ),
                args,
            )


if __name__ == "__main__":
    main()
