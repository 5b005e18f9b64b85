"""Fig9 analog: locality — aggregation speed/traffic vs vertex reordering.

Reference: Figure9 measures the L2 hit rate of the aggregation kernel under
NG / LAS / NG+LSH-reorder vs DGL's kernel (nvprof l2_tex_hit_rate).

On TPU there is no L2 to hit: locality materializes as (a) the fraction of
edges liftable into dense MXU tiles (schedule/tiles.py) — reordering
concentrates the adjacency exactly like it concentrated cache lines — and
(b) the measured hybrid aggregation time.  Reported per reorder: none /
degree-sort / MinHash-LSH cluster (the reference's cluster2.py analog).
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from benchmarks import common
from gnn_computing_tpu.graph.reorder import (
    cluster_reorder,
    cluster_reorder_exact,
    degree_sort,
    label_propagation_reorder,
)
from gnn_computing_tpu.graph.synthetic import normal_features
from gnn_computing_tpu.ops.bcsr import hybrid_spmm
from gnn_computing_tpu.ops.spmm import spmm_xla
from gnn_computing_tpu.schedule import neighbor_grouping_plan
from gnn_computing_tpu.schedule.tiles import densify
from gnn_computing_tpu.utils.timing import benchmark_chained


def main():
    ap = common.parser(__doc__)
    ap.add_argument("--tile-rows", type=int, default=256)
    args = ap.parse_args()
    for name, g in common.datasets(args):
        reorders = {
            "none": None,
            "degree": degree_sort(g),
            "lpa": label_propagation_reorder(g),
            "cluster": cluster_reorder(
                g, num_perm=32, bands=8, threshold=0.2
            ),
            # reference-faithful exact-Jaccard PQ agglomeration with lazy
            # root re-enqueue (cluster2.py:108-153; native gs_jaccard_cluster)
            "cluster_exact": cluster_reorder_exact(
                g, num_perm=32, bands=8
            ),
        }
        reorders = {k: v for k, v in reorders.items() if v is not None or k == "none"}
        for rname, perm in reorders.items():
            g2 = g if perm is None else g.reorder(perm)
            h = jnp.asarray(
                normal_features(g2.num_nodes, args.feature_len, seed=1)
                * 0.1
            )
            tp, res = densify(g2, tile_rows=args.tile_rows, tile_cols=128)
            coverage = tp.num_dense_edges / max(g2.num_edges, 1)
            tpd = tp.device_put()
            rp = (
                neighbor_grouping_plan(res, 8).device_put()
                if res.num_edges
                else None
            )
            r = benchmark_chained(
                lambda x, t, p: hybrid_spmm(t, None, p, None, x),
                h,
                tpd,
                rp,
                iters=args.iters,
            )
            base_plan = neighbor_grouping_plan(g2, args.nei).device_put()
            rb = benchmark_chained(
                lambda x, p: spmm_xla(p, x), h, base_plan, iters=args.iters
            )
            common.emit(
                "fig9",
                dict(
                    dataset=name,
                    reorder=rname,
                    dense_coverage=coverage,  # the TPU "hit rate" analog
                    hybrid_s=r.min_s,
                    gather_s=rb.min_s,
                    edges_per_s=g2.num_edges / min(r.min_s, rb.min_s),
                ),
                args,
            )


if __name__ == "__main__":
    main()
