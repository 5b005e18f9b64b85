"""Fig7 analog: end-to-end 3-layer model forward times (GCN / GAT / SAGE).

Reference: Figure7/{our,dgl_prof,pyg}.py + run_our.sh — 3-layer pipelines at
dims 512->128->64->32 (our.py:92-95), mean forward time.  Here each model
runs with the framework's best schedule; the V100 "Ours" numbers in
BASELINE.md are the bar to clear at reddit scale (bench.py's job); this
sweep tracks the shape across graph scales.
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks import common
from gnn_computing_tpu.graph.sample import presample_fixed_neighbors
from gnn_computing_tpu.graph.synthetic import normal_features
from gnn_computing_tpu.models import (
    BENCH_DIMS,
    init_gat_params,
    init_gcn_params,
)
from gnn_computing_tpu.models.gat import gat_forward
from gnn_computing_tpu.models.gcn import fast_layer_opts, gcn_forward_bench
from gnn_computing_tpu.models.sage_lstm import (
    BENCH_FEATURE_LEN,
    BENCH_NUM_NEIGHBORS,
)
from gnn_computing_tpu.ops.lstm import init_lstm_params, lstm_aggregate
from gnn_computing_tpu.schedule import neighbor_grouping_plan
from gnn_computing_tpu.utils.timing import benchmark_chained


def reddit_entries(args):
    """Reddit-scale fig7 rows from bench.py's CACHED plans (fresh-process
    discipline applies: run this alone, after `python bench.py --phase
    build` has populated data/bench_cache).  Makes fig7.jsonl comparable
    to BASELINE.md's V100 table at the anchor scale."""
    import numpy as np

    import bench as B

    n, m = B.REDDIT_N, B.REDDIT_M
    g = B.build_graph(n, m, kind="rmat")
    plan = B.build_hybrid(
        (lambda: g), n, m, 24, 512, 4, tile_dtype="int8", pack=16,
        reorder="degree", graph_kind="rmat",
    ).device_put()
    h = jnp.asarray(normal_features(n, BENCH_DIMS[0], seed=123) * 0.1)
    gcn_params = init_gcn_params(jax.random.key(0), BENCH_DIMS)
    opts = fast_layer_opts(BENCH_DIMS)
    r = benchmark_chained(
        lambda hh, p, w: gcn_forward_bench(p, w, hh, layer_opts=opts),
        h, plan, gcn_params, iters=8,
    )
    common.emit(
        "fig7",
        dict(dataset="reddit_scale_rmat", model="GCN", seconds=r.min_s,
             edges_per_s=3 * m / r.min_s,
             v100_ours_seconds=0.058089),
        args,
    )
    gat_params = init_gat_params(jax.random.key(1), BENCH_DIMS)
    r = benchmark_chained(
        lambda hh, p, w: gat_forward(p, w, hh, fast=True),
        h, plan, gat_params, iters=8,
    )
    common.emit(
        "fig7",
        dict(dataset="reddit_scale_rmat", model="GAT", seconds=r.min_s,
             edges_per_s=3 * m / r.min_s,
             v100_ours_seconds=0.055538),
        args,
    )
    del plan, h
    nbr_path = os.path.join(
        "data", "bench_cache", f"sample16_rmat_n{n}_m{m}.npz"
    )
    import numpy as _np

    if os.path.exists(nbr_path):
        nbr = jnp.asarray(_np.load(nbr_path)["nbr"])
    else:
        nbr = jnp.asarray(presample_fixed_neighbors(g, k=16, seed=2))
    x = jnp.asarray(normal_features(n, BENCH_FEATURE_LEN, seed=3) * 0.1)
    lstm = init_lstm_params(
        jax.random.key(2), BENCH_FEATURE_LEN, BENCH_FEATURE_LEN
    )
    r = benchmark_chained(
        lambda xx, p, nb: lstm_aggregate(
            p, xx, nb, "redundancy_bypass", gate_gather_dtype=jnp.float16
        ),
        x, lstm, nbr, iters=8,
    )
    common.emit(
        "fig7",
        dict(dataset="reddit_scale_rmat", model="SAGE-LSTM",
             seconds=r.min_s, edges_per_s=n * 16 / r.min_s,
             v100_ours_seconds=0.014204),
        args,
    )


def main():
    ap = common.parser(__doc__)
    ap.add_argument(
        "--reddit", action="store_true",
        help="emit reddit-scale rows from bench.py's cached plans instead "
        "of the synthetic sweep (run alone in a fresh process)",
    )
    args = ap.parse_args()
    if args.reddit:
        reddit_entries(args)
        return
    for name, g in common.datasets(args):
        # the framework's best schedule: reorder (hub+LPA for community
        # graphs, degree sort for rmat) + MXU densification + gather
        # residual (same recipe as bench.py), exact fast modes
        import numpy as np
        from gnn_computing_tpu.aggregator import Aggregator
        from gnn_computing_tpu.graph.reorder import (
            degree_sort,
            label_propagation_reorder,
        )

        perm = (
            label_propagation_reorder(g, hubs=max(256, g.num_nodes // 128))
            if name.startswith("comm")
            else degree_sort(g)
        )
        g2 = g.reorder(perm)
        plan = Aggregator.schedule_hybrid(
            g2, tile_rows=256, tile_cols=128, threshold=24,
            residual_block=common.pick_block(args, g),
            tile_dtype=np.int8, with_transpose=False, pack=16,
        )
        h = jnp.asarray(
            normal_features(g.num_nodes, BENCH_DIMS[0], seed=1) * 0.1
        )

        gcn_params = init_gcn_params(jax.random.key(0), BENCH_DIMS)
        opts = fast_layer_opts(BENCH_DIMS)
        r = benchmark_chained(
            lambda hh, p, w: gcn_forward_bench(p, w, hh, layer_opts=opts),
            h, plan, gcn_params, iters=args.iters,
        )
        common.emit(
            "fig7",
            dict(
                dataset=name,
                model="GCN",
                seconds=r.min_s,
                edges_per_s=3 * g.num_edges / r.min_s,
            ),
            args,
        )

        gat_params = init_gat_params(jax.random.key(1), BENCH_DIMS)
        r = benchmark_chained(
            lambda hh, p, w: gat_forward(p, w, hh, fast=True),
            h, plan, gat_params, iters=args.iters,
        )
        common.emit(
            "fig7",
            dict(
                dataset=name,
                model="GAT",
                seconds=r.min_s,
                edges_per_s=3 * g.num_edges / r.min_s,
            ),
            args,
        )

        nbr = jnp.asarray(
            presample_fixed_neighbors(g, k=BENCH_NUM_NEIGHBORS, seed=2)
        )
        x = jnp.asarray(
            normal_features(g.num_nodes, BENCH_FEATURE_LEN, seed=3) * 0.1
        )
        lstm = init_lstm_params(
            jax.random.key(2), BENCH_FEATURE_LEN, BENCH_FEATURE_LEN
        )
        r = benchmark_chained(
            lambda xx, p, nb: lstm_aggregate(
                p, xx, nb, "redundancy_bypass",
                gate_gather_dtype=jnp.float16,
            ),
            x,
            lstm,
            nbr,
            iters=args.iters,
        )
        common.emit(
            "fig7",
            dict(
                dataset=name,
                model="SAGE-LSTM",
                seconds=r.min_s,
                edges_per_s=g.num_nodes * BENCH_NUM_NEIGHBORS / r.min_s,
            ),
            args,
        )


if __name__ == "__main__":
    main()
