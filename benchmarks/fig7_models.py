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


def main():
    args = common.parser(__doc__).parse_args()
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
