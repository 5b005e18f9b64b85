"""Fig11 analog: GraphSAGE-LSTM strategy ablation.

Reference: Figure11/main.cu — the three LSTM-aggregation strategies on
fixed-16-neighbor sampled graphs, feature length 32:
  base (materialize)   — [n, k, f] neighbor tensor + dense gates
  +SpFetch             — gather raw features, re-transform per step
  +SpFetch+RedBypass   — transform once, gather gate rows (ours)
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks import common
from gnn_computing_tpu.graph.sample import presample_fixed_neighbors
from gnn_computing_tpu.graph.synthetic import normal_features
from gnn_computing_tpu.ops.lstm import init_lstm_params, lstm_aggregate
from gnn_computing_tpu.utils.timing import benchmark_chained

STRATEGIES = {
    "base": "materialize",
    "+SpFetch": "sparse_fetch",
    "+SpFetch+RedBypass": "redundancy_bypass",
}


def main():
    ap = common.parser(__doc__)
    ap.add_argument("--k", type=int, default=16)
    args = ap.parse_args()
    f = args.feature_len
    for name, g in common.datasets(args):
        nbr = jnp.asarray(presample_fixed_neighbors(g, k=args.k, seed=2))
        x = jnp.asarray(normal_features(g.num_nodes, f, seed=3) * 0.1)
        params = init_lstm_params(jax.random.key(0), f, f)
        for label, strat in STRATEGIES.items():
            r = benchmark_chained(
                lambda xx, p, nb, s=strat: lstm_aggregate(
                    p, xx, nb, s,
                    gate_gather_dtype=(
                        jnp.float16 if s == "redundancy_bypass" else None
                    ),
                ),
                x,
                params,
                nbr,
                iters=args.iters,
            )
            common.emit(
                "fig11",
                dict(
                    dataset=name,
                    strategy=label,
                    seconds=r.min_s,
                    edges_per_s=g.num_nodes * args.k / r.min_s,
                ),
                args,
            )


if __name__ == "__main__":
    main()
