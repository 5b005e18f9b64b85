"""Multi-device scaling benchmark: edges/s at 1/2/4/.../N devices.

North-star metric (BASELINE.json): edges/s scaling efficiency at 1 chip,
1 host, N>=2 hosts, with halo exchange overlapped with local aggregation.
This driver measures the ring-hybrid aggregation (parallel/ring_tiles.py)
over every power-of-two device count available on the current backend.

On a real TPU slice the numbers are the scaling result; under
`XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu`
they only validate the plumbing (CPU compute/ICI ratios are not
representative — treat efficiency figures from CPU meshes as smoke
output, not results).

Emits one JSONL record per device count to results/scaling.jsonl.
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The axon sitecustomize force-selects the TPU backend via jax.config,
# ignoring JAX_PLATFORMS; honor the env var here so the CPU virtual-mesh
# invocation documented above actually lands on the N-device CPU backend.
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from benchmarks import common
from gnn_computing_tpu.graph.synthetic import normal_features, rmat_graph
from gnn_computing_tpu.parallel import make_mesh, shard_ring_plan, shard_rows
from gnn_computing_tpu.parallel.ring_tiles import (
    build_ring_hybrid,
    ring_hybrid_spmm,
)
from gnn_computing_tpu.utils.timing import benchmark_chained


def main():
    ap = common.parser(__doc__)
    ap.add_argument("--n", type=int, default=1 << 16)
    ap.add_argument("--m", type=int, default=1 << 22)
    ap.add_argument("--threshold", type=int, default=24)
    ap.add_argument(
        "--allgather", action="store_true",
        help="sweep the DEFAULT distribution (parallel/allgather_tiles, "
        "full single-chip kernel reuse behind one collective) instead of "
        "the capacity-fallback ring; pair with --n 169343 --m 1166243 "
        "for the arxiv-scale plumbing curve",
    )
    args = ap.parse_args()

    ndev = len(jax.devices())
    platform = jax.devices()[0].platform
    g = rmat_graph(args.n, args.m, seed=123, with_val=False)

    if args.allgather:
        from gnn_computing_tpu.parallel.allgather_tiles import (
            allgather_hybrid_spmm,
            build_allgather_hybrid,
        )

        base_rate = None
        d = 1
        while d <= ndev:
            mesh = make_mesh(num_graph=d)
            plan, gp = build_allgather_hybrid(
                g, d, tile_rows=256, tile_cols=128,
                threshold=max(args.threshold // 2, 4), residual_block=4,
                pack=8,
            )
            plan = plan.device_put(shard_ring_plan(mesh))
            h = jax.device_put(
                jnp.asarray(
                    normal_features(
                        gp.num_nodes, args.feature_len, seed=1
                    ) * 0.1
                ),
                shard_rows(mesh),
            )
            r = benchmark_chained(
                lambda hh, p: allgather_hybrid_spmm(mesh, p, hh),
                h, plan, iters=args.iters,
            )
            rate = g.num_edges / r.min_s
            if base_rate is None:
                base_rate = rate
            common.emit(
                "scaling",
                dict(
                    platform=platform,
                    path="allgather",
                    devices=d,
                    seconds=r.min_s,
                    edges_per_s=rate,
                    scaling_efficiency=rate / (base_rate * d),
                    n=g.num_nodes,
                    m=g.num_edges,
                    representative=platform == "tpu",
                ),
                args,
            )
            d *= 2
        return

    base_rate = None
    d = 1
    while d <= ndev:
        mesh = make_mesh(num_graph=d)
        rtp, ring, gp = build_ring_hybrid(
            g, d, tile_rows=128, tile_cols=128,
            threshold=args.threshold,
        )
        rtp = rtp.device_put(shard_ring_plan(mesh))
        ring = ring.device_put(shard_ring_plan(mesh))
        h = jax.device_put(
            jnp.asarray(
                normal_features(gp.num_nodes, args.feature_len, seed=1)
                * 0.1
            ),
            shard_rows(mesh),
        )
        r = benchmark_chained(
            lambda hh, t, rg: ring_hybrid_spmm(mesh, t, rg, hh),
            h, rtp, ring, iters=args.iters,
        )
        rate = g.num_edges / r.min_s
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * d)
        common.emit(
            "scaling",
            dict(
                platform=platform,
                devices=d,
                seconds=r.min_s,
                edges_per_s=rate,
                scaling_efficiency=eff,
                n=g.num_nodes,
                m=g.num_edges,
                representative=platform == "tpu",
            ),
            args,
        )
        d *= 2


if __name__ == "__main__":
    main()
