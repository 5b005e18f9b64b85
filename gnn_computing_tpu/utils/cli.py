"""Command-line interface (reference C1: argParse, src/util.cu:24-147).

Mirrors the reference flag vocabulary — ``--dataset --datadir --reorder
--nei --feature-len --outfea`` — plus subcommands covering the reference's
offline tools and benchmark drivers:

  info        dataset/graph statistics
  schedule    build a plan, print task histogram (ANALYSE_RESULT analog,
              graph_schedule.h:58-88)
  reorder     MinHash-LSH cluster reorder -> ``<dset>.reorder<subfix>`` file
              (script/cluster2.py contract)
  presample   fixed-k neighbor sampling -> ``<dset>_sample_<k>`` graph files
              (the Figure7/11 ``_sample_16`` inputs)
  bench       timed model forward (GCN / GAT / SAGE-LSTM), dbg-style logs
  train       full-graph GCN training (new capability)

Datasets resolve like the reference loader: ``<datadir>/<dset>.config`` +
``.graph``; synthetic graphs via ``--syn rmat:n:m`` bypass the data
directory entirely.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--dataset", default=None, help="dataset name")
    p.add_argument("--datadir", default="data", help="dataset directory")
    p.add_argument(
        "--syn", default=None,
        help="synthetic graph '{rmat|community}:<n>:<m>[:seed]'"
    )
    p.add_argument(
        "--reorder",
        default="",
        help="reorder file subfix (reference --reorder), e.g. _thres_0.2",
    )
    p.add_argument(
        "--nei",
        type=int,
        default=32,
        help="neighbor group / block size (reference --nei)",
    )
    p.add_argument(
        "--feature-len", type=int, default=32, dest="feature_len"
    )
    p.add_argument("--outfea", type=int, default=32)
    p.add_argument(
        "--schedule",
        default="neighbor_grouping",
        choices=[
            "neighbor_grouping",
            "locality",
            "locality_neighbor_grouping",
            "nop",
        ],
    )
    p.add_argument("--partitions", type=int, default=8)


def _load(args):
    from gnn_computing_tpu.graph.io import load_graph
    from gnn_computing_tpu.graph.synthetic import rmat_graph

    if args.syn:
        from gnn_computing_tpu.graph.synthetic import community_graph

        parts = args.syn.split(":")
        kind, n, m = parts[0], int(parts[1]), int(parts[2])
        seed = int(parts[3]) if len(parts) > 3 else 123
        if kind == "community":
            return community_graph(n, m, seed=seed), None
        assert kind == "rmat", f"unknown synthetic kind {kind}"
        return rmat_graph(n, m, seed=seed), None
    assert args.dataset, "--dataset or --syn required"
    return load_graph(args.datadir, args.dataset, args.reorder)


def _plan(args, g):
    from gnn_computing_tpu.schedule import Schedule, make_plan

    kw = {}
    sched = Schedule(args.schedule)
    if sched in (
        Schedule.locality,
        Schedule.locality_neighbor_grouping,
    ):
        kw["num_partitions"] = args.partitions
    if sched is not Schedule.nop:
        kw["block_size"] = args.nei
    return make_plan(g, sched, **kw)


def cmd_info(args):
    g, rows = _load(args)
    deg = g.degrees
    print(
        json.dumps(
            {
                "num_nodes": g.num_nodes,
                "num_edges": g.num_edges,
                "max_degree": int(deg.max()) if len(deg) else 0,
                "mean_degree": float(deg.mean()) if len(deg) else 0,
                "reordered": rows is not None,
            }
        )
    )


def cmd_schedule(args):
    g, _ = _load(args)
    t0 = time.time()
    plan = _plan(args, g)
    stats = plan.stats()
    stats["schedule_seconds"] = time.time() - t0
    print(json.dumps(stats))


def cmd_reorder(args):
    import os

    from gnn_computing_tpu.graph.reorder import (
        cluster_reorder,
        degree_sort,
        label_propagation_reorder,
    )

    g, _ = _load(args)
    if args.method == "lpa":
        perm = label_propagation_reorder(g)
        subfix = "_lpa"
    elif args.method == "degree":
        perm = degree_sort(g)
        subfix = "_degree"
    else:
        perm = cluster_reorder(
            g, threshold=args.threshold, max_cluster=args.max_cluster
        )
        subfix = f"_thres_{args.threshold}"
    out = args.output or os.path.join(
        args.datadir, f"{args.dataset}.reorder{subfix}"
    )
    with open(out, "w") as f:
        f.write("\n".join(str(int(x)) for x in perm))
    print(json.dumps({"output": out, "n": len(perm)}))


def cmd_presample(args):
    import os

    from gnn_computing_tpu.graph.sample import presample_fixed_neighbors

    g, _ = _load(args)
    nbr = presample_fixed_neighbors(g, k=args.k, seed=args.seed)
    name = f"{args.dataset or 'syn'}_sample_{args.k}"
    cfg = os.path.join(args.datadir, name + ".config")
    gp = os.path.join(args.datadir, name + ".graph")
    os.makedirs(args.datadir, exist_ok=True)
    with open(cfg, "w") as f:
        f.write(f"{g.num_nodes} {g.num_nodes * args.k}\n")
    with open(gp, "w") as f:
        f.write(
            " ".join(
                str(i * args.k) for i in range(g.num_nodes + 1)
            )
            + "\n"
        )
        f.write(" ".join(str(int(x)) for x in nbr.reshape(-1)) + "\n")
    print(json.dumps({"config": cfg, "graph": gp}))


def cmd_bench(args):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from gnn_computing_tpu.graph.synthetic import normal_features
    from gnn_computing_tpu.utils.flops import aggregation_gflops

    g, _ = _load(args)
    f = args.feature_len
    h = jnp.asarray(normal_features(g.num_nodes, f, seed=123) * 0.1)

    if args.model in ("gcn", "gat"):
        plan = _plan(args, g).device_put()
        if args.model == "gcn":
            from gnn_computing_tpu.ops.spmm import spmm

            # feature array FIRST: benchmark_chained perturbs args[0] to
            # keep the loop body live (a fori over invariant args gets the
            # whole body hoisted by XLA and reports time/iters)
            fn = lambda x, p: spmm(p, x)
            inputs = (h, plan)
        else:
            from gnn_computing_tpu.ops.gat import gat_aggregate

            att = jnp.asarray(
                normal_features(g.num_nodes, 2, seed=7) * 0.1
            )
            fn = lambda x, p, a: gat_aggregate(p, x, a)
            inputs = (h, plan, att)
    elif args.model == "sage_lstm":
        import jax.random as jrandom

        from gnn_computing_tpu.graph.sample import (
            presample_fixed_neighbors,
        )
        from gnn_computing_tpu.ops.lstm import (
            init_lstm_params,
            lstm_aggregate,
        )

        nbr = jnp.asarray(presample_fixed_neighbors(g, k=args.k))
        params = init_lstm_params(jrandom.key(0), f, f)
        fn = lambda x, p, nb: lstm_aggregate(p, x, nb, args.strategy)
        inputs = (h, params, nbr)
    else:
        raise SystemExit(f"unknown model {args.model}")

    # Loop-carried chained timing (slope fit over two chain lengths):
    # cancels dispatch overhead AND defeats XLA's loop-invariant hoisting
    # — the previous fori-over-invariant-args version here reported
    # time/iters (the exact bug class documented in utils/timing.py).
    from gnn_computing_tpu.utils.timing import benchmark_chained

    r = benchmark_chained(fn, *inputs, iters=args.iters, reps=3)
    best = r.min_s
    print(
        json.dumps(
            {
                "model": args.model,
                "seconds": best,
                "edges_per_s": g.num_edges / best,
                "gflops": aggregation_gflops(g.num_edges, f, best),
            }
        )
    )


def cmd_train(args):
    import jax
    import jax.numpy as jnp
    import optax

    from gnn_computing_tpu.graph.synthetic import normal_features
    from gnn_computing_tpu.models import init_gcn_params
    from gnn_computing_tpu.models.gcn import gcn_forward
    from gnn_computing_tpu.models.training import (
        accuracy,
        make_train_step,
    )

    g, _ = _load(args)
    plan = _plan(args, g).device_put()
    dims = (args.feature_len, 64, args.classes)
    params = init_gcn_params(jax.random.key(0), dims)
    h = jnp.asarray(normal_features(g.num_nodes, dims[0], seed=1) * 0.1)
    rng = np.random.default_rng(0)
    labels = jnp.asarray(rng.integers(0, args.classes, g.num_nodes))

    opt = optax.adam(args.lr)
    opt_state = opt.init(params)
    step = make_train_step(
        lambda p, plan, x: gcn_forward(plan, p, x), opt
    )
    for epoch in range(args.epochs):
        lval, params, opt_state = step(
            params, opt_state, (plan, h), labels
        )
        if epoch % max(args.epochs // 10, 1) == 0:
            acc = accuracy(gcn_forward(plan, params, h), labels)
            print(
                f"epoch {epoch}: loss {float(lval):.4f} "
                f"acc {float(acc):.4f}",
                file=sys.stderr,
            )
    print(json.dumps({"final_loss": float(lval), "epochs": args.epochs}))


def cmd_tune(args):
    from gnn_computing_tpu.utils.autotune import tune

    g, _ = _load(args)
    r = tune(
        g,
        feature_len=args.feature_len,
        iters=args.iters,
        weighted=g.val is not None,
    )
    print(
        json.dumps(
            {
                "best": r.best_config,
                "table": [
                    {**cfg, "seconds": t} for cfg, t in r.table
                ],
            }
        )
    )


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="gnn_computing_tpu",
        description="TPU-native GNN framework CLI",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("info")
    _add_common(p)
    p.set_defaults(fn=cmd_info)

    p = sub.add_parser("schedule")
    _add_common(p)
    p.set_defaults(fn=cmd_schedule)

    p = sub.add_parser("reorder")
    p.add_argument(
        "--method", default="cluster",
        choices=["cluster", "lpa", "degree"],
        help="cluster = reference cluster2.py semantics (LSH); lpa = "
        "community-contiguous label propagation (TPU tile locality); "
        "degree = hub sort",
    )
    _add_common(p)
    p.add_argument("--threshold", type=float, default=0.2)
    p.add_argument("--max-cluster", type=int, default=64)
    p.add_argument("--output", default=None)
    p.set_defaults(fn=cmd_reorder)

    p = sub.add_parser("presample")
    _add_common(p)
    p.add_argument("--k", type=int, default=16)
    p.add_argument("--seed", type=int, default=123)
    p.set_defaults(fn=cmd_presample)

    p = sub.add_parser("bench")
    _add_common(p)
    p.add_argument(
        "--model",
        default="gcn",
        choices=["gcn", "gat", "sage_lstm"],
    )
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--k", type=int, default=16)
    p.add_argument(
        "--strategy",
        default="redundancy_bypass",
        choices=["redundancy_bypass", "sparse_fetch", "materialize"],
    )
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("tune")
    _add_common(p)
    p.add_argument("--iters", type=int, default=4)
    p.set_defaults(fn=cmd_tune)

    p = sub.add_parser("train")
    _add_common(p)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--classes", type=int, default=16)
    p.set_defaults(fn=cmd_train)

    args = ap.parse_args(argv)
    return args.fn(args)
