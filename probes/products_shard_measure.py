"""Measure ONE owner shard of the products all-gather plan on the real
chip (VERDICT r3 #7: the 0.46x@8-chip claim rested on a projection from
measured constants; the single chip can run exactly owner-0's per-chip
program — tiles + residual on the full gathered H — and reconcile).

Two phases like bench.py: a CPU build phase caches owner-0's arrays
(the full 8-owner plan build is a ~25 min host pass), then a fresh
process times on the TPU.

  PYTHONPATH=/root/repo:$PYTHONPATH python probes/products_shard_measure.py
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PRODUCTS_N, PRODUCTS_M = 2_449_029, 123_718_280
D = 8
F = 128
CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data", "bench_cache", "products_ag8_owner0.npz",
)


def build():
    from bench import build_graph, log
    from gnn_computing_tpu.graph.reorder import deal_shards, degree_sort
    from gnn_computing_tpu.parallel.allgather_tiles import (
        build_allgather_hybrid,
    )

    g0 = build_graph(PRODUCTS_N, PRODUCTS_M, kind="rmat")
    t0 = time.time()
    g = g0.reorder(deal_shards(degree_sort(g0), D))
    del g0
    log(f"reorder: {time.time() - t0:.0f}s")
    t0 = time.time()
    plan, gp = build_allgather_hybrid(
        g, D, tile_rows=512, tile_cols=128, threshold=48,
        residual_block=4, pack=4,
        # this probe unpacks groups manually against the FULL gathered H;
        # local_split rebases local-group cols to the shard, which this
        # manual path does not model
        local_split=False,
    )
    log(f"plan build: {time.time() - t0:.0f}s  {plan.stats()}")
    kw = {}
    for i, grp in enumerate(plan.groups):
        kw[f"g{i}_a"] = np.asarray(grp.a[0])
        kw[f"g{i}_row"] = np.asarray(grp.row[0])
        kw[f"g{i}_col"] = np.asarray(grp.col[0])
        kw[f"g{i}_bits"] = np.asarray(grp.bits)
        kw[f"g{i}_pack"] = np.asarray(grp.pack)
        kw[f"g{i}_tr"] = np.asarray(grp.tile_rows)
        kw[f"g{i}_tc"] = np.asarray(grp.tile_cols)
    np.savez(
        CACHE,
        rsrc=np.asarray(plan.rsrc[0]),
        rcnt=np.asarray(plan.rcnt[0]),
        rdst=np.asarray(plan.rdst[0]),
        rval=np.asarray(plan.rval[0]),
        ns=plan.shard_size,
        n_pad=plan.n_pad,
        block=plan.block_size,
        ngroups=len(plan.groups),
        **kw,
    )
    log(f"cached owner-0 -> {CACHE}")


def measure():
    import jax
    import jax.numpy as jnp

    from gnn_computing_tpu.graph.synthetic import normal_features
    from gnn_computing_tpu.ops.bcsr import bcsr_spmm
    from gnn_computing_tpu.ops.spmm import spmm_xla
    from gnn_computing_tpu.schedule.plan import AggregationPlan
    from gnn_computing_tpu.schedule.tiles import TilePlan
    from gnn_computing_tpu.utils.timing import benchmark_chained

    z = np.load(CACHE)
    ns, n_pad, b = int(z["ns"]), int(z["n_pad"]), int(z["block"])
    tps = []
    for i in range(int(z["ngroups"])):
        tps.append(
            TilePlan(
                a=z[f"g{i}_a"],
                tile_row=z[f"g{i}_row"],
                tile_col=z[f"g{i}_col"],
                scale_dst=None,
                scale_src=None,
                num_nodes=ns,
                n_src=n_pad,
                tile_rows=int(z[f"g{i}_tr"]),
                tile_cols=int(z[f"g{i}_tc"]),
                num_tiles=z[f"g{i}_a"].shape[0],
                num_dense_edges=0,
                pack=int(z[f"g{i}_pack"]),
                bits=bool(z[f"g{i}_bits"]),
            ).device_put()
        )
    nt = z["rcnt"].shape[0]
    rp = AggregationPlan(
        src=z["rsrc"], count=z["rcnt"], dst=z["rdst"], val=z["rval"],
        edge_perm=None, num_nodes=ns, n_src=n_pad, block_size=b,
        num_tasks=nt, num_edges=1, sorted_by_dst=True,
        partition_starts=(0, nt),
    ).device_put()
    h = jnp.asarray(normal_features(n_pad, F, seed=5) * 0.1)
    results = {}

    def run(name, fn, *a):
        r = benchmark_chained(fn, *a, iters=8, reps=3)
        results[name] = round(r.min_s * 1e3, 2)
        print(f"{name:14s} {r.min_s * 1e3:8.2f} ms  [compile "
              f"{r.compile_s:.0f}s]", flush=True)

    def dense(hh, t):
        out = None
        for tp in t:
            part = bcsr_spmm(tp, hh)
            out = part if out is None else out + part
        return out

    run("dense", dense, h, tuple(tps))
    run("residual", lambda hh, p: spmm_xla(p, hh), h, rp)
    run(
        "full_local",
        lambda hh, t, p: dense(hh, t) + spmm_xla(p, hh),
        h, tuple(tps), rp,
    )
    # reconcile vs the projection row (products_allgather.jsonl):
    # projected dense_s + res_s at f=128 was 0.067 - gather_s(0.0125)
    row = {
        "metric": "products_allgather8_owner0_measured_pass_ms",
        "dense_ms": results["dense"],
        "residual_ms": results["residual"],
        "full_local_ms": results["full_local"],
        "f": F,
        "note": "owner-0 per-chip program on the real chip, full "
        "gathered H resident (the ICI all-gather itself stays "
        "projected; 1 chip)",
        "ts": time.time(),
    }
    print(json.dumps(row))
    outp = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "results", "products_allgather.jsonl",
    )
    with open(outp, "a") as fh:
        fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    if "--phase-build" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        build()
    elif not os.path.exists(CACHE):
        rc = subprocess.call(
            [sys.executable, os.path.abspath(__file__), "--phase-build"],
            env=dict(os.environ, JAX_PLATFORMS="cpu"),
        )
        if rc:
            sys.exit(rc)
        sys.exit(
            subprocess.call([sys.executable, os.path.abspath(__file__)])
        )
    else:
        measure()
