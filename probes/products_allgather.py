"""Products-scale all-gather hybrid: plan build + 8-device mesh validation.

VERDICT r2 item 9: single-chip products is gather-bound physics (52-65%
max densifiable coverage at plan sizes that fit one chip's HBM/SMEM —
PERF_NOTES session 9/10), so the products claim is the MULTI-CHIP case.
This probe proves the distributed plan exists and is correct:

  1. builds the all-gather hybrid plan for the products graph
     (2,449,029 v / 123,718,280 e, util.py:33/:143) over 8 shards —
     per-owner tiling means each shard's plan is ~1/8 the single-chip
     plan, so the SMEM tile ceiling and HBM A-bytes both shrink 8x,
     letting the plan go DENSER than any single-chip geometry;
  2. runs one aggregation pass on the 8-device CPU mesh at f=32;
  3. validates against an independent torch-sparse CPU oracle;
  4. emits a JSONL row with plan stats + a projected per-chip time from
     the measured v5e constants (PERF_NOTES session 7 cost model).

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      PYTHONPATH=/root/repo python probes/products_allgather.py
(The single collective happens FIRST in the shard_map body, so the 1-CPU
host's ~40 s XLA-CPU rendezvous limit is not in play for the long local
compute that follows.)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PRODUCTS_N, PRODUCTS_M = 2_449_029, 123_718_280
# measured v5e constants (PERF_NOTES sessions 5-8)
DENSE_BW = 640e9  # B/s effective through the BCSR kernel
STEP_FLOOR = 110e-9  # per-grid-step overhead
RES_NS_PER_SLOT = 8.5e-9  # f32 residual, f=128


def main():
    from bench import build_graph, log
    from gnn_computing_tpu.parallel.allgather_tiles import (
        allgather_hybrid_spmm,
        build_allgather_hybrid,
    )
    from gnn_computing_tpu.parallel.mesh import (
        make_mesh,
        shard_ring_plan,
        shard_rows,
    )

    d = 8
    g0 = build_graph(PRODUCTS_N, PRODUCTS_M, kind="rmat")
    t0 = time.time()
    # degree sort + round-robin DEAL across the 8 owner shards: a plain
    # degree sort puts all hubs in owner 0, and _bucket_tiles_by_owner
    # pads every owner to the hub owner's tile count (measured host OOM
    # at 130 GB).  Dealing balances per-owner tile mass ~exactly.
    from gnn_computing_tpu.graph.reorder import deal_shards, degree_sort

    g = g0.reorder(deal_shards(degree_sort(g0), d))
    del g0
    log(f"degree+deal reorder: {time.time() - t0:.0f}s")
    t0 = time.time()
    # r512/t48: denser than ANY single-chip-fitting geometry (coverage
    # 71.8% vs 52-65%; probes/products_plan_curve.py) — per-chip SMEM and
    # HBM budgets relax 8x under per-owner sharding (A 19.5 GiB int8
    # pre-bit-split => ~1.5 GiB/chip after, ~40k tiles/owner)
    plan, gp = build_allgather_hybrid(
        g, d, tile_rows=512, tile_cols=128, threshold=48,
        residual_block=4, pack=4,
    )
    build_s = time.time() - t0
    stats = plan.stats()
    log(f"plan build {build_s:.0f}s: {stats}")

    import jax
    import jax.numpy as jnp

    mesh = make_mesh(num_graph=d)
    f = 32
    h = np.zeros((gp.num_nodes, f), np.float32)
    rng = np.random.default_rng(5)
    h[:PRODUCTS_N] = (rng.standard_normal((PRODUCTS_N, f)) * 0.1).astype(
        np.float32
    )
    plan_d = plan.device_put(shard_ring_plan(mesh))
    hs = jax.device_put(jnp.asarray(h), shard_rows(mesh))
    t0 = time.time()
    out = np.asarray(allgather_hybrid_spmm(mesh, plan_d, hs))
    log(f"mesh spmm pass (CPU, incl. compile): {time.time() - t0:.0f}s")

    # independent oracle: torch sparse CSR mm (f64)
    import torch

    t0 = time.time()
    dst = torch.from_numpy(np.asarray(g.dst_per_edge, np.int64))
    src = torch.from_numpy(np.asarray(g.indices, np.int64))
    a = torch.sparse_coo_tensor(
        torch.stack([dst, src]),
        torch.ones(g.num_edges, dtype=torch.float64),
        (g.num_nodes, g.n_src),
    )
    want = torch.sparse.mm(
        a, torch.from_numpy(h[: g.n_src]).to(torch.float64)
    ).numpy()
    log(f"torch oracle: {time.time() - t0:.0f}s")
    from gnn_computing_tpu.ops.validate import assert_valid

    assert_valid(out[: g.num_nodes], want, what="products allgather spmm")

    # projected per-chip time per pass at f=128 from measured constants:
    # every chip holds 1/d of the tiles and residual slots; the all_gather
    # of H rides ICI (measured-class 1e11 B/s per link on v5e would add
    # ~2.5 ms/pass for the 1.25 GB f32 gather at f=128 — counted below).
    a_bytes = sum(int(np.asarray(grp.a).nbytes) for grp in plan.groups)
    tiles_per_owner = sum(int(grp.a.shape[1]) for grp in plan.groups)
    slots = int(np.asarray(plan.rsrc).size)  # all owners
    h_bytes_per_tile = 128 * 128 * 4
    dense_s = (
        a_bytes / d + tiles_per_owner * h_bytes_per_tile
    ) / DENSE_BW + tiles_per_owner * STEP_FLOOR
    res_s = slots / d * RES_NS_PER_SLOT
    gather_s = gp.num_nodes * 128 * 4 / 1e11
    proj = dense_s + res_s + gather_s
    row = {
        "metric": "products_allgather8_projected_pass_s_per_chip",
        "build_s": round(build_s, 1),
        "a_bytes": int(a_bytes),
        "tiles_per_owner": tiles_per_owner,
        "residual_slots": slots,
        "dense_edges": int(plan.num_edges - plan.num_res_edges),
        "num_edges": int(plan.num_edges),
        "projected_pass_s": round(proj, 4),
        "projected_fwd3_s": round(3 * proj, 4),
        "v100_fwd3_s": 0.092553,
        "projected_vs_v100": round(0.092553 / (3 * proj), 3),
        "validated": True,
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
    main()
