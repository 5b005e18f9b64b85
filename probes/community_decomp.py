"""Probe 5: why is the community+hublpa hybrid 343 ms when the cost model
says ~186?  (RMAT t24 measured 148 ms; community has 1.33x tiles and 1.2x
residual slots, so linear scaling predicts ~186 ms.)

Decompose per plan (cached RMAT-t24 vs community-hublpa-t24), per width:
  * dense tiles only  (pallas bcsr, h_mode='split' — the bench fast mode)
  * residual only     (spmm_xla, f16_split2 at f<=64 / f32 at f=128)

Hypotheses the numbers separate:
  H1 residual indices: RMAT residual gathers hit degree-sorted hub rows
     (DRAM row locality ~5 ns/row); community residual = cross-community
     stragglers, near-uniform (~11 ns/row measured on uniform indices).
  H2 dense H-operand locality: RMAT tiles concentrate on few hub tile_cols
     (H tile reuse across adjacent grid steps); community tiles spread
     over ~1820 cols.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python probes/community_decomp.py [which]
  which = rmat | comm | both (default both, one at a time to fit HBM)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def load(kind):
    """Cache-hit load through bench.build_hybrid (pack16, the bench config)."""
    if kind == "rmat":
        return bench.build_hybrid(
            None, 232_965, 114_615_891, 24, 256, 4, tile_dtype="int8",
            pack=16, reorder="degree", graph_kind="rmat",
        )
    return bench.build_hybrid(
        None, 232_965, 114_615_891, 24, 256, 4, tile_dtype="int8",
        pack=16, reorder="hublpa", graph_kind="community",
    )


def measure(kind):
    import jax.numpy as jnp

    from gnn_computing_tpu.ops.bcsr import bcsr_spmm
    from gnn_computing_tpu.ops.spmm import spmm_xla
    from gnn_computing_tpu.utils.timing import benchmark_chained

    agg = load(kind).device_put()
    tile, plan = agg.tile, agg.plan
    nslots = plan.src.shape[0] * plan.src.shape[1]
    print(
        f"== {kind}: padded tiles={tile.num_tiles} resid slots={nslots}",
        flush=True,
    )
    for F in (128, 64):
        h = jnp.asarray(
            np.random.default_rng(0).standard_normal(
                (232_965, F), dtype=np.float32
            )
        )
        r = benchmark_chained(
            lambda hh, tp: bcsr_spmm(tp, hh, "auto", h_mode="split"),
            h, tile, iters=8,
        )
        print(
            f"{kind} f={F} dense  {r.min_s * 1e3:8.2f} ms "
            f"{r.min_s / tile.num_tiles * 1e9:6.1f} ns/tile "
            f"(compile {r.compile_s:.0f}s)",
            flush=True,
        )
        gdt = "f16_split2" if F <= 64 else None
        r = benchmark_chained(
            lambda hh, p: spmm_xla(p, hh, gather_dtype=gdt),
            h, plan, iters=8,
        )
        print(
            f"{kind} f={F} resid  {r.min_s * 1e3:8.2f} ms "
            f"{r.min_s / nslots * 1e9:6.2f} ns/slot "
            f"(compile {r.compile_s:.0f}s)",
            flush=True,
        )


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    kinds = ["rmat", "comm"] if which == "both" else [which]
    for kind in kinds:
        t0 = time.time()
        measure(kind)
        print(f"{kind} total {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
