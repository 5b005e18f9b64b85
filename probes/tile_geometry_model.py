"""Tile-geometry cost model: is R=512 (or 1024) better than R=256?

Host-only probe: from the cached reddit-scale graph + degree-sort perm,
histogram adjacency bins for (tile_rows, threshold) combos and price each
config with the measured v5e constants (PERF_NOTES.md, session 5):

  dense tile cost  = (A_bytes + H_bytes(f)) / 640 GB/s, floored at the
                     ~110 ns/tile per-step overhead seen at f<=64 R=256
  residual slot    = 8.5 ns (f32, f=128) / 7.25 ns (f16_split2, f<=64)
  slot pad factor  = 1.10 (residual block 4)

H_bytes(f): the pack-16 kernel fetches one [C, 2f] bf16 split2 operand per
tile (f<=64 fast modes) or [C, 3f] split3 at f=128-exact... the bench's
fast path uses 'split' (2 chunks) everywhere => H = C * 2f * 2 bytes.

Run AFTER bench caches exist (data/bench_cache/rmat_*.edges.npz +
perm_rmat_*_degree.npy); prints a model-cost table per config.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "data", "bench_cache")
N, M = 232_965, 114_615_891

BW = 640e9          # measured effective HBM BW through the BCSR kernel
STEP_FLOOR_NS = 110  # per-tile floor at R=256 (pack-16 fixed costs)
SLOT_NS = {128: 8.5, 64: 7.25, 32: 7.25}   # f -> ns/slot (f32 / f16_split2)
PAD = 1.10          # residual block-4 slot padding
FS = (128, 64, 32)  # aggregation widths of the 3 bench layers


def main():
    from gnn_computing_tpu.graph.csr import CSRGraph

    z = np.load(os.path.join(CACHE, f"rmat_n{N}_m{M}.edges.npz"))
    g = CSRGraph(indptr=z["indptr"], indices=z["indices"])
    perm = np.load(os.path.join(CACHE, f"perm_rmat_n{N}_m{M}_degree.npy"))
    t0 = time.time()
    g = g.reorder(perm)
    print(f"reorder: {time.time()-t0:.0f}s", flush=True)

    src = g.indices.astype(np.int64)
    dst = g.dst_per_edge.astype(np.int64)
    C = 128
    nct = -(-N // C)
    cbin = src // C

    print(f"{'R':>5} {'thr':>4} {'tiles':>8} {'cover%':>7} {'res_edges':>10}"
          f" {'dense_ms':>9} {'res_ms':>7} {'total_ms':>9}")
    for R in (256, 512, 1024):
        nrt = -(-N // R)
        key = (dst // R) * nct + cbin
        counts = np.bincount(key, minlength=nrt * nct)
        order = None
        for thr in (16, 24, 32, 48, 64, 96):
            dense_mask = counts >= thr
            ntiles = int(dense_mask.sum())
            dense_edges = int(counts[dense_mask].sum())
            res_edges = M - dense_edges
            # pack-16 run padding: tiles per dst row-run pad to mult of 16;
            # approximate with the R=256 measured pad (157k vs ~149k ~ 5%)
            ntiles_p = ntiles * 1.05
            dense_ms = 0.0
            res_ms = 0.0
            for f in FS:
                a_bytes = R * C            # int8 counts
                h_bytes = C * 2 * f * 2    # [C,2f] bf16 split2
                per_tile = max((a_bytes + h_bytes) / BW * 1e9, STEP_FLOOR_NS)
                dense_ms += ntiles_p * per_tile * 1e-6
                res_ms += res_edges * PAD * SLOT_NS[f] * 1e-6
            print(f"{R:>5} {thr:>4} {ntiles:>8} {100*dense_edges/M:>6.1f}%"
                  f" {res_edges:>10} {dense_ms:>9.1f} {res_ms:>7.1f}"
                  f" {dense_ms+res_ms:>9.1f}", flush=True)


if __name__ == "__main__":
    main()
