"""Host cost model for the tile_cols axis (VERDICT r4 #2: C never swept).

Same counting approach as tile_geometry_model.py but sweeping C at R=512,
with the round-4 measured corrections: the dense phase is NOT purely
DMA-bound — each tile pays a fixed per-step share (~110-160 ns at
C=128/pack16, from per-step overhead + A decode), which is the term wider
tiles amortize (half the tiles at C=256 for the same A bytes).  The model
prices:

  dense = A_bytes/BW + tiles*(H_bytes(C,f)/BW) + tiles*FIXED_NS
  residual = res_edges * PAD * SLOT_NS[f]      (per pass, summed over FS)

Coverage RISES with C at the area-equivalent threshold (a [512,256] window
with thr*2 edges admits windows whose [512,128] halves individually fall
under thr), so both terms move in the right direction; the open question
is measured VMEM/stack limits at wide C (probes/gat_dot_split2 pattern).

Run AFTER bench caches exist.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data", "bench_cache",
)
N, M = 232_965, 114_615_891

BW = 640e9
FIXED_NS = 130.0      # measured f<=64 per-tile cost minus byte cost (C=128)
SLOT_NS = {128: 12.6, 64: 11.0, 32: 11.0}  # r512-tail rates (round 4)
PAD = 1.10
FS = (128, 64, 32)


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
    R = 512
    nrt = -(-N // R)
    rbin = dst // R

    print(f"{'C':>5} {'thr':>4} {'tiles':>8} {'cover%':>7} {'res_edges':>10}"
          f" {'A_GB':>6} {'dense_ms':>9} {'res_ms':>7} {'total_ms':>9}")
    for C in (128, 256, 512):
        nct = -(-N // C)
        key = rbin * nct + (src // C)
        counts = np.bincount(key, minlength=nrt * nct)
        for thr in (16, 24, 32, 48, 64, 96, 128):
            dense_mask = counts >= thr
            ntiles = int(dense_mask.sum())
            dense_edges = int(counts[dense_mask].sum())
            res_edges = M - dense_edges
            ntiles_p = ntiles * 1.05
            a_gb = ntiles_p * R * C / 1e9
            dense_ms = 0.0
            res_ms = 0.0
            for f in FS:
                h_bytes = C * 2 * f * 2
                dense_ms += ntiles_p * (
                    (R * C + h_bytes) / BW * 1e9 + FIXED_NS
                ) * 1e-6
                res_ms += res_edges * PAD * SLOT_NS[f] * 1e-6
            print(f"{C:>5} {thr:>4} {ntiles:>8} {100*dense_edges/M:>6.1f}%"
                  f" {res_edges:>10} {a_gb:>6.2f} {dense_ms:>9.1f}"
                  f" {res_ms:>7.1f} {dense_ms+res_ms:>9.1f}", flush=True)


if __name__ == "__main__":
    main()
