"""Host-only probe: products-scale hybrid plan economics over (R, threshold).

Products (2.45M v / 123.7M e) has mean degree 50 (vs reddit's 492): the
reddit-tuned t24/r512 plan yields 530k tiles = 34.7 GB of A and 2.1 MB of
scalar-prefetch (smem cap: 1 MiB => <= ~260k tiles HARD).  This probe
computes, per (R, t): tile count, dense coverage, residual edges, A bytes,
and the v5e cost model (dense (A+H)/640 GB/s floored at 110 ns/step/pack16,
residual 8.5/7.25 ns/slot) — pick a plan that FITS and minimizes time.

Run:  python probes/products_plan_curve.py   (no TPU use)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from bench import build_graph, _cache_dir

N, M = 2_449_029, 123_718_280
C = 128

g = build_graph(N, M, kind="rmat")
perm = np.load(
    os.path.join(_cache_dir(), f"perm_rmat_n{N}_m{M}_degree.npy")
)
g2 = g.reorder(perm)
dst = np.repeat(
    np.arange(g2.num_nodes, dtype=np.int64), np.diff(g2.indptr)
)
src = g2.indices.astype(np.int64)

for R in (512, 1024, 2048):
    nrt = -(-N // R)
    nct = -(-N // C)
    key = (dst // R) * nct + (src // C)
    counts = np.bincount(key, minlength=nrt * nct)
    counts = counts[counts > 0]
    print(f"R={R}: nonzero tiles {len(counts)}")
    for t in (24, 48, 96, 192, 384):
        keep = counts >= t
        ntiles = int(keep.sum())
        dense_edges = int(counts[keep].sum())
        res_edges = M - dense_edges
        a_gb = ntiles * R * C / 2**30
        # v5e model: 3 layers, A int8 + H split2 bf16 (2f) per tile at
        # 640 GB/s with a 110ns/step floor (pack16 => floor/16 per tile);
        # residual 8.5 (f=128) + 7.25*2 (f<=64) ns/slot, pad 1.12
        h_bytes = C * 2 * 2 * (128 + 64 + 32)
        dense_ms = (
            ntiles * max((R * C + h_bytes / 3) * 3 / 640e9, 110e-9 / 16 * 3)
        ) * 1e3
        res_ms = res_edges * 1.12 * (8.5 + 7.25 * 2) * 1e-6
        print(
            f"  t={t:4d}: tiles={ntiles:7d} cov={dense_edges / M:6.1%} "
            f"res={res_edges / 1e6:6.1f}M  A={a_gb:5.1f}GiB  "
            f"smem={'OK ' if ntiles <= 260000 else 'OVER'} "
            f"model3L={dense_ms + res_ms:6.1f}ms "
            f"(dense {dense_ms:5.1f} + res {res_ms:5.1f})"
        )
