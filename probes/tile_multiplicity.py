"""Per-tile multiplicity census of the cached reddit-scale hybrid plan.

Decides the mixed bitmask/int8 tile design: tiles whose cells are all 0/1
can store 1 bit/cell (8x less A traffic than int8 — the dominant dense-side
HBM cost).  Questions answered:
  * what fraction of tiles / of A bytes is 0/1-only?
  * where do the count>1 tiles live (hub columns?)
  * excess duplicate edges (count-1 mass) if multi-cells were capped at 1
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

path = sys.argv[1] if len(sys.argv) > 1 else (
    "data/bench_cache/hybrid_n232965_m114615891_t24_r512_b4_int8.npz"
)
z = np.load(path)
a = z["a_i8"]  # [T, R, C] int8
T = a.shape[0]
print(f"tiles={T} shape={a.shape} dtype={a.dtype}")

chunk = 4096
max_per_tile = np.zeros(T, np.int32)
edges_per_tile = np.zeros(T, np.int64)
nnz_per_tile = np.zeros(T, np.int64)
cnt_hist = np.zeros(129, np.int64)
for i in range(0, T, chunk):
    c = a[i : i + chunk].astype(np.int32)
    max_per_tile[i : i + chunk] = c.max(axis=(1, 2))
    edges_per_tile[i : i + chunk] = c.sum(axis=(1, 2))
    nnz_per_tile[i : i + chunk] = (c > 0).sum(axis=(1, 2))
    cnt_hist += np.bincount(c.reshape(-1), minlength=129)[:129]

bitable = max_per_tile <= 1
print(f"bitmaskable tiles: {bitable.sum()} / {T} = {bitable.mean():.4f}")
print(
    "edges in bitmaskable tiles:",
    f"{edges_per_tile[bitable].sum() / edges_per_tile.sum():.4f}",
)
print(
    "A bytes: int8-all =", T * a.shape[1] * a.shape[2],
    " mixed =", int(bitable.sum()) * a.shape[1] * a.shape[2] // 8
    + int((~bitable).sum()) * a.shape[1] * a.shape[2],
)
excess = edges_per_tile.sum() - nnz_per_tile.sum()
print(f"excess duplicate edges (count-1 mass): {excess} "
      f"({excess / edges_per_tile.sum():.4f} of dense edges)")
# if multi tiles were ALSO bitmasked with excess spilled to residual:
exc_per_tile = edges_per_tile - nnz_per_tile
print("excess in NON-bitmaskable tiles:", exc_per_tile[~bitable].sum())
cols = z["tile_col"]
print("col-tile range of multi tiles:",
      (cols[~bitable].min(), cols[~bitable].max()) if (~bitable).any()
      else None)
print("count histogram (1..16):", cnt_hist[1:17].tolist())
print("count>16 cells:", int(cnt_hist[17:].sum()))
q = np.quantile(cols[~bitable], [0.5, 0.9, 0.99]) if (~bitable).any() else []
print("multi-tile col quantiles:", q)
