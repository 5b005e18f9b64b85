"""Host coverage curve at r512 on the degree-sorted reddit RMAT:
for each tile threshold, report tile counts (split by bitmaskable /
int8), A bytes, residual edges/slots — feeds the per-layer threshold
choice (tile cost scales with aggregation width, residual does not)."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

R, C = 512, 128
cache = "data/bench_cache"
z = np.load(f"{cache}/rmat_n232965_m114615891.edges.npz")
perm = np.load(f"{cache}/perm_rmat_n232965_m114615891_degree.npy")
indptr, indices = z["indptr"], z["indices"]
n = len(indptr) - 1
m = len(indices)
# relabel: perm[new] = old -> inv[old] = new
inv = np.empty(n, np.int64)
inv[perm] = np.arange(n)
dst = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
dst = inv[dst]
src = inv[indices.astype(np.int64)]
nct = -(-n // C)

bin_key = (dst // R) * nct + (src // C)
cell_key = bin_key * (R * C) + (dst % R) * C + (src % C)
del dst, src
order = np.argsort(cell_key, kind="stable")
ck = cell_key[order]
del cell_key
uniq_mask = np.r_[True, ck[1:] != ck[:-1]]
uniq_cells = ck[uniq_mask]
# multiplicity per unique cell
idx = np.flatnonzero(uniq_mask)
mult = np.diff(np.r_[idx, len(ck)])
cell_bin = uniq_cells // (R * C)
del ck, uniq_cells, idx

nbins = (-(-n // R)) * nct
bin_edges = np.bincount(bin_key, minlength=nbins)
del bin_key
# per-bin max multiplicity
bin_max = np.zeros(nbins, np.int64)
np.maximum.at(bin_max, cell_bin, mult)
del cell_bin, mult

for t in (8, 10, 12, 16, 24, 32):
    sel = bin_edges >= t
    tiles = int(sel.sum())
    cov = int(bin_edges[sel].sum())
    bitable = int((sel & (bin_max <= 1)).sum())
    a_bytes = bitable * (R * C // 8) + (tiles - bitable) * (R * C)
    print(
        f"t={t:3d} tiles={tiles:7d} bit={bitable:7d} "
        f"cov={cov/m:.4f} residual={m-cov:9d} "
        f"A={a_bytes/1e9:.2f}GB"
    )
