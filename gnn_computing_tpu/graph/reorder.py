"""Vertex reordering for locality (the reference's offline preprocessing).

The reference improves gather locality with an offline MinHash-LSH
clustering that groups vertices with similar neighbor sets
(script/cluster2.py) and applies the permutation at load time
(src/data.cu:96-133).  On TPU, reordering serves the tile-densification
path (schedule/tiles.py): a permutation that concentrates edges into few
[TS x TS] adjacency blocks moves more of the aggregation onto the MXU.

Two reorders are provided:
  * degree_sort   — hubs first; cheap, very effective on power-law graphs
                    (hub columns become dense tile stripes).
  * cluster_reorder — MinHash-LSH + union-find agglomeration, semantics of
                    the reference's cluster2.py (64 permutations, Jaccard
                    threshold, cluster size cap), hand-rolled (no
                    datasketch dependency).

Permutations use the reference convention: ``perm[new_id] = old_id``
(src/data.cu:4-29); apply with CSRGraph.reorder(perm).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from gnn_computing_tpu.graph.csr import CSRGraph


def degree_sort(g: CSRGraph, by: str = "total") -> np.ndarray:
    """Permutation (new -> old) sorting vertices by descending degree."""
    in_deg = g.degrees.astype(np.int64)
    out_deg = np.bincount(g.indices, minlength=g.n_src).astype(np.int64)
    if by == "in":
        d = in_deg
    elif by == "out":
        d = out_deg
    else:
        d = in_deg + out_deg[: g.num_nodes]
    return np.argsort(-d, kind="stable").astype(np.int64)


def deal_shards(perm: np.ndarray, num_shards: int) -> np.ndarray:
    """Re-deal an ordered permutation round-robin across contiguous shards.

    Rank r goes to shard r % D at local position r // D, so each of the D
    contiguous shard row-ranges gets an equal share of every degree
    stratum.  Needed by destination-owned distribution (e.g.
    parallel/allgather_tiles): a plain degree sort puts ALL hubs in shard
    0, so per-owner plans pad to the hub owner's tile count (measured:
    8x memory blowup / host OOM at products scale).  Within a shard the
    degree order is preserved (ranks s, s+D, s+2D, ... descending), so
    tile densification inside each shard keeps its hub stripes.
    """
    n = len(perm)
    d = int(num_shards)
    ss = -(-n // d)
    r = np.arange(n, dtype=np.int64)
    # stable argsort of the target position is a bijection even when n is
    # not a multiple of D (gaps in the key space collapse in rank order)
    key = (r % d) * ss + r // d
    return perm[np.argsort(key, kind="stable")]


# ----------------------------------------------------------- MinHash-LSH
_MERSENNE = (1 << 61) - 1


def _minhash_signatures(
    g: CSRGraph, num_perm: int, seed: int
) -> np.ndarray:
    """[n, num_perm] MinHash signatures of each vertex's neighbor set
    (reference cluster2.py:29-41, vectorized; rows with no neighbors get
    sentinel max)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64)
    n = g.num_nodes
    idx = g.indices.astype(np.int64)
    dst = g.dst_per_edge.astype(np.int64)
    sig = np.full((n, num_perm), np.iinfo(np.int64).max, dtype=np.int64)
    # process permutations in blocks to bound the [m, k] hash buffer
    step = max(1, min(num_perm, (1 << 27) // max(len(idx), 1)))
    for s in range(0, num_perm, step):
        hv = (idx[:, None] * a[None, s : s + step] + b[None, s : s + step]) % _MERSENNE
        np.minimum.at(sig[:, s : s + step], dst, hv)
    return sig


def _banding_candidate_pairs(
    sig: np.ndarray, bands: int
) -> Optional[np.ndarray]:
    """LSH banding over MinHash signatures -> unique candidate pairs
    (the role of MinHashLSH.query in cluster2.py:86-95, vectorized).
    Consecutive-in-bucket pairing is linear per bucket — enough to chain a
    bucket into one cluster under transitive merging."""
    num_perm = sig.shape[1]
    rows_per_band = max(num_perm // bands, 1)
    cands = []
    for b in range(bands):
        band = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
        if band.shape[1] == 0:
            continue
        # hash each band row to a bucket; vertices sharing a bucket pair up
        key = np.ascontiguousarray(band).view(
            [("", band.dtype)] * band.shape[1]
        ).ravel()
        order = np.argsort(key, kind="stable")
        sorted_key = key[order]
        same = sorted_key[1:] == sorted_key[:-1]
        i = order[:-1][same]
        j = order[1:][same]
        if len(i):
            cands.append(np.stack([i, j], axis=1))
    if not cands:
        return None
    return np.unique(np.sort(np.concatenate(cands), axis=1), axis=0)


def _emit_clusters_first_seen(root: np.ndarray) -> np.ndarray:
    """Vertices ordered cluster-by-cluster, clusters ranked by first
    appearance (cluster2.py:156-172)."""
    n = len(root)
    first = {}
    rank = np.empty(n, dtype=np.int64)
    next_rank = 0
    for v in range(n):
        r = root[v]
        if r not in first:
            first[r] = next_rank
            next_rank += 1
        rank[v] = first[r]
    return np.lexsort((np.arange(n), rank)).astype(np.int64)


def cluster_reorder_exact(
    g: CSRGraph,
    num_perm: int = 64,
    bands: int = 16,
    max_cluster: int = 64,
    seed: int = 123,
) -> Optional[np.ndarray]:
    """Reference-faithful clustering permutation: LSH banding candidates +
    EXACT-Jaccard max-heap agglomeration with lazy root re-enqueue
    (script/cluster2.py:108-153), run natively (csrc/gnnhost.cpp
    gs_jaccard_cluster).  Differs from cluster_reorder in two ways the
    reference algorithm has and the one-shot merge lacks: pairs are ranked by
    exact (not estimated) Jaccard, and merges close transitively — when a
    popped pair's endpoint was already absorbed, the CURRENT roots are
    re-scored and re-enqueued.  Returns None when the native lib is
    unavailable."""
    from gnn_computing_tpu import native

    n = g.num_nodes
    if n == 0:
        return np.zeros(0, np.int64)
    sig = _minhash_signatures(g, num_perm, seed)
    pairs = _banding_candidate_pairs(sig, bands)
    if pairs is None:
        return np.arange(n, dtype=np.int64)
    root = native.jaccard_cluster(
        g.indptr, g.indices, pairs, max_cluster
    )
    if root is None:
        return None
    return _emit_clusters_first_seen(root)


def cluster_reorder(
    g: CSRGraph,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.2,
    max_cluster: int = 64,
    max_pairs_per_vertex: int = 8,
    seed: int = 123,
) -> np.ndarray:
    """LSH-clustered permutation (new -> old).

    Reference pipeline (script/cluster2.py): MinHash over neighbor sets ->
    LSH candidate pairs -> exact-Jaccard-ranked agglomerative union-find
    merging with a cluster-size cap -> vertices emitted cluster-by-cluster.
    This rendition banding-hashes the signatures (bands x rows-per-band LSH),
    scores candidate pairs by signature agreement (an unbiased Jaccard
    estimate), merges best-first under the same size cap, and emits clusters
    in first-seen order.
    """
    n = g.num_nodes
    if n == 0:
        return np.zeros(0, np.int64)
    sig = _minhash_signatures(g, num_perm, seed)
    pairs = _banding_candidate_pairs(sig, bands)
    if pairs is None:
        return np.arange(n, dtype=np.int64)
    # estimated Jaccard = fraction of agreeing signature slots
    est = (sig[pairs[:, 0]] == sig[pairs[:, 1]]).mean(axis=1)
    keep = est >= threshold
    pairs, est = pairs[keep], est[keep]
    order = np.argsort(-est, kind="stable")
    pairs = pairs[order]

    # union-find with size cap (cluster2.py:108-153); native merge loop
    # (csrc/gnnhost.cpp gs_union_find_merge) when available
    from gnn_computing_tpu import native

    root = native.union_find_merge(n, pairs, max_cluster)
    if root is None:
        parent = np.arange(n, dtype=np.int64)
        size = np.ones(n, dtype=np.int64)

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for u, v in pairs:
            ru, rv = find(u), find(v)
            if ru == rv or size[ru] + size[rv] > max_cluster:
                continue
            parent[rv] = ru
            size[ru] += size[rv]

        root = np.array([find(x) for x in range(n)], dtype=np.int64)
    # emit clusters in order of first appearance (cluster2.py:156-172)
    return _emit_clusters_first_seen(root)


# ------------------------------------------------- label-propagation (2D)
def label_propagation_reorder(
    g: CSRGraph,
    iters: int = 5,
    self_weight: int = 1,
    degree_sort_within: bool = True,
    hubs: int = 0,
) -> np.ndarray:
    """Community-contiguous permutation (new -> old) via label propagation.

    A TPU-motivated reorder with no reference counterpart: the MXU tile
    densification path (schedule/tiles.py) needs 2D BLOCK locality — rows
    AND their neighbor columns packed into the same [tile_rows x
    tile_cols] adjacency blocks.  The reference's LSH clustering
    (cluster2.py) optimizes a GPU-cache objective: it groups <=64
    near-duplicate rows but scatters the clusters (first-seen emission),
    leaving columns spread across the id space — good for L2 row reuse,
    useless for tile density.  Synchronous label propagation makes whole
    communities contiguous, which concentrates both dimensions at once.

    Deterministic: ties break toward the smaller label; `self_weight`
    votes for a vertex's own current label damp oscillation.  Cost per
    iteration is two O(m log m) sorts on (vertex, label) keys.

    With ``degree_sort_within``, vertices sort by (community, -degree):
    hubs of a community lead its block, which packs the densest tile
    stripes first (same effect degree_sort has globally, PERF_NOTES.md).
    """
    n = g.num_nodes
    if n == 0:
        return np.zeros(0, np.int64)
    dst = g.dst_per_edge.astype(np.int64)
    src = g.indices.astype(np.int64)
    label = np.arange(n, dtype=np.int64)
    for _ in range(iters):
        key = dst * n + label[src]
        if self_weight:
            own = np.arange(n, dtype=np.int64) * n + label
            key = np.concatenate(
                [key] + [own] * self_weight
            )
        uk, cnt = np.unique(key, return_counts=True)
        kd = uk // n
        kl = uk % n
        # per dst: label with max count; ties -> smaller label.
        # lexsort (primary last): order by dst, then count asc, then
        # LARGER label first, so the last entry per dst is (max count,
        # smallest label among maxima).
        order = np.lexsort((-kl, cnt, kd))
        kd_o = kd[order]
        last = np.r_[kd_o[1:] != kd_o[:-1], True]
        new_label = label.copy()
        new_label[kd_o[last]] = kl[order][last]
        if np.array_equal(new_label, label):
            break
        label = new_label
    # canonical community ranks by first appearance, then order members
    _, first_idx, inv = np.unique(label, return_index=True, return_inverse=True)
    rank_of_comm = np.argsort(np.argsort(first_idx))
    rank = rank_of_comm[inv]
    in_deg = g.degrees.astype(np.int64)
    out_deg = np.bincount(g.indices, minlength=g.n_src).astype(np.int64)
    d = in_deg + out_deg[:n]
    if hubs > 0:
        # Global hubs lead the order (degree-sorted), communities follow:
        # cross-community edges concentrate on globally popular vertices,
        # so the first few column blocks become dense hub stripes for
        # EVERY destination tile-row (the degree_sort effect), while
        # community-diagonal blocks densify the rest.
        hub_ids = np.argpartition(-d, hubs - 1)[:hubs]
        is_hub = np.zeros(n, dtype=bool)
        is_hub[hub_ids] = True
        rank = np.where(is_hub, -1, rank)
    if degree_sort_within:
        return np.lexsort((np.arange(n), -d, rank)).astype(np.int64)
    return np.lexsort((np.arange(n), rank)).astype(np.int64)
