"""Synthetic graph generators with fixed seeds.

The reference artifact benchmarks on 8 OGB/DGL graphs shipped as a data.zip
(reference README.md:36-47) and fills features/edge values from curand with
seed 123 (Figure9/main.cu:22, Figure8/main.cu:35).  This environment has no
network access, so the framework ships deterministic generators that reproduce
the *statistical shape* of those graphs: RMAT (power-law, community-structured
— reddit/products-like), uniform Erdős–Rényi-style, and fixed-degree regular
graphs (the ``<dset>_sample_16`` pre-sampled SAGE-LSTM inputs,
Figure7/run_our.sh:16-20).
"""

from __future__ import annotations

import numpy as np

from gnn_computing_tpu.graph.csr import CSRGraph

# Named presets matching the scale of the reference's benchmark datasets
# (vertex/edge counts from reference util.py:24-143, tabulated in BASELINE.md).
DATASET_SCALES = {
    "arxiv": (169_343, 1_166_243),
    "collab": (235_868, 2_358_104),
    "citation": (2_927_963, 30_387_995),
    "ddi": (4_267, 2_135_822),
    "protein": (132_534, 79_122_504),
    "ppa": (576_289, 42_463_862),
    "reddit": (232_965, 114_615_891),
    "products": (2_449_029, 123_718_280),
}


def rmat_edges(
    n_log2: int,
    num_edges: int,
    seed: int = 123,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    batch: int = 1 << 24,
) -> tuple[np.ndarray, np.ndarray]:
    """Generate RMAT (Kronecker) edges over 2**n_log2 vertices.

    Classic recursive-matrix generator: each of the n_log2 bits of (dst, src)
    is drawn from the 2x2 quadrant distribution [[a, b], [c, d]].  Vectorized
    over all edges and all bits; ~100M edges in a few seconds.
    """
    rng = np.random.default_rng(seed)
    d = 1.0 - a - b - c
    # quadrant thresholds: 0->a, 1->b, 2->c, 3->d
    t1, t2, t3 = a, a + b, a + b + c
    weights = (1 << np.arange(n_log2 - 1, -1, -1)).astype(np.int64)
    dsts = []
    srcs = []
    remaining = num_edges
    while remaining > 0:
        k = min(batch, remaining)
        # quadrant per (edge, bit) via 3 threshold compares (fast path;
        # rng.choice with p is ~50x slower at this volume)
        r = rng.random((k, n_log2), dtype=np.float32)
        q = (
            (r >= t1).astype(np.int8)
            + (r >= t2).astype(np.int8)
            + (r >= t3).astype(np.int8)
        )
        dst_bits = (q >> 1).astype(np.int64)
        src_bits = (q & 1).astype(np.int64)
        dsts.append(dst_bits @ weights)
        srcs.append(src_bits @ weights)
        remaining -= k
    return np.concatenate(dsts), np.concatenate(srcs)


def rmat_edges_device(
    n_log2: int,
    num_edges: int,
    seed: int = 123,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    batch: int = 1 << 24,
) -> tuple[np.ndarray, np.ndarray]:
    """RMAT edges generated on the accelerator (the host here has a single
    CPU core; 2e9 quadrant draws take minutes in numpy, milliseconds on
    TPU).  Same distribution as rmat_edges, different PRNG stream."""
    import jax
    import jax.numpy as jnp

    t1, t2, t3 = a, a + b, a + b + c
    weights = jnp.asarray(
        (1 << np.arange(n_log2 - 1, -1, -1)).astype(np.int32)
    )

    @jax.jit
    def gen(key):
        r = jax.random.uniform(key, (batch, n_log2))
        q = (
            (r >= t1).astype(jnp.int32)
            + (r >= t2).astype(jnp.int32)
            + (r >= t3).astype(jnp.int32)
        )
        dst = jnp.sum((q >> 1) * weights, axis=1, dtype=jnp.int32)
        src = jnp.sum((q & 1) * weights, axis=1, dtype=jnp.int32)
        return dst, src

    key = jax.random.key(seed)
    dsts, srcs = [], []
    remaining = num_edges
    i = 0
    while remaining > 0:
        d, s = gen(jax.random.fold_in(key, i))
        k = min(batch, remaining)
        dsts.append(np.asarray(d[:k]))
        srcs.append(np.asarray(s[:k]))
        remaining -= k
        i += 1
    return np.concatenate(dsts).astype(np.int64), np.concatenate(srcs)


def rmat_graph(
    num_nodes: int,
    num_edges: int,
    seed: int = 123,
    with_val: bool = True,
    device: str = "auto",
) -> CSRGraph:
    """Power-law community-structured graph at the given scale.

    Vertices are generated over the next power of two then folded down with a
    modulo so arbitrary ``num_nodes`` work.  device='auto' uses the
    accelerator for generation when one is available.
    """
    n_log2 = max(1, int(np.ceil(np.log2(num_nodes))))
    use_dev = device == "device"
    if device == "auto":
        try:
            import jax

            use_dev = jax.default_backend() != "cpu"
        except Exception:
            use_dev = False
    if use_dev:
        dst, src = rmat_edges_device(n_log2, num_edges, seed=seed)
    else:
        dst, src = rmat_edges(n_log2, num_edges, seed=seed)
    dst = dst % num_nodes
    src = (src % num_nodes).astype(np.int32)
    val = None
    if with_val:
        rng = np.random.default_rng(seed + 1)
        val = rng.standard_normal(num_edges, dtype=np.float32)
    return CSRGraph.from_edges(dst, src, num_nodes, val=val)


def _mix64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Deterministic vectorized integer hash (splitmix64 finalizer)."""
    x = (a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ (
        b.astype(np.uint64) * np.uint64(0xBF58476D1CE4E5B9)
    )
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def community_graph(
    num_nodes: int,
    num_edges: int,
    seed: int = 123,
    with_val: bool = True,
    p_within: float = 0.85,
    thread_size: int = 32,
    overlap: float = 0.75,
    sigma: float = 0.75,
    min_comm: int = 2048,
    max_comm: int = 32768,
    target_skew: float = 1.0,
    cross_skew: float = 2.0,
    shuffle: bool = True,
) -> CSRGraph:
    """Community-structured graph modeling reddit.dgl's actual shape.

    The RMAT generator reproduces power-law degrees but NOT reddit's
    defining structure.  reddit.dgl (232,965 posts / 114.6M edges,
    reference util.py:31,133) is a post co-comment graph: posts cluster
    by subreddit, and posts in the same discussion share most of their
    neighbor SETS — which is precisely why the reference's MinHash-LSH
    reorder at Jaccard 0.2 with cluster cap 64 (cluster2.py, reference
    README.md:128-134) pays off on it (Figure 9's L2-hit-rate gains).
    Pure RMAT has no such clusters (measured: LSH reorder gives NO
    coverage gain over degree sort on RMAT, PERF_NOTES.md), making it a
    strictly harder stand-in than the graph the V100 baseline was
    measured on.  This generator reproduces the cluster structure the
    baseline graph actually has:

      * communities ("subreddits") with Zipf-ish sizes in
        [min_comm, max_comm], edge budget ~ size^1.1;
      * per-node degree heterogeneity ~ exp(N(0, sigma));
      * nodes grouped in "threads" of `thread_size`; a fraction
        ``overlap`` of each within-community edge is drawn from the
        thread's shared neighbor pool (hash-defined, storage-free) —
        thread-mates get near-duplicate neighborhoods (Jaccard ~0.2-0.5,
        the LSH reorder's working regime);
      * the rest of within-community edges are uniform in the community;
      * within-community neighbor TARGETS are drawn with probability
        ~ z_i^target_skew (z = the per-node degree weight): co-comment
        edges concentrate on popular posts, giving the heavy in-degree
        tail reddit actually has (max degree ~21k); target_skew=0 gives
        uniform targets;
      * (1 - p_within) of edges are cross-community, with endpoints
        drawn ~ z^cross_skew globally (cross-subreddit co-comments
        attach to globally popular posts — preferential attachment, the
        source of reddit's ~43x-mean max degree); cross_skew=0 gives
        uniform noise;
      * the half-edge list is mirrored (reddit.dgl is symmetric), and
        node ids are randomly permuted so schedules must DISCOVER the
        structure via reorder, exactly as the reference does on reddit.

    Deterministic in ``seed``; ~1 min at reddit scale on one host core.
    """
    rng = np.random.default_rng(seed)
    m_pairs = num_edges // 2

    # ---- community sizes: truncated Zipf until nodes are covered
    sizes = []
    covered = 0
    while covered < num_nodes:
        u = rng.random()
        s = int(min_comm * (1.0 - u) ** -0.8)  # heavy-ish tail
        s = min(s, max_comm, num_nodes - covered)
        sizes.append(s)
        covered += s
    sizes = np.array(sizes, dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(sizes)])  # [C+1]
    ncomm = len(sizes)

    # ---- per-community pair budgets ~ size^1.1
    m_within = int(p_within * m_pairs)
    w = sizes.astype(np.float64) ** 1.1
    mc = np.floor(w / w.sum() * m_within).astype(np.int64)
    mc[: m_within - mc.sum()] += 1  # distribute rounding remainder

    # ---- per-node degree weights and within-edge owner counts
    z = np.exp(sigma * rng.standard_normal(num_nodes))
    # per-community: counts c_i = round-to-budget share of z
    cz = np.add.reduceat(z, offs[:-1])
    frac = z / np.repeat(cz, sizes)
    target = frac * np.repeat(mc, sizes)
    # largest-remainder rounding per community keeps sums exact enough;
    # simple floor + global top-up is fine for a generator
    cnt = np.floor(target).astype(np.int64)
    deficit = int(m_within - cnt.sum())
    if deficit > 0:
        extra = np.argsort(-(target - cnt))[:deficit]
        cnt[extra] += 1
    elif deficit < 0:
        donors = np.flatnonzero(cnt > 0)[:(-deficit)]
        cnt[donors] -= 1

    u_w = np.repeat(np.arange(num_nodes, dtype=np.int64), cnt)
    comm_of = np.repeat(np.arange(ncomm, dtype=np.int64), sizes)
    cu = comm_of[u_w]
    s_cu = sizes[cu]
    off_cu = offs[cu]

    # ---- neighbor draw: thread pool vs popularity-weighted-in-community
    pool_sz = max(2 * (num_edges // max(num_nodes, 1)), 8)
    thread_of = (u_w - off_cu) // thread_size + (off_cu // thread_size)
    from_pool = rng.random(len(u_w)) < overlap
    r = rng.integers(0, 1 << 62, size=len(u_w))
    if target_skew > 0:
        # inverse-CDF draw ~ z^target_skew within the community, shared
        # by pool members (hash-positioned) and non-pool draws (uniform
        # variate): popular posts soak up co-comment edges.
        zt = z ** target_skew
        cum = np.cumsum(zt)
        ctot = np.add.reduceat(zt, offs[:-1])
        base = (cum - zt)[off_cu]  # exclusive cumsum at community start
        ct_cu = ctot[cu]
        upool = (
            _mix64(thread_of, r % pool_sz).astype(np.float64)
            / float(1 << 64)
        )
        uunif = (r.astype(np.float64) / float(1 << 62)) % 1.0
        uu = np.where(from_pool, upool, uunif)
        v_w = np.searchsorted(
            cum, base + uu * ct_cu, side="right"
        ).astype(np.int64)
        np.minimum(v_w, off_cu + s_cu - 1, out=v_w)
        del zt, cum, ctot, base, ct_cu, upool, uunif, uu
    else:
        v_pool = off_cu + (
            _mix64(thread_of, r % pool_sz) % s_cu.astype(np.uint64)
        ).astype(np.int64)
        v_w = np.where(from_pool, v_pool, off_cu + (r % s_cu))
        del v_pool
    del thread_of, from_pool, r, off_cu, s_cu, cu

    # ---- cross-community edges (preferential to global hubs)
    m_cross = m_pairs - m_within
    if cross_skew > 0:
        zc = z ** cross_skew
        cumc = np.cumsum(zc)
        tot = cumc[-1]
        u_x = np.searchsorted(
            cumc, rng.random(m_cross) * tot, side="right"
        ).astype(np.int64)
        v_x = np.searchsorted(
            cumc, rng.random(m_cross) * tot, side="right"
        ).astype(np.int64)
        np.minimum(u_x, num_nodes - 1, out=u_x)
        np.minimum(v_x, num_nodes - 1, out=v_x)
        del zc, cumc
    else:
        u_x = rng.integers(0, num_nodes, size=m_cross, dtype=np.int64)
        v_x = rng.integers(0, num_nodes, size=m_cross, dtype=np.int64)

    u = np.concatenate([u_w, u_x])
    v = np.concatenate([v_w, v_x])
    # symmetric directed edge list (reddit.dgl stores both directions);
    # odd num_edges keeps one extra forward edge
    dst = np.concatenate([u, v, u[: num_edges - 2 * m_pairs]])
    src = np.concatenate([v, u, v[: num_edges - 2 * m_pairs]])

    if shuffle:
        perm = rng.permutation(num_nodes).astype(np.int64)
        dst = perm[dst]
        src = perm[src]

    val = None
    if with_val:
        val = np.random.default_rng(seed + 1).standard_normal(
            num_edges, dtype=np.float32
        )
    return CSRGraph.from_edges(dst, src.astype(np.int32), num_nodes, val=val)


def uniform_graph(
    num_nodes: int, num_edges: int, seed: int = 123, with_val: bool = True
) -> CSRGraph:
    rng = np.random.default_rng(seed)
    dst = rng.integers(0, num_nodes, size=num_edges, dtype=np.int64)
    src = rng.integers(0, num_nodes, size=num_edges, dtype=np.int64).astype(
        np.int32
    )
    val = (
        rng.standard_normal(num_edges, dtype=np.float32) if with_val else None
    )
    return CSRGraph.from_edges(dst, src, num_nodes, val=val)


def fixed_degree_graph(
    num_nodes: int, degree: int, seed: int = 123
) -> CSRGraph:
    """Every vertex has exactly ``degree`` in-edges with random sources.

    Mirrors the reference's pre-sampled ``<dset>_sample_16`` graphs consumed
    by the SAGE-LSTM benchmark (Figure7/main.cu:155 loads them; the CSR there
    has a constant row length of 16).
    """
    rng = np.random.default_rng(seed)
    indices = rng.integers(
        0, num_nodes, size=num_nodes * degree, dtype=np.int64
    ).astype(np.int32)
    indptr = (np.arange(num_nodes + 1, dtype=np.int64) * degree).astype(
        np.int32
    )
    return CSRGraph(indptr=indptr, indices=indices)


def scaled_dataset(
    name: str, seed: int = 123, with_val: bool = True
) -> CSRGraph:
    """RMAT graph at the vertex/edge scale of a reference benchmark dataset."""
    n, m = DATASET_SCALES[name]
    return rmat_graph(n, m, seed=seed, with_val=with_val)


def normal_features(
    num_nodes: int, feature_len: int, seed: int = 123, dtype=np.float32
) -> np.ndarray:
    """Standard-normal node features, the analog of the reference's
    ``curandGenerateNormal(..., 0.f, 1.0)`` with seed 123 (Figure9/main.cu:44-50)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_nodes, feature_len)).astype(dtype)
