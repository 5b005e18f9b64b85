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
