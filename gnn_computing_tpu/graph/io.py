"""Dataset IO: ``.config`` / ``.graph`` text format with binary ``.npz`` cache.

File-format parity with the reference loader (src/data.cu:31-139):
  * ``<dset>.config`` — one line: ``<num_v> <num_e>``.
  * ``<dset>.graph``  — line 1: n+1 whitespace-separated indptr ints,
                        line 2: m indices ints.
  * reorder file ``<dset>.reorder<subfix>`` — n ints, ``rows[i]`` = old vertex
    id placed at new position ``i`` (src/data.cu:105-113).

On first text parse we cache a binary sidecar (``<dset>.graph.npz``) and load
that on subsequent calls — the analog of the reference's ``.ptrdump`` /
``.edgedump`` dump cache (src/data.cu:50-93).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from gnn_computing_tpu.graph.csr import CSRGraph


def dataset_config(datadir: str, dset: str) -> Tuple[int, int]:
    path = os.path.join(datadir, dset + ".config")
    with open(path) as f:
        parts = f.readline().split()
    return int(parts[0]), int(parts[1])


def _read_int_tokens(path: str):
    """All whitespace-separated ints in a text file; native mmap scanner
    (csrc/gnnhost.cpp gs_parse_ints) when available, else python split."""
    from gnn_computing_tpu import native

    arr = native.parse_ints(path)
    if arr is not None:
        return arr
    with open(path) as f:
        return np.asarray(f.read().split(), dtype=np.int64)


def load_reorder(
    datadir: str, dset: str, subfix: str
) -> Optional[np.ndarray]:
    """Read a reorder permutation file (new position -> old id)."""
    path = os.path.join(datadir, dset + ".reorder" + subfix)
    if not os.path.exists(path):
        return None
    toks = _read_int_tokens(path)
    return np.asarray(toks, dtype=np.int64)


def load_graph(
    datadir: str,
    dset: str,
    reorder_subfix: str = "",
    use_cache: bool = True,
) -> Tuple[CSRGraph, Optional[np.ndarray]]:
    """Load a dataset; returns (graph, rows) where ``rows`` is the applied
    reorder permutation (new -> old) or None.

    Mirrors reference ``load_graph`` (src/data.cu:31-139): binary cache on
    first parse, optional reorder application producing a renumbered CSR.
    """
    n, m = dataset_config(datadir, dset)
    graph_path = os.path.join(datadir, dset + ".graph")
    cache_path = graph_path + ".npz"

    if use_cache and os.path.exists(cache_path):
        z = np.load(cache_path)
        indptr, indices = z["indptr"], z["indices"]
    else:
        toks = _read_int_tokens(graph_path)
        assert len(toks) == (n + 1) + m, (
            f"{graph_path}: expected {(n + 1) + m} ints, got {len(toks)}"
        )
        arr = np.asarray(toks, dtype=np.int64)
        indptr = arr[: n + 1].astype(np.int32)
        indices = arr[n + 1 :].astype(np.int32)
        if use_cache:
            # tmp + rename: the cache check above takes file EXISTENCE as
            # validity, so a loader killed mid-savez must never publish a
            # truncated npz (same hazard class as bench.py's plan caches)
            tmp = f"{cache_path}.tmp.{os.getpid()}.npz"
            np.savez(tmp, indptr=indptr, indices=indices)
            os.replace(tmp, cache_path)

    assert int(indptr[-1]) == m
    g = CSRGraph(indptr=indptr, indices=indices)

    rows = None
    if reorder_subfix:
        rows = load_reorder(datadir, dset, reorder_subfix)
        if rows is not None:
            g = g.reorder(rows)
    return g, rows


def save_graph(datadir: str, dset: str, g: CSRGraph) -> None:
    """Write a graph in the reference text format plus config, so datasets
    generated here are consumable by the reference tooling and vice versa."""
    os.makedirs(datadir, exist_ok=True)
    with open(os.path.join(datadir, dset + ".config"), "w") as f:
        f.write(f"{g.num_nodes} {g.num_edges}\n")
    with open(os.path.join(datadir, dset + ".graph"), "w") as f:
        f.write(" ".join(map(str, g.indptr.tolist())))
        f.write("\n")
        f.write(" ".join(map(str, g.indices.tolist())))
        f.write("\n")


def save_reorder(
    datadir: str, dset: str, subfix: str, rows: np.ndarray
) -> str:
    path = os.path.join(datadir, dset + ".reorder" + subfix)
    with open(path, "w") as f:
        f.write("\n".join(map(str, np.asarray(rows).tolist())))
        f.write("\n")
    return path
