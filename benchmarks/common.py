"""Shared harness for the figure-analog benchmarks.

Mirrors the reference's run.sh conventions (B10, SURVEY.md §2d): a dataset
list swept per benchmark, results appended as JSON lines under
``benchmarks/results/``, plotted by ``plot.py``.  The artifact's data.zip is
not available here, so datasets are deterministic RMAT graphs at several
scales (override with --dataset/--datadir to use reference-format files).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

RESULTS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")

# name -> (num_vertices, num_edges): small/mid scales of the reference's
# 8-dataset sweep (arxiv..products, BASELINE.md); full reddit-scale runs
# go through bench.py
SYN_DATASETS = {
    "rmat_arxiv": (1 << 18, 1 << 21),   # ~arxiv scale
    "rmat_collab": (1 << 18, 1 << 22),
    "rmat_ddi": (1 << 12, 1 << 21),     # small+dense like ddi
    "rmat_mid": (1 << 16, 1 << 23),
    # community-structured analogs (graph/synthetic.community_graph):
    # the shape of reddit/products (subreddit clusters + hub tail),
    # which pure RMAT lacks — see bench.py build_graph
    "comm_mid": (1 << 16, 1 << 23),
}
QUICK_DATASETS = {"rmat_quick": (1 << 12, 1 << 16)}


def parser(desc: str) -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=desc)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--iters", type=int, default=48)  # quick graphs: long chains lift the slope fit above the ~27ms tunnel dispatch noise
    ap.add_argument("--feature-len", type=int, default=32, dest="feature_len")
    ap.add_argument(
        "--nei", type=int, default=32,
        help="NG group size (reference run.sh sweeps 16/32/64); 0 = auto "
        "from mean degree — the reference's groups are CSR segments "
        "without padding, so the padded-slot analog should not exceed "
        "the typical degree (4x pad waste on mean-degree-8 graphs).",
    )
    ap.add_argument("--outfea", type=int, default=32)
    ap.add_argument("--out", default=None, help="results file override")
    ap.add_argument(
        "--only", default=None,
        help="comma-separated dataset-name filter (e.g. rmat_mid)",
    )
    return ap


def datasets(args):
    table = QUICK_DATASETS if args.quick else SYN_DATASETS
    only = getattr(args, "only", None)
    if only:
        table = {k: v for k, v in table.items() if k in only.split(",")}
    from gnn_computing_tpu.graph.synthetic import community_graph, rmat_graph

    for name, (n, m) in table.items():
        if name.startswith("comm"):
            yield name, community_graph(
                n, m, seed=123, with_val=False, min_comm=1024, max_comm=8192
            )
        else:
            yield name, rmat_graph(n, m, seed=123, with_val=False)


def pick_block(args, g) -> int:
    """--nei, or the nearest power of two to the mean degree (clamped
    [4, 32]) when --nei 0."""
    if args.nei:
        return args.nei
    mean_deg = max(g.num_edges / max(g.num_nodes, 1), 1.0)
    b = 1 << int(round(np.log2(mean_deg)))
    return int(min(32, max(4, b)))


def emit(tag: str, record: dict, args) -> None:
    os.makedirs(RESULTS_DIR, exist_ok=True)
    path = args.out or os.path.join(RESULTS_DIR, f"{tag}.jsonl")
    record = dict(record, ts=time.time())
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record), flush=True)
