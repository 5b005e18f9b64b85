"""Cross-framework baseline: the reference's GCN/GAT pipelines in PyTorch.

The reference's correctness story is cross-framework comparison — the same
model math implemented independently in DGL and PyG with shared seeds
(SURVEY.md §4; Figure7/{our,dgl_prof,pyg}.py).  This module is that oracle
for the rebuild: 3-layer GCN/GAT forwards in pure PyTorch (CPU tensors),
written in the PyG style (explicit edge materialization + scatter_add,
pyg.py:88-131) and the DGL-sparse style (torch.sparse SpMM).

Used two ways:
  * tests/test_torch_baseline.py asserts our TPU/JAX forwards agree with
    these within the 1e-2 validation gate (independent implementations,
    independent frameworks).
  * `python benchmarks/torch_baseline.py` times them on the benchmark
    graphs for a like-for-like capability comparison (CPU only — the
    image has no CUDA; timings are context, not a target).
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch


def gcn_forward_torch(
    indptr: np.ndarray,
    indices: np.ndarray,
    h: torch.Tensor,
    weights,
    style: str = "sparse",
) -> torch.Tensor:
    """relu(A @ (h @ W)) per layer — reference our.py:171-176 semantics
    (unnormalized sum aggregation, matching the rebuild's bench model)."""
    n = len(indptr) - 1
    dst = torch.from_numpy(
        np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    )
    src = torch.from_numpy(indices.astype(np.int64))
    if style == "sparse":
        a = torch.sparse_coo_tensor(
            torch.stack([dst, src]),
            torch.ones(len(src), dtype=h.dtype),
            (n, n),
        ).coalesce()
    for w in weights:
        z = h @ w
        if style == "sparse":  # DGL-style SpMM
            z = torch.sparse.mm(a, z)
        else:  # PyG-style: materialize per-edge messages + scatter_add
            msg = z.index_select(0, src)
            z = torch.zeros_like(z).index_add_(0, dst, msg)
        h = torch.relu(z)
    return h


def gat_forward_torch(
    indptr: np.ndarray,
    indices: np.ndarray,
    h: torch.Tensor,
    params,
    slope: float = 0.2,
) -> torch.Tensor:
    """Fused-GAT reference semantics (aggr_gat.h:116-164): per layer
    score_e = exp(leakyrelu(att_dst[i] + att_src[j])), out = weighted
    mean.  PyG-style edge materialization."""
    n = len(indptr) - 1
    dst = torch.from_numpy(
        np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    )
    src = torch.from_numpy(indices.astype(np.int64))
    for w, w_att in params:
        feat = h @ w
        att = feat @ w_att  # [n, 2]
        z = att[:, 0].index_select(0, dst) + att[:, 1].index_select(0, src)
        score = torch.exp(torch.nn.functional.leaky_relu(z, slope))
        num = torch.zeros_like(feat).index_add_(
            0, dst, feat.index_select(0, src) * score[:, None]
        )
        den = torch.zeros(n, dtype=h.dtype).index_add_(0, dst, score)
        den = torch.where(den == 0, torch.ones_like(den), den)
        h = num / den[:, None]
    return h


def main():
    import argparse, json, time

    from gnn_computing_tpu.models import BENCH_DIMS

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=1 << 16)
    ap.add_argument("--m", type=int, default=1 << 22)
    ap.add_argument("--style", default="sparse", choices=["sparse", "pyg"])
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from gnn_computing_tpu.graph.synthetic import rmat_graph

    g = rmat_graph(args.n, args.m, seed=123, with_val=False)
    torch.manual_seed(123)
    h = torch.randn(g.num_nodes, BENCH_DIMS[0]) * 0.1
    ws = [
        torch.randn(BENCH_DIMS[i], BENCH_DIMS[i + 1])
        * (2.0 / (BENCH_DIMS[i] + BENCH_DIMS[i + 1])) ** 0.5
        for i in range(3)
    ]
    gcn_forward_torch(g.indptr, g.indices, h, ws, style=args.style)  # warm
    t0 = time.time()
    for _ in range(args.iters):
        gcn_forward_torch(g.indptr, g.indices, h, ws, style=args.style)
    dt = (time.time() - t0) / args.iters
    print(
        json.dumps(
            dict(
                model="gcn3",
                style=args.style,
                device="cpu",
                n=g.num_nodes,
                m=g.num_edges,
                seconds=dt,
                edges_per_s=3 * g.num_edges / dt,
            )
        )
    )


if __name__ == "__main__":
    main()
