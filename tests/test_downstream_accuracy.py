"""Downstream-accuracy parity: train the same GCN in this framework and in
an independent PyTorch implementation and require matching test accuracy.

The reference's correctness story is cross-framework agreement (our.py vs
dgl_prof.py vs pyg.py under shared seeds, SURVEY.md §4.2), and the BASELINE
north star asks that "downstream accuracy matches on ogbn-arxiv/reddit".
Real OGB data is not fetchable in this environment, so this is the runnable
equivalent: a planted-partition (SBM) node-classification task whose labels
are only recoverable through neighbor aggregation (features are noisy),
identical initial weights, identical Adam schedule — the two frameworks must
land at the same test accuracy.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from gnn_computing_tpu.aggregator import Aggregator  # noqa: E402
from gnn_computing_tpu.graph.csr import CSRGraph  # noqa: E402
from gnn_computing_tpu.models.gcn import gcn_forward, init_gcn_params  # noqa: E402
from gnn_computing_tpu.models.training import (  # noqa: E402
    accuracy,
    make_train_step,
)


def _sbm(n=1536, k=6, deg_in=14, deg_out=2, seed=0):
    """Planted-partition graph + noisy features: community labels are the
    classification target; per-node features carry a weak label signal that
    aggregation denoises."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, k, n)
    srcs, dsts = [], []
    for v in range(n):
        same = np.flatnonzero(labels == labels[v])
        other = np.flatnonzero(labels != labels[v])
        srcs.append(rng.choice(same, deg_in))
        dsts.append(np.full(deg_in, v))
        srcs.append(rng.choice(other, deg_out))
        dsts.append(np.full(deg_out, v))
    src = np.concatenate(srcs).astype(np.int32)
    dst = np.concatenate(dsts).astype(np.int64)
    g = CSRGraph.from_edges(dst=dst, src=src, num_nodes=n)
    f = 32
    proj = rng.standard_normal((k, f)).astype(np.float32)
    x = 0.6 * proj[labels] + rng.standard_normal((n, f)).astype(np.float32)
    x *= 0.05  # keep unnormalized-sum aggregations in a sane range
    return g, x.astype(np.float32), labels.astype(np.int32)


def _torch_gcn_logits(indptr, indices, h, weights):
    """Independent torch implementation of gcn_forward (transform -> sparse
    SpMM -> relu; LAST layer linear = logits)."""
    n = len(indptr) - 1
    dst = torch.from_numpy(
        np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    )
    src = torch.from_numpy(np.asarray(indices, dtype=np.int64))
    a = torch.sparse_coo_tensor(
        torch.stack([dst, src]), torch.ones(len(src)), (n, n)
    ).coalesce()
    for i, w in enumerate(weights):
        z = torch.sparse.mm(a, h @ w)
        h = torch.relu(z) if i < len(weights) - 1 else z
    return h


def test_gcn_downstream_accuracy_matches_torch():
    g, x, labels = _sbm()
    n, k = g.num_nodes, int(labels.max()) + 1
    rng = np.random.default_rng(1)
    train_mask = rng.random(n) < 0.3
    test_mask = ~train_mask
    dims = (x.shape[1], 32, k)
    params0 = init_gcn_params(jax.random.key(0), dims)
    epochs, lr = 60, 1e-2

    # ---- this framework
    import optax

    agg = Aggregator.schedule(g, block_size=8)
    opt = optax.adam(lr)
    step = make_train_step(
        lambda p, hh: gcn_forward(agg, p, hh), opt
    )
    params, opt_state = params0, opt.init(params0)
    hj, yj, mj = jnp.asarray(x), jnp.asarray(labels), jnp.asarray(train_mask)
    for _ in range(epochs):
        _, params, opt_state = step(params, opt_state, (hj,), yj, mj)
    acc_ours = float(
        accuracy(gcn_forward(agg, params, hj), yj, jnp.asarray(test_mask))
    )

    # ---- independent torch implementation, SAME init / data / schedule
    tw = [
        torch.nn.Parameter(torch.from_numpy(np.asarray(w)).clone())
        for w in params0
    ]
    topt = torch.optim.Adam(tw, lr=lr)
    th = torch.from_numpy(x)
    ty = torch.from_numpy(labels.astype(np.int64))
    tm = torch.from_numpy(train_mask)
    for _ in range(epochs):
        topt.zero_grad()
        logits = _torch_gcn_logits(g.indptr, g.indices, th, tw)
        loss = torch.nn.functional.cross_entropy(logits[tm], ty[tm])
        loss.backward()
        topt.step()
    with torch.no_grad():
        pred = _torch_gcn_logits(g.indptr, g.indices, th, tw).argmax(1)
        acc_torch = float(
            (pred[~tm] == ty[~tm]).float().mean()
        )

    # the task must be genuinely learned (not a degenerate tie at chance =
    # 1/6), and the two frameworks must agree on the outcome
    assert acc_ours > 0.8, f"ours failed to learn: {acc_ours}"
    assert acc_torch > 0.8, f"torch failed to learn: {acc_torch}"
    assert abs(acc_ours - acc_torch) < 0.05, (
        f"accuracy diverged: ours={acc_ours:.4f} torch={acc_torch:.4f}"
    )
