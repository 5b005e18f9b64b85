"""Reorder unit tests (graph/reorder.py)."""


def test_deal_shards_bijection_and_balance():
    import numpy as np

    from gnn_computing_tpu.graph.reorder import deal_shards

    perm = np.arange(10)
    q = deal_shards(perm, 4)
    # ranks dealt round-robin: shard s holds ranks s, s+4, ...
    assert q.tolist() == [0, 4, 8, 1, 5, 9, 2, 6, 3, 7]
    # bijection at a non-divisible size
    rng = np.random.default_rng(0)
    p2 = rng.permutation(1003)
    q2 = deal_shards(p2, 8)
    assert sorted(q2.tolist()) == sorted(p2.tolist())
