"""Schedule autotuning: measure-and-pick over the plan hyperparameters.

The reference sweeps its neighbor-group size externally (`--nei {16,32,64}`
in Figure run scripts); on TPU the knobs that matter are the gather
block size and the hybrid densification (threshold, tile_rows, tile dtype)
— measured differences at reddit scale exceed 25% (PERF_NOTES.md).  This
module turns the sweep into a first-class API: build candidate schedules,
time one forward aggregation per candidate with the chained-timing harness,
return the winner + the full table.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import numpy as np

from gnn_computing_tpu.graph.csr import CSRGraph


@dataclasses.dataclass
class TuneResult:
    best: object  # the winning Aggregator
    best_config: dict
    table: list  # [(config dict, seconds)]


def _time_agg(agg, feature_len: int, iters: int, seed: int = 0) -> float:
    import jax.numpy as jnp

    from gnn_computing_tpu.utils.timing import benchmark_chained

    rng = np.random.default_rng(seed)
    h = jnp.asarray(
        rng.normal(size=(agg.num_nodes, feature_len)).astype(np.float32)
    )
    r = benchmark_chained(
        lambda x, a: a.run(x), h, agg, iters=iters, reps=2
    )
    return r.min_s


def tune_gather(
    g: CSRGraph,
    feature_len: int = 128,
    block_sizes: Sequence[int] = (8, 16, 32, 64),
    iters: int = 4,
) -> TuneResult:
    """Sweep the neighbor-grouping block size (the reference's --nei)."""
    from gnn_computing_tpu.aggregator import Aggregator

    table = []
    best = None
    for b in block_sizes:
        agg = Aggregator.schedule(
            g, block_size=b, with_transpose=False
        )
        t = _time_agg(agg, feature_len, iters)
        cfg = {"block_size": b}
        table.append((cfg, t))
        if best is None or t < best[1]:
            best = (agg, t, cfg)
    return TuneResult(best=best[0], best_config=best[2], table=table)


def tune_hybrid(
    g: CSRGraph,
    feature_len: int = 128,
    # measured-best at reddit scale: t24/r512 for GCN and GAT (PERF_NOTES
    # sessions 8-9); sparse graphs (products-like, mean degree <~100)
    # need far higher thresholds — the sweep covers both regimes
    thresholds: Sequence[int] = (16, 24, 48),
    tile_rows: Sequence[int] = (256, 512),
    dtypes: Sequence[str] = ("int8", "bf16"),
    residual_block: int = 4,
    iters: int = 4,
    weighted: bool = False,
) -> TuneResult:
    """Sweep hybrid densification (threshold x tile height x tile dtype).

    ``int8`` tile dtype applies only to unweighted graphs (exact counts);
    weighted graphs restrict to bf16/f32 tiles.
    """
    import ml_dtypes

    from gnn_computing_tpu.aggregator import Aggregator

    dt_map = {"int8": np.int8, "bf16": ml_dtypes.bfloat16, "f32": np.float32}
    table = []
    best = None
    for r in tile_rows:
        for thr in thresholds:
            for dts in dtypes:
                if dts == "int8" and weighted:
                    continue
                agg = Aggregator.schedule_hybrid(
                    g,
                    tile_rows=r,
                    threshold=thr,
                    residual_block=residual_block,
                    tile_dtype=dt_map[dts],
                    with_transpose=False,
                    pack=16,
                )
                t = _time_agg(agg, feature_len, iters)
                cfg = {
                    "tile_rows": r,
                    "threshold": thr,
                    "tile_dtype": dts,
                }
                table.append((cfg, t))
                if best is None or t < best[1]:
                    best = (agg, t, cfg)
    return TuneResult(best=best[0], best_config=best[2], table=table)


def tune(
    g: CSRGraph,
    feature_len: int = 128,
    iters: int = 4,
    weighted: bool = False,
    include_hybrid: bool = True,
) -> TuneResult:
    """Full sweep: gather block sizes + hybrid configurations; returns the
    overall winner (an Aggregator ready for .run/.run_gat)."""
    rg = tune_gather(g, feature_len, iters=iters)
    table = list(rg.table)
    best = (rg.best, dict(rg.best_config, strategy="gather"))
    best_t = min(t for _, t in rg.table)
    if include_hybrid:
        rh = tune_hybrid(
            g, feature_len, iters=iters, weighted=weighted
        )
        table += rh.table
        ht = min(t for _, t in rh.table)
        if ht < best_t:
            best = (rh.best, dict(rh.best_config, strategy="hybrid"))
            best_t = ht
    table = [
        (dict(c, strategy="hybrid" if "threshold" in c else "gather"), t)
        for c, t in table
    ]
    return TuneResult(best=best[0], best_config=best[1], table=table)
