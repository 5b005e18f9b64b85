"""GraphSAGE-LSTM model (reference Figure7/main.cu benchmark subject).

Aggregates each vertex's fixed-k sampled neighbor sequence with an LSTM
(ops/lstm.py), following the reference benchmark contract: feature length 32,
k = 16 sampled neighbors (Figure7/run_our.sh:16-20), timing over epochs with
warmup discard.  The three strategies (ours / sparse-fetch / materialize)
are selectable for the Fig7/Fig11 ablation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gnn_computing_tpu.ops.lstm import (
    LSTMParams,
    init_lstm_params,
    lstm_aggregate,
)

BENCH_FEATURE_LEN = 32  # reference Figure7/run_our.sh:16-20, --feature-len 32
BENCH_NUM_NEIGHBORS = 16  # --nei 16 / <dset>_sample_16


class SageLSTMParams(NamedTuple):
    lstm: LSTMParams
    w_self: jnp.ndarray  # [f_in, f] self branch
    w_out: jnp.ndarray  # [2f, f_out] combine


def init_sage_lstm_params(
    key, f_in: int, f: int, f_out: int, dtype=jnp.float32
) -> SageLSTMParams:
    k1, k2, k3 = jax.random.split(key, 3)
    s_self = (1.0 / f_in) ** 0.5
    s_out = (1.0 / (2 * f)) ** 0.5
    return SageLSTMParams(
        lstm=init_lstm_params(k1, f_in, f, dtype),
        w_self=jax.random.uniform(k2, (f_in, f), dtype, -s_self, s_self),
        w_out=jax.random.uniform(k3, (2 * f, f_out), dtype, -s_out, s_out),
    )


def sage_lstm_layer(
    params: SageLSTMParams,
    x: jnp.ndarray,
    nbr: jnp.ndarray,
    strategy: str = "redundancy_bypass",
) -> jnp.ndarray:
    """h_agg = LSTM over neighbor sequence; out = relu([x@Ws ; h_agg] @ Wo)."""
    h_nbr = lstm_aggregate(params.lstm, x, nbr, strategy=strategy)
    hp = jax.lax.Precision.HIGHEST  # TPU DEFAULT dot = bf16 single pass
    h_self = jnp.dot(x, params.w_self, precision=hp)
    return jax.nn.relu(
        jnp.dot(
            jnp.concatenate([h_self, h_nbr], axis=-1),
            params.w_out,
            precision=hp,
        )
    )


def sage_lstm_aggregate_bench(
    params: LSTMParams,
    x: jnp.ndarray,
    nbr: jnp.ndarray,
    strategy: str = "redundancy_bypass",
) -> jnp.ndarray:
    """The exact computation the reference times (Figure7/main.cu:195-235):
    the LSTM aggregation alone, no self/combine branch."""
    return lstm_aggregate(params, x, nbr, strategy=strategy)
