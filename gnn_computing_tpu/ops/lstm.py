"""LSTM neighbor-aggregation kernels (GraphSAGE-LSTM).

The reference's Figure7/11 subject (Figure7/main.cu:45-330): aggregate a
fixed-k sampled neighbor sequence per vertex with an LSTM, comparing three
strategies.  TPU-native rendition:

  * The x-side gate GEMM runs ONCE over all source vertices
    (redundancy bypass — Figure7/main.cu:198-203), on the MXU.
  * Per step, the x-side gates of each vertex's t-th neighbor are row-GATHERED
    (sparse fetch — main.cu:63-64; a gather is the natural TPU primitive, no
    per-edge feature tensor is ever materialized).
  * The h-side GEMM + fused elementwise gate math
    (kernel_elementwise_lstm_forward, main.cu:45-84) is a lax.scan step whose
    elementwise pipeline XLA fuses into the gather.

Gate layout follows the reference: 4 slabs [i, f, o, c~] stacked on the
feature axis (main.cu:54-57); sigma/tanh as in main.cu:37-43.

The two baseline strategies of the ablation (materialize = DGL-style with a
[n, k, f] neighbor-feature tensor, main.cu:239-284; sparse-fetch-only =
gather raw features but re-transform per step, main.cu:286-329) are provided
for the Fig7/11 benchmark parity.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax


class LSTMParams(NamedTuple):
    wx: jnp.ndarray  # [f_in, 4f]
    wh: jnp.ndarray  # [f, 4f]
    b: jnp.ndarray  # [4f]


def init_lstm_params(key, f_in: int, f: int, dtype=jnp.float32) -> LSTMParams:
    k1, k2 = jax.random.split(key)
    s1 = (1.0 / f_in) ** 0.5
    s2 = (1.0 / f) ** 0.5
    return LSTMParams(
        wx=jax.random.uniform(k1, (f_in, 4 * f), dtype, -s1, s1),
        wh=jax.random.uniform(k2, (f, 4 * f), dtype, -s2, s2),
        b=jnp.zeros((4 * f,), dtype),
    )


def lstm_cell(
    gx: jnp.ndarray, gh: jnp.ndarray, b: jnp.ndarray, h, c
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused gate elementwise step (reference
    kernel_elementwise_lstm_forward, Figure7/main.cu:45-84)."""
    f = h.shape[-1]
    z = gx + gh + b
    i = jax.nn.sigmoid(z[..., 0 * f : 1 * f])
    fg = jax.nn.sigmoid(z[..., 1 * f : 2 * f])
    o = jax.nn.sigmoid(z[..., 2 * f : 3 * f])
    ct = jnp.tanh(z[..., 3 * f : 4 * f])
    c = fg * c + i * ct
    h = o * jnp.tanh(c)
    return h, c


def lstm_aggregate(
    params: LSTMParams,
    x: jnp.ndarray,  # [n_src, f_in] source features
    nbr: jnp.ndarray,  # int32[n, k] t-th sampled neighbor of each vertex
    strategy: str = "redundancy_bypass",
    gate_gather_dtype=None,
    unroll: int = 1,
) -> jnp.ndarray:
    """Run the k-step neighbor LSTM; returns final hidden state [n, f].

    strategy:
      'redundancy_bypass' — x @ Wx once, gather gate rows per step (ours,
                            Figure7/main.cu:192-237)
      'sparse_fetch'      — gather x rows per step, re-run the x GEMM each
                            step (main.cu:286-329)
      'materialize'       — materialize [n, k, f_in] neighbor features up
                            front (DGL-style, main.cu:239-284)

    gate_gather_dtype (redundancy_bypass only): gather the pre-activation
    gate rows in this dtype — 16-bit rows issue ~2x faster than f32
    (PERF_NOTES.md) and LSTM gates are CONTRACTIVE (sigmoid/tanh bound
    the derivative), so the f16 single rounding (~5e-4) stays well inside
    the 1e-2 validation gate (tests/test_sage_lstm.py).

    unroll: lax.scan unroll factor.  Only the (h, c) recurrence is
    sequential — each step's gate-row GATHER is independent, so an
    unrolled body lets XLA issue step t+1's gather while step t's
    h-GEMM/gate math runs."""
    n, k = nbr.shape
    f = params.wh.shape[0]
    h0 = jnp.zeros((n, f), x.dtype)
    c0 = jnp.zeros((n, f), x.dtype)
    nbr_t = jnp.transpose(nbr)  # [k, n] -> scan steps

    if strategy == "redundancy_bypass":
        hp = lax.Precision.HIGHEST  # TPU DEFAULT dot = bf16 1-pass
        gx_all = jnp.dot(x, params.wx, precision=hp)  # ONE gate GEMM
        if gate_gather_dtype is not None:
            gx_all = gx_all.astype(gate_gather_dtype)

        def step(carry, nbr_step):
            h, c = carry
            # sparse fetch of gates (16-bit fast row path when cast)
            gx = jnp.take(gx_all, nbr_step, axis=0).astype(x.dtype)
            gh = jnp.dot(h, params.wh, precision=hp)
            h, c = lstm_cell(gx, gh, params.b, h, c)
            return (h, c), None

        (h, _), _ = lax.scan(step, (h0, c0), nbr_t, unroll=unroll)
        return h

    if strategy == "sparse_fetch":
        hp = lax.Precision.HIGHEST

        def step(carry, nbr_step):
            h, c = carry
            xg = jnp.dot(  # redundant GEMM
                jnp.take(x, nbr_step, axis=0), params.wx, precision=hp
            )
            gh = jnp.dot(h, params.wh, precision=hp)
            h, c = lstm_cell(xg, gh, params.b, h, c)
            return (h, c), None

        (h, _), _ = lax.scan(step, (h0, c0), nbr_t)
        return h

    if strategy == "materialize":
        xs = jnp.take(x, nbr.reshape(-1), axis=0).reshape(n, k, -1)
        hp = lax.Precision.HIGHEST

        def step(carry, t):
            h, c = carry
            xg = jnp.dot(xs[:, t], params.wx, precision=hp)
            gh = jnp.dot(h, params.wh, precision=hp)
            h, c = lstm_cell(xg, gh, params.b, h, c)
            return (h, c), None

        (h, _), _ = lax.scan(step, (h0, c0), jnp.arange(k))
        return h

    raise ValueError(f"unknown strategy {strategy!r}")
