"""Probe: residual-gather rate vs table dtype at reddit scale.

Question (PERF_NOTES 'Honest reddit-scale state'): the residual random-row
gather has a FIXED per-row cost by dtype (f32 ~6.7-9.3 ns, 16-bit ~3.9-7.3).
8-bit rows were never measured.  If int8/f8 rows issue ~2x faster again,
that opens (a) f16-as-int8-pair bitcast tables (exact, if the bitcast does
not force materialization — u16 bitcast DID, 174 ms) and (b) quantized
opt-in modes for contractive consumers (SAGE gates).

Mirrors the deployment shape: h is the loop-carried f32 arg (the gathered
table is the layer's activations); per-dtype tables are derived IN-jit so
conversion cost is included, exactly as the model pays it.

Run on the real chip: PYTHONPATH=/root/repo python probes/gather_dtypes.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gnn_computing_tpu.utils.timing import benchmark_chained

N, F = 232_965, 128
EDGES = "data/bench_cache/rmat_n232965_m114615891.edges.npz"
TARGET_ROWS = 3_840_000  # ~ the t24 residual slot count


def load_idx():
    z = np.load(EDGES)
    idx = z["indices"]  # CSR (dst-major) src ids — skewed, dst-sorted
    stride = max(1, len(idx) // TARGET_ROWS)
    idx = np.ascontiguousarray(idx[::stride][:TARGET_ROWS]).astype(np.int32)
    print(f"rows={len(idx)}  unique={len(np.unique(idx))}", file=sys.stderr)
    return idx


def main():
    idx = jnp.asarray(load_idx())
    nrows = idx.shape[0]
    h = jnp.asarray(
        np.random.default_rng(0).standard_normal((N, F), dtype=np.float32)
    )

    def rate(name, fn, iters=8):
        r = benchmark_chained(fn, h, idx, iters=iters)
        print(
            f"{name:28s} {r.min_s * 1e3:8.2f} ms "
            f"{r.min_s / nrows * 1e9:6.2f} ns/row"
        )

    def take_sum(tbl, ix):
        return jnp.take(tbl, ix, axis=0).astype(jnp.float32).sum(axis=0)

    rate("f32 [n,128]", lambda hh, ix: take_sum(hh, ix))
    rate("f16 [n,128]", lambda hh, ix: take_sum(hh.astype(jnp.float16), ix))
    rate("bf16 [n,128]", lambda hh, ix: take_sum(hh.astype(jnp.bfloat16), ix))
    rate(
        "int8 [n,128]",
        lambda hh, ix: take_sum((hh * 16.0).astype(jnp.int8), ix),
    )
    rate(
        "f8e4m3 [n,128]",
        lambda hh, ix: take_sum(hh.astype(jnp.float8_e4m3fn), ix),
    )
    # 256 int8 lanes == the byte budget of an f16 [n,128] row
    rate(
        "int8 [n,256]",
        lambda hh, ix: take_sum(
            (jnp.concatenate([hh, hh], axis=1) * 16.0).astype(jnp.int8), ix
        ),
    )
    # f16 bytes gathered AS int8 lanes, bitcast back after the take:
    # exact f16 row fetch at (maybe) the 8-bit issue rate.  u16 bitcast
    # materialized (174 ms) — does the int8 flavor fuse?
    def bitcast_pair(hh, ix):
        tbl = jax.lax.bitcast_convert_type(
            hh.astype(jnp.float16), jnp.int8
        ).reshape(N, 2 * F)
        rows = jnp.take(tbl, ix, axis=0)
        back = jax.lax.bitcast_convert_type(
            rows.reshape(nrows, F, 2), jnp.float16
        ).reshape(nrows, F)
        return back.astype(jnp.float32).sum(axis=0)

    rate("f16-as-int8pair bitcast", bitcast_pair)
    # calibration point: the known-slow 256-lane f16 split2 layout
    rate(
        "f16 [n,256]",
        lambda hh, ix: take_sum(
            jnp.concatenate([hh, hh], axis=1).astype(jnp.float16), ix
        ),
    )


if __name__ == "__main__":
    main()
