"""Probe 2: gather rates on the REAL t24 residual slot indices.

gather_dtypes.py (stride-sampled CSR indices) found the rate is set by row
BYTES: <=256 B rows ~2.5 ns (f16/bf16/int8 at 128 lanes, int8 at 256),
512 B rows ~11-13 ns (f32-128, f16-256).  Hypotheses to settle on the
production index set (p_src of the cached t24 plan):

  1. f32 [n,64] rows (256 B) join the fast class => the f=128 residual can
     run as TWO exact f32 half-gathers (no precision games), and the f=64
     pass as ONE.
  2. The t24 residual's locality doesn't collapse the fast class back to
     ~7 ns (the PERF_NOTES l2/l3 figure).

Run: PYTHONPATH=/root/repo python probes/gather_residual_real.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gnn_computing_tpu.utils.timing import benchmark_chained

N, F = 232_965, 128
PLAN = "data/bench_cache/hybrid_n232965_m114615891_t24_r256_b4_int8.npz"


def main():
    z = np.load(PLAN)
    idx = jnp.asarray(np.ascontiguousarray(z["p_src"]).ravel())
    nrows = idx.shape[0]
    print(f"slots={nrows} unique={len(np.unique(idx))}", file=sys.stderr)
    h = jnp.asarray(
        np.random.default_rng(0).standard_normal((N, F), dtype=np.float32)
    )

    def rate(name, fn, iters=8):
        r = benchmark_chained(fn, h, idx, iters=iters)
        print(
            f"{name:30s} {r.min_s * 1e3:8.2f} ms "
            f"{r.min_s / nrows * 1e9:6.2f} ns/slot"
        )

    def take_sum(tbl, ix):
        return jnp.take(tbl, ix, axis=0).astype(jnp.float32).sum(axis=0)

    # current defaults at each layer width
    rate("f32 [n,128]  (l1 now)", lambda hh, ix: take_sum(hh, ix))
    rate(
        "f16s2 [n,128] (l2-at-64 now)",
        lambda hh, ix: take_sum(hh[:, :64].astype(jnp.float16), ix),
    )
    # hypothesis 1: f32 halves, each 256 B rows, fused into separate sums
    def f32_halves(hh, ix):
        a = jnp.take(hh[:, :64], ix, axis=0).sum(axis=0)
        b = jnp.take(hh[:, 64:], ix, axis=0).sum(axis=0)
        return jnp.concatenate([a, b])

    rate("2x f32 [n,64] halves", f32_halves)
    rate("1x f32 [n,64]", lambda hh, ix: take_sum(hh[:, :64], ix))
    rate("1x f32 [n,32]", lambda hh, ix: take_sum(hh[:, :32], ix))
    rate("f16 [n,128] single", lambda hh, ix: take_sum(hh.astype(jnp.float16), ix))
    # 4 quarter-gathers f32 [n,32] (128 B rows) — does splitting keep paying?
    def f32_quarters(hh, ix):
        outs = [
            jnp.take(hh[:, i * 32 : (i + 1) * 32], ix, axis=0).sum(axis=0)
            for i in range(4)
        ]
        return jnp.concatenate(outs)

    rate("4x f32 [n,32] quarters", f32_quarters)


if __name__ == "__main__":
    main()
