"""Probe 3: stage-by-stage cost of the residual pipeline on the real t24 plan.

gather_residual_real.py measured the pure take+sum at 9.4 ms (f16) /
20.7 ms (f32) per pass, but the bench decomposition charges the residual
27.9-32.8 ms per pass — find where the other ~10-18 ms goes
(val multiply? task reshape-sum? segment_sum? the final add?), and test a
TWO-TABLE f16_split2 form at f=128 (hi and lo as separate [n,128] gathers,
avoiding the 512 B-row slow path of the [n,256] concat).

Run: PYTHONPATH=/root/repo python probes/residual_pipeline.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gnn_computing_tpu.utils.timing import benchmark_chained

N = 232_965
PLAN = "data/bench_cache/hybrid_n232965_m114615891_t24_r256_b4_int8.npz"


def main():
    z = np.load(PLAN)
    src = jnp.asarray(np.ascontiguousarray(z["p_src"]))  # [nt, 4]
    dst = jnp.asarray(np.ascontiguousarray(z["p_dst"]))  # [nt]
    val = jnp.asarray(np.ascontiguousarray(z["p_val"]))  # [nt, 4] f32
    nt, b = src.shape
    nslots = nt * b
    print(f"tasks={nt} slots={nslots}", file=sys.stderr)

    widths = (
        [int(sys.argv[1])] if len(sys.argv) > 1 else [128, 64]
    )  # one width per process keeps the tunnel-compile budget bounded
    for F in widths:
        h = jnp.asarray(
            np.random.default_rng(0).standard_normal((N, F), dtype=np.float32)
        )

        def rate(name, fn, iters=8):
            r = benchmark_chained(fn, h, src, dst, val, iters=iters)
            print(
                f"f={F} {name:34s} {r.min_s * 1e3:8.2f} ms "
                f"{r.min_s / nslots * 1e9:6.2f} ns/slot"
            )

        flat = src.reshape(-1)

        # A: pure gather+reduce-all (floor)
        rate("take+sum", lambda hh, s, d, v: jnp.take(hh, s.reshape(-1), axis=0).sum(0))
        # B: + val multiply + task reshape-sum
        def stage_b(hh, s, d, v):
            msg = jnp.take(hh, s.reshape(-1), axis=0) * v.reshape(-1)[:, None]
            return msg.reshape(nt, b, F).sum(axis=1)

        rate("take*val->task sums", stage_b)
        # C: + segment_sum to rows
        def stage_c(hh, s, d, v):
            return jax.ops.segment_sum(
                stage_b(hh, s, d, v), d, num_segments=N,
                indices_are_sorted=True,
            )

        rate("full spmm_xla form (f32)", stage_c)

        # D: f16 split2 single concat table (current l2/l3 form at f<=64;
        #    at f=128 this is the known-slow 512 B row)
        def split2_concat(hh, s, d, v):
            hi = jax.lax.reduce_precision(hh, 5, 10).astype(jnp.float16)
            lo = (hh - hi.astype(jnp.float32)).astype(jnp.float16)
            g = jnp.take(jnp.concatenate([hi, lo], 1), s.reshape(-1), axis=0)
            rec = g[:, :F].astype(jnp.float32) + g[:, F:].astype(jnp.float32)
            msg = rec * v.reshape(-1)[:, None]
            t = msg.reshape(nt, b, F).sum(axis=1)
            return jax.ops.segment_sum(
                t, d, num_segments=N, indices_are_sorted=True
            )

        rate("split2 concat-table full", split2_concat)

        # E: f16 split2 TWO separate tables (two [n,F] f16 gathers)
        def split2_twotable(hh, s, d, v):
            hi = jax.lax.reduce_precision(hh, 5, 10).astype(jnp.float16)
            lo = (hh - hi.astype(jnp.float32)).astype(jnp.float16)
            sf = s.reshape(-1)
            ghi = jnp.take(hi, sf, axis=0).astype(jnp.float32)
            glo = jnp.take(lo, sf, axis=0).astype(jnp.float32)
            msg = (ghi + glo) * v.reshape(-1)[:, None]
            t = msg.reshape(nt, b, F).sum(axis=1)
            return jax.ops.segment_sum(
                t, d, num_segments=N, indices_are_sorted=True
            )

        rate("split2 two-table full", split2_twotable)

        # F: two-table, but weighted sums taken per chunk then recombined
        #    (keeps each gather single-consumer-fused to its own reduce)
        def split2_twosum(hh, s, d, v):
            hi = jax.lax.reduce_precision(hh, 5, 10).astype(jnp.float16)
            lo = (hh - hi.astype(jnp.float32)).astype(jnp.float16)
            sf = s.reshape(-1)
            vf = v.reshape(-1)[:, None]
            thi = (jnp.take(hi, sf, axis=0).astype(jnp.float32) * vf)
            tlo = (jnp.take(lo, sf, axis=0).astype(jnp.float32) * vf)
            t = (thi + tlo).reshape(nt, b, F).sum(axis=1)
            return jax.ops.segment_sum(
                t, d, num_segments=N, indices_are_sorted=True
            )

        rate("split2 two-table presum", split2_twosum)


if __name__ == "__main__":
    main()
