"""Wall-clock benchmarking with warmup discard.

The reference times with chrono timestamps, discarding warmup iterations
(Figure7/main.cu:195-236 runs 5 reps and keeps the last 2; our.py:219-225 runs
100 warmup + 100 timed).  JAX needs block_until_ready to exclude dispatch
async-ness, and the first call is excluded anyway since it compiles.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable


@dataclasses.dataclass
class BenchResult:
    mean_s: float
    min_s: float
    max_s: float
    iters: int
    compile_s: float
    # True when benchmark_chained's slope fit went negative (loop body below
    # the dispatch-jitter noise floor) and the result fell back to the
    # overhead-INCLUSIVE bound total/(2*iters) — small-problem numbers with
    # this flag set are upper bounds, not measurements.
    noise_floor: bool = False

    def __repr__(self):
        nf = ", NOISE-FLOOR BOUND" if self.noise_floor else ""
        return (
            f"BenchResult(mean={self.mean_s * 1e3:.3f}ms, "
            f"min={self.min_s * 1e3:.3f}ms, iters={self.iters}, "
            f"compile={self.compile_s:.2f}s{nf})"
        )


def _block(x):
    import jax

    return jax.block_until_ready(x)


def benchmark(
    fn: Callable, warmup: int = 3, iters: int = 10
) -> BenchResult:
    """Time ``fn()`` (which must return JAX arrays) with warmup discard."""
    t0 = time.perf_counter()
    _block(fn())
    compile_s = time.perf_counter() - t0
    for _ in range(warmup):
        _block(fn())
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _block(fn())
        times.append(time.perf_counter() - t0)
    return BenchResult(
        mean_s=sum(times) / len(times),
        min_s=min(times),
        max_s=max(times),
        iters=iters,
        compile_s=compile_s,
    )


def benchmark_chained(
    fn: Callable, *args, iters: int = 8, reps: int = 2, on_rep=None
) -> BenchResult:
    """Per-iteration time of ``fn(*args)`` with the iterations CHAINED
    inside one jitted fori_loop, a LOOP-CARRIED DEPENDENCE, and a two-point
    iteration-count fit.

    Two hazards this construction defeats (both observed on the axon
    tunnel, PERF_NOTES.md):
      * XLA hoists loop-INVARIANT bodies out of while loops — a fori that
        recomputes fn(*invariant args) measures ONE call divided by iters.
        The first array argument is therefore perturbed each step by a
        tiny function of the output (1e-30 * out, numerically nil but not
        foldable).
      * Per-call host timing through the tunnel carries ~tens-of-ms
        dispatch+fetch overhead; timing (2*iters) and (iters) chains and
        taking the slope cancels it exactly.

    ``fn`` must return a JAX array; args[0] must be a float array.

    ``on_rep(result, k, reps)`` is called after each rep pair with the
    estimate over reps 1..k — a driver-facing bench can emit its metric
    after the FIRST completed rep so an external timeout still leaves a
    number behind (the round-2 capture died with nothing on the board).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    # ONE jitted program with the chain length as a TRACED scalar: the
    # (iters) and (2*iters) chains share the executable, so the expensive
    # compile is paid once, not twice (the remote axon compile of a
    # reddit-scale forward is 2-11 min; two static chains doubled it —
    # measured first-call 388-886 s, the driver-budget killer).  A dynamic
    # trip count lowers to a while loop, which XLA cannot unroll or hoist
    # a loop-CARRIED body out of — the anti-hoisting construction is
    # unchanged.
    @jax.jit
    def chained(n, *a):
        def body(i, first):
            out = fn(first, *a[1:])
            fb = (out.astype(jnp.float32).ravel()[0] * 1e-30).astype(
                first.dtype
            )
            return first + fb

        return lax.fori_loop(0, n, body, a[0]).ravel()[0]

    n1 = jnp.asarray(iters, jnp.int32)
    n2 = jnp.asarray(2 * iters, jnp.int32)
    c1 = lambda *a: chained(n1, *a)
    c2 = lambda *a: chained(n2, *a)
    t0 = time.perf_counter()
    float(c1(*args))
    compile_s = time.perf_counter() - t0
    float(c2(*args))  # warm the n2 path (same executable, no compile)
    # Difference min-of-reps, not per-rep pairs: per-rep slopes go negative
    # when dispatch jitter exceeds the (small-problem) loop-body time.
    t1s, t2s = [], []
    result = None
    for k in range(reps):
        t0 = time.perf_counter()
        float(c1(*args))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(c2(*args))
        t2s.append(time.perf_counter() - t0)
        slope = (min(t2s) - min(t1s)) / iters
        noise_floor = slope <= 0
        if noise_floor:  # noise floor: overhead-inclusive bound
            slope = min(t2s) / (2 * iters)
        mean = max((sum(t2s) - sum(t1s)) / len(t1s) / iters, slope)
        result = BenchResult(
            mean_s=mean,
            min_s=slope,
            max_s=max(t2s) / (2 * iters),
            iters=iters * (k + 1),
            compile_s=compile_s,
            noise_floor=noise_floor,
        )
        if on_rep is not None:
            on_rep(result, k + 1, reps)
    return result
