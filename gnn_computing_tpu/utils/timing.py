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

    def __repr__(self):
        return (
            f"BenchResult(mean={self.mean_s * 1e3:.3f}ms, "
            f"min={self.min_s * 1e3:.3f}ms, iters={self.iters}, "
            f"compile={self.compile_s:.2f}s)"
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
    fn: Callable, *args, iters: int = 10, reps: int = 3
) -> BenchResult:
    """Per-iteration time of ``fn(*args)`` with the iterations CHAINED
    inside one jitted fori_loop and a scalar fetch.

    Through a remote-dispatch tunnel (axon) per-call host timing is
    dominated by ~ms dispatch+fetch overhead; chaining amortizes it away
    (the technique behind every number in PERF_NOTES.md).  ``fn`` must
    return a JAX array; a data dependence on its first element keeps the
    loop body alive under DCE.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def chained(*a):
        def body(i, acc):
            out = fn(*a)
            return acc + out.astype(jnp.float32).ravel()[0] * 1e-9

        return lax.fori_loop(0, iters, body, 0.0)

    t0 = time.perf_counter()
    float(chained(*args))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chained(*args))
        times.append((time.perf_counter() - t0) / iters)
    return BenchResult(
        mean_s=sum(times) / len(times),
        min_s=min(times),
        max_s=max(times),
        iters=iters * reps,
        compile_s=compile_s,
    )
