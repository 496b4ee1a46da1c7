"""Wall-clock timing helpers that respect JAX async dispatch.

The reference has no profiling subsystem beyond ad-hoc ``perf_counter``
prints (``scripts/desk_workflow_localvol_barrier.py:82-86``); here timing
blocks on device completion so numbers are honest, and ``jax.profiler``
traces can wrap any engine call.
"""
from __future__ import annotations

import time
from contextlib import contextmanager

import jax


@contextmanager
def Timer(label: str = "", results: dict | None = None, verbose: bool = True):
    """Context manager timing a block; blocks on async device work."""
    start = time.perf_counter()
    yield
    # Fence: make sure all dispatched work is done before reading the clock.
    jax.effects_barrier()
    elapsed = time.perf_counter() - start
    if results is not None:
        results[label] = elapsed
    if verbose and label:
        print(f"[{label}] {elapsed * 1e3:.2f} ms")


def benchmark(fn, *args, warmup: int = 2, iters: int = 10, **kwargs) -> float:
    """Median wall-clock seconds per call of ``fn`` (jitted or not)."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
