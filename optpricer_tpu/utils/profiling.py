"""Tracing / profiling / timing subsystem.

The reference has no profiling subsystem (SURVEY §5 — ad-hoc perf_counter
prints in one script, ``desk_workflow_localvol_barrier.py:82-148``). Here:

* :func:`trace` — capture a ``jax.profiler`` device trace
  (TensorBoard/Perfetto).
* :func:`annotate` — named regions on profiler timelines.
* :func:`benchmark` — device-sync-aware wall-clock measurement of any
  function returning JAX arrays (compile excluded, ``block_until_ready``
  included — the two classic async-dispatch timing mistakes).
* :func:`timed` / :func:`timing_report` — lightweight accumulating
  section timers for pipeline scripts (the desk workflow's report table
  uses these).
* :func:`device_memory` — per-device live/peak HBM byte counts.
"""
from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

import jax
import jax.profiler

__all__ = ["trace", "annotate", "benchmark", "timed", "timing_report",
           "reset_timings", "device_memory"]


@contextmanager
def trace(log_dir: str = "/tmp/optpricer_tpu_trace"):
    """Capture a device trace of the enclosed block.

    View with: ``tensorboard --logdir <log_dir>`` (Profile tab) or load the
    .pb into Perfetto.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


def _sync(out):
    """Block until every JAX array in ``out`` is materialised."""
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    return out


def benchmark(fn, *args, warmup: int = 1, iters: int = 5, **kwargs):
    """Wall-clock a JAX computation correctly.

    Runs ``fn(*args, **kwargs)`` ``warmup`` times (absorbing compilation
    and autotuning), then ``iters`` timed runs, each fenced with
    ``block_until_ready`` so async dispatch can't fake a result. Returns
    ``{"best", "mean", "times", "result"}`` (seconds; ``result`` is the
    last run's output).
    """
    out = None
    for _ in range(max(0, warmup)):
        out = _sync(fn(*args, **kwargs))
    times = []
    for _ in range(max(1, iters)):
        t0 = time.perf_counter()
        out = _sync(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    return {"best": min(times), "mean": sum(times) / len(times),
            "times": times, "result": out}


_TIMINGS: dict[str, list[float]] = defaultdict(list)


@contextmanager
def timed(label: str, *, sync: bool = True):
    """Accumulating section timer: ``with timed("calibrate"): ...``.

    ``sync=True`` fences pending device work before AND after the block so
    the section is charged its own device time, not its predecessor's.
    """
    if sync:
        try:
            jax.effects_barrier()
        except Exception:
            pass
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync:
            try:
                jax.effects_barrier()
            except Exception:
                pass
        _TIMINGS[label].append(time.perf_counter() - t0)


def timing_report(*, reset: bool = False) -> str:
    """Formatted table of every ``timed`` section recorded so far."""
    rows = ["%-32s %5s %10s %10s" % ("section", "calls", "total[s]",
                                     "mean[ms]")]
    for label, ts in _TIMINGS.items():
        rows.append("%-32s %5d %10.3f %10.1f"
                    % (label, len(ts), sum(ts), 1e3 * sum(ts) / len(ts)))
    if reset:
        reset_timings()
    return "\n".join(rows)


def reset_timings() -> None:
    _TIMINGS.clear()


def device_memory() -> list[dict]:
    """Per-device live/peak HBM usage in bytes (empty entries where the
    backend exposes no memory stats, e.g. CPU)."""
    out = []
    for d in jax.devices():
        try:
            s = d.memory_stats() or {}
        except Exception:
            s = {}
        out.append({"device": str(d),
                    "bytes_in_use": s.get("bytes_in_use"),
                    "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                    "bytes_limit": s.get("bytes_limit")})
    return out
