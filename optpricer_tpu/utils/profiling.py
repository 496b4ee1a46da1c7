"""Tracing / profiling helpers.

The reference has no profiling subsystem (SURVEY §5 — ad-hoc perf_counter
prints only). Here: a `trace` context manager that captures a
``jax.profiler`` trace viewable in TensorBoard/Perfetto, and named
annotations for engine phases.
"""
from __future__ import annotations

from contextlib import contextmanager

import jax
import jax.profiler

__all__ = ["trace", "annotate"]


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
