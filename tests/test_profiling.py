"""Profiling subsystem (utils/profiling.py): sync-aware benchmarking,
accumulating section timers, device memory stats, trace capture."""
import jax
import jax.numpy as jnp

from optpricer_tpu.utils import profiling


def test_benchmark_syncs_and_reports():
    f = jax.jit(lambda x: (x * x).sum())
    r = profiling.benchmark(f, jnp.arange(1024.0), warmup=1, iters=3)
    assert set(r) == {"best", "mean", "times", "result"}
    assert len(r["times"]) == 3 and r["best"] > 0.0
    assert float(r["result"]) == float((jnp.arange(1024.0) ** 2).sum())
    assert r["best"] <= r["mean"] <= max(r["times"])


def test_timed_accumulates_and_reports():
    profiling.reset_timings()
    for _ in range(3):
        with profiling.timed("unit-test-section"):
            jnp.ones(16).sum().block_until_ready()
    report = profiling.timing_report(reset=True)
    assert "unit-test-section" in report and "    3" in report
    # reset=True cleared the store
    assert "unit-test-section" not in profiling.timing_report()


def test_device_memory_shape():
    mem = profiling.device_memory()
    assert len(mem) == len(jax.devices())
    assert all("device" in m and "bytes_in_use" in m for m in mem)


def test_trace_writes_profile(tmp_path):
    with profiling.trace(str(tmp_path)) as d:
        jax.jit(lambda x: x + 1)(jnp.ones(8)).block_until_ready()
    assert list(tmp_path.rglob("*"))  # something was captured
    assert d == str(tmp_path)


def test_annotate_is_usable():
    with profiling.annotate("unit-test-region"):
        jnp.zeros(4).sum().block_until_ready()
