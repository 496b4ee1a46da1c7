"""Test harness configuration.

Tests run on CPU with a virtual 8-device platform so the mesh-parallel paths
(shard_map + psum over a 'paths' axis) are exercised without TPU hardware,
and with x64 enabled so tight reference tolerances can be validated in f64
while the default f32 TPU path is covered by dtype-parameterised tests.
"""
import os

# OPTPRICER_TEST_TPU=1 runs the suite on real TPU hardware instead
# (tests/test_pallas_tpu.py and friends un-skip; x64 stays off as on TPU).
_ON_TPU = os.environ.get("OPTPRICER_TEST_TPU", "") == "1"

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

if _ON_TPU and os.environ.get("PYTEST_XDIST_WORKER"):
    raise RuntimeError(
        "OPTPRICER_TEST_TPU=1 runs must be serial (one chip, one "
        "process): pass -n0 to override the default xdist workers")

import jax  # noqa: E402

if not _ON_TPU:
    # The axon TPU plugin overrides JAX_PLATFORMS from the environment; the
    # config update is authoritative.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
