"""Pallas kernels under shard_map: the multi-chip fast path.

CPU-ONLY (skipped on TPU): these tests target the Mosaic *interpreter* on
the 8-device virtual CPU platform (the interpreter's hardware PRNG is
degenerate — all-zero bits — so prices are meaningless here). What they pin
down is the *plumbing* the TPU run relies on: the global program-grid split
across devices, per-device stream offsets, ragged tail masking, the ICI
psum of the 10-stat vector, and that the sharded estimator is numerically
the same as single-chip. Interpret-mode kernels do not terminate in
reasonable time on the TPU platform, and real-kernel single-vs-mesh
equality on hardware is covered by the TPU-gated suite
(tests/test_pallas_tpu.py::TestMeshOnHardware).
"""
import jax
import numpy as np
import pytest

if jax.default_backend() == "tpu":
    pytest.skip("interpreter-targeted mesh tests run on the CPU harness; "
                "hardware mesh coverage lives in test_pallas_tpu.py",
                allow_module_level=True)

from optpricer_tpu.ops.pallas_mc import (
    _plan_grid, mc_sumstats_pallas, mc_sumstats_pallas_sharded,
)
from optpricer_tpu.ops.pallas_path_mc import (
    path_mc_sumstats_pallas, path_mc_sumstats_pallas_sharded,
)
from optpricer_tpu.parallel import get_mesh

ARGS = (100.0, 110.0, 1.0, 0.03, 0.0, 0.2, True)  # S0 K T r q sigma is_call


@pytest.fixture(scope="module")
def mesh():
    return get_mesh(8)


class TestPlanGrid:
    def test_device_multiple(self):
        for n_paths in (1, 1000, 2**20, 3_100_000, 2**31):
            for n_dev in (1, 2, 8):
                reps, n_programs = _plan_grid(n_paths, 65536, n_dev)
                assert n_programs % n_dev == 0
                assert reps * n_programs * 65536 >= n_paths

    def test_single_device_unchanged(self):
        # n_dev=1 must reproduce the round-1 grid (stream compatibility)
        reps, n_programs = _plan_grid(2**31, 2 * 32768)
        assert reps >= 1 and n_programs <= 64


class TestTerminalSharded:
    def test_matches_single_device(self, mesh):
        # ragged path count exercises the tail mask on the global grid
        n_paths = 3_100_000
        ref = np.asarray(mc_sumstats_pallas(
            7, n_paths, *ARGS, antithetic=True, interpret=True))
        out = np.asarray(mc_sumstats_pallas_sharded(
            mesh, 7, n_paths, *ARGS, antithetic=True))
        assert ref[0] == n_paths
        np.testing.assert_allclose(out, ref, rtol=3e-6)

    def test_no_antithetic(self, mesh):
        n_paths = 600_000
        ref = np.asarray(mc_sumstats_pallas(
            3, n_paths, *ARGS, antithetic=False, interpret=True))
        out = np.asarray(mc_sumstats_pallas_sharded(
            mesh, 3, n_paths, *ARGS, antithetic=False))
        np.testing.assert_allclose(out, ref, rtol=3e-6)

    def test_euro_price_mc_mesh_pallas_backend(self, mesh):
        from optpricer_tpu import CALL, OptionSpec, euro_price_mc

        opt = OptionSpec(S0=100.0, K=110.0, T=1.0, r=0.03, sigma=0.2)
        p, se = euro_price_mc(opt, CALL, n_paths=200_000, seed=0, mesh=mesh,
                              backend="pallas")
        assert np.isfinite(p) and np.isfinite(se)


class TestPathSharded:
    def test_asian_matches_single_device(self, mesh):
        n_paths = 200_000
        ref = np.asarray(path_mc_sumstats_pallas(
            11, n_paths, 16, *ARGS, payoff="asian", antithetic=True,
            interpret=True))
        out = np.asarray(path_mc_sumstats_pallas_sharded(
            mesh, 11, n_paths, 16, *ARGS, payoff="asian", antithetic=True))
        assert ref[0] == n_paths
        np.testing.assert_allclose(out, ref, rtol=3e-6)

    def test_barrier_heston_runs(self, mesh):
        heston = dict(v0=0.04, kappa=1.5, theta=0.04, xi=0.4, rho=-0.6)
        out = np.asarray(path_mc_sumstats_pallas_sharded(
            mesh, 5, 100_000, 8, 100.0, 100.0, 1.0, 0.03, 0.0, None, True,
            payoff="barrier", antithetic=True, barrier=130.0,
            barrier_type="up-and-out", heston=heston))
        assert out.shape == (21,) and np.all(np.isfinite(out))

    def test_exotic_price_mc_mesh_pallas_backend(self, mesh):
        from optpricer_tpu import exotic_price_mc

        p, se = exotic_price_mc(
            "asian", 100.0, 100.0, 1.0, 0.03, sigma=0.2, n_steps=8,
            n_paths=8 * 4096, seed=1, mesh=mesh, backend="pallas")
        assert np.isfinite(p) and np.isfinite(se)


class TestMeshXlaExotics:
    """The sharded XLA engine now carries the full 10-stat CV layout."""

    def test_cv_reduces_stderr_gbm(self, mesh):
        from optpricer_tpu import exotic_price_mc

        kw = dict(sigma=0.2, n_steps=12, n_paths=40_000, seed=2, mesh=mesh,
                  backend="xla")
        p0, se0 = exotic_price_mc("vanilla", 100.0, 100.0, 1.0, 0.03,
                                  control_variate=False, **kw)
        p1, se1 = exotic_price_mc("vanilla", 100.0, 100.0, 1.0, 0.03,
                                  control_variate=True, **kw)
        assert se1 < se0  # dual CV must help a vanilla payoff
        assert abs(p1 - p0) < 4 * se0

    def test_mesh_price_consistent_with_single_device(self, mesh):
        from optpricer_tpu import exotic_price_mc

        kw = dict(sigma=0.2, n_steps=12, n_paths=40_000, backend="xla")
        p1, se1 = exotic_price_mc("asian", 100.0, 100.0, 1.0, 0.03, seed=4,
                                  **kw)
        p8, se8 = exotic_price_mc("asian", 100.0, 100.0, 1.0, 0.03, seed=4,
                                  mesh=mesh, **kw)
        # different streams (per-device fold_in) → statistical agreement
        assert abs(p8 - p1) < 5 * np.hypot(se1, se8)

    def test_heston_mesh_single_cv(self, mesh):
        from optpricer_tpu import exotic_price_mc

        heston = dict(v0=0.04, kappa=1.5, theta=0.04, xi=0.4, rho=-0.6)
        p, se = exotic_price_mc(
            "vanilla", 100.0, 100.0, 1.0, 0.03, heston=heston, n_steps=12,
            n_paths=40_000, seed=3, mesh=mesh, backend="xla",
            control_variate=True)
        assert np.isfinite(p) and np.isfinite(se) and p > 0
