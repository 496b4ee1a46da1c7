"""TPU-only validation of the Pallas kernels (skipped on CPU runs; the
XLA-path equivalents are covered by the rest of the suite). Run on a TPU
host: JAX_PLATFORMS= python -m pytest tests/test_pallas_tpu.py"""
import numpy as np
import pytest

import jax

if jax.default_backend() != "tpu":
    pytest.skip("Pallas TPU kernels require TPU hardware",
                allow_module_level=True)

from optpricer_tpu import CALL, OptionSpec, euro_price_mc
from optpricer_tpu.models.mc_fused import exotic_price_mc


def test_terminal_kernel_vs_f64_bs():
    from math import erfc, exp, log, sqrt

    opt = OptionSpec(S0=100.0, K=110.0, T=1.0, r=0.03, sigma=0.2)
    d1 = (log(100 / 110) + (0.03 + 0.02)) / 0.2
    d2 = d1 - 0.2
    Phi = lambda x: 0.5 * erfc(-x / sqrt(2))
    ref = 100 * Phi(d1) - 110 * exp(-0.03) * Phi(d2)
    px, se = euro_price_mc(opt, CALL, n_paths=1 << 28, seed=3,
                           backend="pallas")
    assert abs(px - ref) < 5 * se + 1e-4


@pytest.mark.parametrize("payoff,kw", [
    ("vanilla", {}),
    ("barrier", dict(barrier=120.0, barrier_type="up-and-out")),
    ("asian", {}),
    ("digital", {}),
    ("lookback", dict(strike_type="floating")),
])
def test_path_kernel_vs_xla(payoff, kw):
    common = dict(n_steps=64, n_paths=200_000, seed=5)
    p1, s1 = exotic_price_mc(payoff, 100.0, 100.0, 1.0, 0.05, sigma=0.2,
                             backend="pallas", **common, **kw)
    p2, s2 = exotic_price_mc(payoff, 100.0, 100.0, 1.0, 0.05, sigma=0.2,
                             backend="xla", **common, **kw)
    assert abs(p1 - p2) < 5 * np.hypot(s1, s2) + 1e-3


def test_batch_book_kernel_vs_f64_bs():
    from math import erfc, exp, log, sqrt

    from optpricer_tpu.ops.pallas_mc_batch import euro_price_mc_batch

    def bs64(S0, K, T, r, q, s, call=True):
        d1 = (log(S0 / K) + (r - q + 0.5 * s * s) * T) / (s * sqrt(T))
        d2 = d1 - s * sqrt(T)
        Phi = lambda x: 0.5 * erfc(-x / sqrt(2))
        c = S0 * exp(-q * T) * Phi(d1) - K * exp(-r * T) * Phi(d2)
        return c if call else c - S0 * exp(-q * T) + K * exp(-r * T)

    Ks = np.linspace(60, 150, 300)
    kinds = np.where(Ks >= 100, "call", "put")
    px, se = euro_price_mc_batch(100.0, Ks, 1.0, 0.03, 0.0, 0.2, kinds,
                                 n_paths=1 << 22, seed=3)
    refs = np.array([bs64(100.0, k, 1.0, 0.03, 0.0, 0.2, c == "call")
                     for k, c in zip(Ks, kinds)])
    z = np.abs(px - refs) / np.maximum(se, 1e-12)
    # 300 simultaneous 5σ tests: essentially impossible under H0
    assert z.max() < 5.0, (z.max(), np.abs(px - refs).max())


def test_tridiag_pallas_tpu():
    from optpricer_tpu.ops.pallas_tridiag import tridiag_solve_pallas
    from optpricer_tpu.ops.tridiag import tridiag_solve_thomas

    rng = np.random.default_rng(0)
    n, batch = 64, 256
    a = rng.normal(size=(n, batch)).astype(np.float32)
    b = (rng.normal(size=(n, batch)) + 4).astype(np.float32)
    c = rng.normal(size=(n, batch)).astype(np.float32)
    d = rng.normal(size=(n, batch)).astype(np.float32)
    import jax.numpy as jnp

    x = np.asarray(tridiag_solve_pallas(jnp.asarray(a), jnp.asarray(b),
                                        jnp.asarray(c), jnp.asarray(d)))
    ref = np.asarray(tridiag_solve_thomas(
        jnp.asarray(a.T), jnp.asarray(b.T), jnp.asarray(c.T),
        jnp.asarray(d.T))).T
    np.testing.assert_allclose(x, ref, rtol=2e-3, atol=1e-4)


def test_dupire_kernel_vs_xla():
    from optpricer_tpu import SVIParams, VolSurface
    from optpricer_tpu.models.mc_fused import exotic_price_mc_dupire

    sl = {T: SVIParams(a=0.02 * T + 0.02, b=0.15, rho=-0.3, m=0.02,
                       sigma=0.12, expiry=T) for T in (0.25, 0.5, 1.0)}
    surf = VolSurface(sl, forward_curve={T: 100 * np.exp(0.03 * T)
                                         for T in sl})
    kw = dict(barrier=130.0, barrier_type="up-and-out", n_steps=100,
              n_paths=100_000)
    p1, s1 = exotic_price_mc_dupire("barrier", surf, 100.0, 100.0, 1.0,
                                    0.05, 0.02, scheme="milstein",
                                    backend="pallas", seed=3, **kw)
    p2, s2 = exotic_price_mc_dupire("barrier", surf, 100.0, 100.0, 1.0,
                                    0.05, 0.02, scheme="milstein",
                                    backend="xla", seed=4, **kw)
    assert abs(p1 - p2) < 5 * np.hypot(s1, s2) + 1e-3


def test_heston_kernel_vs_xla():
    hp = dict(v0=0.04, kappa=1.5, theta=0.04, xi=0.3, rho=-0.5)
    p1, s1 = exotic_price_mc("vanilla", 100.0, 100.0, 1.0, 0.05, heston=hp,
                             n_steps=100, n_paths=200_000, seed=3,
                             backend="pallas")
    p2, s2 = exotic_price_mc("vanilla", 100.0, 100.0, 1.0, 0.05, heston=hp,
                             n_steps=100, n_paths=200_000, seed=4,
                             backend="xla")
    assert abs(p1 - p2) < 5 * np.hypot(s1, s2) + 1e-3


class TestPallasUnderMesh:
    """Pallas kernels inside shard_map on real hardware. With one chip the
    1-device mesh must be BIT-identical to the non-mesh kernel (same global
    program grid, same hardware PRNG streams); on a pod slice the same code
    splits the grid across chips."""

    def test_terminal_mesh1_bit_identical(self):
        from optpricer_tpu.ops.pallas_mc import (
            mc_sumstats_pallas, mc_sumstats_pallas_sharded)
        from optpricer_tpu.parallel import get_mesh

        args = (100.0, 110.0, 1.0, 0.03, 0.0, 0.2, True)
        s1 = np.asarray(mc_sumstats_pallas(7, 10_000_000, *args,
                                           antithetic=True))
        sm = np.asarray(mc_sumstats_pallas_sharded(
            get_mesh(1), 7, 10_000_000, *args, antithetic=True))
        assert np.array_equal(s1, sm)

    def test_path_mesh1_bit_identical(self):
        from optpricer_tpu.ops.pallas_path_mc import (
            path_mc_sumstats_pallas, path_mc_sumstats_pallas_sharded)
        from optpricer_tpu.parallel import get_mesh

        args = (100.0, 100.0, 1.0, 0.03, 0.0, 0.2, True)
        s1 = np.asarray(path_mc_sumstats_pallas(
            3, 500_000, 32, *args, payoff="asian", antithetic=True))
        sm = np.asarray(path_mc_sumstats_pallas_sharded(
            get_mesh(1), 3, 500_000, 32, *args, payoff="asian",
            antithetic=True))
        assert np.array_equal(s1, sm)

    def test_euro_price_mc_mesh_accuracy(self):
        from optpricer_tpu.ops.black_scholes import bs_price_vec
        from optpricer_tpu.parallel import get_mesh

        opt = OptionSpec(S0=100.0, K=110.0, T=1.0, r=0.03, sigma=0.2)
        ref = float(bs_price_vec(100.0, 110.0, 1.0, 0.03, 0.0, 0.2, CALL))
        px, se = euro_price_mc(opt, CALL, n_paths=1 << 24, seed=9,
                               mesh=get_mesh(1), backend="pallas")
        assert abs(px - ref) < 5 * se + 1e-4


def test_pallas_greeks_full_set():
    """All five Greeks + digital from one fused kernel run vs analytic BS."""
    import jax.numpy as jnp

    from optpricer_tpu.models.monte_carlo import euro_greeks_mc
    from optpricer_tpu.ops.black_scholes import greeks_core

    opt = OptionSpec(S0=100.0, K=110.0, T=1.0, r=0.03, sigma=0.2)
    for kind in ("call", "put"):
        g = euro_greeks_mc(opt, kind, n_paths=1 << 26, seed=17,
                           backend="pallas")
        ref = {k: float(v) for k, v in greeks_core(
            jnp.float32(100.0), jnp.float32(110.0), jnp.float32(1.0),
            jnp.float32(0.03), jnp.float32(0.0), jnp.float32(0.2),
            jnp.asarray(kind == "call")).items()}
        assert abs(g["delta"] - ref["delta"]) < 1e-3, (kind, g, ref)
        assert abs(g["gamma"] - ref["gamma"]) < 5e-4, (kind, g, ref)
        assert abs(g["vega"] - ref["vega"]) < 0.1, (kind, g, ref)
        assert abs(g["theta"] - ref["theta"]) < 0.05, (kind, g, ref)
        assert abs(g["rho"] - ref["rho"]) < 0.1, (kind, g, ref)


@pytest.mark.parametrize("payoff,kw", [
    ("vanilla", {}),
    ("asian", {}),
    ("barrier", dict(barrier=125.0, barrier_type="up-and-out")),
])
def test_sabr_pallas_vs_xla(payoff, kw):
    """SABR in the Pallas path kernel (exact lognormal σ in registers)
    agrees with the XLA scan engine to z-test tolerance."""
    sabr = dict(alpha0=0.25, beta=1.0, nu=0.5, rho=-0.4)
    common = dict(n_steps=64, n_paths=200_000, sabr=sabr)
    p1, s1 = exotic_price_mc(payoff, 100.0, 100.0, 1.0, 0.05,
                             backend="pallas", seed=5, **common, **kw)
    p2, s2 = exotic_price_mc(payoff, 100.0, 100.0, 1.0, 0.05,
                             backend="xla", seed=6, **common, **kw)
    assert abs(p1 - p2) < 5 * np.hypot(s1, s2), (payoff, p1, p2, s1, s2)


def test_sabr_cev_pallas_vs_xla():
    sabr = dict(alpha0=2.0, beta=0.5, nu=0.4, rho=-0.3)
    common = dict(n_steps=64, n_paths=200_000, sabr=sabr)
    p1, s1 = exotic_price_mc("vanilla", 100.0, 100.0, 1.0, 0.05,
                             backend="pallas", seed=7, **common)
    p2, s2 = exotic_price_mc("vanilla", 100.0, 100.0, 1.0, 0.05,
                             backend="xla", seed=8, **common)
    assert abs(p1 - p2) < 5 * np.hypot(s1, s2), (p1, p2, s1, s2)


class TestSeedSemanticsTPU:
    """Hardware half of the seed contract (tests/test_seed_semantics.py)."""

    def test_pallas_bitwise_reproducible(self):
        opt = OptionSpec(S0=100.0, K=110.0, T=1.0, r=0.03, sigma=0.2)
        runs = [euro_price_mc(opt, CALL, n_paths=2_000_000, seed=21,
                              backend="pallas") for _ in range(2)]
        assert runs[0] == runs[1]

    def test_backends_differ_but_agree_statistically(self):
        opt = OptionSpec(S0=100.0, K=110.0, T=1.0, r=0.03, sigma=0.2)
        px_p, se_p = euro_price_mc(opt, CALL, n_paths=2_000_000, seed=21,
                                   backend="pallas")
        px_x, se_x = euro_price_mc(opt, CALL, n_paths=2_000_000, seed=21,
                                   backend="xla")
        assert px_p != px_x  # different generators by design (documented)
        assert abs(px_p - px_x) < 5 * np.hypot(se_p, se_x) + 1e-4


class TestQmcTPU:
    def test_accuracy_at_scale(self):
        from math import erfc, exp, log, sqrt

        d1 = (log(100 / 110) + 0.03 + 0.02) / 0.2
        P = lambda x: 0.5 * erfc(-x / sqrt(2))
        ref = 100 * P(d1) - 110 * exp(-0.03) * P(d1 - 0.2)
        opt = OptionSpec(S0=100.0, K=110.0, T=1.0, r=0.03, sigma=0.2)
        px, se = euro_price_mc(opt, CALL, n_paths=1 << 26, seed=7,
                               backend="qmc")
        assert abs(px - ref) < 5 * se
        assert abs(px - ref) < 1e-5  # 10x inside the driver gate

    def test_hardware_matches_cpu_interpreter(self):
        # The QMC point set is pure arithmetic, so hardware and the CPU
        # Mosaic interpreter evaluate the SAME sample set; the compiled
        # kernel's FMA/sqrt rounding differs by ~1 ulp, so agreement is
        # to f32 round-off, not bitwise. Constants from
        #   JAX_PLATFORMS=cpu mc_sumstats_qmc(5, 1<<20, ..., interpret=True)
        from optpricer_tpu.ops.pallas_mc import mc_sumstats_qmc

        args = (100.0, 110.0, 1.0, 0.03, 0.0, 0.2, True)
        hw = mc_sumstats_qmc(5, 1 << 20, *args, interpret=False)
        assert hw[0, 0] == 65536.0
        np.testing.assert_allclose(
            hw[0, :3], [65536.0, 346881.3125, 9690020.5], rtol=1e-6)
        np.testing.assert_allclose(
            hw[7, :3], [65536.0, 346859.96875, 9687252.5], rtol=1e-6)
        assert abs(float(hw[:, 1].sum()) / 5550500.515625 - 1) < 1e-6


class TestMeshOnHardware:
    """Real-kernel shard_map coverage on hardware (1-chip mesh here; the
    same code paths scale the program grid over N chips). Replaces the
    interpreter-mode plumbing checks of tests/test_pallas_mesh.py, which
    are CPU-only."""

    @pytest.fixture(scope="class")
    def mesh(self):
        from optpricer_tpu.parallel import get_mesh

        return get_mesh(1)

    def test_terminal_sharded_matches_single(self, mesh):
        from optpricer_tpu.ops.pallas_mc import (
            mc_sumstats_pallas, mc_sumstats_pallas_sharded)

        args = (100.0, 110.0, 1.0, 0.03, 0.0, 0.2, True)
        n_paths = 3_100_000  # ragged: exercises the tail mask
        ref = np.asarray(mc_sumstats_pallas(
            7, n_paths, *args, antithetic=True))
        out = np.asarray(mc_sumstats_pallas_sharded(
            mesh, 7, n_paths, *args, antithetic=True))
        assert ref[0] == n_paths
        np.testing.assert_allclose(out, ref, rtol=3e-6)

    def test_path_sharded_matches_single(self, mesh):
        from optpricer_tpu.ops.pallas_path_mc import (
            path_mc_sumstats_pallas, path_mc_sumstats_pallas_sharded)

        args = (100.0, 110.0, 1.0, 0.03, 0.0, 0.2, True)
        ref = np.asarray(path_mc_sumstats_pallas(
            11, 200_000, 16, *args, payoff="asian", antithetic=True))
        out = np.asarray(path_mc_sumstats_pallas_sharded(
            mesh, 11, 200_000, 16, *args, payoff="asian", antithetic=True))
        np.testing.assert_allclose(out, ref, rtol=3e-6)

    def test_euro_price_mc_mesh_backend(self, mesh):
        opt = OptionSpec(S0=100.0, K=110.0, T=1.0, r=0.03, sigma=0.2)
        p, se = euro_price_mc(opt, CALL, n_paths=200_000, seed=0, mesh=mesh,
                              backend="pallas")
        assert np.isfinite(p) and np.isfinite(se)

    def test_exotic_price_mc_mesh_heston(self, mesh):
        heston = dict(v0=0.04, kappa=1.5, theta=0.04, xi=0.4, rho=-0.6)
        p, se = exotic_price_mc(
            "barrier", 100.0, 100.0, 1.0, 0.03, heston=heston, n_steps=8,
            n_paths=100_000, seed=5, mesh=mesh, backend="pallas",
            barrier=130.0, barrier_type="up-and-out")
        assert np.isfinite(p) and np.isfinite(se) and p > 0


class TestFusedQmcPathTPU:
    def test_large_budget_vanilla_vs_bs(self):
        # 2^22 points per replicate — above the staged pipeline's former
        # 2^21 Sobol-table cap — priced by the one-kernel pipeline.
        from math import erfc, exp, log, sqrt

        from optpricer_tpu.ops.pallas_qmc_path import (
            path_qmc_sumstats_pallas, qmc_path_estimate)

        stats = path_qmc_sumstats_pallas(
            0, 1 << 22, 64, 100.0, 110.0, 1.0, 0.03, 0.0, 0.2, True,
            payoff="vanilla", n_replicates=8)
        assert float(stats[0, 0]) == float(1 << 22)
        px, se = qmc_path_estimate(stats, 100.0, 0.0, 1.0)
        d1 = (log(100 / 110) + 0.03 + 0.02) / 0.2
        P = lambda x: 0.5 * erfc(-x / sqrt(2))
        ref = 100 * P(d1) - 110 * exp(-0.03) * P(d1 - 0.2)
        assert abs(px - ref) < max(5 * se, 5e-5)

    def test_geo_asian_closed_form_on_hardware(self):
        from optpricer_tpu.models.analytic import geometric_asian_price_f64

        ref = geometric_asian_price_f64(100.0, 100.0, 1.0, 0.05, 0.0, 0.2,
                                        kind="call", n_steps=64)
        p, se = exotic_price_mc("asian", 100.0, 100.0, 1.0, 0.05,
                                sigma=0.2, kind="call",
                                average_type="geometric", n_steps=64,
                                n_paths=1 << 16, seed=0, backend="qmc")
        assert abs(p - ref) < max(5 * se, 2e-4)


class TestSwPrngOracle:
    """Cross-platform reproducibility oracle: the counter-based software
    PRNG (ops/swprng.py) produces the SAME draw bits on the chip and under
    the Mosaic interpreter, so hardware stats must agree with a CPU
    interpret run to f32 rounding (FMA contraction and transcendental
    implementations differ; the draws do not). Before sw_prng the
    interpreter's PRNG stub returned zeros and no such comparison existed.
    The interpret side runs in a CPU subprocess — interpret-mode kernels
    on the TPU *platform* are pathologically slow (io_callback per op)."""

    @staticmethod
    def _cpu_interpret_stats(call_src: str) -> np.ndarray:
        import subprocess
        import sys

        script = (
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "import numpy as np\n"
            "from optpricer_tpu.ops.pallas_mc import mc_sumstats_pallas\n"
            "from optpricer_tpu.ops.pallas_path_mc import "
            "path_mc_sumstats_pallas\n"
            f"s = {call_src}\n"
            "print('STATS', ' '.join(repr(float(v)) "
            "for v in np.asarray(s, np.float64)))\n")
        out = subprocess.run([sys.executable, "-c", script], timeout=420,
                             capture_output=True, text=True, check=True)
        row = [ln for ln in out.stdout.splitlines()
               if ln.startswith("STATS ")][0]
        return np.asarray([float(v) for v in row.split()[1:]], np.float64)

    def test_terminal_kernel_hw_equals_cpu_interpret(self):
        from optpricer_tpu.ops.pallas_mc import mc_sumstats_pallas

        args = "(3, 1 << 18, 100.0, 105.0, 1.0, 0.05, 0.01, 0.25, True)"
        s_hw = np.asarray(mc_sumstats_pallas(
            *eval(args), antithetic=True, sw_prng=True), np.float64)
        s_in = self._cpu_interpret_stats(
            f"mc_sumstats_pallas(*{args}, antithetic=True, interpret=True)")
        np.testing.assert_allclose(s_hw, s_in, rtol=2e-5)

    def test_path_kernel_hw_equals_cpu_interpret(self):
        from optpricer_tpu.ops.pallas_path_mc import path_mc_sumstats_pallas

        args = "(5, 1 << 15, 16, 100.0, 105.0, 1.0, 0.05, 0.01, 0.25, True)"
        s_hw = np.asarray(path_mc_sumstats_pallas(
            *eval(args), payoff="asian", antithetic=True, sw_prng=True),
            np.float64)
        s_in = self._cpu_interpret_stats(
            f"path_mc_sumstats_pallas(*{args}, payoff='asian', "
            "antithetic=True, interpret=True)")
        np.testing.assert_allclose(s_hw, s_in, rtol=2e-5)

    def test_hardware_prng_remains_default(self):
        # production path must stay on the hardware PRNG: same seed,
        # sw_prng on/off -> different (but both valid) streams
        from optpricer_tpu.ops.pallas_mc import (mc_sumstats_pallas,
                                                 pallas_estimate)

        args = (3, 1 << 18, 100.0, 105.0, 1.0, 0.05, 0.01, 0.25, True)
        s_hw = mc_sumstats_pallas(*args, antithetic=True)
        s_sw = mc_sumstats_pallas(*args, antithetic=True, sw_prng=True)
        p_hw, se_hw = pallas_estimate(s_hw, *args[2:], True)
        p_sw, se_sw = pallas_estimate(s_sw, *args[2:], True)
        assert float(np.asarray(s_hw)[1]) != float(np.asarray(s_sw)[1])
        assert abs(p_hw - p_sw) < 5 * (se_hw + se_sw)


class TestBasketKernelTPU:
    """In-register multi-asset path kernel on hardware: parity with the
    XLA scan engine and with the 1-asset single-asset kernel limit."""

    CORR = np.array([[1.0, 0.5, 0.3], [0.5, 1.0, 0.4], [0.3, 0.4, 1.0]])
    SIG = np.array([0.2, 0.3, 0.25])
    S0 = np.array([100.0, 95.0, 105.0])
    W = np.array([0.4, 0.3, 0.3])

    @pytest.mark.parametrize("payoff,extra", [
        ("asian_basket", {}),
        ("worstof_barrier", dict(barrier=80.0,
                                 barrier_type="down-and-out")),
        ("basket_barrier", dict(barrier=115.0, barrier_type="up-and-in")),
    ])
    def test_kernel_matches_xla_engine(self, payoff, extra):
        from optpricer_tpu import basket_exotic_mc

        kw = dict(sigmas=self.SIG, corr=self.CORR, payoff=payoff,
                  n_steps=32, seed=11, **extra)
        p_p, s_p = basket_exotic_mc(self.S0, self.W, 100.0, 1.0, 0.03,
                                    n_paths=1 << 18, backend="pallas", **kw)
        p_x, s_x = basket_exotic_mc(self.S0, self.W, 100.0, 1.0, 0.03,
                                    n_paths=1 << 18, backend="xla", **kw)
        assert abs(p_p - p_x) < 5 * (s_p + s_x) + 1e-3

    def test_mesh1_bit_identical(self):
        from optpricer_tpu.ops.pallas_basket_mc import (
            basket_path_sumstats_pallas, basket_path_sumstats_pallas_sharded)
        from optpricer_tpu.parallel.mesh import get_mesh

        chol = np.linalg.cholesky(self.CORR)
        call = (7, 1 << 17, 16, self.S0, self.W, 100.0, 1.0, 0.03,
                None, self.SIG, chol, True)
        ref = np.asarray(basket_path_sumstats_pallas(
            *call, payoff="asian_basket"))
        out = np.asarray(basket_path_sumstats_pallas_sharded(
            get_mesh(1), *call, payoff="asian_basket"))
        np.testing.assert_array_equal(out, ref)


class TestHestonQEKernelTPU:
    """Andersen QE dynamics in the path kernel on hardware: COS-oracle
    bias gate at coarse steps (the whole point of QE) and in/out parity
    on identical kernel draws."""

    HP = dict(v0=0.04, kappa=1.5, theta=0.04, xi=0.5, rho=-0.6)

    def test_qe_kernel_unbiased_at_12_steps(self):
        from optpricer_tpu import exotic_price_mc, heston_price_cos

        ref = float(heston_price_cos(100.0, 110.0, 1.0, 0.05, 0.0,
                                     **self.HP, kind="put"))
        px, se = exotic_price_mc(
            "vanilla", 100.0, 110.0, 1.0, 0.05, 0.0, heston=self.HP,
            kind="put", n_steps=12, n_paths=1 << 20, seed=2, scheme="qe",
            backend="pallas", dtype="float32")
        assert abs(px - ref) < 4 * se + 0.02, (px, ref)
        # contrast: the Euler kernel at the same budget is way off
        px_e, _ = exotic_price_mc(
            "vanilla", 100.0, 110.0, 1.0, 0.05, 0.0, heston=self.HP,
            kind="put", n_steps=12, n_paths=1 << 20, seed=2,
            backend="pallas", dtype="float32")
        assert px_e - ref > 0.3

    def test_qe_kernel_asian_parity_with_xla(self):
        from optpricer_tpu import exotic_price_mc

        kw = dict(heston=self.HP, kind="call", n_steps=32,
                  n_paths=1 << 18, seed=7, scheme="qe", dtype="float32")
        p_k, s_k = exotic_price_mc("asian", 100.0, 100.0, 1.0, 0.05, 0.0,
                                   backend="pallas", **kw)
        p_x, s_x = exotic_price_mc("asian", 100.0, 100.0, 1.0, 0.05, 0.0,
                                   backend="xla", **kw)
        assert abs(p_k - p_x) < 5 * (s_k + s_x) + 1e-3


class TestLsvQEKernelTPU:
    """QE-calibrated LSV models priced by the in-register path kernel on
    hardware (leverage Horner + QE variance transition in registers)."""

    def test_qe_model_kernel_matches_xla(self):
        import numpy as np

        from optpricer_tpu import (SVIParams, VolSurface, lsv_calibrate,
                                   lsv_price_mc)

        S0, r = 100.0, 0.03
        slices = {T_: SVIParams(a=0.03 * T_, b=0.12 * T_, rho=-0.4,
                                m=0.0, sigma=0.25, expiry=T_)
                  for T_ in (0.5, 1.0)}
        surf = VolSurface(slices, forward_curve={
            T_: S0 * np.exp(r * T_) for T_ in slices})
        m = lsv_calibrate(surf, dict(v0=0.04, kappa=1.5, theta=0.04,
                                     xi=0.5, rho=-0.6), S0, r, T=1.0,
                          n_steps=32, n_paths=32_768, n_bins=96, seed=0,
                          scheme="qe", dtype="float32")
        p_x, s_x = lsv_price_mc("vanilla", m, 100.0, n_paths=1 << 18,
                                seed=3, backend="xla", dtype="float32")
        p_p, s_p = lsv_price_mc("vanilla", m, 100.0, n_paths=1 << 18,
                                seed=3, backend="pallas", dtype="float32")
        assert abs(p_x - p_p) < 5 * (s_x + s_p) + 1e-3, (p_x, p_p)
