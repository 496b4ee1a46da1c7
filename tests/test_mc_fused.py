"""Fused exotic MC vs the path-matrix engines and closed forms."""
import jax.numpy as jnp
import numpy as np
import pytest

from optpricer_tpu import (
    CALL, PUT, OptionSpec, asian_price, barrier_price, bs_price,
    digital_price, lookback_price,
)
from optpricer_tpu.models.mc_fused import exotic_price_mc
from optpricer_tpu.models.processes import gbm_paths

S0, K, R, T, SIG = 100.0, 100.0, 0.05, 1.0, 0.2
N_STEPS, N_PATHS = 100, 100_000


@pytest.fixture(scope="module")
def paths():
    return gbm_paths(S0, R, 0.0, SIG, T, N_STEPS, N_PATHS, antithetic=True,
                     seed=42)


def _agree(a, sa, b, sb, nsig=4.0, extra=1e-3):
    assert abs(a - b) <= nsig * np.hypot(sa, sb) + extra, (a, b, sa, sb)


class TestFusedVsPathMatrix:
    def test_vanilla_vs_bs(self):
        px, se = exotic_price_mc("vanilla", S0, K, T, R, sigma=SIG,
                                 n_steps=N_STEPS, n_paths=N_PATHS, seed=1)
        ref = bs_price(OptionSpec(S0, K, T, R, SIG), CALL)
        assert abs(px - ref) < 4 * se + 1e-3

    def test_barrier(self, paths):
        ref, se_ref = barrier_price(paths, K, R, T, CALL, 120.0, "up-and-out")
        px, se = exotic_price_mc("barrier", S0, K, T, R, sigma=SIG,
                                 barrier=120.0, barrier_type="up-and-out",
                                 n_steps=N_STEPS, n_paths=N_PATHS, seed=2)
        _agree(px, se, ref, se_ref)

    def test_barrier_knock_in(self, paths):
        ref, se_ref = barrier_price(paths, K, R, T, PUT, 80.0, "down-and-in")
        px, se = exotic_price_mc("barrier", S0, K, T, R, sigma=SIG, kind="put",
                                 barrier=80.0, barrier_type="down-and-in",
                                 n_steps=N_STEPS, n_paths=N_PATHS, seed=3)
        _agree(px, se, ref, se_ref)

    def test_asian_arithmetic(self, paths):
        ref, se_ref = asian_price(paths, K, R, T, CALL, "arithmetic")
        px, se = exotic_price_mc("asian", S0, K, T, R, sigma=SIG,
                                 average_type="arithmetic",
                                 n_steps=N_STEPS, n_paths=N_PATHS, seed=4)
        _agree(px, se, ref, se_ref)

    def test_asian_geometric_floating(self, paths):
        ref, se_ref = asian_price(paths, K, R, T, PUT, "geometric", "floating")
        px, se = exotic_price_mc("asian", S0, K, T, R, sigma=SIG, kind="put",
                                 average_type="geometric",
                                 strike_type="floating",
                                 n_steps=N_STEPS, n_paths=N_PATHS, seed=5)
        _agree(px, se, ref, se_ref)

    def test_digital(self, paths):
        ref, se_ref = digital_price(paths, K, R, T, CALL)
        px, se = exotic_price_mc("digital", S0, K, T, R, sigma=SIG,
                                 n_steps=N_STEPS, n_paths=N_PATHS, seed=6)
        _agree(px, se, ref, se_ref)

    def test_lookback_floating(self, paths):
        ref, se_ref = lookback_price(paths, R, T, CALL)
        px, se = exotic_price_mc("lookback", S0, K, T, R, sigma=SIG,
                                 strike_type="floating",
                                 n_steps=N_STEPS, n_paths=N_PATHS, seed=7)
        _agree(px, se, ref, se_ref)

    def test_lookback_fixed(self, paths):
        ref, se_ref = lookback_price(paths, R, T, PUT, K=K,
                                     strike_type="fixed")
        px, se = exotic_price_mc("lookback", S0, K, T, R, sigma=SIG,
                                 kind="put", strike_type="fixed",
                                 n_steps=N_STEPS, n_paths=N_PATHS, seed=8)
        _agree(px, se, ref, se_ref)


class TestFusedLocalVol:
    def test_const_local_vol_matches_gbm(self):
        sigma_fn = lambda S, t: SIG * jnp.ones_like(S)
        p1, se1 = exotic_price_mc("vanilla", S0, K, T, R, sigma=SIG,
                                  n_steps=50, n_paths=50_000, seed=9)
        p2, se2 = exotic_price_mc("vanilla", S0, K, T, R, sigma_loc=sigma_fn,
                                  n_steps=50, n_paths=50_000, seed=9)
        _agree(p1, se1, p2, se2)

    def test_milstein_scheme(self):
        sigma_fn = lambda S, t: SIG * jnp.ones_like(S)
        px, se = exotic_price_mc("vanilla", S0, K, T, R, sigma_loc=sigma_fn,
                                 scheme="milstein", n_steps=100,
                                 n_paths=50_000, seed=10)
        ref = bs_price(OptionSpec(S0, K, T, R, SIG), CALL)
        assert abs(px - ref) < 4 * se + 5e-2

    def test_barrier_local_vol(self):
        sigma_fn = lambda S, t: SIG * jnp.ones_like(S)
        px, se = exotic_price_mc("barrier", S0, K, T, R, sigma_loc=sigma_fn,
                                 barrier=130.0, barrier_type="up-and-out",
                                 n_steps=100, n_paths=50_000, seed=11)
        px_g, se_g = exotic_price_mc("barrier", S0, K, T, R, sigma=SIG,
                                     barrier=130.0, barrier_type="up-and-out",
                                     n_steps=100, n_paths=50_000, seed=12)
        _agree(px, se, px_g, se_g)


class TestValidation:
    def test_bad_payoff(self):
        with pytest.raises(ValueError):
            exotic_price_mc("rainbow", S0, K, T, R, sigma=SIG)

    def test_sigma_exclusive(self):
        with pytest.raises(ValueError):
            exotic_price_mc("vanilla", S0, K, T, R)
        with pytest.raises(ValueError):
            exotic_price_mc("vanilla", S0, K, T, R, sigma=SIG,
                            sigma_loc=lambda S, t: S)


class TestFusedHeston:
    def test_heston_vanilla_vs_path_engine(self):
        from optpricer_tpu.models.processes import heston_paths
        hp = dict(v0=0.04, kappa=1.5, theta=0.04, xi=0.3, rho=-0.5)
        paths = heston_paths(S0, R, 0.0, hp["v0"], hp["kappa"], hp["theta"],
                             hp["xi"], hp["rho"], T, 100, 50_000, seed=20)
        ST = np.asarray(paths[-1])
        ref = float(np.exp(-R * T) * np.maximum(ST - K, 0.0).mean())
        se_ref = float(np.exp(-R * T) * np.maximum(ST - K, 0.0).std()
                       / np.sqrt(ST.size))
        px, se = exotic_price_mc("vanilla", S0, K, T, R, heston=hp,
                                 n_steps=100, n_paths=50_000, seed=21)
        _agree(px, se, ref, se_ref)

    def test_heston_asian(self):
        hp = dict(v0=0.04, kappa=1.5, theta=0.04, xi=0.3, rho=-0.5)
        px, se = exotic_price_mc("asian", S0, K, T, R, heston=hp,
                                 n_steps=100, n_paths=50_000, seed=22)
        assert 0 < px < 20 and se > 0

    def test_model_exclusivity(self):
        hp = dict(v0=0.04, kappa=1.5, theta=0.04, xi=0.3, rho=-0.5)
        with pytest.raises(ValueError):
            exotic_price_mc("vanilla", S0, K, T, R, sigma=SIG, heston=hp)


class TestFusedMerton:
    def test_merton_vanilla_vs_path_engine(self):
        from optpricer_tpu.models.processes import merton_jump_paths
        mp = dict(sigma=SIG, lam=0.5, mJ=-0.05, sJ=0.1)
        paths = merton_jump_paths(S0, R, 0.0, SIG, T, 100, 50_000,
                                  lam=0.5, mJ=-0.05, sJ=0.1, seed=30)
        ST = np.asarray(paths[-1])
        disc_pay = np.exp(-R * T) * np.maximum(ST - K, 0.0)
        ref, se_ref = float(disc_pay.mean()), float(
            disc_pay.std() / np.sqrt(ST.size))
        px, se = exotic_price_mc("vanilla", S0, K, T, R, merton=mp,
                                 n_steps=100, n_paths=50_000, seed=31)
        _agree(px, se, ref, se_ref)

    def test_merton_martingale(self):
        """Compensated jumps keep the forward: price of zero-strike call
        = discounted forward."""
        mp = dict(sigma=SIG, lam=1.0, mJ=0.08, sJ=0.15)
        px, se = exotic_price_mc("vanilla", S0, 1e-6, T, R, merton=mp,
                                 n_steps=100, n_paths=200_000, seed=32)
        fwd = S0  # e^{-rT}·E[S_T] = S0·e^{-qT}, q=0
        assert abs(px - fwd) < 5 * se + 0.05


class TestFusedMesh:
    def test_mesh_close_to_single(self):
        from optpricer_tpu.parallel import get_mesh
        mesh = get_mesh(8)
        p1, s1 = exotic_price_mc("asian", S0, K, T, R, sigma=SIG,
                                 n_steps=50, n_paths=80_000, seed=40,
                                 mesh=mesh)
        p2, s2 = exotic_price_mc("asian", S0, K, T, R, sigma=SIG,
                                 n_steps=50, n_paths=80_000, seed=41)
        _agree(p1, s1, p2, s2)

    def test_mesh_barrier_heston(self):
        from optpricer_tpu.parallel import get_mesh
        mesh = get_mesh(8)
        hp = dict(v0=0.04, kappa=1.5, theta=0.04, xi=0.3, rho=-0.5)
        px, se = exotic_price_mc("barrier", S0, K, T, R, heston=hp,
                                 barrier=130.0, barrier_type="up-and-out",
                                 n_steps=50, n_paths=40_000, seed=42,
                                 mesh=mesh)
        assert 0 < px < 10 and se > 0


class TestDupireFused:
    def _flat_surface(self, v=0.2):
        from optpricer_tpu import SVIParams, VolSurface
        slices = {T: SVIParams(a=v * v * T, b=1e-6, rho=0.0, m=0.0,
                               sigma=0.1, expiry=T) for T in (0.25, 0.5, 1.0)}
        return VolSurface(slices, forward_curve={T: 100.0 for T in slices})

    def test_flat_surface_matches_bs(self):
        from optpricer_tpu.models.mc_fused import exotic_price_mc_dupire
        surf = self._flat_surface(0.2)
        px, se = exotic_price_mc_dupire("vanilla", surf, 100.0, 100.0, 1.0,
                                        0.05, 0.0, scheme="log_euler",
                                        n_steps=100, n_paths=50_000, seed=1)
        ref = bs_price(OptionSpec(100.0, 100.0, 1.0, 0.05, 0.2), CALL)
        assert abs(px - ref) < 4 * se + 0.05

    def test_milstein_scheme(self):
        from optpricer_tpu.models.mc_fused import exotic_price_mc_dupire
        surf = self._flat_surface(0.2)
        px, se = exotic_price_mc_dupire("barrier", surf, 100.0, 100.0, 1.0,
                                        0.05, 0.0, scheme="milstein",
                                        barrier=130.0,
                                        barrier_type="up-and-out",
                                        n_steps=100, n_paths=50_000, seed=2)
        assert 0 < px < 10 and se > 0


class TestFusedHestonQE:
    """Andersen QE dynamics in the fused engine (scheme="qe" with
    heston=): unbiased coarse-step marginals vs the COS oracle, exact
    in/out parity on shared draws, and the scheme guard."""

    HP = dict(v0=0.04, kappa=1.5, theta=0.04, xi=0.5, rho=-0.6)

    def test_unbiased_at_coarse_steps_vs_cos(self):
        from optpricer_tpu import heston_price_cos

        ref = float(heston_price_cos(100.0, 110.0, 1.0, 0.05, 0.0,
                                     **self.HP, kind="put"))
        px, se = exotic_price_mc(
            "vanilla", 100.0, 110.0, 1.0, 0.05, 0.0, heston=self.HP,
            kind="put", n_steps=12, n_paths=200_000, seed=2, scheme="qe",
            backend="xla")
        assert abs(px - ref) < 4 * se + 0.01
        # the euler failure mode at the same budget, for contrast
        px_e, _ = exotic_price_mc(
            "vanilla", 100.0, 110.0, 1.0, 0.05, 0.0, heston=self.HP,
            kind="put", n_steps=12, n_paths=200_000, seed=2, backend="xla")
        assert px_e - ref > 0.2

    def test_in_out_parity_exact_on_shared_draws(self):
        kw = dict(heston=self.HP, kind="call", n_steps=16,
                  n_paths=50_000, seed=5, scheme="qe", backend="xla",
                  barrier=130.0)
        uo, _ = exotic_price_mc("barrier", 100.0, 100.0, 1.0, 0.05, 0.0,
                                barrier_type="up-and-out", **kw)
        ui, _ = exotic_price_mc("barrier", 100.0, 100.0, 1.0, 0.05, 0.0,
                                barrier_type="up-and-in", **kw)
        van, _ = exotic_price_mc("vanilla", 100.0, 100.0, 1.0, 0.05, 0.0,
                                 heston=self.HP, kind="call", n_steps=16,
                                 n_paths=50_000, seed=5, scheme="qe",
                                 backend="xla")
        assert abs((uo + ui) - van) < 1e-6 * max(1.0, van)

    def test_qe_requires_heston(self):
        with pytest.raises(ValueError, match="qe"):
            exotic_price_mc("vanilla", 100.0, 100.0, 1.0, 0.05, 0.0,
                            sigma=0.2, scheme="qe")

    def test_qe_kernel_matches_xla_engine(self):
        # interpret-mode Pallas QE (software PRNG) vs the XLA scan —
        # independent draw streams, so statistical agreement + the COS
        # oracle pin both
        from optpricer_tpu import heston_price_cos

        ref = float(heston_price_cos(100.0, 110.0, 1.0, 0.05, 0.0,
                                     **self.HP, kind="put"))
        kw = dict(heston=self.HP, kind="put", n_steps=12,
                  n_paths=1 << 15, seed=2, scheme="qe", dtype="float32")
        px_k, se_k = exotic_price_mc("vanilla", 100.0, 110.0, 1.0, 0.05,
                                     0.0, backend="pallas", **kw)
        px_x, se_x = exotic_price_mc("vanilla", 100.0, 110.0, 1.0, 0.05,
                                     0.0, backend="xla", **kw)
        assert abs(px_k - ref) < 4 * se_k + 0.02
        assert abs(px_k - px_x) < 4 * (se_k + se_x) + 0.02

    def test_qe_kernel_barrier_parity(self):
        kb = dict(heston=self.HP, kind="call", n_steps=16,
                  n_paths=1 << 14, seed=5, scheme="qe", dtype="float32",
                  backend="pallas", barrier=130.0)
        uo, _ = exotic_price_mc("barrier", 100.0, 100.0, 1.0, 0.05, 0.0,
                                barrier_type="up-and-out", **kb)
        ui, _ = exotic_price_mc("barrier", 100.0, 100.0, 1.0, 0.05, 0.0,
                                barrier_type="up-and-in", **kb)
        van, _ = exotic_price_mc("vanilla", 100.0, 100.0, 1.0, 0.05, 0.0,
                                 heston=self.HP, kind="call", n_steps=16,
                                 n_paths=1 << 14, seed=5, scheme="qe",
                                 dtype="float32", backend="pallas")
        assert abs((uo + ui) - van) < 1e-5 * max(1.0, van)

    def test_qe_mesh_matches_single_statistically(self):
        from optpricer_tpu.parallel.mesh import get_mesh

        kw = dict(heston=self.HP, kind="put", n_steps=12,
                  n_paths=1 << 14, seed=2, scheme="qe", backend="xla")
        p1, se1 = exotic_price_mc("vanilla", 100.0, 110.0, 1.0, 0.05,
                                  0.0, **kw)
        pm, sem = exotic_price_mc("vanilla", 100.0, 110.0, 1.0, 0.05,
                                  0.0, mesh=get_mesh(8), **kw)
        assert abs(p1 - pm) < 4 * (se1 + sem) + 0.05


class TestExactCEV:
    """Dual-BESQ exact absorbed-CEV sampling (scheme="exact" with
    sabr=, beta<1): the transition is EXACT at any step count — the
    oracles are the noncentral-chi-square closed forms, hit at 2 steps
    where the Euler backbone needs hundreds."""

    SIG, BETA = 2.5, 0.5
    SB = dict(alpha0=2.5, beta=0.5, nu=0.0, rho=0.0)

    def test_vanilla_call_exact_at_two_steps(self):
        from optpricer_tpu import cev_price

        ref = float(cev_price(100.0, 100.0, 1.0, 0.04, 0.01,
                              sigma=self.SIG, beta=self.BETA,
                              n_terms=4096))
        px, se = exotic_price_mc(
            "vanilla", 100.0, 100.0, 1.0, 0.04, 0.01, sabr=self.SB,
            scheme="exact", n_steps=2, n_paths=400_000, seed=11,
            control_variate=True)
        assert abs(px - ref) < 4 * se + 1e-3, (px, ref)

    def test_put_by_parity(self):
        from optpricer_tpu import cev_price

        ref = float(cev_price(100.0, 110.0, 1.0, 0.04, 0.01,
                              sigma=self.SIG, beta=self.BETA, kind="put",
                              n_terms=4096))
        px, se = exotic_price_mc(
            "vanilla", 100.0, 110.0, 1.0, 0.04, 0.01, kind="put",
            sabr=self.SB, scheme="exact", n_steps=4, n_paths=400_000,
            seed=11, control_variate=True)
        assert abs(px - ref) < 4 * se + 1e-3

    def test_digital_matches_ncx2_distribution(self):
        # the digital IS the risk-neutral CDF: the strongest pointwise
        # check that the sampled terminal law is exactly Schroder's
        from scipy.stats import ncx2

        om = 1.0 - self.BETA
        drift = 2 * 0.04 * om
        tau = (np.exp(drift) - 1.0) / drift
        v = self.SIG**2 * tau
        F = 100.0 * np.exp(0.04)
        a = 100.0 ** (2 * om) / (om * om * v)
        c = F ** (2 * om) / (om * om * v)
        ref = np.exp(-0.04) * ncx2.cdf(c, 1 / om, a)
        px, se = exotic_price_mc(
            "digital", 100.0, 100.0, 1.0, 0.04, 0.0, sabr=self.SB,
            scheme="exact", n_steps=4, n_paths=400_000, seed=6)
        assert abs(px - ref) < 4 * se + 1e-4, (px, ref)

    def test_barrier_matches_substepped_euler_skeleton(self):
        # same 8-date discrete-monitoring contract: exact transitions at
        # 8 steps vs the Euler backbone at 64 substeps per date
        from optpricer_tpu.models.processes import sabr_paths

        pb, seb = exotic_price_mc(
            "barrier", 100.0, 100.0, 1.0, 0.04, 0.0, sabr=self.SB,
            scheme="exact", barrier=140.0, barrier_type="up-and-out",
            n_steps=8, n_paths=200_000, seed=4)
        S = sabr_paths(100.0, 0.04, 0.0, self.SIG, self.BETA, 0.0, 0.0,
                       1.0, 8 * 64, 100_000, seed=5, dtype="float64")
        Sm = np.asarray(S)[::64]
        crossed = (Sm >= 140.0).any(axis=0)
        pay = np.exp(-0.04) * np.where(
            crossed, 0.0, np.maximum(Sm[-1] - 100.0, 0.0))
        ref, rse = pay.mean(), pay.std() / np.sqrt(pay.size)
        assert abs(pb - ref) < 4 * (seb + rse) + 5e-3

    def test_correlated_sabr_matches_fine_euler(self):
        # Islah's conditional shifted-CEV step: nu>0, rho<0 at 16 steps
        # vs the Euler backbone at 1024 (driftless forward) — the only
        # residual bias is the trapezoid int-alpha^2, O(dt^2)
        from optpricer_tpu.models.processes import sabr_paths

        sb = dict(alpha0=2.5, beta=0.5, nu=0.6, rho=-0.7)
        pe, see = exotic_price_mc(
            "vanilla", 100.0, 100.0, 1.0, 0.0, 0.0, sabr=sb,
            scheme="exact", n_steps=16, n_paths=200_000, seed=5,
            control_variate=True)
        S = sabr_paths(100.0, 0.0, 0.0, 2.5, 0.5, 0.6, -0.7, 1.0, 1024,
                       100_000, seed=3, dtype="float64")
        ST = np.asarray(S[-1])
        pay = np.maximum(ST - 100.0, 0.0)
        ref, rse = pay.mean(), pay.std() / np.sqrt(ST.size)
        assert abs(pe - ref) < 4 * (see + rse) + 5e-3, (pe, ref)

    def test_guards(self):
        with pytest.raises(ValueError, match="beta"):
            exotic_price_mc("vanilla", 100.0, 100.0, 1.0, 0.04, 0.0,
                            sabr=dict(alpha0=0.2, beta=1.0, nu=0.0,
                                      rho=0.0), scheme="exact")
        with pytest.raises(ValueError, match="rho"):
            exotic_price_mc("vanilla", 100.0, 100.0, 1.0, 0.04, 0.0,
                            sabr=dict(self.SB, nu=0.3, rho=-1.0),
                            scheme="exact")
        with pytest.raises(ValueError, match="absorbed"):
            exotic_price_mc("asian", 100.0, 100.0, 1.0, 0.04, 0.0,
                            sabr=self.SB, scheme="exact")
        with pytest.raises(ValueError, match="rebate"):
            exotic_price_mc("barrier", 100.0, 100.0, 1.0, 0.04, 0.0,
                            sabr=self.SB, scheme="exact", barrier=140.0,
                            rebate=1.0)


class TestDiscreteDividendsMC:
    """Piecewise-GBM cash dividends on the XLA scan engine — the PDE
    jump-condition solver (pinned to an exact quadrature oracle in
    test_pde.py) is the cross-engine truth."""

    def test_vanilla_matches_dividend_pde(self):
        from optpricer_tpu import OptionSpec, exotic_price_mc, fd_price

        divs = [(0.5, 5.0)]
        opt = OptionSpec(S0=100.0, K=100.0, T=1.0, r=0.05, sigma=0.2)
        pde = fd_price(opt, "call", N_S=400, N_t=400, dividends=divs)
        mc, se = exotic_price_mc("vanilla", 100.0, 100.0, 1.0, 0.05,
                                 sigma=0.2, n_steps=64, n_paths=200_000,
                                 seed=3, dividends=divs)
        assert se > 0.0
        assert abs(mc - pde) < 4.0 * se + 5e-3, (mc, pde)

    def test_dividend_lowers_call_payoffs(self):
        from optpricer_tpu import exotic_price_mc

        kw = dict(sigma=0.2, n_steps=32, n_paths=100_000, seed=5)
        for payoff, extra in (("vanilla", {}), ("asian", {}),
                              ("lookback", dict(strike_type="fixed"))):
            with_d, _ = exotic_price_mc(payoff, 100.0, 100.0, 1.0, 0.05,
                                        dividends=[(0.5, 5.0)], **extra,
                                        **kw)
            without, _ = exotic_price_mc(payoff, 100.0, 100.0, 1.0, 0.05,
                                         **extra, **kw)
            assert with_d < without, payoff

    def test_guards(self):
        from optpricer_tpu import exotic_price_mc

        divs = [(0.5, 5.0)]
        hp = dict(v0=0.04, kappa=1.5, theta=0.04, xi=0.4, rho=-0.5)
        with pytest.raises(ValueError, match="GBM"):
            exotic_price_mc("vanilla", 100.0, 100.0, 1.0, 0.05,
                            heston=hp, dividends=divs)
        with pytest.raises(ValueError, match="control_variate"):
            exotic_price_mc("asian", 100.0, 100.0, 1.0, 0.05, sigma=0.2,
                            control_variate=True, dividends=divs)
        with pytest.raises(ValueError, match="XLA scan"):
            exotic_price_mc("vanilla", 100.0, 100.0, 1.0, 0.05, sigma=0.2,
                            backend="pallas", dividends=divs)

    def test_greeks_reject_dividends(self):
        # the pathwise/LR chains assume dividend-free dynamics: a silent
        # ignore would return Greeks for the WRONG model
        from optpricer_tpu import exotic_greeks_mc

        with pytest.raises(ValueError, match="dividends"):
            exotic_greeks_mc("vanilla", 100.0, 100.0, 1.0, 0.05,
                             sigma=0.2, dividends=[(0.5, 5.0)])
