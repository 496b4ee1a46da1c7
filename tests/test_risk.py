"""Risk engine: bump Greeks vs analytic, AD Greeks, scenarios, VaR/CVaR.

Mirrors reference test_risk.py (greeks key sets, monotonicity, CVaR≥VaR,
VaR of N(0,1) ≈ 2.326).
"""
import numpy as np
import pytest

from optpricer_tpu import (
    CALL, PUT, bs_greeks, bs_price_vec, cvar_historical, numerical_greeks,
    portfolio_risk, scenario_grid, var_historical,
)
from optpricer_tpu.core import OptionSpec
from optpricer_tpu.risk import ad_greeks


def _bs_pricer(S, K, T, r, q, sigma, kind):
    return float(bs_price_vec(S, K, T, r, q, sigma, kind))


ARGS = dict(S=100.0, K=100.0, T=1.0, r=0.05, q=0.0, sigma=0.2)


class TestNumericalGreeks:
    def test_keys(self):
        g = numerical_greeks(_bs_pricer, **ARGS, kind=CALL)
        assert set(g) == {"delta", "gamma", "vega", "theta", "rho"}

    def test_matches_analytic(self):
        g = numerical_greeks(_bs_pricer, **ARGS, kind=CALL, bump_pct=0.001)
        ref = bs_greeks(OptionSpec(100.0, 100.0, 1.0, 0.05, 0.2), CALL)
        assert abs(g["delta"] - ref["delta"]) < 1e-3
        assert abs(g["gamma"] - ref["gamma"]) < 1e-3
        assert abs(g["vega"] - ref["vega"]) < 0.05
        assert abs(g["rho"] - ref["rho"]) < 0.1
        # theta: forward 1-day difference vs instantaneous
        assert abs(g["theta"] - ref["theta"]) / abs(ref["theta"]) < 0.05

    def test_put_delta_negative(self):
        g = numerical_greeks(_bs_pricer, **ARGS, kind=PUT)
        assert g["delta"] < 0


class TestADGreeks:
    def test_matches_analytic_exactly(self):
        from optpricer_tpu.ops.black_scholes import price_core
        g = ad_greeks(price_core, 100.0, 100.0, 1.0, 0.05, 0.0, 0.2, CALL)
        ref = bs_greeks(OptionSpec(100.0, 100.0, 1.0, 0.05, 0.2), CALL)
        assert abs(g["delta"] - ref["delta"]) < 1e-9
        assert abs(g["gamma"] - ref["gamma"]) < 1e-9
        assert abs(g["vega"] - ref["vega"]) < 1e-8
        assert abs(g["rho"] - ref["rho"]) < 1e-8
        assert abs(g["theta"] - ref["theta"]) < 1e-8


class TestScenarioGrid:
    def test_shape_and_monotonicity(self):
        out = scenario_grid(_bs_pricer, **ARGS, kind=CALL,
                            spot_range=np.linspace(80, 120, 5),
                            vol_range=np.linspace(0.1, 0.4, 4))
        assert out["prices"].shape == (5, 4)
        assert np.all(np.diff(out["prices"], axis=0) > 0)  # call ↑ in spot
        assert np.all(np.diff(out["prices"], axis=1) > 0)  # call ↑ in vol

    def test_vectorized_matches_loop(self):
        spot = np.linspace(90, 110, 3)
        vol = np.linspace(0.15, 0.25, 3)
        loop = scenario_grid(_bs_pricer, **ARGS, kind=CALL,
                             spot_range=spot, vol_range=vol)
        vec = scenario_grid(
            lambda S, K, T, r, q, sigma, kind: bs_price_vec(
                S, K, T, r, q, sigma, kind),
            **ARGS, kind=CALL, spot_range=spot, vol_range=vol,
            vectorized=True)
        np.testing.assert_allclose(loop["prices"], vec["prices"], atol=1e-10)


class TestPortfolioRisk:
    def test_aggregation(self):
        insts = [
            {**ARGS, "kind": CALL, "position": 1.0},
            {**ARGS, "kind": PUT, "position": -2.0},
        ]
        out = portfolio_risk(insts, _bs_pricer)
        assert len(out["instrument_greeks"]) == 2
        g1 = numerical_greeks(_bs_pricer, **ARGS, kind=CALL)
        g2 = numerical_greeks(_bs_pricer, **ARGS, kind=PUT)
        assert abs(out["total_delta"] - (g1["delta"] - 2 * g2["delta"])) < 1e-9
        assert abs(out["total_gamma"] - (g1["gamma"] - 2 * g2["gamma"])) < 1e-9

    def test_long_short_cancel(self):
        insts = [
            {**ARGS, "kind": CALL, "position": 1.0},
            {**ARGS, "kind": CALL, "position": -1.0},
        ]
        out = portfolio_risk(insts, _bs_pricer)
        assert abs(out["total_delta"]) < 1e-12
        assert abs(out["total_value"]) < 1e-12


class TestVaR:
    def test_var_of_standard_normal(self):
        rng = np.random.default_rng(1)
        returns = rng.normal(0, 1, 200_000)
        v = var_historical(returns, confidence=0.99)
        assert abs(v - 2.326) < 0.05

    def test_cvar_geq_var(self):
        rng = np.random.default_rng(2)
        returns = rng.normal(0, 0.02, 10_000)
        v = var_historical(returns, 0.99)
        c = cvar_historical(returns, 0.99)
        assert c >= v

    def test_horizon_scaling(self):
        rng = np.random.default_rng(3)
        returns = rng.normal(0, 0.01, 50_000)
        v1 = var_historical(returns, 0.99, horizon=1)
        v4 = var_historical(returns, 0.99, horizon=4)
        assert abs(v4 - 2 * v1) < 1e-12

    def test_var_positive_for_loss_tail(self):
        returns = np.concatenate([np.full(90, 0.001), np.full(10, -0.10)])
        assert var_historical(returns, confidence=0.95) > 0


class TestPortfolioRiskFast:
    def test_matches_analytic_per_instrument(self):
        from optpricer_tpu.risk import portfolio_risk_fast
        insts = [
            {**ARGS, "kind": CALL, "position": 2.0},
            {"S": 100.0, "K": 95.0, "T": 0.5, "r": 0.02, "q": 0.01,
             "sigma": 0.3, "kind": PUT, "position": -1.5},
        ]
        out = portfolio_risk_fast(insts)
        g1 = bs_greeks(OptionSpec(100.0, 100.0, 1.0, 0.05, 0.2), CALL)
        g2 = bs_greeks(OptionSpec(100.0, 95.0, 0.5, 0.02, 0.3, q=0.01), PUT)
        assert abs(out["total_delta"] - (2 * g1["delta"] - 1.5 * g2["delta"])) < 1e-9
        assert abs(out["total_vega"] - (2 * g1["vega"] - 1.5 * g2["vega"])) < 1e-7
        assert len(out["instrument_greeks"]) == 2


class TestExposureProfile:
    """Counterparty exposure metrics against the martingale oracle:
    discounted book values are martingales, so an always-positive book
    must show EE(t) = V0 * exp(r t) exactly (in expectation)."""

    INST = dict(S=100., K=100., T=1., r=0.05, q=0.01, sigma=0.2,
                kind="call", position=1.0)

    def test_long_call_ee_is_forward_value(self):
        from optpricer_tpu import bs_price_vec, exposure_profile

        prof = exposure_profile([self.INST], n_paths=200_000, n_times=11,
                                seed=3)
        C0 = float(bs_price_vec(100., 100., 1., 0.05, 0.01, 0.2, "call"))
        ref = C0 * np.exp(0.05 * prof["t"])
        # interior nodes (t=0 is exact, t=T settles to zero by convention)
        z = np.abs(prof["EE"][1:-1] - ref[1:-1]) / prof["EE_stderr"][1:-1]
        assert np.max(z) < 4.0
        assert prof["EE"][0] == pytest.approx(C0, rel=1e-9)
        assert prof["EE"][-1] == 0.0  # settled at expiry

    def test_pfe_dominates_ee_and_short_side(self):
        from optpricer_tpu import exposure_profile

        prof = exposure_profile([self.INST], n_paths=50_000, n_times=9,
                                seed=5)
        assert np.all(prof["PFE"][1:-1] > prof["EE"][1:-1])
        assert prof["EPE"] > 0.0
        short = exposure_profile([dict(self.INST, position=-1.0)],
                                 n_paths=20_000, n_times=5, seed=5)
        assert short["EE"].max() == 0.0          # pure liability
        assert np.all(short["ENE"][:-1] < 0.0)

    def test_netting_cancels(self):
        from optpricer_tpu import exposure_profile

        book = [self.INST, dict(self.INST, position=-1.0)]
        prof = exposure_profile(book, n_paths=10_000, n_times=5, seed=7)
        assert np.allclose(prof["EE"], 0.0)
        assert np.allclose(prof["ENE"], 0.0)

    def test_staggered_expiries_roll_off(self):
        from optpricer_tpu import exposure_profile

        book = [self.INST,
                dict(self.INST, T=0.5, K=105., position=2.0)]
        prof = exposure_profile(book, n_paths=50_000, n_times=9, seed=9)
        # after the 6m contract settles only the 1y call remains: the
        # profile steps DOWN across t = 0.5
        t = prof["t"]
        before = prof["EE"][np.searchsorted(t, 0.5) - 1]
        after = prof["EE"][np.searchsorted(t, 0.5) + 1]
        assert after < before

    def test_validation(self):
        from optpricer_tpu import exposure_profile

        with pytest.raises(ValueError):
            exposure_profile([])
        with pytest.raises(ValueError):
            exposure_profile([self.INST], quantile=1.5)
        with pytest.raises(ValueError):
            exposure_profile([self.INST,
                              dict(self.INST, sigma=0.3)])  # mixed vol
        with pytest.raises(ValueError):
            exposure_profile([self.INST], n_times=1)
