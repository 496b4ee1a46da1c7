"""Validation framework: cross-model consistency, convergence order, stress
cube shape, delta-hedge backtest. Mirrors reference test_validation.py."""
import numpy as np

from optpricer_tpu import (
    CALL, PUT, OptionSpec, backtest_delta_hedge, convergence_analysis,
    cross_validate, stress_test,
)
from optpricer_tpu.models.processes import gbm_paths

OPT = OptionSpec(S0=100.0, K=100.0, T=1.0, r=0.05, sigma=0.2)


class TestCrossValidate:
    def test_all_methods_close_to_bs(self):
        out = cross_validate(OPT, CALL)
        assert out["max_discrepancy"] < 0.5
        assert set(out) >= {"bs", "mc", "tree", "fdm", "fem",
                            "max_discrepancy"}

    def test_subset_methods(self):
        out = cross_validate(OPT, PUT, methods=["bs", "fdm"])
        assert "mc" not in out
        assert out["max_discrepancy"] < 0.1

    def test_mc_returns_tuple(self):
        out = cross_validate(OPT, CALL, methods=["bs", "mc"])
        assert isinstance(out["mc"], tuple) and len(out["mc"]) == 2


class TestConvergence:
    def test_tree_convergence_order_positive(self):
        out = convergence_analysis(OPT, CALL, "tree", "N",
                                   [50, 100, 200, 400, 800])
        assert out["order"] > 0
        assert len(out["prices"]) == 5

    def test_fdm_errors_decrease(self):
        out = convergence_analysis(OPT, CALL, "fdm", "N_S", [50, 100, 200])
        assert out["errors"][-1] < out["errors"][0]

    def test_mc_runs(self):
        out = convergence_analysis(OPT, CALL, "mc", "n_paths",
                                   [1000, 10_000, 100_000])
        assert len(out["errors"]) == 3


class TestStressTest:
    def test_cube_shape(self):
        cube = stress_test(OPT, CALL, np.array([0.8, 1.0, 1.2]),
                           np.array([-0.05, 0.0, 0.05]),
                           np.array([-0.01, 0.0, 0.01]))
        assert cube.shape == (3, 3, 3)

    def test_center_is_base_price(self):
        from optpricer_tpu import bs_price
        cube = stress_test(OPT, CALL, np.array([0.8, 1.0, 1.2]),
                           np.array([-0.05, 0.0, 0.05]),
                           np.array([-0.01, 0.0, 0.01]))
        assert abs(cube[1, 1, 1] - bs_price(OPT, CALL)) < 1e-9

    def test_monotone_in_spot_shock(self):
        cube = stress_test(OPT, CALL, np.array([0.8, 1.0, 1.2]),
                           np.array([0.0]), np.array([0.0]))
        assert cube[0, 0, 0] < cube[1, 0, 0] < cube[2, 0, 0]

    def test_fdm_pricer(self):
        cube = stress_test(OPT, CALL, np.array([0.9, 1.1]),
                           np.array([0.0]), np.array([0.0]), pricer="fdm")
        assert cube.shape == (2, 1, 1)
        assert np.all(cube > 0)


class TestDeltaHedge:
    def test_pnl_shape_and_quality(self):
        paths = gbm_paths(OPT.S0, OPT.r, OPT.q, OPT.sigma, OPT.T, 252, 500,
                          antithetic=True, seed=42)
        out = backtest_delta_hedge(OPT, CALL, paths, rebalance_freq=1)
        assert out["pnl"].shape == (1000,)  # antithetic doubles
        # Daily delta hedging: P&L small relative to option premium
        from optpricer_tpu import bs_price
        prem = bs_price(OPT, CALL)
        assert abs(out["mean_pnl"]) < 0.1 * prem
        assert out["std_pnl"] < 0.3 * prem

    def test_more_rebalancing_less_risk(self):
        paths = gbm_paths(OPT.S0, OPT.r, OPT.q, OPT.sigma, OPT.T, 252, 2000,
                          antithetic=True, seed=7)
        tight = backtest_delta_hedge(OPT, CALL, paths, rebalance_freq=1)
        loose = backtest_delta_hedge(OPT, CALL, paths, rebalance_freq=21)
        assert tight["std_pnl"] < loose["std_pnl"]

    def test_max_drawdown_leq_min_pnl(self):
        paths = gbm_paths(OPT.S0, OPT.r, OPT.q, OPT.sigma, OPT.T, 50, 200,
                          seed=3)
        out = backtest_delta_hedge(OPT, PUT, paths)
        assert out["max_drawdown"] == float(out["pnl"].min())
