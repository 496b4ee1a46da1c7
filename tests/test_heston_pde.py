"""Heston 2-D ADI PDE solver (models/heston_pde.py).

Oracles: the in-house COS transform for Europeans (itself pinned to the
Fang-Oosterlee reference value in test_analytic.py), CRR in the
ξ→0/v0=θ degenerate limit for Americans, and financial invariants
(parity, monotonicity, early-exercise premium). Test grids are coarser
than the production defaults (n_x=256, n_v=96, n_t=512 — worst |err|
6.6e-3 vs COS across a 80-120 strike board) to keep the CPU harness
fast; tolerances scale accordingly.
"""
import numpy as np
import pytest

from optpricer_tpu import (OptionSpec, crr, heston_fd_greeks,
                           heston_fd_price, heston_price_cos)

HP = dict(v0=0.04, kappa=1.5, theta=0.04, xi=0.5, rho=-0.6)
COARSE = dict(n_x=128, n_v=64, n_t=256)
S0, R, Q, T = 100.0, 0.03, 0.01, 1.0


class TestEuropean:
    @pytest.mark.parametrize("K", [80.0, 100.0, 120.0])
    @pytest.mark.parametrize("kind", ["call", "put"])
    def test_matches_cos_oracle_coarse(self, K, kind):
        ref = float(heston_price_cos(S0, K, T, R, Q, **HP, kind=kind))
        got = heston_fd_price(S0, K, T, R, Q, **HP, kind=kind, **COARSE)
        assert abs(got - ref) < 0.05, (K, kind, got, ref)

    def test_matches_cos_oracle_default_grid(self):
        # one strike at production resolution: the 1e-2 bar
        ref = float(heston_price_cos(S0, 100.0, T, R, Q, **HP))
        got = heston_fd_price(S0, 100.0, T, R, Q, **HP)
        assert abs(got - ref) < 0.01, (got, ref)

    def test_put_call_parity(self):
        c = heston_fd_price(S0, 95.0, T, R, Q, **HP, kind="call", **COARSE)
        p = heston_fd_price(S0, 95.0, T, R, Q, **HP, kind="put", **COARSE)
        fwd = S0 * np.exp(-Q * T) - 95.0 * np.exp(-R * T)
        # the ADI transition density is payoff-independent, so parity
        # holds to much better than the absolute price error
        assert abs((c - p) - fwd) < 5e-3

    def test_converges_with_refinement(self):
        ref = float(heston_price_cos(S0, 110.0, T, R, Q, **HP))
        coarse = heston_fd_price(S0, 110.0, T, R, Q, **HP, **COARSE)
        fine = heston_fd_price(S0, 110.0, T, R, Q, **HP,
                               n_x=256, n_v=96, n_t=512)
        assert abs(fine - ref) < 0.5 * abs(coarse - ref) + 1e-4

    def test_bs_limit(self):
        # xi→0 with v0=θ freezes v: exact BS with σ=√v0
        from optpricer_tpu import bs_price_vec

        hp0 = dict(v0=0.04, kappa=1.5, theta=0.04, xi=1e-4, rho=0.0)
        ref = float(np.asarray(bs_price_vec(
            S0, 100.0, T, R, Q, 0.2, "call", dtype="float64")))
        got = heston_fd_price(S0, 100.0, T, R, Q, **hp0, **COARSE)
        assert abs(got - ref) < 0.03

    def test_input_validation(self):
        with pytest.raises(ValueError, match="kind"):
            heston_fd_price(S0, 100.0, T, R, Q, **HP, kind="straddle")
        with pytest.raises(ValueError, match="theta_scheme"):
            heston_fd_price(S0, 100.0, T, R, Q, **HP, theta_scheme=0.0)


class TestAmerican:
    def test_degenerate_limit_matches_crr(self):
        # xi→0, ρ=0, v0=θ: American put under BS dynamics — CRR oracle
        hp0 = dict(v0=0.04, kappa=1.5, theta=0.04, xi=1e-4, rho=0.0)
        ref = float(crr(OptionSpec(S0=S0, K=110.0, T=T, r=0.05, sigma=0.2),
                        "put", N=2000, american=True))
        got = heston_fd_price(S0, 110.0, T, 0.05, 0.0, **hp0, kind="put",
                              american=True)
        assert abs(got - ref) < 0.02, (got, ref)

    def test_early_exercise_premium_and_floors(self):
        eu = heston_fd_price(S0, 110.0, T, 0.05, 0.0, **HP, kind="put",
                             **COARSE)
        am = heston_fd_price(S0, 110.0, T, 0.05, 0.0, **HP, kind="put",
                             american=True, **COARSE)
        assert am > eu + 1e-3            # strictly positive premium
        assert am >= 10.0 - 1e-6         # intrinsic floor

    def test_american_call_no_dividend_equals_european(self):
        eu = heston_fd_price(S0, 100.0, T, R, 0.0, **HP, **COARSE)
        am = heston_fd_price(S0, 100.0, T, R, 0.0, **HP, american=True,
                             **COARSE)
        assert abs(am - eu) < 1e-3       # Merton: no early exercise


class TestGreeks:
    def test_grid_greeks_match_cos_ad(self):
        from optpricer_tpu import heston_greeks_cos

        g = heston_fd_greeks(S0, 100.0, T, R, Q, **HP)
        ref = heston_greeks_cos(S0, 100.0, T, R, Q, **HP)
        assert abs(g["delta"] - ref["delta"]) < 5e-3
        assert abs(g["gamma"] - ref["gamma"]) < 2e-3
        assert abs(g["vega_v0"] - ref["vega_v0"]) < 1.5

    def test_gamma_positive_delta_bounded(self):
        g = heston_fd_greeks(S0, 100.0, T, R, Q, **HP, **COARSE)
        assert 0.0 < g["delta"] < 1.0
        assert g["gamma"] > 0.0
        assert g["vega_v0"] > 0.0


class TestBatch:
    def test_ladder_matches_scalar_exactly(self):
        from optpricer_tpu import heston_fd_price_batch

        Ks = np.array([80.0, 100.0, 120.0])
        kinds = np.array(["call", "put", "call"])
        b = heston_fd_price_batch(S0, Ks, T, R, Q, **HP, kind=kinds,
                                  **COARSE)
        for i, (K, kd) in enumerate(zip(Ks, kinds)):
            s = heston_fd_price(S0, K, T, R, Q, **HP, kind=kd, **COARSE)
            assert abs(b[i] - s) < 1e-10, (K, kd)

    def test_american_ladder(self):
        from optpricer_tpu import heston_fd_price_batch

        b = heston_fd_price_batch(S0, [100.0, 110.0], T, 0.05, 0.0, **HP,
                                  kind="put", american=True, **COARSE)
        assert b[1] > b[0] > 0.0
        assert b[1] >= 10.0 - 1e-6   # intrinsic floor at K=110

    def test_kind_guard(self):
        from optpricer_tpu import heston_fd_price_batch

        with pytest.raises(ValueError, match="kind"):
            heston_fd_price_batch(S0, [100.0], T, R, Q, **HP,
                                  kind="straddle", **COARSE)
