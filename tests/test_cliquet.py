"""Forward-start options and cliquets: MC pinned to closed forms.

Rubinstein's homogeneity argument gives the GBM forward-start price in
closed form, and the no-global-floor cliquet decomposes into independent
per-period forward-start call spreads — both exact oracles for the MC
routes, which then extend to Heston/Merton dynamics where no closed form
exists.
"""
import numpy as np
import pytest

from optpricer_tpu import (
    cliquet_price_bs, cliquet_price_mc, forward_start_price,
)

S0, R, Q = 100.0, 0.03, 0.01
HP = dict(v0=0.04, kappa=1.5, theta=0.04, xi=0.5, rho=-0.6)


class TestForwardStart:
    def test_mc_matches_rubinstein(self):
        closed = forward_start_price(S0, 1.05, 0.5, 1.0, R, Q,
                                     sigma=0.25, method="closed")
        mc, se = forward_start_price(S0, 1.05, 0.5, 1.0, R, Q,
                                     sigma=0.25, method="mc",
                                     n_paths=400_000, seed=3)
        assert abs(mc - closed) < 4.0 * se

    def test_put_parity_like_monotonicity(self):
        # higher strike ratio: cheaper call, dearer put
        c1 = forward_start_price(S0, 0.95, 0.5, 1.0, R, Q, sigma=0.2,
                                 method="closed")
        c2 = forward_start_price(S0, 1.10, 0.5, 1.0, R, Q, sigma=0.2,
                                 method="closed")
        p1 = forward_start_price(S0, 0.95, 0.5, 1.0, R, Q, sigma=0.2,
                                 method="closed", kind="put")
        p2 = forward_start_price(S0, 1.10, 0.5, 1.0, R, Q, sigma=0.2,
                                 method="closed", kind="put")
        assert c1 > c2 and p2 > p1

    def test_independent_of_spot_vol_before_start(self):
        # Rubinstein: price scales with S0 only through e^{-q T0};
        # doubling S0 doubles the price exactly
        a = forward_start_price(100., 1.0, 0.5, 1.0, R, Q, sigma=0.2,
                                method="closed")
        b = forward_start_price(200., 1.0, 0.5, 1.0, R, Q, sigma=0.2,
                                method="closed")
        assert abs(b - 2.0 * a) < 1e-12

    def test_heston_forward_start_below_bs(self):
        mc, se = forward_start_price(S0, 1.0, 0.5, 1.0, R, Q, heston=HP,
                                     n_paths=100_000, seed=7)
        gbm = forward_start_price(S0, 1.0, 0.5, 1.0, R, Q, sigma=0.2,
                                  method="closed")
        # THE reason forward-starts are traded on stoch-vol models: at
        # v0 = theta the BS-equivalent vol is right on average, but the
        # ATM forward-start pays E[sqrt] of integrated variance and
        # Jensen + vol-of-vol make it materially CHEAPER than BS
        # (~15% here at xi = 0.5); both prices vanilla-validated
        assert 0.0 < mc < gbm - 4.0 * se
        assert abs(mc - gbm) < 0.25 * gbm

    def test_bad_args_raise(self):
        with pytest.raises(ValueError):
            forward_start_price(S0, 1.0, 1.5, 1.0, R, Q, sigma=0.2)
        with pytest.raises(ValueError):
            forward_start_price(S0, -1.0, 0.5, 1.0, R, Q, sigma=0.2)
        with pytest.raises(ValueError):
            forward_start_price(S0, 1.0, 0.5, 1.0, R, Q, heston=HP,
                                method="closed")
        with pytest.raises(ValueError):
            # T0 off the step grid
            forward_start_price(S0, 1.0, 0.333, 1.0, R, Q, sigma=0.2,
                                method="mc", n_steps=10, n_paths=1000)


class TestCliquet:
    def test_mc_matches_spread_decomposition(self):
        kw = dict(sigma=0.2, n_periods=12, local_floor=0.0,
                  local_cap=0.08)
        closed = cliquet_price_bs(S0, 1.0, R, Q, **kw)
        mc, se = cliquet_price_mc(S0, 1.0, R, Q, n_paths=400_000, seed=5,
                                  **kw)
        assert abs(mc - closed) < 4.0 * se

    def test_negative_floor_decomposition(self):
        kw = dict(sigma=0.25, n_periods=4, local_floor=-0.05,
                  local_cap=0.10)
        closed = cliquet_price_bs(S0, 2.0, R, Q, **kw)
        mc, se = cliquet_price_mc(S0, 2.0, R, Q, n_paths=400_000, seed=9,
                                  **kw)
        assert abs(mc - closed) < 4.0 * se

    def test_global_floor_adds_value(self):
        kw = dict(sigma=0.2, n_periods=12, local_floor=-0.05,
                  local_cap=0.08, n_paths=100_000, seed=5)
        with_f, _ = cliquet_price_mc(S0, 1.0, R, Q, global_floor=0.03,
                                     **kw)
        without, _ = cliquet_price_mc(S0, 1.0, R, Q, **kw)
        assert with_f > without

    def test_bounds(self):
        # payoff is inside [n*floor, n*cap] -> price inside the
        # discounted envelope
        kw = dict(sigma=0.3, n_periods=12, local_floor=-0.02,
                  local_cap=0.05, n_paths=50_000, seed=1)
        px, _ = cliquet_price_mc(S0, 1.0, R, Q, **kw)
        df = np.exp(-R)
        assert -0.02 * 12 * df <= px <= 0.05 * 12 * df

    def test_heston_cliquet_runs(self):
        px, se = cliquet_price_mc(S0, 1.0, R, Q, heston=HP, n_periods=12,
                                  local_floor=0.0, local_cap=0.08,
                                  steps_per_period=1, n_paths=100_000,
                                  seed=11)
        assert 0.0 < px < 0.08 * 12 and se < 0.01

    def test_bad_args_raise(self):
        with pytest.raises(ValueError):
            cliquet_price_bs(S0, 1.0, R, Q, sigma=0.2, local_floor=0.1,
                             local_cap=0.0)
        with pytest.raises(ValueError):
            cliquet_price_mc(S0, 1.0, R, Q, sigma=0.2, n_periods=0)
