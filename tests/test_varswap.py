"""Variance swaps: three independent routes to the fair strike must agree.

Log-contract replication (model-free, from any IV surface), the exact
Heston integrated-variance expectation, and discretely-monitored MC on the
package's own path generators. The reference has no volatility derivatives
at all — this suite pins the new module to closed forms and to
cross-engine consistency.
"""
import numpy as np
import pytest

from optpricer_tpu import (
    SVIParams, VolSurface, heston_price_cos, varswap_strike_heston,
    varswap_strike_mc, varswap_strike_replication, volswap_strike_mc,
)
from optpricer_tpu.ops.black_scholes import bs_implied_vol_vec

S0, R, Q = 100.0, 0.03, 0.01
HP = dict(v0=0.09, kappa=2.0, theta=0.04, xi=0.3, rho=-0.7)


class TestReplication:
    def test_flat_vol_gives_sigma_squared(self):
        kv = varswap_strike_replication(0.2, S0, R, Q, 1.0)
        assert abs(kv - 0.04) < 1e-5

    def test_flat_vol_other_maturities(self):
        for T in (0.25, 2.0):
            kv = varswap_strike_replication(0.3, S0, R, Q, T)
            assert abs(kv - 0.09) < 3e-5, (T, kv)

    def test_volsurface_object_accepted(self):
        slices = {T: SVIParams(a=0.04 * T, b=1e-6, rho=0.0, m=0.0,
                               sigma=0.1, expiry=T)
                  for T in (0.5, 1.0)}
        fwd = {T: S0 * np.exp((R - Q) * T) for T in slices}
        surf = VolSurface(slices, forward_curve=fwd)
        kv = varswap_strike_replication(surf, S0, R, Q, 1.0)
        assert abs(kv - 0.04) < 5e-4

    def test_heston_surface_matches_closed_form(self):
        # IVs inverted from COS prices -> replication must return the
        # exact Heston integrated variance (continuous paths)
        def iv_fn(K, T):
            c = heston_price_cos(S0, np.asarray(K), T, R, Q, **HP,
                                 kind="call")
            return bs_implied_vol_vec(S0, np.asarray(K), T, R, Q,
                                      np.asarray(c), "call")

        kr = varswap_strike_replication(iv_fn, S0, R, Q, 1.0, width=8.0)
        kh = varswap_strike_heston(HP["v0"], HP["kappa"], HP["theta"], 1.0)
        assert abs(kr - kh) < 1e-4

    def test_bad_args_raise(self):
        with pytest.raises(ValueError):
            varswap_strike_replication(0.2, S0, R, Q, -1.0)
        with pytest.raises(ValueError):
            varswap_strike_mc(S0, R, Q, 1.0)  # no dynamics
        with pytest.raises(ValueError):
            varswap_strike_mc(S0, R, Q, 1.0, sigma=0.2, heston=HP)
        with pytest.raises(ValueError):
            varswap_strike_heston(0.04, -1.0, 0.04, 1.0)


class TestHestonClosedForm:
    def test_limits(self):
        # v0 == theta: flat at theta; T -> 0: v0; T -> inf: theta
        assert varswap_strike_heston(0.04, 2.0, 0.04, 1.0) == \
            pytest.approx(0.04)
        assert varswap_strike_heston(0.09, 2.0, 0.04, 1e-6) == \
            pytest.approx(0.09, rel=1e-4)
        assert varswap_strike_heston(0.09, 2.0, 0.04, 200.0) == \
            pytest.approx(0.04, rel=1e-2)

    def test_mc_agrees(self):
        kh = varswap_strike_heston(HP["v0"], HP["kappa"], HP["theta"], 1.0)
        km, se = varswap_strike_mc(S0, R, Q, 1.0, heston=HP, n_steps=252,
                                   n_paths=65_536, seed=5)
        # discrete-monitoring bias is O(dt); allow it on top of 4 se
        assert abs(km - kh) < 4.0 * se + 5e-4


class TestDiscreteMonitoring:
    def test_gbm_strike_is_sigma_squared(self):
        km, se = varswap_strike_mc(S0, R, Q, 1.0, sigma=0.2, n_steps=252,
                                   n_paths=65_536, seed=5)
        # E[r_i^2] = sigma^2 dt + (drift dt)^2: tiny positive bias
        assert abs(km - 0.04) < 4.0 * se + 1e-4

    def test_merton_jumps_add_lambda_ej2(self):
        # discrete monitoring captures the jump quadratic variation:
        # K_d ~= sigma^2 + lam * (mJ^2 + sJ^2)
        mp = dict(sigma=0.2, lam=0.5, mJ=-0.1, sJ=0.15)
        km, se = varswap_strike_mc(S0, R, Q, 1.0, merton=mp, n_steps=252,
                                   n_paths=65_536, seed=7)
        expect = 0.04 + 0.5 * (0.1**2 + 0.15**2)
        assert abs(km - expect) < 5.0 * se + 1e-3

    def test_volswap_below_sqrt_varswap(self):
        kh = varswap_strike_heston(HP["v0"], HP["kappa"], HP["theta"], 1.0)
        vs, vse = volswap_strike_mc(S0, R, Q, 1.0, heston=HP, n_steps=252,
                                    n_paths=32_768, seed=3)
        # Jensen: strictly below, by a materially positive convexity gap
        assert vs < np.sqrt(kh) - 2.0 * vse
        assert np.sqrt(kh) - vs < 0.02  # but not absurdly so
