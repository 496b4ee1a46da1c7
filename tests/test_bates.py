"""Bates (Heston + Merton jumps): COS oracle pinned to both exact limits.

The Bates characteristic function factorises into Heston × jumps, so the
model must collapse EXACTLY onto the two semi-analytic oracles the package
already trusts: λ=0 reproduces heston_price_cos bit-for-bit (same code
path, jump factor ≡ 1) and ξ→0 with v0=θ reproduces the Merton Poisson-BS
series. Away from both limits the QE-paths × compound-Poisson MC
cross-checks the smile.
"""
import numpy as np
import pytest

from optpricer_tpu import (
    bates_paths, bates_price_cos, heston_price_cos, merton_price,
)

S0, R, Q = 100.0, 0.03, 0.01
HP = dict(v0=0.04, kappa=1.5, theta=0.04, xi=0.5, rho=-0.6)
JP = dict(lam=0.5, mJ=-0.1, sJ=0.15)


class TestExactLimits:
    def test_zero_intensity_is_heston_exactly(self):
        b = float(bates_price_cos(S0, 100.0, 1.0, R, Q, **HP, lam=0.0,
                                  mJ=0.0, sJ=0.1))
        h = float(heston_price_cos(S0, 100.0, 1.0, R, Q, **HP))
        assert b == h  # same code path, jump factor identically 1

    def test_vanishing_vol_of_vol_is_merton(self):
        hp0 = dict(v0=0.04, kappa=1.5, theta=0.04, xi=1e-6, rho=0.0)
        for K in (85.0, 100.0, 120.0):
            b = float(bates_price_cos(S0, K, 1.0, R, Q, **hp0, **JP))
            m = float(merton_price(S0, K, 1.0, R, Q, 0.2, **JP))
            assert abs(b - m) < 5e-7, (K, b, m)

    def test_put_call_parity(self):
        c = float(bates_price_cos(S0, 105.0, 1.0, R, Q, **HP, **JP,
                                  kind="call"))
        p = float(bates_price_cos(S0, 105.0, 1.0, R, Q, **HP, **JP,
                                  kind="put"))
        rhs = S0 * np.exp(-Q) - 105.0 * np.exp(-R)
        assert abs((c - p) - rhs) < 1e-9

    def test_strike_batch_shape(self):
        K = np.linspace(80.0, 120.0, 11)
        out = np.asarray(bates_price_cos(S0, K, 1.0, R, Q, **HP, **JP))
        assert out.shape == (11,)
        assert np.all(np.diff(out) < 0)  # calls decrease in strike

    def test_jumps_fatten_the_left_tail(self):
        # downward jumps (mJ < 0) make OTM puts dearer than pure Heston
        p_bates = float(bates_price_cos(S0, 80.0, 1.0, R, Q, **HP, **JP,
                                        kind="put"))
        p_hest = float(heston_price_cos(S0, 80.0, 1.0, R, Q, **HP,
                                        kind="put"))
        assert p_bates > p_hest

    def test_bad_args_raise(self):
        with pytest.raises(ValueError):
            bates_price_cos(S0, 100.0, 1.0, R, Q, **HP, lam=-1.0,
                            mJ=0.0, sJ=0.1)
        with pytest.raises(ValueError):
            bates_paths(S0, R, Q, **HP, T=1.0, n_steps=8, n_paths=100,
                        lam=0.5, mJ=0.0, sJ=-0.1)


class TestPathsVsCos:
    def test_martingale(self):
        S = bates_paths(S0, R, Q, **HP, T=1.0, n_steps=64,
                        n_paths=400_000, seed=7, **JP)
        ST = np.asarray(S[-1], np.float64)
        se = ST.std(ddof=1) / np.sqrt(ST.size)
        assert abs(ST.mean() - S0 * np.exp((R - Q))) < 4.0 * se + 0.02

    def test_vanillas_match_cos(self):
        S = bates_paths(S0, R, Q, **HP, T=1.0, n_steps=64,
                        n_paths=400_000, seed=7, **JP)
        ST = np.asarray(S[-1], np.float64)
        for K in (90.0, 100.0, 110.0):
            pay = np.maximum(ST - K, 0.0) * np.exp(-R)
            mc = pay.mean()
            se = pay.std(ddof=1) / np.sqrt(pay.size)
            cos = float(bates_price_cos(S0, K, 1.0, R, Q, **HP, **JP))
            assert abs(mc - cos) < 4.0 * se, (K, mc, cos)

    def test_paths_feed_the_exotics_api(self):
        from optpricer_tpu import barrier_price

        S = bates_paths(S0, R, Q, **HP, T=1.0, n_steps=64,
                        n_paths=100_000, seed=9, **JP)
        ko, _ = barrier_price(S, 100.0, R, 1.0, "call", 130.0,
                              "up-and-out")
        vanilla = float(bates_price_cos(S0, 100.0, 1.0, R, Q, **HP,
                                        **JP))
        assert 0.0 < ko < vanilla

    def test_variance_returned(self):
        S, v = bates_paths(S0, R, Q, **HP, T=1.0, n_steps=16,
                           n_paths=1000, seed=1, return_variance=True,
                           **JP)
        # antithetic pairing doubles the effective path count (package
        # path contract, models/processes.py)
        assert S.shape[0] == 17 and S.shape == v.shape
        assert np.all(np.asarray(v) >= 0.0)
