"""rBergomi rough volatility: exact-covariance scheme against its limits.

No closed form exists for rough-vol vanillas, so the suite pins the
implementation to the places where exactness IS available: the Volterra
covariance against brute-force quadrature, E[v_t] = ξ0 (the exponential is
mean-one by construction), the martingale property of S, the η→0
Black-Scholes limit, and the H = 1/2 reduction where the kernel collapses
to the driving Brownian motion and an independent plain-Euler simulation
of the classic lognormal-vol model must agree.
"""
import numpy as np
import pytest

from optpricer_tpu import rbergomi_paths, rbergomi_price
from optpricer_tpu.models.rough import _joint_chol, _volterra_cov
from optpricer_tpu.ops.black_scholes import bs_implied_vol_vec, bs_price_vec

BFG = dict(xi0=0.0552, eta=1.9, H=0.07, rho=-0.9)  # Bayer-Friz-Gatheral


class TestVolterraCovariance:
    def test_matches_quadrature(self):
        from scipy.integrate import quad

        H = 0.07
        t = np.array([0.1, 0.35, 0.5, 1.0])
        C = _volterra_cov(t, H)
        for i in range(4):
            for j in range(i):
                ref = 2 * H * quad(
                    lambda s: (t[i] - s) ** (H - 0.5)
                    * (t[j] - s) ** (H - 0.5), 0, t[j], points=[t[j]])[0]
                assert abs(C[i, j] - ref) < 1e-8
        np.testing.assert_allclose(np.diag(C), t ** (2 * H), rtol=1e-12)

    def test_joint_cholesky_factors(self):
        for H in (0.07, 0.25, 0.5):
            L = _joint_chol(48, 1.0 / 48, H)
            assert np.all(np.isfinite(L))
            assert np.min(np.diag(L)) > 0.0


class TestExactProperties:
    def test_variance_mean_is_xi0(self):
        # E[exp(eta*W~_t - eta^2/2 t^{2H})] = 1 exactly at every grid time
        _, v = rbergomi_paths(100., 0., 0., 1.0, 16, 200_000, seed=3,
                              return_variance=True, **BFG)
        ev = np.asarray(v).mean(axis=1)
        assert np.all(np.abs(ev - BFG["xi0"]) < 0.06 * BFG["xi0"])

    def test_spot_martingale(self):
        S = rbergomi_paths(100., 0., 0., 1.0, 64, 400_000, seed=5, **BFG)
        ST = np.asarray(S[-1], np.float64)
        se = ST.std(ddof=1) / np.sqrt(ST.size)
        assert abs(ST.mean() - 100.0) < 4.0 * se + 0.1

    def test_eta_zero_is_black_scholes(self):
        p, se = rbergomi_price(100., 100., 1.0, 0.05, xi0=0.04,
                               eta=1e-9, H=0.3, rho=0.0, n_steps=64,
                               n_paths=200_000, seed=5)
        ref = float(bs_price_vec(100., 100., 1.0, 0.05, 0.0, 0.2, "call"))
        assert abs(p - ref) < 3.0 * se + 0.01

    def test_h_half_reduces_to_classic_lognormal_vol(self):
        # H=1/2: W~ = W; an independent plain-Euler simulation of
        # v = xi0 exp(eta W - eta^2 t / 2) must agree
        S0, K, T, r = 100., 105., 1.0, 0.03
        xi0, eta, rho = 0.04, 0.8, -0.6
        p1, se1 = rbergomi_price(S0, K, T, r, xi0=xi0, eta=eta, H=0.5,
                                 rho=rho, n_steps=64, n_paths=400_000,
                                 seed=5)
        rng = np.random.default_rng(5)
        n_steps, n_paths = 64, 400_000
        dt = T / n_steps
        half = n_paths // 2
        zW = rng.standard_normal((n_steps, half))
        zW = np.concatenate([zW, -zW], 1)
        zP = rng.standard_normal((n_steps, half))
        zP = np.concatenate([zP, -zP], 1)
        W = np.vstack([np.zeros((1, n_paths)),
                       np.cumsum(np.sqrt(dt) * zW, 0)])
        t = dt * np.arange(n_steps)[:, None]
        v = xi0 * np.exp(eta * W[:-1] - 0.5 * eta ** 2 * t)
        dlog = (r - 0.5 * v) * dt + np.sqrt(v * dt) * (
            rho * zW + np.sqrt(1 - rho ** 2) * zP)
        pay = np.maximum(S0 * np.exp(dlog.sum(0)) - K, 0) * np.exp(-r * T)
        p2 = pay.mean()
        se2 = pay.std(ddof=1) / np.sqrt(n_paths)
        assert abs(p1 - p2) < 4.0 * (se1 + se2)


class TestSmileShape:
    def test_negative_skew_for_negative_rho(self):
        Ks = np.array([90., 100., 110.])
        ps = [rbergomi_price(100., k, 0.5, 0.0, n_steps=64,
                             n_paths=200_000, seed=7, **BFG)[0]
              for k in Ks]
        iv = np.asarray(bs_implied_vol_vec(100., Ks, 0.5, 0.0, 0.0,
                                           np.array(ps), "call"))
        assert iv[0] > iv[1] > iv[2]          # monotone negative skew
        assert iv[0] - iv[2] > 0.04           # and steep (rough + rho<0)
        # ATM IV sits below the forward vol sqrt(xi0) (vol-of-vol drag)
        assert iv[1] < np.sqrt(BFG["xi0"])


class TestComposition:
    def test_paths_feed_the_exotics_api(self):
        from optpricer_tpu import barrier_price

        S = rbergomi_paths(100., 0.03, 0., 1.0, 64, 100_000, seed=9,
                           **BFG)
        ko, se = barrier_price(S, 100., 0.03, 1.0, "call", 130.0,
                               "up-and-out")
        vanilla = np.exp(-0.03) * np.maximum(
            np.asarray(S[-1], np.float64) - 100., 0.).mean()
        assert 0.0 < ko < vanilla

    def test_xi0_callable_term_structure(self):
        S, v = rbergomi_paths(100., 0., 0., 1.0, 16, 50_000,
                              xi0=lambda t: 0.04 + 0.02 * t, eta=1.0,
                              H=0.2, rho=-0.5, seed=1,
                              return_variance=True)
        ev = np.asarray(v).mean(axis=1)
        assert ev[-1] > ev[0]  # rising forward variance shows in E[v]

    def test_bad_args_raise(self):
        kw = dict(xi0=0.04, eta=1.0, rho=-0.5)
        with pytest.raises(ValueError):
            rbergomi_paths(100., 0., 0., 1.0, 16, 1000, H=0.8, **kw)
        with pytest.raises(ValueError):
            rbergomi_paths(100., 0., 0., 1.0, 16, 1000, H=0.2, xi0=0.04,
                           eta=-1.0, rho=0.0)
        with pytest.raises(ValueError):
            rbergomi_paths(100., 0., 0., 1.0, 16, 1000, H=0.2, xi0=0.04,
                           eta=1.0, rho=-2.0)
        with pytest.raises(ValueError):
            rbergomi_price(100., 100., 1.0, 0.0, H=0.2, kind="straddle",
                           **kw)
