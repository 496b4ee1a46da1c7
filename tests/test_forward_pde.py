"""Dupire forward PDE: whole-surface march vs closed forms and round trips.

The forward equation transposes the backward solvers (reference
``pde.py:97-240``) — one march prices every (K, T) — so its oracle is the
same Black-Scholes closed form evaluated on a BOARD, and its flagship
validation is the calibration loop closing: SVI fit → Dupire local vol →
forward march → the SVI vols back out.
"""
import numpy as np
import pytest

from optpricer_tpu import (
    SVIParams, VolSurface, bs_price_vec, dupire_forward_price,
    dupire_forward_surface, forward_surface_iv, reprice_surface_forward,
)

S0, R, Q, SIG = 100.0, 0.05, 0.01, 0.2


def _board():
    Ks = np.array([70.0, 85.0, 100.0, 115.0, 140.0])
    Ts = np.array([0.25, 0.5, 1.0, 2.0])
    return np.meshgrid(Ks, Ts)


class TestConstantVolOracle:
    def test_call_board_matches_bs(self):
        KK, TT = _board()
        fs = dupire_forward_surface(S0, R, Q, T=2.0, sigma=SIG,
                                    n_y=512, n_t=256)
        got = fs.price(KK, TT)
        ref = np.asarray(bs_price_vec(
            S0, KK.ravel(), TT.ravel(), R, Q, SIG, "call"),
            np.float64).reshape(KK.shape)
        np.testing.assert_allclose(got, ref, atol=2e-3)

    def test_put_parity_readout(self):
        fs = dupire_forward_surface(S0, R, Q, T=1.0, sigma=SIG)
        ref = float(bs_price_vec(S0, 110.0, 1.0, R, Q, SIG, "put"))
        assert abs(fs.price(110.0, 1.0, kind="put") - ref) < 2e-3

    def test_iv_recovery_inside_band(self):
        # implied vols of the marched prices within |k| <= 1.5 sigma*sqrt(T)
        fs = dupire_forward_surface(S0, R, Q, T=1.0, sigma=SIG,
                                    n_y=512, n_t=256)
        for T in (0.5, 1.0):
            F = S0 * np.exp((R - Q) * T)
            K = F * np.exp(np.linspace(-1.5, 1.5, 11) * SIG * np.sqrt(T))
            iv = forward_surface_iv(fs, K, np.full_like(K, T))
            assert np.nanmax(np.abs(iv - SIG)) < 2e-3

    def test_second_order_convergence(self):
        KK, TT = _board()
        ref = np.asarray(bs_price_vec(
            S0, KK.ravel(), TT.ravel(), R, Q, SIG, "call"),
            np.float64).reshape(KK.shape)

        def err(n):
            fs = dupire_forward_surface(S0, R, Q, T=2.0, sigma=SIG,
                                        n_y=n, n_t=n // 2)
            return np.abs(fs.price(KK, TT) - ref).max()

        e1, e2 = err(256), err(512)
        assert e2 < e1 / 2.5  # second order: ~4x per refinement

    def test_one_march_prices_a_chain(self):
        K = np.linspace(80.0, 125.0, 10)
        T = np.full_like(K, 0.75)
        got = dupire_forward_price(S0, K, T, R, Q, sigma=SIG)
        ref = np.asarray(bs_price_vec(S0, K, T, R, Q, SIG, "call"),
                         np.float64)
        np.testing.assert_allclose(got, ref, atol=2e-3)
        assert got.shape == K.shape


class TestSurfaceObject:
    def test_grid_shapes_and_payoff_row(self):
        fs = dupire_forward_surface(S0, R, Q, T=1.0, sigma=SIG,
                                    n_y=64, n_t=16)
        assert fs.K.shape == (65,) and fs.T.shape == (17,)
        assert fs.C.shape == (17, 65)
        # row 0 is the (kink-smoothed) payoff: exact off the ATM cell
        payoff = np.maximum(S0 - fs.K, 0.0)
        mask = np.abs(np.log(fs.K / S0)) > 2.0 * (
            np.log(fs.K[1]) - np.log(fs.K[0]))
        np.testing.assert_allclose(fs.C[0][mask], payoff[mask], atol=1e-12)

    def test_monotone_in_maturity_and_strike(self):
        fs = dupire_forward_surface(S0, R, 0.0, T=1.0, sigma=SIG,
                                    n_y=256, n_t=128)
        # q=0 calls increase in T (no-arbitrage) and decrease in K
        C = fs.C
        interior = slice(5, -5)
        assert np.all(np.diff(C[:, interior], axis=0) > -1e-8)
        assert np.all(np.diff(C[-1, :], axis=0) < 1e-8)

    def test_scalar_readout_is_float(self):
        fs = dupire_forward_surface(S0, R, Q, T=1.0, sigma=SIG,
                                    n_y=64, n_t=16)
        assert isinstance(fs.price(100.0, 0.5), float)

    def test_bad_args_raise(self):
        with pytest.raises(ValueError):
            dupire_forward_surface(S0, R, Q, T=1.0)  # no dynamics
        with pytest.raises(ValueError):
            dupire_forward_surface(S0, R, Q, T=1.0, sigma=SIG,
                                   sigma_loc=lambda K, t: SIG)  # both
        with pytest.raises(ValueError):
            dupire_forward_surface(S0, R, Q, T=-1.0, sigma=SIG)
        fs = dupire_forward_surface(S0, R, Q, T=1.0, sigma=SIG,
                                    n_y=64, n_t=16)
        with pytest.raises(ValueError):
            fs.price(100.0, 0.5, kind="straddle")


class TestLocalVolRoundTrip:
    def test_flat_local_vol_equals_bs(self):
        fs = dupire_forward_surface(
            S0, R, Q, T=1.0, sigma_loc=lambda K, t: 0.25 * K / K,
            n_y=384, n_t=192)
        KK, TT = np.meshgrid(np.array([85.0, 100.0, 115.0]),
                             np.array([0.5, 1.0]))
        ref = np.asarray(bs_price_vec(
            S0, KK.ravel(), TT.ravel(), R, Q, 0.25, "call"),
            np.float64).reshape(KK.shape)
        np.testing.assert_allclose(fs.price(KK, TT), ref, atol=3e-3)

    def test_svi_surface_reprices_through_dupire(self):
        # THE calibration-loop validation: the forward march under the
        # Dupire local vol of a skewed SVI surface must return that
        # surface's own implied vols (Dupire's theorem, in practice).
        slices = {
            T: SVIParams(a=0.03 * T, b=0.12 * T, rho=-0.4, m=0.0,
                         sigma=0.2, expiry=T)
            for T in (0.25, 0.5, 1.0)
        }
        fwd = {T: S0 * np.exp((R - Q) * T) for T in slices}
        surf = VolSurface(slices, forward_curve=fwd)
        out = reprice_surface_forward(surf, S0, R, Q, n_y=768, n_t=384,
                                      k_lo=-0.5, k_hi=0.5, n_k=21)
        assert set(out) == {0.25, 0.5, 1.0}
        for T, (K, iv_model, iv_market) in out.items():
            assert K.shape == iv_model.shape == iv_market.shape
            d = np.abs(iv_model - iv_market)
            assert np.nanmax(d) < 2e-3, f"T={T}: {np.nanmax(d)}"

    def test_time_dependent_vol_term_structure(self):
        # sigma(t) only: the march must price with the ROOT-MEAN-SQUARE
        # vol over [0, T] (exact for deterministic term structures)
        lo, hi = 0.15, 0.3

        def sig_t(K, t):
            import jax.numpy as jnp
            return jnp.where(t < 0.5, lo, hi) * (K / K)

        fs = dupire_forward_surface(S0, R, Q, T=1.0, sigma_loc=sig_t,
                                    n_y=512, n_t=512)
        rms = np.sqrt(0.5 * lo**2 + 0.5 * hi**2)
        ref = float(bs_price_vec(S0, 100.0, 1.0, R, Q, rms, "call"))
        assert abs(fs.price(100.0, 1.0) - ref) < 5e-3


class TestPropagatorBuild:
    def test_banded_build_matches_dense_solve(self):
        # _prop_host now uses LAPACK's banded solver; it must be
        # bit-level equivalent to the dense np.linalg.solve it replaced
        from optpricer_tpu.models.forward_pde import _prop_host

        y = np.linspace(-2.0, 2.0, 258)
        dt, r, q, sigma = 1.0 / 64, 0.05, 0.01, 0.25
        for th in (1.0, 0.5):
            P, w_lo, w_hi, a0, cM = _prop_host(y, dt, r, q, sigma, th)
            M = y.size - 2
            dy = y[1] - y[0]
            alpha = 0.5 * sigma**2 / dy**2
            beta = -(0.5 * sigma**2 + (r - q)) / (2.0 * dy)
            a_L = np.full(M, alpha - beta)
            b_L = np.full(M, -2.0 * alpha - q)
            c_L = np.full(M, alpha + beta)
            e = (1.0 - th) * dt
            A = (np.diag(1.0 - th * dt * b_L)
                 + np.diag(-th * dt * a_L[1:], -1)
                 + np.diag(-th * dt * c_L[:-1], 1))
            B = (np.diag(1.0 + e * b_L)
                 + np.diag(e * a_L[1:], -1) + np.diag(e * c_L[:-1], 1))
            np.testing.assert_allclose(P, np.linalg.solve(A, B),
                                       rtol=0, atol=1e-13)
            w = np.linalg.solve(A, np.eye(M)[:, [0, M - 1]])
            np.testing.assert_allclose(w_lo, w[:, 0], rtol=0, atol=1e-15)
            np.testing.assert_allclose(w_hi, w[:, 1], rtol=0, atol=1e-15)
