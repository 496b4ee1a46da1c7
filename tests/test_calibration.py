"""SVI calibration: param round-trips, surface interpolation, no-arb checks.

Mirrors reference test_calibration.py.
"""
import numpy as np
import pytest

from optpricer_tpu import SVIParams, VolSurface, fit_svi, fit_svi_surface


class TestSVIParams:
    def test_total_var_at_money(self):
        p = SVIParams(a=0.04, b=0.1, rho=0.0, m=0.0, sigma=0.1, expiry=1.0)
        w = float(p.total_var(0.0))
        assert abs(w - 0.05) < 1e-10  # a + b·σ = 0.04 + 0.01

    def test_iv_positive(self):
        p = SVIParams(a=0.04, b=0.1, rho=-0.3, m=0.0, sigma=0.15, expiry=0.5)
        k = np.linspace(-0.5, 0.5, 20)
        assert np.all(np.asarray(p.iv(k)) > 0)

    def test_wings_increase(self):
        p = SVIParams(a=0.04, b=0.2, rho=0.0, m=0.0, sigma=0.1, expiry=1.0)
        w = [float(p.total_var(x)) for x in (-1.0, 0.0, 1.0)]
        assert w[0] > w[1] and w[2] > w[1]

    def test_analytic_derivatives_match_ad(self):
        import jax
        p = SVIParams(a=0.04, b=0.15, rho=-0.2, m=0.05, sigma=0.1, expiry=0.5)
        k0 = 0.1
        dw_ad = float(jax.grad(lambda k: p.total_var(k))(k0))
        d2w_ad = float(jax.grad(jax.grad(lambda k: p.total_var(k)))(k0))
        assert abs(float(p.dw_dk(k0)) - dw_ad) < 1e-10
        assert abs(float(p.d2w_dk2(k0)) - d2w_ad) < 1e-10


class TestFitSVI:
    def test_zero_noise_recovery(self):
        true = SVIParams(a=0.04, b=0.15, rho=-0.2, m=0.05, sigma=0.10,
                         expiry=0.5)
        k = np.linspace(-0.4, 0.4, 30)
        ivs = np.asarray(true.iv(k))
        strikes = 100.0 * np.exp(k)
        fitted = fit_svi(strikes, forward=100.0, expiry=0.5, market_ivs=ivs)
        assert abs(fitted.a - true.a) < 0.005
        assert abs(fitted.b - true.b) < 0.01
        assert abs(fitted.rho - true.rho) < 0.05
        assert abs(fitted.m - true.m) < 0.05
        assert abs(fitted.sigma - true.sigma) < 0.01

    def test_noisy_fit_residuals(self):
        true = SVIParams(a=0.05, b=0.12, rho=-0.15, m=0.0, sigma=0.12,
                         expiry=1.0)
        k = np.linspace(-0.3, 0.3, 20)
        ivs = np.asarray(true.iv(k)) + \
            np.random.default_rng(42).normal(0, 0.002, size=k.shape)
        strikes = 100.0 * np.exp(k)
        fitted = fit_svi(strikes, forward=100.0, expiry=1.0, market_ivs=ivs)
        rmse = float(np.sqrt(np.mean((np.asarray(fitted.iv(k)) - ivs) ** 2)))
        assert rmse < 0.005

    def test_butterfly_constraint(self):
        true = SVIParams(a=0.04, b=0.10, rho=-0.1, m=0.0, sigma=0.1,
                         expiry=0.25)
        k = np.linspace(-0.3, 0.3, 20)
        fitted = fit_svi(100.0 * np.exp(k), forward=100.0, expiry=0.25,
                         market_ivs=np.asarray(true.iv(k)))
        k_wide = np.linspace(-1.0, 1.0, 200)
        w = np.asarray(fitted.total_var(k_wide))
        assert np.all(w >= -1e-8)


class TestVolSurface:
    @pytest.fixture
    def surface(self):
        s1 = SVIParams(a=0.03, b=0.10, rho=-0.2, m=0.0, sigma=0.10, expiry=0.25)
        s2 = SVIParams(a=0.05, b=0.12, rho=-0.15, m=0.0, sigma=0.12, expiry=1.0)
        return VolSurface({0.25: s1, 1.0: s2},
                          forward_curve={0.25: 100.0, 1.0: 100.0})

    def test_exact_expiry(self, surface):
        iv = surface.iv(100.0, 0.25)
        assert isinstance(iv, float) and iv > 0
        # Exact match reproduces the slice's own iv
        slice_iv = float(surface.slices[0.25].iv(0.0))
        assert abs(iv - slice_iv) < 1e-10

    def test_interpolated_expiry(self, surface):
        iv = surface.iv(100.0, 0.5)
        lo = surface.iv(100.0, 0.25)
        hi = surface.iv(100.0, 1.0)
        assert min(lo, hi) * 0.9 < iv < max(lo, hi) * 1.1

    def test_continuity_at_slice(self, surface):
        """Interp branch limits to the exact branch at a slice expiry —
        the reference's w·T interpolation violates this; ours must not."""
        iv_at = surface.iv(100.0, 0.25)
        iv_eps = surface.iv(100.0, 0.25 + 1e-9)
        assert abs(iv_at - iv_eps) < 1e-6

    def test_array_strikes(self, surface):
        ivs = surface.iv(np.array([90.0, 100.0, 110.0]), 0.25)
        assert np.asarray(ivs).shape == (3,)
        assert np.all(np.asarray(ivs) > 0)

    def test_extrapolation_short_flat_vol(self, surface):
        iv_short = surface.iv(100.0, 0.1)
        iv_first = surface.iv(100.0, 0.25)
        assert abs(iv_short - iv_first) < 1e-9

    def test_extrapolation_long_flat_vol(self, surface):
        iv_long = surface.iv(100.0, 2.0)
        iv_last = surface.iv(100.0, 1.0)
        assert abs(iv_long - iv_last) < 1e-9

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            VolSurface({})


class TestFitSVISurface:
    def test_two_slice_surface(self):
        true_25 = SVIParams(a=0.03, b=0.10, rho=-0.2, m=0.0, sigma=0.1,
                            expiry=0.25)
        true_1 = SVIParams(a=0.05, b=0.12, rho=-0.15, m=0.0, sigma=0.12,
                           expiry=1.0)
        k = np.linspace(-0.3, 0.3, 15)
        strikes = 100.0 * np.exp(k)
        surface = fit_svi_surface(
            strikes_by_expiry={0.25: strikes, 1.0: strikes},
            forwards={0.25: 100.0, 1.0: 100.0},
            market_ivs_by_expiry={0.25: np.asarray(true_25.iv(k)),
                                  1.0: np.asarray(true_1.iv(k))},
        )
        assert isinstance(surface, VolSurface)
        assert len(surface.expiries) == 2
        for T in (0.25, 0.5, 1.0):
            iv = surface.iv(100.0, T)
            assert 0.05 < iv < 1.0


class TestSerialization:
    def test_surface_round_trip(self, tmp_path):
        from optpricer_tpu.utils.serialization import (
            load_surface, save_surface,
        )
        s1 = SVIParams(a=0.03, b=0.10, rho=-0.2, m=0.0, sigma=0.10,
                       expiry=0.25)
        s2 = SVIParams(a=0.05, b=0.12, rho=-0.15, m=0.0, sigma=0.12,
                       expiry=1.0)
        surf = VolSurface({0.25: s1, 1.0: s2},
                          forward_curve={0.25: 100.0, 1.0: 101.0})
        p = tmp_path / "surf.json"
        save_surface(surf, p)
        back = load_surface(p)
        assert abs(back.iv(100.0, 0.5) - surf.iv(100.0, 0.5)) < 1e-12
        assert list(back.expiries) == [0.25, 1.0]


class TestVmappedSurfaceFit:
    def test_ragged_matches_uniform(self):
        """vmapped (uniform grids) and per-slice (ragged) fits agree."""
        true_1 = SVIParams(a=0.03, b=0.10, rho=-0.2, m=0.0, sigma=0.1,
                           expiry=0.25)
        true_2 = SVIParams(a=0.05, b=0.12, rho=-0.15, m=0.0, sigma=0.12,
                           expiry=1.0)
        k = np.linspace(-0.3, 0.3, 15)
        strikes = 100.0 * np.exp(k)
        ivs = {0.25: np.asarray(true_1.iv(k)), 1.0: np.asarray(true_2.iv(k))}
        surf_v = fit_svi_surface({0.25: strikes, 1.0: strikes},
                                 {0.25: 100.0, 1.0: 100.0}, ivs)
        # ragged: drop one strike from the second slice → per-slice path
        surf_r = fit_svi_surface(
            {0.25: strikes, 1.0: strikes[:-1]},
            {0.25: 100.0, 1.0: 100.0},
            {0.25: ivs[0.25], 1.0: ivs[1.0][:-1]})
        for T in (0.25, 0.6, 1.0):
            assert abs(surf_v.iv(100.0, T) - surf_r.iv(100.0, T)) < 1e-3


class TestArbitrageDiagnostics:
    """Gatheral-Jacquier static-arbitrage screens: Vogt's classic
    butterfly-arbitrageable SVI slice must be flagged, benign fitted
    smiles must pass, the implied density must integrate to one and
    price the forward, and crossing slices must trip the calendar
    check."""

    BENIGN = SVIParams(a=0.02, b=0.08, rho=-0.4, m=0.0, sigma=0.3,
                       expiry=0.5)
    # Axel Vogt's counterexample (Gatheral & Jacquier 2014 §3): fits a
    # plausible smile yet has a negative density region
    VOGT = SVIParams(a=-0.0410, b=0.1331, rho=0.3060, m=0.3586,
                     sigma=0.4153, expiry=1.0)

    def test_benign_slice_passes(self):
        from optpricer_tpu import check_butterfly

        rep = check_butterfly(self.BENIGN)
        assert rep["ok"] and rep["min_g"] >= 0.0

    def test_vogt_slice_is_flagged(self):
        from optpricer_tpu import check_butterfly, svi_density

        rep = check_butterfly(self.VOGT)
        assert not rep["ok"] and rep["min_g"] < 0.0
        # the density is negative exactly where g is
        k = rep["k_at_min"]
        assert float(svi_density(self.VOGT, k)) < 0.0

    def test_density_integrates_to_one_and_prices_forward(self):
        from optpricer_tpu import svi_density

        k = np.linspace(-6.0, 6.0, 20_001)
        p = np.asarray(svi_density(self.BENIGN, k))
        mass = np.trapezoid(p, k)
        fwd = np.trapezoid(np.exp(k) * p, k)
        assert abs(mass - 1.0) < 1e-4
        assert abs(fwd - 1.0) < 1e-3   # E[e^k] = 1: martingale

    def test_calendar_crossing_is_flagged(self):
        from optpricer_tpu import check_calendar

        # flat 30% vol at 6m vs flat 20% at 1y: total variance DROPS
        bad = VolSurface({
            0.5: SVIParams(a=0.09 * 0.5, b=1e-6, rho=0.0, m=0.0,
                           sigma=0.1, expiry=0.5),
            1.0: SVIParams(a=0.04 * 1.0, b=1e-6, rho=0.0, m=0.0,
                           sigma=0.1, expiry=1.0)})
        rep = check_calendar(bad)
        assert not rep["ok"] and rep["min_gap"] < 0.0
        assert rep["pair"] == (0.5, 1.0)

    def test_full_report_on_fitted_surface(self):
        from optpricer_tpu import arbitrage_report

        good = VolSurface({
            T: SVIParams(a=0.02 * T, b=0.1 * T, rho=-0.3, m=0.0,
                         sigma=0.25, expiry=T)
            for T in (0.25, 0.5, 1.0)})
        rep = arbitrage_report(good)
        assert rep["ok"]
        assert set(rep["butterfly"]) == {0.25, 0.5, 1.0}
        assert rep["calendar"]["ok"]

    def test_single_slice_calendar_is_trivially_ok(self):
        from optpricer_tpu import check_calendar

        one = VolSurface({1.0: self.VOGT})
        assert check_calendar(one)["ok"]
