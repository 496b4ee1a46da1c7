"""Black-Scholes golden values, Greeks and implied vol.

Mirrors the reference test strategy (SURVEY §4): golden literature values,
scalar↔vector equivalence, round-trips, monotonicity — plus f32-path coverage
for the TPU default dtype.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from optpricer_tpu import (
    CALL, PUT, OptionSpec, bs_greeks, bs_greeks_vec, bs_implied_vol_vec,
    bs_price, bs_price_vec, implied_vol,
)

OPT = OptionSpec(S0=100.0, K=100.0, T=1.0, r=0.05, sigma=0.2)


class TestGoldenValues:
    def test_call_price(self):
        assert abs(bs_price(OPT, CALL) - 10.4506) < 1e-3

    def test_put_price(self):
        assert abs(bs_price(OPT, PUT) - 5.5735) < 1e-3

    def test_put_call_parity(self):
        c = bs_price(OPT, CALL)
        p = bs_price(OPT, PUT)
        parity = OPT.S0 - OPT.K * np.exp(-OPT.r * OPT.T)
        assert abs((c - p) - parity) < 1e-9


class TestGreeks:
    def test_keys(self):
        g = bs_greeks(OPT, CALL)
        assert set(g) == {"delta", "gamma", "vega", "theta", "rho"}

    def test_call_delta_range(self):
        g = bs_greeks(OPT, CALL)
        assert 0.0 < g["delta"] < 1.0

    def test_put_call_delta_parity(self):
        gc = bs_greeks(OPT, CALL)
        gp = bs_greeks(OPT, PUT)
        disc_q = np.exp(-OPT.q * OPT.T)
        assert abs((gc["delta"] - gp["delta"]) - disc_q) < 1e-9
        assert abs(gc["gamma"] - gp["gamma"]) < 1e-12
        assert abs(gc["vega"] - gp["vega"]) < 1e-9

    def test_greeks_match_finite_difference(self):
        g = bs_greeks(OPT, CALL)
        eps = 1e-4
        up = bs_price(OptionSpec(OPT.S0 + eps, OPT.K, OPT.T, OPT.r, OPT.sigma), CALL)
        dn = bs_price(OptionSpec(OPT.S0 - eps, OPT.K, OPT.T, OPT.r, OPT.sigma), CALL)
        assert abs(g["delta"] - (up - dn) / (2 * eps)) < 1e-6

    def test_vega_absolute_units(self):
        g = bs_greeks(OPT, CALL)
        eps = 1e-5
        up = bs_price(OptionSpec(OPT.S0, OPT.K, OPT.T, OPT.r, OPT.sigma + eps), CALL)
        dn = bs_price(OptionSpec(OPT.S0, OPT.K, OPT.T, OPT.r, OPT.sigma - eps), CALL)
        assert abs(g["vega"] - (up - dn) / (2 * eps)) < 1e-5


class TestVectorised:
    def test_matches_scalar(self):
        S = np.array([80.0, 100.0, 120.0])
        px = bs_price_vec(S, 100.0, 1.0, 0.05, 0.0, 0.2, CALL)
        for i, s in enumerate(S):
            scalar = bs_price(OptionSpec(float(s), 100.0, 1.0, 0.05, 0.2), CALL)
            assert abs(float(px[i]) - scalar) < 1e-10

    def test_mixed_kinds(self):
        kinds = np.array(["call", "put", "call"])
        px = bs_price_vec(100.0, np.array([90.0, 100.0, 110.0]), 1.0,
                          0.05, 0.0, 0.2, kinds)
        assert float(px[0]) > float(px[2])  # ITM call > OTM call
        assert np.all(np.asarray(px) > 0)

    def test_monotone_in_spot(self):
        S = np.linspace(50, 150, 21)
        px = np.asarray(bs_price_vec(S, 100.0, 1.0, 0.05, 0.0, 0.2, CALL))
        assert np.all(np.diff(px) > 0)

    def test_monotone_in_strike(self):
        K = np.linspace(50, 150, 21)
        px = np.asarray(bs_price_vec(100.0, K, 1.0, 0.05, 0.0, 0.2, CALL))
        assert np.all(np.diff(px) < 0)

    def test_greeks_vec_matches_scalar(self):
        S = np.array([90.0, 100.0, 110.0])
        gv = bs_greeks_vec(S, 100.0, 1.0, 0.05, 0.0, 0.2, PUT)
        for i, s in enumerate(S):
            gs = bs_greeks(OptionSpec(float(s), 100.0, 1.0, 0.05, 0.2), PUT)
            for key in gs:
                assert abs(float(gv[key][i]) - gs[key]) < 1e-10

    def test_f32_close_to_f64(self):
        S = np.linspace(80, 120, 9)
        p32 = np.asarray(bs_price_vec(S, 100.0, 1.0, 0.05, 0.0, 0.2, CALL,
                                      dtype=jnp.float32))
        p64 = np.asarray(bs_price_vec(S, 100.0, 1.0, 0.05, 0.0, 0.2, CALL,
                                      dtype=jnp.float64))
        assert np.max(np.abs(p32 - p64)) < 1e-4


class TestImpliedVol:
    def test_scalar_round_trip(self):
        px = bs_price(OPT, CALL)
        iv = implied_vol(OPT, px, CALL)
        assert abs(iv - OPT.sigma) < 1e-6

    def test_scalar_round_trip_put(self):
        px = bs_price(OPT, PUT)
        iv = implied_vol(OPT, px, PUT)
        assert abs(iv - OPT.sigma) < 1e-6

    def test_vec_round_trip(self):
        sigmas = np.array([0.1, 0.2, 0.35, 0.6])
        px = bs_price_vec(100.0, 100.0, 1.0, 0.05, 0.0, sigmas, CALL)
        ivs = np.asarray(bs_implied_vol_vec(100.0, 100.0, 1.0, 0.05, 0.0,
                                            px, CALL))
        np.testing.assert_allclose(ivs, sigmas, atol=1e-6)

    def test_vec_bad_price_is_nan(self):
        # Price below intrinsic-forward lower bound cannot be matched
        ivs = bs_implied_vol_vec(100.0, 100.0, 1.0, 0.05, 0.0,
                                 np.array([1e-12]), CALL)
        assert np.isnan(np.asarray(ivs)).all()


class TestImpliedVolEdges:
    def test_unattainable_price_raises(self):
        import pytest
        with pytest.raises(ValueError):
            implied_vol(OPT, 0.001, CALL)  # below the zero-vol lower bound
        with pytest.raises(ValueError):
            implied_vol(OPT, 200.0, CALL)  # above S0

    def test_high_vol_round_trip(self):
        opt = OptionSpec(S0=100.0, K=100.0, T=0.5, r=0.02, sigma=1.5)
        px = bs_price(opt, CALL)
        assert abs(implied_vol(opt, px, CALL) - 1.5) < 1e-5


class TestExoticsAcceptNumpy:
    def test_numpy_paths(self):
        from optpricer_tpu import asian_price
        rng = np.random.default_rng(0)
        paths = 100.0 * np.exp(np.cumsum(
            rng.normal(0, 0.01, size=(51, 1000)), axis=0))
        paths[0, :] = 100.0
        px, se = asian_price(paths, 100.0, 0.05, 1.0, CALL)
        assert np.isfinite(px) and se > 0


class TestHigherGreeks:
    """Closed-form vanna/volga/charm/speed/zomma against the AD oracle:
    every formula must match jax.grad through price_core to machine
    precision (the formulas ARE derivatives of the same function)."""

    CASES = [(100., 105., 0.8, 0.04, 0.015, 0.22),
             (100., 80., 0.1, 0.0, 0.0, 0.35),
             (50., 55., 3.0, 0.07, 0.03, 0.15)]

    def test_matches_ad_everywhere(self):
        import jax

        from optpricer_tpu import bs_higher_greeks_vec
        from optpricer_tpu.ops.black_scholes import price_core

        for S0, K, T, r, q, sig in self.CASES:
            for kind, mask in (("call", True), ("put", False)):
                g = {k: float(v) for k, v in bs_higher_greeks_vec(
                    S0, K, T, r, q, sig, kind).items()}

                def f(S, sigma, T_):
                    return price_core(S, K, T_, r, q, sigma,
                                      jnp.asarray(mask))

                ad = {
                    "vanna": jax.grad(jax.grad(f, 0), 1)(S0, sig, T),
                    "volga": jax.grad(jax.grad(f, 1), 1)(S0, sig, T),
                    "charm": -jax.grad(jax.grad(f, 0), 2)(S0, sig, T),
                    "speed": jax.grad(jax.grad(jax.grad(f, 0), 0),
                                      0)(S0, sig, T),
                    "zomma": jax.grad(jax.grad(jax.grad(f, 0), 0),
                                      1)(S0, sig, T),
                }
                tol = 1e-9 if jax.config.jax_enable_x64 else 1e-4
                for name in g:
                    assert abs(g[name] - float(ad[name])) < tol, \
                        (kind, name, S0, K)

    def test_broadcasts(self):
        from optpricer_tpu import bs_higher_greeks_vec

        Ks = np.linspace(80.0, 120.0, 9)
        out = bs_higher_greeks_vec(100.0, Ks, 1.0, 0.05, 0.0, 0.2,
                                   "call")
        assert all(np.asarray(v).shape == (9,) for v in out.values())
        # volga is positive away from ATM-forward and ~0 at the d1=0 /
        # d2=0 crossovers; vanna flips sign across the forward
        v = np.asarray(out["vanna"])
        assert v[0] * v[-1] < 0
