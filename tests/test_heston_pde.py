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


def _haug_uoc(S, K, H, T, r, q, sig):
    """Analytic continuously-monitored up-and-out call (Haug/Merton
    reflection formulas) — the truth for the ξ→0 degenerate limit."""
    from scipy.stats import norm

    mu = (r - q - 0.5 * sig * sig) / (sig * sig)
    st = sig * np.sqrt(T)
    x1 = np.log(S / K) / st + (1 + mu) * st
    x2 = np.log(S / H) / st + (1 + mu) * st
    y1 = np.log(H * H / (S * K)) / st + (1 + mu) * st
    y2 = np.log(H / S) / st + (1 + mu) * st
    A = S * np.exp(-q * T) * norm.cdf(x1) \
        - K * np.exp(-r * T) * norm.cdf(x1 - st)
    B = S * np.exp(-q * T) * norm.cdf(x2) \
        - K * np.exp(-r * T) * norm.cdf(x2 - st)
    C = (S * np.exp(-q * T) * (H / S) ** (2 * (mu + 1)) * norm.cdf(-y1)
         - K * np.exp(-r * T) * (H / S) ** (2 * mu) * norm.cdf(-y1 + st))
    D = (S * np.exp(-q * T) * (H / S) ** (2 * (mu + 1)) * norm.cdf(-y2)
         - K * np.exp(-r * T) * (H / S) ** (2 * mu) * norm.cdf(-y2 + st))
    return A - B + C - D


class TestBarrier:
    """Barrier options by the ADI march: the knock-out nodes are TRUE
    Dirichlet rows of the implicit operator (project-after-solve behaves
    like discrete monitoring and converges O(√Δt) high — measured +0.6
    at coarse grids); knock-in via European parity."""

    def test_degenerate_limit_matches_analytic_uoc(self):
        hp0 = dict(v0=0.04, kappa=1.5, theta=0.04, xi=1e-4, rho=0.0)
        truth = _haug_uoc(100.0, 100.0, 130.0, 1.0, 0.03, 0.0, 0.2)
        from optpricer_tpu import heston_fd_price_barrier

        got = heston_fd_price_barrier(
            100.0, 100.0, 1.0, 0.03, 0.0, **hp0, barrier=130.0,
            barrier_type="up-and-out", **COARSE)
        assert abs(got - truth) < 0.03, (got, truth)

    def test_in_out_parity_exact(self):
        from optpricer_tpu import heston_fd_price, heston_fd_price_barrier

        kw = dict(barrier=130.0, **COARSE)
        van = heston_fd_price(S0, 100.0, T, R, Q, **HP, **COARSE)
        uo = heston_fd_price_barrier(S0, 100.0, T, R, Q, **HP,
                                     barrier_type="up-and-out", **kw)
        ui = heston_fd_price_barrier(S0, 100.0, T, R, Q, **HP,
                                     barrier_type="up-and-in", **kw)
        assert 0.0 < uo < van and 0.0 < ui < van
        assert abs((uo + ui) - van) < 1e-9   # parity by construction

    def test_american_barrier_below_american_vanilla(self):
        from optpricer_tpu import heston_fd_price, heston_fd_price_barrier

        am = heston_fd_price_barrier(
            S0, 110.0, T, 0.05, 0.0, **HP, barrier=70.0,
            barrier_type="down-and-out", kind="put", american=True,
            **COARSE)
        amv = heston_fd_price(S0, 110.0, T, 0.05, 0.0, **HP, kind="put",
                              american=True, **COARSE)
        assert 0.0 < am <= amv + 1e-9

    def test_guards(self):
        from optpricer_tpu import heston_fd_price_barrier

        with pytest.raises(ValueError, match="barrier_type"):
            heston_fd_price_barrier(S0, 100.0, T, R, Q, **HP,
                                    barrier=130.0, barrier_type="sideways")
        with pytest.raises(ValueError, match="European"):
            heston_fd_price_barrier(S0, 100.0, T, R, Q, **HP,
                                    barrier=130.0,
                                    barrier_type="up-and-in",
                                    american=True)
        with pytest.raises(ValueError, match="rebate"):
            heston_fd_price_barrier(S0, 100.0, T, R, Q, **HP,
                                    barrier=130.0,
                                    barrier_type="up-and-in", rebate=1.0)

    def test_far_barrier_degenerates_to_vanilla(self):
        # a barrier outside the grid must NOT translate the grid (the
        # snap would push S0 off the domain and the read-out would
        # silently extrapolate); it degenerates to the vanilla price
        from optpricer_tpu import heston_fd_price, heston_fd_price_barrier

        van = heston_fd_price(S0, 100.0, T, R, Q, **HP, **COARSE)
        far = heston_fd_price_barrier(S0, 100.0, T, R, Q, **HP,
                                      barrier=10_000.0,
                                      barrier_type="up-and-out", **COARSE)
        assert abs(far - van) < 1e-9


class TestDiscreteDividendsADI:
    """Discrete cash dividends in the 2-D ADI march: jump-condition
    x-remaps per variance row. Oracle: the 1-D θ-scheme dividend solver
    (itself pinned to an exact quadrature, test_pde.py) in the ξ→0
    degenerate limit where Heston IS Black-Scholes."""

    DEG = dict(v0=0.04, kappa=1.5, theta=0.04, xi=1e-4, rho=0.0)
    COARSE = dict(n_x=192, n_v=48, n_t=192)

    def test_degenerate_limit_matches_1d_dividend_solver(self):
        from optpricer_tpu import OptionSpec, fd_price, heston_fd_price

        divs = [(0.5, 5.0)]
        opt = OptionSpec(S0=100.0, K=100.0, T=1.0, r=0.05, sigma=0.2)
        ref = fd_price(opt, "call", N_S=400, N_t=400, dividends=divs)
        got = heston_fd_price(100.0, 100.0, 1.0, 0.05, 0.0, **self.DEG,
                              kind="call", dividends=divs, **self.COARSE)
        assert abs(got - ref) < 2e-2, (got, ref)

    def test_no_dividend_unchanged_and_monotone(self):
        from optpricer_tpu import heston_fd_price

        hp = dict(v0=0.04, kappa=1.5, theta=0.04, xi=0.5, rho=-0.6)
        base = heston_fd_price(100.0, 100.0, 1.0, 0.05, 0.0, **hp,
                               kind="call", **self.COARSE)
        same = heston_fd_price(100.0, 100.0, 1.0, 0.05, 0.0, **hp,
                               kind="call", dividends=None, **self.COARSE)
        assert got_equal(base, same)
        small = heston_fd_price(100.0, 100.0, 1.0, 0.05, 0.0, **hp,
                                kind="call", dividends=[(0.5, 2.0)],
                                **self.COARSE)
        big = heston_fd_price(100.0, 100.0, 1.0, 0.05, 0.0, **hp,
                              kind="call", dividends=[(0.5, 5.0)],
                              **self.COARSE)
        assert base > small > big > 0.0

    def test_american_call_cum_dividend_premium(self):
        from optpricer_tpu import heston_fd_price

        hp = dict(v0=0.04, kappa=1.5, theta=0.04, xi=0.5, rho=-0.6)
        divs = [(0.9, 8.0)]
        eu = heston_fd_price(100.0, 100.0, 1.0, 0.05, 0.0, **hp,
                             kind="call", dividends=divs, **self.COARSE)
        am = heston_fd_price(100.0, 100.0, 1.0, 0.05, 0.0, **hp,
                             kind="call", dividends=divs, american=True,
                             **self.COARSE)
        assert am > eu + 1.0, (am, eu)


def got_equal(a, b):
    return abs(a - b) < 1e-12


class TestDeviceOperatorBuild:
    """The device-side operator assembly/inversion must reproduce the
    host f64 builder (its oracle) to the working-dtype floor."""

    def _grids(self, n_x=64, n_v=24):
        vbar = 0.04
        xh = 6.0 * np.sqrt(vbar)
        x = np.linspace(np.log(100.0) - xh, np.log(100.0) + xh, n_x)
        u = np.linspace(0.0, 1.0, n_v)
        v = 10.0 * vbar * np.sinh(3.0 * u) / np.sinh(3.0)
        return x, v

    def test_matches_host_oracle_f64(self):
        import jax.numpy as jnp

        from optpricer_tpu.models.heston_pde import (_build_operators,
                                                     _build_operators_dev)

        x, v = self._grids()
        args = (x, v, 0.05, 0.01, 1.5, 0.04, 0.5, 1.0 / 128, 0.5)
        host = _build_operators(*args)
        dev = _build_operators_dev(*args, dtype=jnp.float64)
        for h, d in zip(host, dev):
            np.testing.assert_allclose(np.asarray(d), h, rtol=0,
                                       atol=1e-12)

    def test_matches_host_oracle_with_barrier_mask(self):
        import jax.numpy as jnp

        from optpricer_tpu.models.heston_pde import (_build_operators,
                                                     _build_operators_dev)

        x, v = self._grids()
        ko = np.exp(x) >= 130.0
        args = (x, v, 0.05, 0.01, 1.5, 0.04, 0.5, 1.0 / 128, 0.5)
        host = _build_operators(*args, ko_mask=ko)
        dev = _build_operators_dev(*args, ko_mask=ko, dtype=jnp.float64)
        for h, d in zip(host, dev):
            np.testing.assert_allclose(np.asarray(d), h, rtol=0,
                                       atol=1e-12)

    def test_f32_build_at_working_dtype_floor(self):
        # f32 assembly + LU + Newton-Schulz must match the f64 oracle as
        # well as casting the f64 inverse to f32 would (~1e-7 relative)
        import jax.numpy as jnp

        from optpricer_tpu.models.heston_pde import (_build_operators,
                                                     _build_operators_dev)

        x, v = self._grids()
        args = (x, v, 0.05, 0.01, 1.5, 0.04, 0.5, 1.0 / 128, 0.5)
        host = _build_operators(*args)
        dev = _build_operators_dev(*args, dtype=jnp.float32)
        for h, d in zip(host, dev):
            scale = np.max(np.abs(h))
            err = np.max(np.abs(np.asarray(d, np.float64) - h)) / scale
            assert err < 5e-7, err
