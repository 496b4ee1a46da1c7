"""FDM θ-scheme: oracle vs BS, parity, American premium, barriers, Greeks.

Mirrors reference test_pde.py tolerances: <0.1% rel @400², Δ<0.005, Γ<0.002,
theta rel <1%, in/out parity <0.1.
"""
import numpy as np
import pytest

from optpricer_tpu import (
    CALL, PUT, OptionSpec, bs_greeks, bs_price, fd_greeks, fd_price,
    fd_price_barrier, fd_price_local_vol,
)

OPT = OptionSpec(S0=100.0, K=100.0, T=1.0, r=0.05, sigma=0.2)


class TestVanilla:
    def test_call_accuracy(self):
        px = fd_price(OPT, CALL, N_S=400, N_t=400)
        ref = bs_price(OPT, CALL)
        assert abs(px - ref) / ref < 0.001

    def test_put_accuracy(self):
        px = fd_price(OPT, PUT, N_S=400, N_t=400)
        ref = bs_price(OPT, PUT)
        assert abs(px - ref) / ref < 0.001

    def test_put_call_parity(self):
        c = fd_price(OPT, CALL, N_S=300, N_t=300)
        p = fd_price(OPT, PUT, N_S=300, N_t=300)
        parity = OPT.S0 - OPT.K * np.exp(-OPT.r * OPT.T)
        assert abs((c - p) - parity) < 0.02

    def test_dividend_yield(self):
        opt = OptionSpec(100.0, 100.0, 1.0, 0.05, 0.2, q=0.03)
        px = fd_price(opt, CALL, N_S=400, N_t=400)
        ref = bs_price(opt, CALL)
        assert abs(px - ref) / ref < 0.001

    @pytest.mark.parametrize("theta", [0.5, 1.0])
    def test_schemes_converge(self, theta):
        px = fd_price(OPT, CALL, N_S=400, N_t=400, theta=theta)
        ref = bs_price(OPT, CALL)
        assert abs(px - ref) / ref < 0.005

    def test_thomas_solver_matches_parallel(self):
        p1 = fd_price(OPT, CALL, N_S=200, N_t=200, solver="parallel")
        p2 = fd_price(OPT, CALL, N_S=200, N_t=200, solver="thomas")
        assert abs(p1 - p2) < 1e-8

    def test_convergence_with_refinement(self):
        ref = bs_price(OPT, CALL)
        errs = [abs(fd_price(OPT, CALL, N_S=n, N_t=n) - ref)
                for n in (50, 100, 200)]
        assert errs[2] < errs[0]


class TestAmerican:
    def test_american_put_above_european(self):
        eu = fd_price(OPT, PUT, N_S=300, N_t=300)
        am = fd_price(OPT, PUT, N_S=300, N_t=300, american=True)
        assert am > eu
        assert am >= max(OPT.K - OPT.S0, 0.0)

    def test_american_matches_binomial(self):
        from optpricer_tpu import crr
        am_fd = fd_price(OPT, PUT, N_S=400, N_t=400, american=True)
        am_tree = crr(OPT, PUT, N=2000, american=True)
        assert abs(am_fd - am_tree) / am_tree < 0.005


class TestBarrier:
    def test_in_out_parity(self):
        vanilla = fd_price(OPT, CALL, N_S=400, N_t=400)
        out_px = fd_price_barrier(OPT, CALL, 130.0, "up-and-out",
                                  N_S=400, N_t=400)
        in_px = fd_price_barrier(OPT, CALL, 130.0, "up-and-in",
                                 N_S=400, N_t=400)
        assert abs((out_px + in_px) - vanilla) < 0.1

    def test_knockout_below_vanilla(self):
        vanilla = fd_price(OPT, CALL, N_S=200, N_t=200)
        out_px = fd_price_barrier(OPT, CALL, 120.0, "up-and-out",
                                  N_S=200, N_t=200)
        assert out_px < vanilla

    def test_far_barrier_is_vanilla(self):
        vanilla = fd_price(OPT, CALL, N_S=200, N_t=200)
        out_px = fd_price_barrier(OPT, CALL, 1000.0, "up-and-out",
                                  N_S=200, N_t=200)
        assert abs(out_px - vanilla) < 0.01

    def test_down_and_out_put(self):
        out_px = fd_price_barrier(OPT, PUT, 70.0, "down-and-out",
                                  N_S=300, N_t=300)
        vanilla = fd_price(OPT, PUT, N_S=300, N_t=300)
        assert 0 < out_px < vanilla


class TestGreeks:
    def test_vs_analytic(self):
        g_fd = fd_greeks(OPT, CALL, N_S=400, N_t=400)
        g_bs = bs_greeks(OPT, CALL)
        assert abs(g_fd["delta"] - g_bs["delta"]) < 0.005
        assert abs(g_fd["gamma"] - g_bs["gamma"]) < 0.002
        assert abs(g_fd["theta"] - g_bs["theta"]) / abs(g_bs["theta"]) < 0.01

    def test_put_delta(self):
        g_fd = fd_greeks(OPT, PUT, N_S=400, N_t=400)
        g_bs = bs_greeks(OPT, PUT)
        assert abs(g_fd["delta"] - g_bs["delta"]) < 0.005


class TestLocalVol:
    def test_const_sigma_func_matches_bs(self):
        import jax.numpy as jnp
        sigma_fn = lambda S, t: 0.2 * jnp.ones_like(S)
        px = fd_price_local_vol(100.0, 100.0, 1.0, 0.05, 0.0, sigma_fn, CALL,
                                N_S=200, N_t=200, ref_vol=0.2)
        ref = bs_price(OPT, CALL)
        assert abs(px - ref) / ref < 0.002

    def test_term_structure_sigma(self):
        """σ(t) only: price should equal BS with RMS vol."""
        import jax.numpy as jnp
        sigma_fn = lambda S, t: jnp.sqrt(0.03 + 0.02 * t) * jnp.ones_like(S)
        px = fd_price_local_vol(100.0, 100.0, 1.0, 0.05, 0.0, sigma_fn, CALL,
                                N_S=300, N_t=300, ref_vol=0.2)
        rms = np.sqrt(0.03 + 0.02 * 0.5)  # ∫σ²dt = 0.04
        ref = bs_price(OptionSpec(100.0, 100.0, 1.0, 0.05, float(rms)), CALL)
        assert abs(px - ref) / ref < 0.005


class TestBatch:
    def test_fd_price_batch_matches_scalar(self):
        from optpricer_tpu.models.pde import fd_price_batch
        Ks = np.array([90.0, 100.0, 110.0])
        px = np.asarray(fd_price_batch(100.0, Ks, 1.0, 0.05, 0.0, 0.2, CALL,
                                       N_S=200, N_t=200))
        for i, K in enumerate(Ks):
            scalar = fd_price(OptionSpec(100.0, float(K), 1.0, 0.05, 0.2),
                              CALL, N_S=200, N_t=200)
            assert abs(px[i] - scalar) < 1e-8


class TestSolverEquivalence:
    def test_propagator_matches_tridiag(self):
        pp = fd_price(OPT, CALL, N_S=200, N_t=200, solver="propagator")
        pt = fd_price(OPT, CALL, N_S=200, N_t=200, solver="parallel")
        assert abs(pp - pt) < 1e-7

    def test_propagator_american(self):
        pp = fd_price(OPT, PUT, N_S=200, N_t=200, solver="propagator",
                      american=True)
        pt = fd_price(OPT, PUT, N_S=200, N_t=200, solver="parallel",
                      american=True)
        assert abs(pp - pt) < 1e-7

    def test_propagator_barrier(self):
        pp = fd_price_barrier(OPT, CALL, 120.0, "up-and-out", N_S=200,
                              N_t=200, solver="propagator")
        pt = fd_price_barrier(OPT, CALL, 120.0, "up-and-out", N_S=200,
                              N_t=200, solver="parallel")
        assert abs(pp - pt) < 1e-7


class TestPSOR:
    def test_psor_vs_binomial(self):
        from optpricer_tpu import crr
        am_psor = fd_price(OPT, PUT, N_S=400, N_t=400, american=True,
                           american_method="psor", psor_sweeps=40)
        am_tree = crr(OPT, PUT, N=4000, american=True)
        assert abs(am_psor - am_tree) / am_tree < 0.003

    def test_psor_close_to_projection(self):
        proj = fd_price(OPT, PUT, N_S=300, N_t=300, american=True)
        psor = fd_price(OPT, PUT, N_S=300, N_t=300, american=True,
                        american_method="psor")
        # Both converge to the same LCP solution at this resolution
        assert abs(proj - psor) < 0.01
        assert psor >= max(OPT.K - OPT.S0, 0.0)

    def test_psor_european_unchanged(self):
        """psor flag has no effect on European pricing."""
        eu1 = fd_price(OPT, CALL, N_S=200, N_t=200)
        eu2 = fd_price(OPT, CALL, N_S=200, N_t=200,
                       american_method="psor")
        assert abs(eu1 - eu2) < 1e-9


def test_unknown_solver_raises():
    import pytest
    from optpricer_tpu import OptionSpec
    from optpricer_tpu.models.pde import (fd_price, fd_price_local_vol_batch)

    opt = OptionSpec(S0=100.0, K=100.0, T=1.0, r=0.05, sigma=0.2)
    with pytest.raises(ValueError, match="unknown solver"):
        fd_price(opt, "call", N_S=32, N_t=16, solver="warp")
    with pytest.raises(ValueError, match="unknown solver"):
        fd_price_local_vol_batch(
            100.0, [100.0], 1.0, 0.05, 0.0,
            lambda S, t: 0.2 + 0.0 * S, "call",
            N_S=32, N_t=16, solver="warp")


class TestBarrierOperatorMode:
    """barrier_mode="operator": knocked-out nodes as identity rows of the
    θ-scheme system + barrier snapped onto a node — TRUE continuous
    monitoring, second-order convergent to the analytic reflection price
    (the default "node" mode keeps the reference's after-step override
    for number parity, which is O(√Δt) high)."""

    def _haug_uoc(self, S, K, H, T, r, q, sig):
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
        C = (S * np.exp(-q * T) * (H / S) ** (2 * (mu + 1))
             * norm.cdf(-y1)
             - K * np.exp(-r * T) * (H / S) ** (2 * mu)
             * norm.cdf(-y1 + st))
        D = (S * np.exp(-q * T) * (H / S) ** (2 * (mu + 1))
             * norm.cdf(-y2)
             - K * np.exp(-r * T) * (H / S) ** (2 * mu)
             * norm.cdf(-y2 + st))
        return A - B + C - D

    def test_matches_analytic_reflection_price(self):
        truth = self._haug_uoc(100.0, 100.0, 130.0, 1.0, 0.05, 0.0, 0.2)
        got = fd_price_barrier(OPT, CALL, 130.0, "up-and-out",
                               N_S=400, N_t=400, barrier_mode="operator")
        assert abs(got - truth) < 3e-3, (got, truth)
        # the reference-parity node mode is visibly biased high on the
        # same contract — the documented trade-off
        node = fd_price_barrier(OPT, CALL, 130.0, "up-and-out",
                                N_S=400, N_t=400)
        assert node - truth > 0.05

    def test_parity_and_guard(self):
        uo = fd_price_barrier(OPT, CALL, 130.0, "up-and-out",
                              barrier_mode="operator")
        ui = fd_price_barrier(OPT, CALL, 130.0, "up-and-in",
                              barrier_mode="operator")
        vanilla = fd_price(OPT, CALL)
        assert abs((uo + ui) - vanilla) < 1e-9
        with pytest.raises(ValueError, match="barrier_mode"):
            fd_price_barrier(OPT, CALL, 130.0, "up-and-out",
                             barrier_mode="exact")

    def test_far_barrier_degenerates_to_vanilla(self):
        van = fd_price(OPT, CALL)
        far = fd_price_barrier(OPT, CALL, 10_000.0, "up-and-out",
                               barrier_mode="operator")
        assert abs(far - van) < 1e-9


class TestRebateAtExpiry:
    """Default rebate semantics match the analytic/MC engines (rebate paid
    AT EXPIRY), assembled from zero-rebate solves + an exact
    strike-difference survival probability. The reference's
    rebate-as-Dirichlet scheme (pde.py:209-211) stays reachable as
    rebate_mode='node'."""

    @pytest.mark.parametrize("bt,B,kind", [
        ("up-and-out", 130.0, CALL), ("down-and-out", 80.0, PUT),
        ("up-and-in", 130.0, PUT), ("down-and-in", 80.0, CALL),
    ])
    def test_matches_analytic(self, bt, B, kind):
        from optpricer_tpu.models.analytic import barrier_price_bs

        fd = fd_price_barrier(OPT, kind, B, bt, rebate=3.0,
                              N_S=400, N_t=400, barrier_mode="operator")
        an = float(barrier_price_bs(
            OPT.S0, OPT.K, OPT.T, OPT.r, OPT.q, sigma=OPT.sigma,
            barrier=B, barrier_type=bt, kind=kind, rebate=3.0))
        assert abs(fd - an) < 2e-3, (bt, kind, fd, an)

    def test_in_out_rebate_identity(self):
        # KO(reb) + KI(reb) = vanilla + reb·e^{-rT}: exactly one of the
        # two legs pays the rebate at expiry on every path
        reb = 5.0
        kw = dict(N_S=300, N_t=300, barrier_mode="operator")
        ko = fd_price_barrier(OPT, CALL, 130.0, "up-and-out",
                              rebate=reb, **kw)
        ki = fd_price_barrier(OPT, CALL, 130.0, "up-and-in",
                              rebate=reb, **kw)
        van = fd_price(OPT, CALL, N_S=300, N_t=300)
        assert abs((ko + ki) - (van + reb * np.exp(-OPT.r * OPT.T))) < 1e-6

    def test_zero_rebate_modes_identical(self):
        e = fd_price_barrier(OPT, CALL, 130.0, "up-and-out")
        n = fd_price_barrier(OPT, CALL, 130.0, "up-and-out",
                             rebate_mode="node")
        assert e == n

    def test_node_mode_is_the_reference_scheme(self):
        # rebate-at-hit undiscounted is worth MORE than rebate-at-expiry
        # (r > 0): the legacy scheme stays available and biased the
        # expected way
        e = fd_price_barrier(OPT, CALL, 130.0, "up-and-out", rebate=5.0,
                             N_S=200, N_t=200)
        n = fd_price_barrier(OPT, CALL, 130.0, "up-and-out", rebate=5.0,
                             N_S=200, N_t=200, rebate_mode="node")
        assert n > e
        with pytest.raises(ValueError, match="rebate_mode"):
            fd_price_barrier(OPT, CALL, 130.0, "up-and-out",
                             rebate_mode="hit")


class TestDiscreteDividends:
    """Piecewise-GBM cash dividends via jump conditions on the marching
    layer. Oracle: exact 1-D quadrature (the inner segment is a BS call
    in closed form). The reference supports only a continuous yield
    (pde.py:145) — no dividend test exists to inherit."""

    def _quad_div_call(self, S0, K, D, r, sig, t1, t2):
        from scipy.stats import norm

        def bs_call(S, Kv, T, rv, sigma):
            S = np.maximum(S, 1e-300)
            d1 = (np.log(S / Kv) + (rv + sigma**2 / 2) * T) \
                / (sigma * np.sqrt(T))
            return S * norm.cdf(d1) \
                - Kv * np.exp(-rv * T) * norm.cdf(d1 - sigma * np.sqrt(T))

        z = np.linspace(-10, 10, 100_001)
        phi = np.exp(-z * z / 2) / np.sqrt(2 * np.pi)
        S1 = S0 * np.exp((r - sig * sig / 2) * t1 + sig * np.sqrt(t1) * z)
        vals = bs_call(np.maximum(S1 - D, 1e-12), K, t2, r, sig)
        return np.exp(-r * t1) * np.trapezoid(vals * phi, z)

    def test_single_dividend_matches_quadrature(self):
        truth = self._quad_div_call(100.0, 100.0, 5.0, 0.05, 0.2, 0.5, 0.5)
        got = fd_price(OPT, CALL, N_S=400, N_t=400,
                       dividends=[(0.5, 5.0)])
        assert abs(got - truth) < 5e-3, (got, truth)

    def test_zero_dividend_is_exactly_vanilla(self):
        # D = 0 must bypass the remap bit-exactly (f32 log/exp round
        # trips are not identity)
        van = fd_price(OPT, CALL, N_S=200, N_t=200)
        z = fd_price(OPT, CALL, N_S=200, N_t=200, dividends=[(0.5, 0.0)])
        assert z == van

    def test_early_dividend_limit_is_shifted_bs(self):
        # dividend at t→0⁺ ⇒ call on S0 − D
        got = fd_price(OPT, CALL, N_S=400, N_t=500,
                       dividends=[(0.002, 5.0)])
        shifted = fd_price(OptionSpec(S0=95.0, K=100.0, T=1.0, r=0.05,
                                      sigma=0.2), CALL, N_S=400, N_t=500)
        assert abs(got - shifted) < 2e-2

    def test_monotone_in_dividend(self):
        kw = dict(N_S=200, N_t=200)
        calls = [fd_price(OPT, CALL, dividends=[(0.5, D)], **kw)
                 for D in (0.0, 2.0, 5.0)]
        puts = [fd_price(OPT, PUT, dividends=[(0.5, D)], **kw)
                for D in (0.0, 2.0, 5.0)]
        assert calls[0] > calls[1] > calls[2]
        assert puts[0] < puts[1] < puts[2]

    def test_american_call_exercises_before_big_dividend(self):
        # with a large late dividend the American call is worth nearly
        # the no-dividend T=0.9 American (exercise cum-dividend), far
        # above the European on the dropped asset
        divs = [(0.9, 8.0)]
        eu = fd_price(OPT, CALL, N_S=400, N_t=400, dividends=divs)
        am = fd_price(OPT, CALL, N_S=400, N_t=400, dividends=divs,
                      american=True)
        pre = fd_price(OptionSpec(S0=100.0, K=100.0, T=0.9, r=0.05,
                                  sigma=0.2), CALL, N_S=400, N_t=400)
        assert am > eu + 1.0
        assert am > pre - 0.05  # can't be worth less than stopping at t1⁻

    def test_multiple_dividends_and_guards(self):
        multi = fd_price(OPT, CALL, N_S=200, N_t=200,
                         dividends=[(0.25, 2.0), (0.75, 2.0)])
        single = fd_price(OPT, CALL, N_S=200, N_t=200,
                          dividends=[(0.25, 4.0)])
        assert 0.0 < multi < fd_price(OPT, CALL, N_S=200, N_t=200)
        assert multi != single
        with pytest.raises(ValueError, match="outside"):
            fd_price(OPT, CALL, dividends=[(1.5, 1.0)])
        with pytest.raises(ValueError, match="negative"):
            fd_price(OPT, CALL, dividends=[(0.5, -1.0)])

    def test_boundary_asymptotes_carry_future_dividends(self):
        # on a TIGHT domain the call's upper Dirichlet value must be the
        # forward NET of remaining dividend PV; unadjusted it overstated
        # the boundary layer by ~PV(D) and biased the price high
        opt3 = OptionSpec(S0=100.0, K=100.0, T=1.0, r=0.05, sigma=0.3)
        divs = [(0.9, 20.0)]
        tight = fd_price(opt3, CALL, N_S=300, N_t=300, S_max_mult=2.0,
                         dividends=divs)
        wide = fd_price(opt3, CALL, N_S=600, N_t=600, S_max_mult=5.0,
                        dividends=divs)
        # residual ~2e-3 is the plain 2σ√T domain-truncation error;
        # the unadjusted boundary was off by two orders more
        assert abs(tight - wide) < 5e-3, (tight, wide)

    def test_fd_greeks_with_dividends(self):
        # grid Greeks from the dividend march vs central bump-and-reprice
        divs = [(0.5, 5.0)]
        kw = dict(N_S=400, N_t=400)
        g = fd_greeks(OPT, CALL, dividends=divs, **kw)
        h = 0.5
        up = fd_price(OptionSpec(S0=100.0 + h, K=100.0, T=1.0, r=0.05,
                                 sigma=0.2), CALL, dividends=divs, **kw)
        dn = fd_price(OptionSpec(S0=100.0 - h, K=100.0, T=1.0, r=0.05,
                                 sigma=0.2), CALL, dividends=divs, **kw)
        base = fd_price(OPT, CALL, dividends=divs, **kw)
        assert abs(g["delta"] - (up - dn) / (2 * h)) < 1e-3
        # bump gamma re-interpolates three separate grids — noisier than
        # the in-grid second difference; 3e-3 brackets both
        assert abs(g["gamma"] - (up - 2 * base + dn) / h**2) < 3e-3
        assert 0.0 < g["delta"] < 1.0 and g["gamma"] > 0.0
