"""Semi-analytic engines (models/analytic.py): Merton series, Heston COS,
Hagan SABR.

Oracles: exact degenerate limits (λ=0 / ξ→0 / ν=0 reduce each model to
Black-Scholes), the published Fang-Oosterlee COS test value, put-call
parity, and z-tests against the framework's own fused MC engines — which
simultaneously gives those MC kernels a true non-statistical oracle.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from optpricer_tpu import (bs_price_vec, exotic_price_mc, heston_price_cos,
                           merton_price, sabr_implied_vol, sabr_price_hagan)

S0, K, T, R = 100.0, 100.0, 1.0, 0.05


def _bs(K_=K, sig=0.2, r=R, q=0.0, kind="call"):
    return float(bs_price_vec(S0, K_, T, r, q, sig, kind, dtype="float64"))


class TestMerton:
    def test_lam_zero_reduces_to_bs(self):
        m = float(merton_price(S0, K, T, R, sigma=0.2, lam=0.0, mJ=-0.1,
                               sJ=0.15))
        assert m == pytest.approx(_bs(), abs=1e-10)

    def test_sj_zero_mj_zero_reduces_to_bs(self):
        # jumps of size zero change nothing (κ=0, σ_k=σ for... only k
        # terms shift r_k by 0) — series must resum to BS exactly
        m = float(merton_price(S0, K, T, R, sigma=0.2, lam=2.0, mJ=0.0,
                               sJ=0.0))
        assert m == pytest.approx(_bs(), abs=1e-8)

    def test_matches_fused_mc(self):
        mp = dict(sigma=0.2, lam=0.5, mJ=-0.08, sJ=0.12)
        ref = float(merton_price(S0, K, T, R, sigma=0.2, lam=0.5, mJ=-0.08,
                                 sJ=0.12))
        px, se = exotic_price_mc("vanilla", S0, K, T, R, merton=mp,
                                 n_steps=64, n_paths=400_000, seed=11,
                                 backend="xla", dtype="float64")
        assert abs(px - ref) < 4.0 * se + 1e-3

    def test_put_call_parity(self):
        kw = dict(sigma=0.25, lam=1.0, mJ=0.05, sJ=0.2)
        c = float(merton_price(S0, 90.0, T, R, 0.01, **kw, kind="call"))
        p = float(merton_price(S0, 90.0, T, R, 0.01, **kw, kind="put"))
        fwd = S0 * np.exp(-0.01 * T) - 90.0 * np.exp(-R * T)
        assert c - p == pytest.approx(fwd, abs=1e-8)

    def test_jumps_add_value_atm(self):
        base = _bs()
        m = float(merton_price(S0, K, T, R, sigma=0.2, lam=1.0, mJ=-0.1,
                               sJ=0.2))
        assert m > base  # extra (compensated) variance ⇒ dearer option

    def test_ad_greeks_finite(self):
        g = jax.grad(lambda s: merton_price(s, K, T, R, sigma=0.2, lam=0.5,
                                            mJ=-0.05, sJ=0.1))(
            jnp.asarray(S0, jnp.float64))
        assert np.isfinite(float(g)) and 0.0 < float(g) < 1.0


HESTON = dict(v0=0.04, kappa=2.0, theta=0.05, xi=0.4, rho=-0.6)


class TestHestonCOS:
    def test_degenerate_reduces_to_bs(self):
        h = float(heston_price_cos(S0, K, T, R, v0=0.04, kappa=1.5,
                                   theta=0.04, xi=1e-5, rho=0.0))
        assert h == pytest.approx(_bs(), abs=5e-5)

    def test_fang_oosterlee_reference_value(self):
        # COS paper test case: put = 5.785155450 (Fang & Oosterlee 2008)
        hp = float(heston_price_cos(
            100.0, 100.0, 1.0, 0.0, v0=0.0175, kappa=1.5768, theta=0.0398,
            xi=0.5751, rho=-0.5711, kind="put", N=512))
        assert hp == pytest.approx(5.785155450, abs=5e-5)

    def test_put_call_parity_exact(self):
        c = float(heston_price_cos(S0, 90.0, T, R, 0.01, **HESTON,
                                   kind="call"))
        p = float(heston_price_cos(S0, 90.0, T, R, 0.01, **HESTON,
                                   kind="put"))
        fwd = S0 * np.exp(-0.01 * T) - 90.0 * np.exp(-R * T)
        assert c - p == pytest.approx(fwd, abs=1e-9)

    def test_matches_fused_mc(self):
        ref = float(heston_price_cos(S0, K, T, R, **HESTON))
        px, se = exotic_price_mc("vanilla", S0, K, T, R, heston=HESTON,
                                 n_steps=256, n_paths=400_000, seed=12,
                                 backend="xla", dtype="float64")
        # full-truncation Euler carries O(dt) bias on top of MC noise
        assert abs(px - ref) < 4.0 * se + 0.03

    def test_strike_batch_matches_loop(self):
        Ks = jnp.linspace(80.0, 120.0, 9)
        batch = np.asarray(heston_price_cos(S0, Ks, T, R, **HESTON))
        loop = np.array([float(heston_price_cos(S0, float(k), T, R,
                                                **HESTON)) for k in Ks])
        np.testing.assert_allclose(batch, loop, rtol=1e-12)
        assert np.all(np.diff(batch) < 0.0)  # calls decrease in strike

    def test_converges_in_N(self):
        h1 = float(heston_price_cos(S0, K, T, R, **HESTON, N=96))
        h2 = float(heston_price_cos(S0, K, T, R, **HESTON, N=512))
        assert abs(h1 - h2) < 1e-6  # exponential convergence well set in


class TestSABRHagan:
    def test_nu_zero_beta_one_is_flat_bs_vol(self):
        iv = float(sabr_implied_vol(100.0, 123.0, 1.0, 0.2, 1.0, 1e-9, 0.0))
        assert iv == pytest.approx(0.2, abs=1e-9)
        px = float(sabr_price_hagan(S0, 110.0, T, R, alpha=0.2, beta=1.0,
                                    nu=1e-9, rho=0.0))
        assert px == pytest.approx(_bs(110.0), abs=1e-8)

    def test_atm_continuity(self):
        # the z/x(z) removable singularity must be smooth through ATM
        ivs = [float(sabr_implied_vol(100.0, k, 1.0, 0.2, 1.0, 0.5, -0.3))
               for k in (99.999, 100.0, 100.001)]
        assert abs(ivs[0] - 2 * ivs[1] + ivs[2]) < 1e-6

    def test_skew_sign(self):
        # ρ<0 tilts the smile down in strike
        lo = float(sabr_implied_vol(100.0, 90.0, 1.0, 0.2, 1.0, 0.5, -0.5))
        hi = float(sabr_implied_vol(100.0, 110.0, 1.0, 0.2, 1.0, 0.5, -0.5))
        assert lo > hi

    def test_matches_fused_mc_beta_one(self):
        sp = dict(alpha0=0.2, beta=1.0, nu=0.3, rho=-0.3)
        ref = float(sabr_price_hagan(S0, K, T, R, alpha=0.2, beta=1.0,
                                     nu=0.3, rho=-0.3))
        px, se = exotic_price_mc("vanilla", S0, K, T, R, sabr=sp,
                                 n_steps=256, n_paths=400_000, seed=13,
                                 backend="xla", dtype="float64")
        # Hagan is an O(T) asymptotic: allow ~0.5% of premium on top of MC
        assert abs(px - ref) < 4.0 * se + 0.005 * ref


class TestFitHeston:
    """Heston surface calibration: LM on vega-weighted COS price
    residuals, exact jacfwd Jacobians. Zero-noise round-trip must recover
    the generating parameters (analogue of the SVI recovery test)."""

    TRUE = dict(v0=0.04, kappa=1.8, theta=0.05, xi=0.45, rho=-0.55)

    def _surface(self):
        from optpricer_tpu import bs_implied_vol_vec

        S0, r, q = 100.0, 0.03, 0.01
        Ks, Ts = [], []
        for T_ in (0.25, 0.5, 1.0):
            for K_ in np.linspace(80, 120, 11):
                Ks.append(K_)
                Ts.append(T_)
        Ks, Ts = np.array(Ks), np.array(Ts)
        px = np.array([float(heston_price_cos(S0, k, t, r, q, **self.TRUE))
                       for k, t in zip(Ks, Ts)])
        iv = np.asarray(bs_implied_vol_vec(S0, Ks, Ts, r, q, px, "call"))
        return Ks, Ts, iv, S0, r, q

    def test_zero_noise_recovery(self):
        from optpricer_tpu import fit_heston

        Ks, Ts, iv, S0, r, q = self._surface()
        fit = fit_heston(Ks, Ts, iv, S0, r, q)
        for k, v in self.TRUE.items():
            assert abs(fit[k] - v) < 1e-4, (k, fit[k], v)
        assert fit["rmse"] < 1e-6

    def test_noisy_fit_stays_close(self):
        from optpricer_tpu import fit_heston

        Ks, Ts, iv, S0, r, q = self._surface()
        rng = np.random.default_rng(7)
        fit = fit_heston(Ks, Ts, iv + rng.normal(0, 5e-4, iv.shape),
                         S0, r, q)
        assert abs(fit["v0"] - self.TRUE["v0"]) < 5e-3
        assert abs(fit["rho"] - self.TRUE["rho"]) < 0.1
        assert fit["rmse"] < 2e-3

    def test_shape_validation(self):
        from optpricer_tpu import fit_heston

        with pytest.raises(ValueError, match="same-length"):
            fit_heston([100.0, 105.0], [1.0], [0.2, 0.2], 100.0, 0.03)


class TestHestonGreeksCOS:
    def test_degenerate_matches_bs_greeks(self):
        from optpricer_tpu import heston_greeks_cos
        from optpricer_tpu.ops.black_scholes import greeks_core

        g = heston_greeks_cos(S0, K, T, R, v0=0.04, kappa=1.5, theta=0.04,
                              xi=1e-5, rho=0.0)
        ref = greeks_core(*(jnp.float64(v)
                            for v in (S0, K, T, R, 0.0, 0.2)),
                          jnp.asarray(True))
        for name in ("delta", "gamma", "theta", "rho"):
            assert abs(g[name] - float(ref[name])) < 1e-4, name
        # v0 enters the total variance as dw/dv0 = (1−e^{−κT})/κ (mean
        # reversion discounts the initial level), so in the flat limit
        # dV/dv0 = vega/(2σ)·(1−e^{−κT})/(κT)
        dwdv0 = (1.0 - np.exp(-1.5 * T)) / 1.5
        expect = float(ref["vega"]) / (2.0 * 0.2) * dwdv0 / T
        assert abs(g["vega_v0"] - expect) < 1e-3

    def test_matches_bumped_cos(self):
        from optpricer_tpu import heston_greeks_cos

        g = heston_greeks_cos(S0, 105.0, T, R, 0.01, **HESTON)
        h = 1e-4

        def px(**over):
            kw = dict(HESTON, **{k: v for k, v in over.items()
                                 if k in HESTON})
            s0 = over.get("S0", S0)
            return float(heston_price_cos(s0, 105.0, T, R, 0.01, **kw))

        fd_delta = (px(S0=S0 + 0.01) - px(S0=S0 - 0.01)) / 0.02
        fd_v0 = (px(v0=HESTON["v0"] + h) - px(v0=HESTON["v0"] - h)) / (2 * h)
        fd_xi = (px(xi=HESTON["xi"] + h) - px(xi=HESTON["xi"] - h)) / (2 * h)
        assert abs(g["delta"] - fd_delta) < 1e-5
        assert abs(g["vega_v0"] - fd_v0) < 1e-3
        assert abs(g["vega_xi"] - fd_xi) < 1e-3


class TestCEV:
    """CEV closed form (absorbing boundary, noncentral chi-square).
    Oracles: scipy's independent ncx2 CDF, the Hagan small-vol ATM
    expansion, converged Euler MC (SABR backbone at nu = 0), and put-call
    parity against the plain forward (the absorbed CEV is a true
    martingale)."""

    def test_matches_scipy_ncx2(self):
        from scipy.stats import ncx2

        from optpricer_tpu import cev_price

        S0, T, r, q = 100.0, 1.0, 0.03, 0.01
        for beta in (0.3, 0.5, 0.7, 0.9):
            sig = 0.25 * S0 ** (1.0 - beta)
            om = 1.0 - beta
            drift = 2 * (r - q) * om
            tau = (np.exp(drift * T) - 1) / drift
            v = sig * sig * tau
            F = S0 * np.exp((r - q) * T)
            for K in (80.0, 100.0, 125.0):
                a = K ** (2 * om) / (om * om * v)
                c = F ** (2 * om) / (om * om * v)
                b = 1 / om
                ref = np.exp(-r * T) * (
                    F * (1 - ncx2.cdf(a, b + 2, c))
                    - K * ncx2.cdf(c, b, a))
                got = float(cev_price(S0, K, T, r, q, sigma=sig, beta=beta,
                                      n_terms=4096))
                assert got == pytest.approx(ref, abs=5e-7), (beta, K)

    def test_hagan_atm_consistency(self):
        # ATM implied vol of CEV ~ sigma/F^(1-beta)*(1 + (1-b)^2/24 *
        # sigma^2/F^(2-2b) * T + ...) — the beta<1 limit of Hagan's SABR
        # formula at nu=0
        from optpricer_tpu import cev_price, sabr_implied_vol

        S0 = K = 100.0
        for beta in (0.4, 0.7):
            sig = 0.3 * S0 ** (1.0 - beta)
            px = float(cev_price(S0, K, 1.0, 0.0, 0.0, sigma=sig,
                                 beta=beta, n_terms=4096))
            iv = float(sabr_implied_vol(100.0, 100.0, 1.0, sig, beta,
                                        1e-8, 0.0))
            ref = float(bs_price_vec(S0, K, 1.0, 0.0, 0.0, iv, "call",
                                     dtype="float64"))
            assert abs(px - ref) < 2e-3 * ref

    def test_put_call_parity(self):
        from optpricer_tpu import cev_price

        args = dict(sigma=2.2, beta=0.6, n_terms=4096)
        c = float(cev_price(100.0, 95.0, 2.0, 0.04, 0.01, kind="call",
                            **args))
        p = float(cev_price(100.0, 95.0, 2.0, 0.04, 0.01, kind="put",
                            **args))
        F = 100.0 * np.exp((0.04 - 0.01) * 2.0)
        assert c - p == pytest.approx(np.exp(-0.04 * 2.0) * (F - 95.0),
                                      abs=1e-8)

    def test_sabr_mc_backbone_converges_to_cev(self):
        # nu=0 SABR IS the CEV diffusion: the Euler backbone (positivity
        # clamp, effectively absorbing) must converge to the closed form
        # even at 60% LN-equivalent vol where absorption mass is real
        from optpricer_tpu import cev_price
        from optpricer_tpu.models.processes import sabr_paths

        beta, S0, K, T = 0.5, 100.0, 100.0, 1.0
        sig = 0.6 * S0 ** (1.0 - beta)
        ref = float(cev_price(S0, K, T, 0.0, 0.0, sigma=sig, beta=beta,
                              n_terms=4096))
        S = sabr_paths(S0, 0.0, 0.0, sig, beta, 0.0, 0.0, T, 400,
                       200_000, seed=1, dtype="float64")
        ST = np.asarray(S[-1])
        pay = np.maximum(ST - K, 0.0)
        mc, se = pay.mean(), pay.std() / np.sqrt(ST.size)
        # martingale check: absorption must not leak drift
        assert abs(ST.mean() - S0) < 4 * ST.std() / np.sqrt(ST.size)
        assert abs(mc - ref) < 4 * se + 2e-2 * ref

    def test_term_budget_guard(self):
        # n_terms far below lambda/2: the mixture truncates and the CDF
        # collapses — document the failure mode by checking the good one
        from optpricer_tpu import cev_price

        good = float(cev_price(100.0, 100.0, 1.0, 0.0, 0.0, sigma=6.0,
                               beta=0.5, n_terms=2048))
        bad = float(cev_price(100.0, 100.0, 1.0, 0.0, 0.0, sigma=0.5,
                              beta=0.5, n_terms=2048))
        assert np.isfinite(good)
        # tiny sigma -> lambda ~ 1.6e5 >> n_terms: must NOT silently look
        # plausible; it degrades toward the no-exercise limit
        assert bad < good


class TestBarrierClosedForm:
    """Reiner-Rubinstein continuously-monitored barriers: independent
    reflection-formula oracle (up-and-out call), exact in/out parity for
    all eight combos, degenerate limits, expiry-paid rebate identities,
    and the in-operator PDE cross-check."""

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

    def test_matches_independent_reflection_oracle(self):
        from optpricer_tpu import barrier_price_bs

        for Kq, H, q, sig in ((100.0, 130.0, 0.0, 0.2),
                              (110.0, 125.0, 0.02, 0.3),
                              (90.0, 140.0, 0.01, 0.15)):
            truth = self._haug_uoc(S0, Kq, H, T, R, q, sig)
            got = float(barrier_price_bs(S0, Kq, T, R, q, sigma=sig,
                                         barrier=H,
                                         barrier_type="up-and-out"))
            assert abs(got - truth) < 5e-5, (Kq, H, got, truth)

    @pytest.mark.parametrize("kind", ["call", "put"])
    @pytest.mark.parametrize("direction,H", [("up", 130.0), ("down", 80.0)])
    @pytest.mark.parametrize("Kq", [85.0, 100.0, 120.0])
    def test_in_out_parity_all_combos(self, kind, direction, H, Kq):
        from optpricer_tpu import OptionSpec, barrier_price_bs, bs_price

        van = float(bs_price(OptionSpec(S0=S0, K=Kq, T=T, r=R, sigma=0.2),
                             kind))
        kw = dict(sigma=0.2, barrier=H, kind=kind)
        po = float(barrier_price_bs(S0, Kq, T, R, 0.0,
                                    barrier_type=f"{direction}-and-out",
                                    **kw))
        pi = float(barrier_price_bs(S0, Kq, T, R, 0.0,
                                    barrier_type=f"{direction}-and-in",
                                    **kw))
        assert po >= -1e-6 and pi >= -1e-6
        assert abs((po + pi) - van) < 2e-4, (po, pi, van)

    def test_degenerate_limits(self):
        from optpricer_tpu import OptionSpec, barrier_price_bs, bs_price

        van = float(bs_price(OptionSpec(S0=S0, K=K, T=T, r=R, sigma=0.2),
                             "call"))
        far = float(barrier_price_bs(S0, K, T, R, sigma=0.2,
                                     barrier=10_000.0,
                                     barrier_type="up-and-out"))
        assert abs(far - van) < 1e-6
        low = float(barrier_price_bs(S0, K, T, R, sigma=0.2, barrier=1e-4,
                                     barrier_type="down-and-out"))
        assert abs(low - van) < 1e-6

    def test_already_crossed(self):
        from optpricer_tpu import OptionSpec, barrier_price_bs, bs_price

        van = float(bs_price(OptionSpec(S0=S0, K=K, T=T, r=R, sigma=0.2),
                             "call"))
        out = float(barrier_price_bs(S0, K, T, R, sigma=0.2, barrier=90.0,
                                     barrier_type="up-and-out",
                                     rebate=2.0))
        assert abs(out - 2.0 * np.exp(-R * T)) < 1e-6
        inn = float(barrier_price_bs(S0, K, T, R, sigma=0.2, barrier=90.0,
                                     barrier_type="up-and-in"))
        assert abs(inn - van) < 1e-6

    def test_rebate_paid_at_expiry_identity(self):
        # in(R) + out(R) = vanilla + R·df  (P_hit + P_nohit = 1)
        from optpricer_tpu import OptionSpec, barrier_price_bs, bs_price

        van = float(bs_price(OptionSpec(S0=S0, K=K, T=T, r=R, sigma=0.2),
                             "call"))
        Rb = 3.0
        kw = dict(sigma=0.2, barrier=130.0, rebate=Rb)
        po = float(barrier_price_bs(S0, K, T, R, 0.0,
                                    barrier_type="up-and-out", **kw))
        pi = float(barrier_price_bs(S0, K, T, R, 0.0,
                                    barrier_type="up-and-in", **kw))
        assert abs((po + pi) - (van + Rb * np.exp(-R * T))) < 2e-4
        # rebate only ever adds value
        po0 = float(barrier_price_bs(S0, K, T, R, sigma=0.2, barrier=130.0,
                                     barrier_type="up-and-out"))
        assert po > po0

    def test_pde_operator_mode_agrees(self):
        from optpricer_tpu import (OptionSpec, barrier_price_bs,
                                   fd_price_barrier)

        opt = OptionSpec(S0=S0, K=K, T=T, r=R, sigma=0.2)
        truth = float(barrier_price_bs(S0, K, T, R, sigma=0.2,
                                       barrier=130.0,
                                       barrier_type="up-and-out"))
        got = fd_price_barrier(opt, "call", 130.0, "up-and-out",
                               N_S=400, N_t=400, barrier_mode="operator")
        assert abs(got - truth) < 3e-3

    def test_guards(self):
        from optpricer_tpu import barrier_price_bs

        with pytest.raises(ValueError, match="barrier_type"):
            barrier_price_bs(S0, K, T, R, sigma=0.2, barrier=130.0,
                             barrier_type="sideways-and-out")
        with pytest.raises(ValueError, match="kind"):
            barrier_price_bs(S0, K, T, R, sigma=0.2, barrier=130.0,
                             kind="straddle")


class TestQuanto:
    """Quanto vanillas: the drift correction IS the whole model."""

    def test_zero_fx_vol_is_vanilla(self):
        from optpricer_tpu import bs_price_vec, quanto_price

        v = np.asarray(quanto_price(100.0, 100.0, 1.0, 0.05, 0.01,
                                    sigma_S=0.2, sigma_fx=0.0,
                                    rho_sfx=0.5))
        ref = np.asarray(bs_price_vec(100.0, 100.0, 1.0, 0.05, 0.01,
                                      0.2, "call"))
        np.testing.assert_allclose(v, ref, rtol=1e-12)

    def test_mc_at_adjusted_carry_agrees(self):
        from optpricer_tpu import (
            OptionSpec, euro_price_mc, quanto_adjusted_carry, quanto_price,
        )

        q_eff = quanto_adjusted_carry(0.01, 0.2, 0.12, -0.4)
        qp = float(np.asarray(quanto_price(
            100.0, 100.0, 1.0, 0.05, 0.01, sigma_S=0.2, sigma_fx=0.12,
            rho_sfx=-0.4)))
        mc, se = euro_price_mc(
            OptionSpec(S0=100.0, K=100.0, T=1.0, r=0.05, sigma=0.2,
                       q=q_eff), "call", n_paths=1 << 21, seed=3)
        assert abs(mc - qp) < 4.0 * se

    def test_negative_rho_raises_call_value(self):
        from optpricer_tpu import quanto_price

        lo = float(np.asarray(quanto_price(
            100.0, 100.0, 1.0, 0.05, 0.01, sigma_S=0.2, sigma_fx=0.15,
            rho_sfx=0.5)))
        hi = float(np.asarray(quanto_price(
            100.0, 100.0, 1.0, 0.05, 0.01, sigma_S=0.2, sigma_fx=0.15,
            rho_sfx=-0.5)))
        # negative S-FX correlation LOWERS q_eff -> richer forward ->
        # dearer call
        assert hi > lo

    def test_validation(self):
        from optpricer_tpu import quanto_price

        with pytest.raises(ValueError):
            quanto_price(100.0, 100.0, 1.0, 0.05, sigma_S=0.2,
                         sigma_fx=0.1, rho_sfx=2.0)
        with pytest.raises(ValueError):
            quanto_price(100.0, 100.0, 1.0, 0.05, sigma_S=-0.2,
                         sigma_fx=0.1, rho_sfx=0.0)
