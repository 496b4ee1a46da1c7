"""Pathwise delta for path-dependent payoffs (exotic_greeks_mc).

Homogeneity argument: under GBM every running path statistic is degree-1
homogeneous in S0, so delta = (E[X] + sign·K_eff·E[Y3])/S0. Validated
against analytic BS (vanilla), central-difference bumping with common
random numbers (asian), and the exact floating-strike identity
delta = price/S0.
"""
import numpy as np
import pytest

from optpricer_tpu import exotic_greeks_mc, exotic_price_mc

KW = dict(sigma=0.2, n_steps=32, n_paths=400_000, seed=3, backend="xla",
          dtype="float64")


def test_vanilla_delta_matches_bs():
    import jax.numpy as jnp

    from optpricer_tpu.ops.black_scholes import greeks_core

    g = exotic_greeks_mc("vanilla", 100.0, 105.0, 1.0, 0.03, kind="call",
                         **KW)
    ref = float(greeks_core(jnp.float64(100.0), jnp.float64(105.0),
                            jnp.float64(1.0), jnp.float64(0.03),
                            jnp.float64(0.0), jnp.float64(0.2),
                            jnp.asarray(True))["delta"])
    assert abs(g["delta"] - ref) < 3e-3


@pytest.mark.parametrize("kind", ["call", "put"])
def test_asian_delta_matches_bump(kind):
    # central difference with common random numbers (same seed)
    h = 0.5
    g = exotic_greeks_mc("asian", 100.0, 100.0, 1.0, 0.03, kind=kind, **KW)
    up, _ = exotic_price_mc("asian", 100.0 + h, 100.0, 1.0, 0.03, kind=kind,
                            **KW)
    dn, _ = exotic_price_mc("asian", 100.0 - h, 100.0, 1.0, 0.03, kind=kind,
                            **KW)
    bump = (up - dn) / (2 * h)
    assert abs(g["delta"] - bump) < 3e-3, (g["delta"], bump)


def test_lookback_floating_delta_is_price_over_s0():
    g = exotic_greeks_mc("lookback", 100.0, 100.0, 1.0, 0.03, kind="call",
                         strike_type="floating", **KW)
    assert g["delta"] == pytest.approx(g["price"] / 100.0, rel=1e-12)
    # pay = S_T − min ≥ 0, zero exactly when the terminal spot IS the
    # running minimum — a positive-probability event on discrete paths
    assert 0.8 < g["exercise_prob"] <= 1.0


def test_lookback_fixed_delta_matches_bump():
    h = 0.5
    g = exotic_greeks_mc("lookback", 100.0, 110.0, 1.0, 0.03, kind="call",
                         **KW)
    up, _ = exotic_price_mc("lookback", 100.0 + h, 110.0, 1.0, 0.03,
                            kind="call", **KW)
    dn, _ = exotic_price_mc("lookback", 100.0 - h, 110.0, 1.0, 0.03,
                            kind="call", **KW)
    assert abs(g["delta"] - (up - dn) / (2 * h)) < 3e-3


def test_discontinuous_payoffs_use_lr():
    # barrier/digital switch to likelihood-ratio estimators (own stderr
    # on delta, since the homogeneity shortcut no longer applies)
    for payoff in ("barrier", "digital"):
        g = exotic_greeks_mc(payoff, 100.0, 100.0, 1.0, 0.03,
                             barrier=130.0, **KW)
        assert "delta_stderr" in g and np.isfinite(g["delta"])


def test_pallas_path_agrees_with_xla():
    # interpret-mode pallas backend vs XLA (different streams → statistical)
    kw = dict(sigma=0.2, n_steps=16, n_paths=200_000, seed=4)
    gx = exotic_greeks_mc("asian", 100.0, 100.0, 1.0, 0.03, kind="call",
                          backend="xla", dtype="float64", **kw)
    gp = exotic_greeks_mc("asian", 100.0, 100.0, 1.0, 0.03, kind="call",
                          backend="pallas", **kw)
    # interpreter PRNG is degenerate on CPU, so only check plumbing/shape
    assert set(gp) == set(gx) and np.isfinite(gp["delta"])


class TestPathwiseVega:
    """Pathwise vega: dS_t/dσ = S_t·(W_t − σt) carried through each
    payoff's chain rule; validated against analytic BS vega (vanilla) and
    CRN central differences in σ (asian/lookback, all strike conventions).
    """

    def test_vanilla_vega_matches_bs(self):
        import jax.numpy as jnp

        from optpricer_tpu.ops.black_scholes import greeks_core

        g = exotic_greeks_mc("vanilla", 100.0, 105.0, 1.0, 0.03,
                             kind="call", **KW)
        ref = float(greeks_core(jnp.float64(100.0), jnp.float64(105.0),
                                jnp.float64(1.0), jnp.float64(0.03),
                                jnp.float64(0.0), jnp.float64(0.2),
                                jnp.asarray(True))["vega"])
        assert abs(g["vega"] - ref) < 4.0 * g["vega_stderr"] + 1e-6

    @pytest.mark.parametrize("kind,avg,strike", [
        ("call", "arithmetic", "fixed"),
        ("put", "arithmetic", "fixed"),
        ("call", "geometric", "fixed"),
        ("call", "arithmetic", "floating"),
    ])
    def test_asian_vega_matches_crn_bump(self, kind, avg, strike):
        h = 0.01
        kw = dict(KW, average_type=avg, strike_type=strike)
        g = exotic_greeks_mc("asian", 100.0, 100.0, 1.0, 0.03, kind=kind,
                             **kw)
        up, _ = exotic_price_mc("asian", 100.0, 100.0, 1.0, 0.03, kind=kind,
                                **dict(kw, sigma=0.2 + h))
        dn, _ = exotic_price_mc("asian", 100.0, 100.0, 1.0, 0.03, kind=kind,
                                **dict(kw, sigma=0.2 - h))
        fd = (up - dn) / (2.0 * h)
        assert abs(g["vega"] - fd) < 0.02 * max(1.0, abs(fd))

    @pytest.mark.parametrize("kind,strike", [
        ("call", "fixed"), ("put", "fixed"),
        ("call", "floating"), ("put", "floating"),
    ])
    def test_lookback_vega_matches_crn_bump(self, kind, strike):
        h = 0.01
        kw = dict(KW, strike_type=strike)
        g = exotic_greeks_mc("lookback", 100.0, 100.0, 1.0, 0.03, kind=kind,
                             **kw)
        up, _ = exotic_price_mc("lookback", 100.0, 100.0, 1.0, 0.03,
                                kind=kind, **dict(kw, sigma=0.2 + h))
        dn, _ = exotic_price_mc("lookback", 100.0, 100.0, 1.0, 0.03,
                                kind=kind, **dict(kw, sigma=0.2 - h))
        fd = (up - dn) / (2.0 * h)
        assert abs(g["vega"] - fd) < 0.02 * max(1.0, abs(fd))

    def test_vega_stats_guards(self):
        from optpricer_tpu.ops.pallas_path_mc import path_mc_sumstats_pallas

        with pytest.raises(ValueError, match="unknown payoff"):
            exotic_greeks_mc("parisian", 100.0, 100.0, 1.0, 0.03,
                             sigma=0.2)
        with pytest.raises(ValueError, match="GBM"):
            path_mc_sumstats_pallas(
                0, 4096, 16, 100.0, 100.0, 1.0, 0.03, 0.0, 0.2, True,
                payoff="asian", antithetic=True, greek_stats=True,
                heston=dict(v0=0.04, kappa=1.0, theta=0.04, xi=0.3,
                            rho=-0.5), interpret=True)


class TestPathwiseRhoTheta:
    """Rho and theta from the same run: dS_t/dr = S_t·t and
    dS_t/dT = S_t·(ct + σW_t/2)/T, plus the discount terms −T·X / r·X.
    Theta uses the reference sign convention (−dV/dT)."""

    def test_vanilla_matches_bs(self):
        import jax.numpy as jnp

        from optpricer_tpu.ops.black_scholes import greeks_core

        g = exotic_greeks_mc("vanilla", 100.0, 105.0, 1.0, 0.03, 0.01,
                             kind="call", **KW)
        ref = greeks_core(jnp.float64(100.0), jnp.float64(105.0),
                          jnp.float64(1.0), jnp.float64(0.03),
                          jnp.float64(0.01), jnp.float64(0.2),
                          jnp.asarray(True))
        for k in ("rho", "theta"):
            assert abs(g[k] - float(ref[k])) < \
                4.0 * g[k + "_stderr"] + 1e-6, k

    @pytest.mark.parametrize("payoff,kind,kw2", [
        ("asian", "call", {}),
        ("asian", "put", {"average_type": "geometric"}),
        ("asian", "call", {"strike_type": "floating"}),
        ("lookback", "put", {}),
        ("lookback", "call", {"strike_type": "floating"}),
    ])
    def test_rho_theta_match_crn_bumps(self, payoff, kind, kw2):
        kw = dict(KW, **kw2)
        g = exotic_greeks_mc(payoff, 100.0, 100.0, 1.0, 0.03, 0.01,
                             kind=kind, **kw)
        h = 1e-3
        up, _ = exotic_price_mc(payoff, 100.0, 100.0, 1.0, 0.03 + h, 0.01,
                                kind=kind, **kw)
        dn, _ = exotic_price_mc(payoff, 100.0, 100.0, 1.0, 0.03 - h, 0.01,
                                kind=kind, **kw)
        fd_rho = (up - dn) / (2.0 * h)
        assert abs(g["rho"] - fd_rho) < 0.02 * max(1.0, abs(fd_rho))
        up, _ = exotic_price_mc(payoff, 100.0, 100.0, 1.0 + h, 0.03, 0.01,
                                kind=kind, **kw)
        dn, _ = exotic_price_mc(payoff, 100.0, 100.0, 1.0 - h, 0.03, 0.01,
                                kind=kind, **kw)
        fd_theta = -(up - dn) / (2.0 * h)
        assert abs(g["theta"] - fd_theta) < 0.02 * max(1.0, abs(fd_theta))


class TestLikelihoodRatioGreeks:
    """Barrier/digital payoffs are discontinuous, so exotic_greeks_mc
    switches to likelihood-ratio estimators: all four Greeks derive from
    the scores (z₁, W, Q=Σz²). Oracles: AD on the closed-form digital
    price; the vanilla limit (B→∞) of the knock-out barrier."""

    KWLR = dict(sigma=0.2, n_steps=16, n_paths=500_000, seed=3,
                backend="xla", dtype="float64")

    def test_digital_matches_analytic(self):
        import jax
        import jax.numpy as jnp
        from jax.scipy.stats import norm

        def dig_price(S0, K, T, r, q, sigma):
            d2 = (jnp.log(S0 / K) + (r - q - 0.5 * sigma**2) * T) \
                / (sigma * jnp.sqrt(T))
            return jnp.exp(-r * T) * norm.cdf(d2)

        args = (100.0, 105.0, 1.0, 0.03, 0.01, 0.2)
        ana = {"delta": float(jax.grad(dig_price, 0)(*args)),
               "vega": float(jax.grad(dig_price, 5)(*args)),
               "rho": float(jax.grad(dig_price, 3)(*args)),
               "theta": float(-jax.grad(dig_price, 2)(*args))}
        g = exotic_greeks_mc("digital", 100.0, 105.0, 1.0, 0.03, 0.01,
                             kind="call", **self.KWLR)
        for k, ref in ana.items():
            se = g.get(k + "_stderr", g["stderr"])
            assert abs(g[k] - ref) < 4.0 * se + 1e-4, (k, g[k], ref)

    def test_barrier_vanilla_limit(self):
        import jax.numpy as jnp

        from optpricer_tpu.ops.black_scholes import greeks_core

        g = exotic_greeks_mc("barrier", 100.0, 105.0, 1.0, 0.03, 0.01,
                             kind="call", barrier=1e6,
                             barrier_type="up-and-out", **self.KWLR)
        ref = greeks_core(*(jnp.float64(v)
                            for v in (100.0, 105.0, 1.0, 0.03, 0.01, 0.2)),
                          jnp.asarray(True))
        for k in ("delta", "vega", "rho", "theta"):
            se = g.get(k + "_stderr", g["stderr"])
            assert abs(g[k] - float(ref[k])) < 4.0 * se + 1e-3, k

    def test_knockout_delta_sign(self):
        # deep up-and-out call near the barrier: vega negative, delta can
        # flip; the estimator must at least reproduce the CRN price slope
        g = exotic_greeks_mc("barrier", 100.0, 100.0, 1.0, 0.03, 0.0,
                             kind="call", barrier=120.0,
                             barrier_type="up-and-out", **self.KWLR)
        assert g["vega"] < 0.0  # knock-out calls lose value with vol
        h = 1.0
        up, _ = exotic_price_mc("barrier", 101.0, 100.0, 1.0, 0.03, 0.0,
                                kind="call", barrier=120.0,
                                barrier_type="up-and-out", **self.KWLR)
        dn, _ = exotic_price_mc("barrier", 99.0, 100.0, 1.0, 0.03, 0.0,
                                kind="call", barrier=120.0,
                                barrier_type="up-and-out", **self.KWLR)
        fd = (up - dn) / (2.0 * h)
        assert abs(g["delta"] - fd) < 0.1 * max(0.05, abs(fd))

    def test_lr_delta_has_stderr(self):
        g = exotic_greeks_mc("digital", 100.0, 100.0, 1.0, 0.03, 0.0,
                             **self.KWLR)
        assert "delta_stderr" in g and g["delta_stderr"] > 0.0


class TestGamma:
    """Gamma from the same single run: mixed pathwise-LR for continuous
    payoffs (LR applied to the homogeneity delta observable), pure LR for
    barrier/digital. Oracles: analytic BS gamma (vanilla), AD on the
    closed-form digital price, CRN second differences (asian)."""

    def test_vanilla_gamma_matches_bs(self):
        import jax.numpy as jnp

        from optpricer_tpu.ops.black_scholes import greeks_core

        g = exotic_greeks_mc("vanilla", 100.0, 105.0, 1.0, 0.03,
                             kind="call", **KW)
        ref = float(greeks_core(jnp.float64(100.0), jnp.float64(105.0),
                                jnp.float64(1.0), jnp.float64(0.03),
                                jnp.float64(0.0), jnp.float64(0.2),
                                jnp.asarray(True))["gamma"])
        assert abs(g["gamma"] - ref) < 4.0 * g["gamma_stderr"] + 5e-4

    def test_digital_gamma_matches_analytic(self):
        import jax
        import jax.numpy as jnp
        from jax.scipy.stats import norm

        def dig_price(S0):
            K, T, r, q, sigma = 105.0, 1.0, 0.03, 0.01, 0.2
            d2 = (jnp.log(S0 / K) + (r - q - 0.5 * sigma**2) * T) \
                / (sigma * jnp.sqrt(T))
            return jnp.exp(-r * T) * norm.cdf(d2)

        ref = float(jax.grad(jax.grad(dig_price))(100.0))
        g = exotic_greeks_mc(
            "digital", 100.0, 105.0, 1.0, 0.03, 0.01, kind="call",
            sigma=0.2, n_steps=16, n_paths=500_000, seed=3,
            backend="xla", dtype="float64")
        assert abs(g["gamma"] - ref) < 4.0 * g["gamma_stderr"] + 1e-4

    def test_asian_gamma_matches_bump(self):
        h = 2.0
        g = exotic_greeks_mc("asian", 100.0, 100.0, 1.0, 0.03,
                             kind="call", **KW)
        px = {}
        for s0 in (100.0 - h, 100.0, 100.0 + h):
            px[s0], _ = exotic_price_mc("asian", s0, 100.0, 1.0, 0.03,
                                        kind="call", **KW)
        fd = (px[100.0 + h] - 2.0 * px[100.0] + px[100.0 - h]) / (h * h)
        assert abs(g["gamma"] - fd) < 4.0 * g["gamma_stderr"] + 2e-3

    def test_gamma_present_for_all_payoffs(self):
        kw = dict(sigma=0.2, n_steps=8, n_paths=50_000, seed=1,
                  backend="xla", dtype="float64")
        for payoff, extra in (("vanilla", {}), ("asian", {}),
                              ("lookback", {}),
                              ("barrier", {"barrier": 130.0}),
                              ("digital", {})):
            g = exotic_greeks_mc(payoff, 100.0, 100.0, 1.0, 0.03,
                                 **kw, **extra)
            assert np.isfinite(g["gamma"]) and g["gamma_stderr"] >= 0.0


class TestAdGreeksNonGbm:
    """Pathwise-AD Greeks through the fused scan for non-GBM dynamics
    (mc_fused._ad_exotic_greeks): cross-checked against common-random-
    number bump-and-reprice of the same engine."""

    HESTON = dict(v0=0.04, kappa=1.5, theta=0.04, xi=0.4, rho=-0.6)
    KW = dict(kind="call", n_steps=16, n_paths=100_000, seed=3)

    def _bump(self, payoff, extra_price, base, key, lo, hi, **kw):
        def price(**over):
            d = dict(base)
            d.update(over)
            p, _ = exotic_price_mc(payoff, d.pop("S0", 100.0), 100.0, 1.0,
                                   d.pop("r", 0.04), 0.01, backend="xla",
                                   **self.KW, **extra_price, **d)
            return p
        return (price(**{key: hi}) - price(**{key: lo})) / (hi - lo)

    def test_heston_asian_delta_vs_crn_bump(self):
        g = exotic_greeks_mc("asian", 100.0, 100.0, 1.0, 0.04, 0.01,
                             heston=self.HESTON, **self.KW)
        bump = self._bump("asian", {}, dict(heston=self.HESTON),
                          "S0", 99.5, 100.5)
        assert abs(g["delta"] - bump) < 4 * g["delta_stderr"] + 1e-3

    def test_heston_vega_of_v0_vs_crn_bump(self):
        g = exotic_greeks_mc("asian", 100.0, 100.0, 1.0, 0.04, 0.01,
                             heston=self.HESTON, **self.KW)
        h_lo = dict(self.HESTON, v0=0.038)
        h_hi = dict(self.HESTON, v0=0.042)
        def price(h):
            p, _ = exotic_price_mc("asian", 100.0, 100.0, 1.0, 0.04, 0.01,
                                   heston=h, backend="xla", **self.KW)
            return p
        bump = (price(h_hi) - price(h_lo)) / 0.004
        assert abs(g["d_v0"] - bump) < 4 * g["d_v0_stderr"] + 0.5

    def test_heston_rho_vs_crn_bump(self):
        g = exotic_greeks_mc("vanilla", 100.0, 100.0, 1.0, 0.04, 0.01,
                             heston=self.HESTON, **self.KW)
        bump = self._bump("vanilla", {}, dict(heston=self.HESTON),
                          "r", 0.038, 0.042)
        assert abs(g["rho"] - bump) < 4 * g["rho_stderr"] + 0.2

    def test_sabr_vega_alpha0_vs_crn_bump(self):
        sabr = dict(alpha0=0.2, beta=1.0, nu=0.5, rho=-0.3)
        g = exotic_greeks_mc("lookback", 100.0, 100.0, 1.0, 0.04, 0.01,
                             sabr=sabr, strike_type="floating", **self.KW)
        def price(a):
            p, _ = exotic_price_mc(
                "lookback", 100.0, 100.0, 1.0, 0.04, 0.01,
                sabr=dict(sabr, alpha0=a), strike_type="floating",
                backend="xla", **self.KW)
            return p
        bump = (price(0.205) - price(0.195)) / 0.01
        assert abs(g["vega"] - bump) < 4 * g["vega_stderr"] + 0.5

    def test_merton_vega_and_jump_sens(self):
        merton = dict(lam=0.5, mJ=-0.1, sJ=0.15, sigma=0.2)
        g = exotic_greeks_mc("vanilla", 100.0, 100.0, 1.0, 0.04, 0.01,
                             merton=merton, **self.KW)
        for k in ("vega", "d_mJ", "d_sJ", "delta", "rho", "theta"):
            assert np.isfinite(g[k]), k
        def price(s):
            p, _ = exotic_price_mc("vanilla", 100.0, 100.0, 1.0, 0.04, 0.01,
                                   merton=dict(merton, sigma=s),
                                   backend="xla", **self.KW)
            return p
        bump = (price(0.205) - price(0.195)) / 0.01
        assert abs(g["vega"] - bump) < 4 * g["vega_stderr"] + 0.5

    def test_discontinuous_payoff_raises(self):
        with pytest.raises(ValueError, match="continuous"):
            exotic_greeks_mc("barrier", 100.0, 100.0, 1.0, 0.04, 0.01,
                             heston=self.HESTON, barrier=130.0, **self.KW)

    def test_mesh_matches_single_device_design(self, ):
        from optpricer_tpu.parallel import get_mesh

        g1 = exotic_greeks_mc("asian", 100.0, 100.0, 1.0, 0.04, 0.01,
                              heston=self.HESTON, **self.KW)
        g8 = exotic_greeks_mc("asian", 100.0, 100.0, 1.0, 0.04, 0.01,
                              heston=self.HESTON, mesh=get_mesh(8),
                              **self.KW)
        # per-device streams differ → statistical agreement
        for k in ("price", "delta", "d_v0"):
            tol = 5 * np.hypot(g1[f"{k}_stderr" if k != "price"
                                  else "stderr"],
                               g8[f"{k}_stderr" if k != "price"
                                  else "stderr"])
            assert abs(g1[k] - g8[k]) < tol + 1e-6, k


class TestGreekMeshEntry:
    def test_euro_greeks_mc_accepts_mesh(self):
        from optpricer_tpu import OptionSpec
        from optpricer_tpu.models.monte_carlo import euro_greeks_mc
        from optpricer_tpu.parallel import get_mesh

        opt = OptionSpec(S0=100.0, K=100.0, T=1.0, r=0.05, sigma=0.2)
        g = euro_greeks_mc(opt, "call", n_paths=100_000, seed=2,
                           mesh=get_mesh(8))
        # interpreter PRNG is degenerate on CPU — only plumbing/shape here
        assert set(g) >= {"price", "delta", "gamma", "vega", "theta",
                          "rho", "digital"}

    def test_exotic_greeks_mc_gbm_mesh_xla(self):
        from optpricer_tpu.parallel import get_mesh

        g = exotic_greeks_mc("asian", 100.0, 100.0, 1.0, 0.03, kind="call",
                             sigma=0.2, n_steps=16, n_paths=50_000, seed=4,
                             backend="xla", mesh=get_mesh(8))
        g1 = exotic_greeks_mc("asian", 100.0, 100.0, 1.0, 0.03, kind="call",
                              sigma=0.2, n_steps=16, n_paths=50_000, seed=4,
                              backend="xla")
        assert abs(g["delta"] - g1["delta"]) < 0.02
        assert abs(g["vega"] - g1["vega"]) < 5 * (
            g["vega_stderr"] + g1["vega_stderr"]) + 0.05
