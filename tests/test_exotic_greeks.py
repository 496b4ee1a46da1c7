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


def test_discontinuous_payoffs_rejected():
    with pytest.raises(ValueError, match="likelihood-ratio"):
        exotic_greeks_mc("barrier", 100.0, 100.0, 1.0, 0.03, **KW)
    with pytest.raises(ValueError, match="likelihood-ratio"):
        exotic_greeks_mc("digital", 100.0, 100.0, 1.0, 0.03, **KW)


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

        with pytest.raises(ValueError, match="continuous payoff"):
            path_mc_sumstats_pallas(
                0, 4096, 16, 100.0, 100.0, 1.0, 0.03, 0.0, 0.2, True,
                payoff="digital", antithetic=True, greek_stats=True,
                interpret=True)
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
