"""Bivariate normal CDF (ops/bvn.py) and the closed forms built on it:
chooser, Geske compound, Stulz two-asset rainbow.

Oracles: scipy's multivariate normal CDF for Φ₂ itself; exact-GBM MC
with a Black-Scholes t₁ readout for the two-timescale products (the
readout makes the oracle exact up to terminal MC noise — no nested
simulation); put-call parity / Margrabe identities for the rainbow.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from optpricer_tpu import (bvn_cdf, chooser_price, compound_price,
                           rainbow_price_stulz, margrabe_price, bs_price,
                           OptionSpec)
from optpricer_tpu.ops.black_scholes import price_core


class TestBvnCdf:
    def test_vs_scipy_dense_grid(self):
        from scipy.stats import multivariate_normal

        hs = np.array([-8.0, -3.0, -1.0, -0.3, 0.0, 0.4, 1.2, 3.0, 8.0])
        rhos = np.array([-0.999, -0.95, -0.925, -0.9, -0.5, 0.0, 0.3,
                         0.7, 0.925, 0.99, 0.9999])
        H, K = np.meshgrid(hs, hs)
        for r in rhos:
            ours = np.asarray(bvn_cdf(H, K, np.full_like(H, r)))
            mvn = multivariate_normal(mean=[0, 0],
                                      cov=[[1, r], [r, 1]])
            for i in range(len(hs)):
                for j in range(len(hs)):
                    ref = mvn.cdf([H[i, j], K[i, j]])
                    assert abs(ours[i, j] - ref) < 5e-9, (
                        H[i, j], K[i, j], r)

    def test_degenerate_limits(self):
        # ρ = 0 factorises; ρ → 1 gives Φ(min); ρ → −1 gives the band
        from jax.scipy.stats import norm

        h, k = 0.7, -0.4
        assert float(bvn_cdf(h, k, 0.0)) == pytest.approx(
            float(norm.cdf(h) * norm.cdf(k)), abs=1e-12)
        assert float(bvn_cdf(h, k, 1.0)) == pytest.approx(
            float(norm.cdf(min(h, k))), abs=1e-9)
        assert float(bvn_cdf(h, k, -1.0)) == pytest.approx(
            max(0.0, float(norm.cdf(h) + norm.cdf(k) - 1.0)), abs=1e-9)

    def test_differentiable(self):
        g = jax.grad(lambda h: bvn_cdf(h, 0.3, 0.8))(0.5)
        # ∂Φ₂/∂h = φ(h)·Φ((k−ρh)/√(1−ρ²))
        from jax.scipy.stats import norm

        ref = float(norm.pdf(0.5)
                    * norm.cdf((0.3 - 0.8 * 0.5) / np.sqrt(1 - 0.64)))
        assert float(g) == pytest.approx(ref, rel=1e-6)


def _gbm_t1_readout(S0, r, q, sigma, t1, n, seed):
    """Exact-GBM spot draws at t1 (antithetic)."""
    z = jax.random.normal(jax.random.key(seed), (n // 2,), jnp.float64)
    z = jnp.concatenate([z, -z])
    return S0 * jnp.exp((r - q - 0.5 * sigma**2) * t1
                        + sigma * np.sqrt(t1) * z)


class TestChooser:
    S0, K, T, r, q, sig, t1 = 100.0, 100.0, 1.0, 0.05, 0.02, 0.25, 0.4

    def test_vs_mc_bs_readout(self):
        S1 = _gbm_t1_readout(self.S0, self.r, self.q, self.sig, self.t1,
                             1_000_000, 0)
        tau = self.T - self.t1
        C = price_core(S1, self.K, tau, self.r, self.q, self.sig,
                       jnp.asarray(True))
        P = price_core(S1, self.K, tau, self.r, self.q, self.sig,
                       jnp.asarray(False))
        pay = jnp.maximum(C, P)
        mc = float(np.exp(-self.r * self.t1) * pay.mean())
        se = float(np.exp(-self.r * self.t1) * pay.std()
                   / np.sqrt(pay.shape[0]))
        cf = chooser_price(self.S0, self.K, self.T, self.r, self.q,
                           sigma=self.sig, t_choose=self.t1)
        assert abs(cf - mc) < 4 * se + 2e-3

    def test_t_choose_at_maturity_is_straddle(self):
        opt = OptionSpec(S0=self.S0, K=self.K, T=self.T, r=self.r,
                         q=self.q, sigma=self.sig)
        straddle = bs_price(opt, "call") + bs_price(opt, "put")
        cf = chooser_price(self.S0, self.K, self.T, self.r, self.q,
                           sigma=self.sig, t_choose=self.T)
        assert cf == pytest.approx(straddle, rel=1e-6)

    def test_bounds_and_monotonicity(self):
        # chooser ≥ max(call, put); increasing in t_choose
        opt = OptionSpec(S0=self.S0, K=self.K, T=self.T, r=self.r,
                         q=self.q, sigma=self.sig)
        c = bs_price(opt, "call")
        p = bs_price(opt, "put")
        vals = [chooser_price(self.S0, self.K, self.T, self.r, self.q,
                              sigma=self.sig, t_choose=t)
                for t in (0.1, 0.4, 0.7, 1.0)]
        assert vals[0] > max(c, p)
        assert np.all(np.diff(vals) > 0)

    def test_invalid_t_choose_raises(self):
        with pytest.raises(ValueError, match="t_choose"):
            chooser_price(100.0, 100.0, 1.0, 0.05, sigma=0.2,
                          t_choose=1.5)


class TestCompound:
    S0, K1, K2, t1, T2 = 100.0, 6.0, 100.0, 0.5, 1.0
    r, q, sig = 0.05, 0.02, 0.25

    @pytest.mark.parametrize("kind", ["call", "put"])
    @pytest.mark.parametrize("underlying", ["call", "put"])
    def test_vs_mc_bs_readout(self, kind, underlying):
        S1 = _gbm_t1_readout(self.S0, self.r, self.q, self.sig, self.t1,
                             1_000_000, 1)
        U = price_core(S1, self.K2, self.T2 - self.t1, self.r, self.q,
                       self.sig, jnp.asarray(underlying == "call"))
        sign = 1.0 if kind == "call" else -1.0
        pay = jnp.maximum(sign * (U - self.K1), 0.0)
        mc = float(np.exp(-self.r * self.t1) * pay.mean())
        se = float(np.exp(-self.r * self.t1) * pay.std()
                   / np.sqrt(pay.shape[0]))
        cf = compound_price(self.S0, self.K1, self.K2, self.t1, self.T2,
                            self.r, self.q, sigma=self.sig, kind=kind,
                            underlying=underlying)
        assert abs(cf - mc) < 4 * se + 2e-3, (kind, underlying, cf, mc)

    def test_compound_parity(self):
        # call-on-X − put-on-X = PV of (X's forward value − K1) read at
        # t1: C − P = X_0 − K1·e^{−r·t1} with X_0 today's value of the
        # underlying option (its value process is a df-martingale)
        for und in ("call", "put"):
            c = compound_price(self.S0, self.K1, self.K2, self.t1,
                               self.T2, self.r, self.q, sigma=self.sig,
                               kind="call", underlying=und)
            p = compound_price(self.S0, self.K1, self.K2, self.t1,
                               self.T2, self.r, self.q, sigma=self.sig,
                               kind="put", underlying=und)
            opt = OptionSpec(S0=self.S0, K=self.K2, T=self.T2, r=self.r,
                             q=self.q, sigma=self.sig)
            x0 = bs_price(opt, und)
            assert c - p == pytest.approx(
                x0 - self.K1 * np.exp(-self.r * self.t1), abs=5e-6)

    def test_invalid_args_raise(self):
        with pytest.raises(ValueError, match="t1"):
            compound_price(100.0, 5.0, 100.0, 1.0, 0.5, 0.05, sigma=0.2)
        with pytest.raises(ValueError, match="kind"):
            compound_price(100.0, 5.0, 100.0, 0.5, 1.0, 0.05, sigma=0.2,
                           kind="straddle")


class TestRainbowStulz:
    S1, S2, K, T, r, q1, q2 = 100.0, 95.0, 100.0, 1.0, 0.05, 0.01, 0.03
    s1, s2, rho = 0.25, 0.35, 0.4

    def _terminal(self, n, seed):
        z = jax.random.normal(jax.random.key(seed), (n // 2, 2),
                              jnp.float64)
        z = jnp.concatenate([z, -z])
        L = np.linalg.cholesky([[1.0, self.rho], [self.rho, 1.0]])
        x = z @ L.T
        ST1 = self.S1 * np.exp((self.r - self.q1 - self.s1**2 / 2)
                               * self.T
                               + self.s1 * np.sqrt(self.T) * x[:, 0])
        ST2 = self.S2 * np.exp((self.r - self.q2 - self.s2**2 / 2)
                               * self.T
                               + self.s2 * np.sqrt(self.T) * x[:, 1])
        return ST1, ST2

    @pytest.mark.parametrize("kind", ["call", "put"])
    @pytest.mark.parametrize("mode", ["min", "max"])
    def test_vs_mc(self, kind, mode):
        ST1, ST2 = self._terminal(1_000_000, 2)
        M = jnp.minimum(ST1, ST2) if mode == "min" \
            else jnp.maximum(ST1, ST2)
        sign = 1.0 if kind == "call" else -1.0
        pay = jnp.maximum(sign * (M - self.K), 0.0)
        df = np.exp(-self.r * self.T)
        mc = float(df * pay.mean())
        se = float(df * pay.std() / np.sqrt(pay.shape[0]))
        cf = rainbow_price_stulz(self.S1, self.S2, self.K, self.T,
                                 self.r, self.q1, self.q2,
                                 sigma1=self.s1, sigma2=self.s2,
                                 rho=self.rho, kind=kind, mode=mode)
        assert abs(cf - mc) < 4 * se + 5e-3, (kind, mode, cf, mc)

    def test_margrabe_identity(self):
        # exchange option = hold S1, give up min: S1·e^{−q1T} − C_min(0)
        cmin0 = rainbow_price_stulz(self.S1, self.S2, 0.0, self.T,
                                    self.r, self.q1, self.q2,
                                    sigma1=self.s1, sigma2=self.s2,
                                    rho=self.rho, kind="call",
                                    mode="min")
        mg = float(margrabe_price(self.S1, self.S2, self.T, self.q1,
                                  self.q2, sigma1=self.s1,
                                  sigma2=self.s2, rho=self.rho))
        assert self.S1 * np.exp(-self.q1 * self.T) - cmin0 \
            == pytest.approx(mg, abs=1e-8)

    def test_min_max_sum_identity(self):
        # C_min + C_max = C(S1) + C(S2), any strike
        kw = dict(sigma1=self.s1, sigma2=self.s2, rho=self.rho,
                  kind="call")
        cmin = rainbow_price_stulz(self.S1, self.S2, self.K, self.T,
                                   self.r, self.q1, self.q2, mode="min",
                                   **kw)
        cmax = rainbow_price_stulz(self.S1, self.S2, self.K, self.T,
                                   self.r, self.q1, self.q2, mode="max",
                                   **kw)
        c1 = bs_price(OptionSpec(S0=self.S1, K=self.K, T=self.T,
                                 r=self.r, q=self.q1, sigma=self.s1),
                      "call")
        c2 = bs_price(OptionSpec(S0=self.S2, K=self.K, T=self.T,
                                 r=self.r, q=self.q2, sigma=self.s2),
                      "call")
        assert cmin + cmax == pytest.approx(c1 + c2, rel=1e-9)
