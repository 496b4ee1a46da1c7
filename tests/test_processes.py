"""Path-generator contracts: shapes, martingale property, scheme equivalence.

Mirrors reference test_milstein.py plus coverage for every generator.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from optpricer_tpu.models.processes import (
    gbm_milstein_paths, gbm_paths, heston_paths, local_vol_paths,
    merton_jump_paths, milstein_local_vol_paths, sabr_paths,
)

S0, R, Q, SIG, T = 100.0, 0.05, 0.01, 0.2, 1.0


class TestShapes:
    def test_gbm_shape_antithetic(self):
        p = gbm_paths(S0, R, Q, SIG, T, 50, 1000, antithetic=True, seed=1)
        assert p.shape == (51, 2000)

    def test_gbm_shape_plain(self):
        p = gbm_paths(S0, R, Q, SIG, T, 50, 1000, antithetic=False, seed=1)
        assert p.shape == (51, 1000)

    def test_t0_row_is_S0(self):
        for gen in (gbm_paths, gbm_milstein_paths):
            p = gen(S0, R, Q, SIG, T, 10, 100, seed=2)
            np.testing.assert_allclose(np.asarray(p[0]), S0)

    def test_milstein_shape(self):
        p = gbm_milstein_paths(S0, R, Q, SIG, T, 50, 500, antithetic=True,
                               seed=3)
        assert p.shape == (51, 1000)

    def test_validation_errors(self):
        with pytest.raises(ValueError):
            gbm_paths(S0, R, Q, SIG, T, 0, 100)
        with pytest.raises(ValueError):
            heston_paths(S0, R, Q, 0.04, 1.0, 0.04, 0.3, -2.0, T, 10, 10)
        with pytest.raises(ValueError):
            sabr_paths(S0, R, Q, 0.2, 1.5, 0.3, 0.0, T, 10, 10)


class TestMartingale:
    """E[S_T] = S0·e^{(r−q)T} under Q for every scheme."""

    def _check(self, paths, tol=0.01):
        ST = np.asarray(paths[-1])
        expected = S0 * np.exp((R - Q) * T)
        assert abs(ST.mean() - expected) / expected < tol

    def test_gbm(self):
        self._check(gbm_paths(S0, R, Q, SIG, T, 100, 50_000, seed=42))

    def test_milstein(self):
        self._check(gbm_milstein_paths(S0, R, Q, SIG, T, 200, 50_000, seed=42))

    def test_merton(self):
        self._check(merton_jump_paths(S0, R, Q, SIG, T, 100, 50_000,
                                      lam=0.5, mJ=-0.05, sJ=0.1, seed=42),
                    tol=0.015)

    def test_heston(self):
        self._check(heston_paths(S0, R, Q, 0.04, 1.5, 0.04, 0.3, -0.5, T,
                                 200, 50_000, seed=42), tol=0.015)

    def test_sabr_beta1(self):
        # pre-update-σ ordering keeps the forward exact even at ρ≠0 (the
        # reference's σ-first ordering would fail this at tol=0.01: its
        # bias is e^{ρανT} ≈ −1.8% here)
        self._check(sabr_paths(S0, R, Q, 0.2, 1.0, 0.3, -0.3, T, 200,
                               50_000, seed=42), tol=0.01)

    def test_local_vol_const(self):
        sigma_fn = lambda S, t: 0.2 * jnp.ones_like(S)
        self._check(local_vol_paths(S0, R, Q, T, 100, 50_000, sigma_fn,
                                    seed=42))

    def test_milstein_local_vol_const(self):
        sigma_fn = lambda S, t: 0.2 * jnp.ones_like(S)
        self._check(milstein_local_vol_paths(S0, R, Q, T, 200, 50_000,
                                             sigma_fn, seed=42))


class TestSchemeEquivalence:
    def test_milstein_close_to_exact_gbm_distribution(self):
        """Constant-σ Milstein ≈ exact GBM in terminal distribution."""
        p_m = gbm_milstein_paths(S0, R, Q, SIG, T, 500, 20_000, seed=9)
        p_e = gbm_paths(S0, R, Q, SIG, T, 500, 20_000, seed=9)
        m1, m2 = float(jnp.mean(p_m[-1])), float(jnp.mean(p_e[-1]))
        s1, s2 = float(jnp.std(p_m[-1])), float(jnp.std(p_e[-1]))
        assert abs(m1 - m2) / m2 < 0.01
        assert abs(s1 - s2) / s2 < 0.03

    def test_local_vol_const_matches_gbm_scheme(self):
        """σ(S,t)=const local-vol engine collapses to GBM exactly (same
        draws, same scheme)."""
        sigma_fn = lambda S, t: SIG * jnp.ones_like(S)
        p_lv = local_vol_paths(S0, R, Q, T, 50, 2_000, sigma_fn, seed=5)
        # statistical comparison (different key stream structure)
        p_g = gbm_paths(S0, R, Q, SIG, T, 50, 2_000, seed=5)
        assert abs(float(jnp.mean(jnp.log(p_lv[-1]))) -
                   float(jnp.mean(jnp.log(p_g[-1])))) < 0.02


class TestHeston:
    def test_return_variance(self):
        S, v = heston_paths(S0, R, Q, 0.04, 1.5, 0.04, 0.3, -0.5, T, 50,
                            1000, seed=4, return_variance=True)
        assert S.shape == v.shape == (51, 2000)
        assert bool(jnp.all(v >= 0))

    def test_variance_mean_reverts(self):
        _, v = heston_paths(S0, R, Q, 0.25, 3.0, 0.04, 0.2, 0.0, 2.0, 200,
                            20_000, seed=6, return_variance=True)
        # long-run mean ≈ theta
        assert abs(float(jnp.mean(v[-1])) - 0.04) < 0.02


class TestAntitheticPairing:
    def test_gbm_columns_mirror(self):
        p = gbm_paths(S0, R, Q, SIG, T, 10, 100, antithetic=True, seed=8)
        logs = jnp.log(np.asarray(p) / S0)
        n = 100
        drift = (R - Q - 0.5 * SIG**2) * T / 10
        # increments of col i and col n+i sum to 2·drift each step
        inc = jnp.diff(jnp.asarray(logs), axis=0)
        np.testing.assert_allclose(
            np.asarray(inc[:, :n] + inc[:, n:]), 2 * drift, atol=1e-9)


class TestHestonQE:
    """Andersen quadratic-exponential Heston scheme (scheme="qe") —
    the coarse-step answer to full-truncation Euler's O(Δt) bias.
    Oracle: the COS transform; book chosen to VIOLATE Feller
    (2κθ/ξ² ≈ 0.5) where the Euler bias is largest."""

    HP = dict(v0=0.04, kappa=1.5, theta=0.04, xi=0.5, rho=-0.6)

    def _put(self, scheme, n_steps, n_paths=200_000, seed=2):
        from optpricer_tpu.models.processes import heston_paths

        S = heston_paths(100.0, 0.05, 0.0, self.HP["v0"], self.HP["kappa"],
                         self.HP["theta"], self.HP["xi"], self.HP["rho"],
                         1.0, n_steps, n_paths, seed=seed, scheme=scheme)
        ST = np.asarray(S[-1], np.float64)
        pay = np.exp(-0.05) * np.maximum(110.0 - ST, 0.0)
        return pay.mean(), pay.std() / np.sqrt(ST.size)

    def test_qe_unbiased_at_coarse_steps(self):
        from optpricer_tpu import heston_price_cos

        ref = float(heston_price_cos(100.0, 110.0, 1.0, 0.05, 0.0,
                                     **self.HP, kind="put"))
        px, se = self._put("qe", 12)
        assert abs(px - ref) < 4 * se + 0.01, (px, ref)

    def test_euler_bias_documented(self):
        # the failure mode QE exists to fix: Euler at 50 steps is
        # >10 sigma biased on this book (measured +0.20)
        from optpricer_tpu import heston_price_cos

        ref = float(heston_price_cos(100.0, 110.0, 1.0, 0.05, 0.0,
                                     **self.HP, kind="put"))
        px_e, se_e = self._put("euler", 50)
        px_q, se_q = self._put("qe", 50)
        assert px_e - ref > 0.1          # Euler bias is real and large
        assert abs(px_q - ref) < 4 * se_q + 0.02

    def test_martingale_and_shape(self):
        from optpricer_tpu.models.processes import heston_paths

        S, v = heston_paths(100.0, 0.05, 0.01, 0.04, 1.5, 0.04, 0.5, -0.6,
                            1.0, 24, 50_000, seed=3, scheme="qe",
                            return_variance=True)
        assert S.shape == (25, 100_000) and v.shape == (25, 100_000)
        ST = np.asarray(S[-1], np.float64)
        fwd = ST.mean() * np.exp(-0.05)
        assert abs(fwd - 100.0 * np.exp(-0.01)) \
            < 4 * ST.std() / np.sqrt(ST.size)
        assert np.all(np.asarray(v) >= 0.0)

    def test_degenerate_xi_is_deterministic_variance(self):
        # xi -> 0 with v0 = theta: v stays at v0, S is plain GBM
        from optpricer_tpu import bs_price_vec
        from optpricer_tpu.models.processes import heston_paths

        S = heston_paths(100.0, 0.03, 0.0, 0.04, 1.5, 0.04, 1e-8, 0.0,
                         1.0, 16, 100_000, seed=5, scheme="qe")
        ST = np.asarray(S[-1], np.float64)
        pay = np.exp(-0.03) * np.maximum(ST - 100.0, 0.0)
        ref = float(np.asarray(bs_price_vec(
            100.0, 100.0, 1.0, 0.03, 0.0, 0.2, "call", dtype="float64")))
        assert abs(pay.mean() - ref) < 4 * pay.std() / np.sqrt(ST.size)

    def test_scheme_guard(self):
        from optpricer_tpu.models.processes import heston_paths

        with pytest.raises(ValueError, match="scheme"):
            heston_paths(100.0, 0.03, 0.0, 0.04, 1.5, 0.04, 0.5, -0.6,
                         1.0, 16, 100, scheme="milstein")
