"""Multi-asset engine (models/basket.py): correlated-GBM baskets, spreads,
rainbows, with exact geometric-basket and Margrabe oracles."""
import numpy as np
import pytest

import jax

from optpricer_tpu import (basket_price_mc, bs_price_vec,
                           geometric_basket_price, margrabe_price)

CORR2 = np.array([[1.0, 0.5], [0.5, 1.0]])
KW2 = dict(sigmas=[0.2, 0.3], corr=CORR2, seed=0, dtype="float64")


class TestGeometricBasket:
    def test_one_asset_is_bs(self):
        g = float(geometric_basket_price([100.0], [1.0], 105.0, 1.0, 0.05,
                                         [0.01], [0.2], np.eye(1)))
        bs = float(bs_price_vec(100.0, 105.0, 1.0, 0.05, 0.01, 0.2, "call",
                                dtype="float64"))
        assert g == pytest.approx(bs, abs=1e-10)

    def test_perfect_correlation_identical_assets_is_bs(self):
        # two identical, perfectly correlated assets ≡ one asset
        corr = np.ones((2, 2))
        g = float(geometric_basket_price([100.0, 100.0], [0.5, 0.5], 100.0,
                                         1.0, 0.05, [0.0, 0.0], [0.2, 0.2],
                                         corr))
        bs = float(bs_price_vec(100.0, 100.0, 1.0, 0.05, 0.0, 0.2, "call",
                                dtype="float64"))
        assert g == pytest.approx(bs, abs=1e-10)

    def test_put_call_parity(self):
        args = ([100.0, 95.0], [0.6, 0.4], 90.0, 1.0, 0.03,
                [0.01, 0.02], [0.2, 0.3], CORR2)
        c = float(geometric_basket_price(*args, kind="call"))
        p = float(geometric_basket_price(*args, kind="put"))
        # forward of G from the same lognormal moments
        w = np.array([0.6, 0.4])
        mu = np.sum(w * (np.log([100.0, 95.0])
                         + (0.03 - np.array([0.01, 0.02])
                            - 0.5 * np.array([0.2, 0.3]) ** 2)))
        cov = np.outer([0.2, 0.3], [0.2, 0.3]) * CORR2
        F = np.exp(mu + 0.5 * w @ cov @ w)
        assert c - p == pytest.approx(np.exp(-0.03) * (F - 90.0), abs=1e-9)


class TestMargrabe:
    def test_rate_invariance(self):
        # the exchange option does not depend on r — MC at two rates agrees
        m = float(margrabe_price(100.0, 95.0, 1.0, 0.01, 0.02, sigma1=0.2,
                                 sigma2=0.3, rho=0.5))
        for r in (0.0, 0.08):
            p, se = basket_price_mc(
                [100.0, 95.0], [1.0, -1.0], 0.0, 1.0, r, qs=[0.01, 0.02],
                payoff="spread", n_paths=1 << 20, **KW2)
            assert abs(p - m) < 4.0 * se

    def test_zero_vol_is_forward_spread(self):
        m = float(margrabe_price(100.0, 90.0, 1.0, sigma1=1e-9,
                                 sigma2=1e-9, rho=0.0))
        assert m == pytest.approx(10.0, abs=1e-6)


class TestBasketMC:
    def test_geo_cv_unbiased_and_tighter(self):
        kw = dict(KW2, n_paths=1 << 18)
        p1, se1 = basket_price_mc([100.0, 95.0], [0.6, 0.4], 100.0, 1.0,
                                  0.03, **kw)
        p0, se0 = basket_price_mc([100.0, 95.0], [0.6, 0.4], 100.0, 1.0,
                                  0.03, control_variate=False, **kw)
        assert se1 < se0 / 5.0
        assert abs(p1 - p0) < 4.0 * (se0 + se1)

    def test_sampler_prices_geometric_exactly(self):
        # CV sanity from the other side: the geometric payoff's own MC
        # (X = Y) must hit the closed form to within stderr
        ref = float(geometric_basket_price([100.0, 95.0], [0.6, 0.4],
                                           100.0, 1.0, 0.03, [0.0, 0.0],
                                           [0.2, 0.3], CORR2))
        # arithmetic ≥ geometric (AM-GM under positive weights)
        p, se = basket_price_mc([100.0, 95.0], [0.6, 0.4], 100.0, 1.0,
                                0.03, **KW2)
        assert p > ref - 4.0 * se

    def test_rainbow_ordering(self):
        kw = dict(sigmas=[0.2, 0.2], corr=CORR2, seed=2, dtype="float64")
        mx, _ = basket_price_mc([100.0, 100.0], [0.5, 0.5], 100.0, 1.0,
                                0.03, payoff="rainbow_max", **kw)
        mn, _ = basket_price_mc([100.0, 100.0], [0.5, 0.5], 100.0, 1.0,
                                0.03, payoff="rainbow_min", **kw)
        van = float(bs_price_vec(100.0, 100.0, 1.0, 0.03, 0.0, 0.2, "call",
                                 dtype="float64"))
        assert mx > van > mn > 0.0

    def test_correlation_lowers_rainbow_max(self):
        lo = basket_price_mc([100.0, 100.0], [0.5, 0.5], 100.0, 1.0, 0.03,
                             sigmas=[0.2, 0.2],
                             corr=np.array([[1.0, 0.1], [0.1, 1.0]]),
                             payoff="rainbow_max", seed=3,
                             dtype="float64")[0]
        hi = basket_price_mc([100.0, 100.0], [0.5, 0.5], 100.0, 1.0, 0.03,
                             sigmas=[0.2, 0.2],
                             corr=np.array([[1.0, 0.9], [0.9, 1.0]]),
                             payoff="rainbow_max", seed=3,
                             dtype="float64")[0]
        assert lo > hi  # dispersion is what best-of options buy

    def test_mesh_matches_single_device(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device harness")
        from optpricer_tpu.parallel.mesh import get_mesh

        kw = dict(KW2, n_paths=1 << 17)
        p1, se1 = basket_price_mc([100.0, 95.0], [0.6, 0.4], 100.0, 1.0,
                                  0.03, **kw)
        pm, sem = basket_price_mc([100.0, 95.0], [0.6, 0.4], 100.0, 1.0,
                                  0.03, mesh=get_mesh(8), **kw)
        assert abs(pm - p1) < 4.0 * (se1 + sem) and sem < 0.01

    def test_ad_delta(self):
        # the geometric closed form is differentiable: basket vega/delta
        # via jax.grad as a cheap model-risk check
        g = jax.grad(lambda s: geometric_basket_price(
            [s, 95.0], [0.6, 0.4], 100.0, 1.0, 0.03, [0.0, 0.0],
            [0.2, 0.3], CORR2))(100.0)
        assert 0.0 < float(g) < 0.6

    def test_validation(self):
        with pytest.raises(ValueError, match="weights"):
            basket_price_mc([100.0, 95.0], [0.8, 0.4], 100.0, 1.0, 0.03,
                            **KW2)
        with pytest.raises(ValueError, match="payoff"):
            basket_price_mc([100.0], [1.0], 100.0, 1.0, 0.03,
                            sigmas=[0.2], corr=np.eye(1), payoff="himalaya")
        with pytest.raises(np.linalg.LinAlgError):
            bad = np.array([[1.0, 2.0], [2.0, 1.0]])  # not PSD
            basket_price_mc([100.0, 95.0], [0.6, 0.4], 100.0, 1.0, 0.03,
                            sigmas=[0.2, 0.3], corr=bad)


class TestBasketGreeks:
    def test_one_asset_limit_matches_bs(self):
        import jax.numpy as jnp

        from optpricer_tpu import basket_greeks_mc
        from optpricer_tpu.ops.black_scholes import greeks_core

        g = basket_greeks_mc([100.0], [1.0], 105.0, 1.0, 0.05,
                             sigmas=[0.2], corr=np.eye(1), seed=0,
                             n_paths=1 << 19, dtype="float64")
        ref = greeks_core(*(jnp.float64(v)
                            for v in (100.0, 105.0, 1.0, 0.05, 0.0, 0.2)),
                          jnp.asarray(True))
        assert abs(g["delta"][0] - float(ref["delta"])) \
            < 4.0 * g["delta_stderr"][0] + 1e-5
        assert abs(g["vega"][0] - float(ref["vega"])) \
            < 4.0 * g["vega_stderr"][0] + 1e-4

    @pytest.mark.parametrize("payoff", ["basket", "rainbow_max"])
    def test_matches_crn_bump(self, payoff):
        from optpricer_tpu import basket_greeks_mc

        kw = dict(sigmas=[0.2, 0.3], corr=CORR2, seed=4,
                  n_paths=1 << 18, dtype="float64", payoff=payoff,
                  control_variate=False)
        gkw = {k: v for k, v in kw.items() if k != "control_variate"}
        g = basket_greeks_mc([100.0, 95.0], [0.6, 0.4], 100.0, 1.0, 0.03,
                             **gkw)
        h = 0.5
        for i in range(2):
            s_up = [100.0, 95.0]
            s_dn = [100.0, 95.0]
            s_up[i] += h
            s_dn[i] -= h
            up, _ = basket_price_mc(s_up, [0.6, 0.4], 100.0, 1.0, 0.03,
                                    **kw)
            dn, _ = basket_price_mc(s_dn, [0.6, 0.4], 100.0, 1.0, 0.03,
                                    **kw)
            fd = (up - dn) / (2.0 * h)
            assert abs(g["delta"][i] - fd) < 3e-3, (payoff, i)

    def test_spread_deltas_have_opposite_signs(self):
        from optpricer_tpu import basket_greeks_mc

        g = basket_greeks_mc([100.0, 95.0], [1.0, -1.0], 0.0, 1.0, 0.03,
                             sigmas=[0.2, 0.3], corr=CORR2,
                             payoff="spread", seed=5, dtype="float64")
        assert g["delta"][0] > 0.0 > g["delta"][1]

    def test_rainbow_deltas_sum_near_max_delta(self):
        from optpricer_tpu import basket_greeks_mc

        # best-of on identical assets: symmetry ⇒ equal per-asset deltas
        g = basket_greeks_mc([100.0, 100.0], [0.5, 0.5], 100.0, 1.0, 0.03,
                             sigmas=[0.2, 0.2], corr=CORR2,
                             payoff="rainbow_max", seed=6, dtype="float64")
        assert abs(g["delta"][0] - g["delta"][1]) \
            < 6.0 * (g["delta_stderr"][0] + g["delta_stderr"][1])


class TestBasketExotic:
    """Path-dependent multi-asset engine (basket_exotic_mc): 1-asset
    limits reduce exactly to the single-asset engine's semantics, the
    multi-asset case matches an independent path-matrix oracle, and the
    mesh run agrees statistically."""

    CORR = np.array([[1.0, 0.5, 0.3], [0.5, 1.0, 0.4], [0.3, 0.4, 1.0]])
    SIG = np.array([0.2, 0.3, 0.25])
    S0 = np.array([100.0, 95.0, 105.0])
    W = np.array([0.4, 0.3, 0.3])

    def test_one_asset_limit_asian(self):
        from optpricer_tpu import basket_exotic_mc, exotic_price_mc

        kw = dict(n_steps=16, n_paths=200_000, seed=5)
        p_b, se_b = basket_exotic_mc([100.0], [1.0], 100.0, 1.0, 0.04,
                                     sigmas=[0.2], corr=[[1.0]],
                                     payoff="asian_basket", **kw)
        p_s, se_s = exotic_price_mc("asian", 100.0, 100.0, 1.0, 0.04,
                                    sigma=0.2, backend="xla",
                                    dtype="float64", **kw)
        assert abs(p_b - p_s) < 5 * np.hypot(se_b, se_s)

    @pytest.mark.parametrize("btype", ["up-and-out", "down-and-in"])
    def test_one_asset_limit_barrier(self, btype):
        from optpricer_tpu import basket_exotic_mc, exotic_price_mc

        barrier = 130.0 if btype.startswith("up") else 80.0
        kw = dict(n_steps=16, n_paths=200_000, seed=5)
        p_b, se_b = basket_exotic_mc([100.0], [1.0], 100.0, 1.0, 0.04,
                                     sigmas=[0.2], corr=[[1.0]],
                                     payoff="worstof_barrier",
                                     barrier=barrier, barrier_type=btype,
                                     **kw)
        p_s, se_s = exotic_price_mc("barrier", 100.0, 100.0, 1.0, 0.04,
                                    sigma=0.2, barrier=barrier,
                                    barrier_type=btype, backend="xla",
                                    dtype="float64", **kw)
        assert abs(p_b - p_s) < 5 * np.hypot(se_b, se_s) + 1e-3

    def test_asian_basket_vs_path_matrix_oracle(self):
        from optpricer_tpu import basket_exotic_mc

        rng = np.random.default_rng(0)
        n, m, r, T = 200_000, 16, 0.03, 1.0
        L = np.linalg.cholesky(self.CORR)
        dt = T / m
        z = rng.standard_normal((m, n, 3)) @ L.T
        logS = np.log(self.S0) + np.cumsum(
            (r - 0.5 * self.SIG**2) * dt
            + self.SIG * np.sqrt(dt) * z, axis=0)
        B = np.exp(logS) @ self.W
        pay = np.maximum(B.mean(axis=0) - 100.0, 0.0)
        oracle = np.exp(-r * T) * pay.mean()
        ose = np.exp(-r * T) * pay.std() / np.sqrt(n)
        p, se = basket_exotic_mc(self.S0, self.W, 100.0, T, r,
                                 sigmas=self.SIG, corr=self.CORR,
                                 payoff="asian_basket", n_steps=m,
                                 n_paths=n, seed=9)
        assert abs(p - oracle) < 5 * np.hypot(se, ose)

    def test_worstof_knockin_knockout_parity(self):
        # in + out = unconditional terminal worst-of vanilla
        from optpricer_tpu import basket_exotic_mc

        kw = dict(sigmas=self.SIG, corr=self.CORR, n_steps=16,
                  n_paths=100_000, control_variate=False)
        p_in, se_i = basket_exotic_mc(self.S0, self.W, 90.0, 1.0, 0.03,
                                      payoff="worstof_barrier", kind="put",
                                      barrier=80.0,
                                      barrier_type="down-and-in", seed=3,
                                      **kw)
        p_out, se_o = basket_exotic_mc(self.S0, self.W, 90.0, 1.0, 0.03,
                                       payoff="worstof_barrier",
                                       kind="put", barrier=80.0,
                                       barrier_type="down-and-out", seed=3,
                                       **kw)
        # same seed → same paths → parity is EXACT up to f32 roundoff
        rng = np.random.default_rng(1)
        # unconditional worst-of put oracle via fresh matrix
        n, m, r, T = 200_000, 16, 0.03, 1.0
        L = np.linalg.cholesky(self.CORR)
        dt = T / m
        z = rng.standard_normal((m, n, 3)) @ L.T
        logS = np.log(self.S0) + np.cumsum(
            (r - 0.5 * self.SIG**2) * dt
            + self.SIG * np.sqrt(dt) * z, axis=0)
        worst = np.exp(logS[-1]).min(axis=1)
        pay = np.maximum(90.0 - worst, 0.0)
        oracle = np.exp(-r * T) * pay.mean()
        ose = np.exp(-r * T) * pay.std() / np.sqrt(n)
        assert abs((p_in + p_out) - oracle) < 5 * np.hypot(
            np.hypot(se_i, se_o), ose)

    def test_cv_tightens_asian_basket(self):
        from optpricer_tpu import basket_exotic_mc

        kw = dict(sigmas=self.SIG, corr=self.CORR, n_steps=8,
                  n_paths=50_000, seed=7)
        _, se_cv = basket_exotic_mc(self.S0, self.W, 100.0, 1.0, 0.03,
                                    payoff="asian_basket", **kw)
        _, se_raw = basket_exotic_mc(self.S0, self.W, 100.0, 1.0, 0.03,
                                     payoff="asian_basket",
                                     control_variate=False, **kw)
        assert se_cv < se_raw

    def test_mesh_statistical_agreement(self):
        from optpricer_tpu import basket_exotic_mc
        from optpricer_tpu.parallel import get_mesh

        kw = dict(sigmas=self.SIG, corr=self.CORR, n_steps=16,
                  n_paths=200_000, seed=9, payoff="asian_basket")
        p1, se1 = basket_exotic_mc(self.S0, self.W, 100.0, 1.0, 0.03, **kw)
        p8, se8 = basket_exotic_mc(self.S0, self.W, 100.0, 1.0, 0.03,
                                   mesh=get_mesh(8), **kw)
        assert abs(p8 - p1) < 5 * np.hypot(se1, se8)

    def test_unknown_payoff_raises(self):
        from optpricer_tpu import basket_exotic_mc

        with pytest.raises(ValueError, match="payoff"):
            basket_exotic_mc(self.S0, self.W, 100.0, 1.0, 0.03,
                             sigmas=self.SIG, corr=self.CORR,
                             payoff="nope")


class TestBasketPallasKernel:
    """In-register multi-asset path kernel (ops/pallas_basket_mc.py) vs
    the XLA scan engine — interpret mode on the CPU harness (real draws
    via the software PRNG), real-chip runs in test_pallas_tpu.py."""

    CORR = np.array([[1.0, 0.5, 0.3], [0.5, 1.0, 0.4], [0.3, 0.4, 1.0]])
    SIG = np.array([0.2, 0.3, 0.25])
    S0 = np.array([100.0, 95.0, 105.0])
    W = np.array([0.4, 0.3, 0.3])

    def _price(self, backend, payoff, **extra):
        from optpricer_tpu import basket_exotic_mc

        return basket_exotic_mc(
            self.S0, self.W, 100.0, 1.0, 0.03, sigmas=self.SIG,
            corr=self.CORR, payoff=payoff, n_steps=16, n_paths=1 << 15,
            seed=11, dtype="float32", backend=backend, **extra)

    @pytest.mark.parametrize("payoff,extra", [
        ("asian_basket", {}),
        ("worstof_barrier", dict(barrier=80.0, barrier_type="down-and-out")),
        ("worstof_barrier", dict(barrier=120.0, barrier_type="up-and-in")),
        ("basket_barrier", dict(barrier=115.0, barrier_type="up-and-out",
                                rebate=1.0)),
    ])
    def test_kernel_matches_xla_engine(self, payoff, extra):
        p_x, s_x = self._price("xla", payoff, **extra)
        p_p, s_p = self._price("pallas", payoff, **extra)
        assert s_p > 0.0
        assert abs(p_x - p_p) < 4 * (s_x + s_p) + 2e-3, \
            f"{payoff} {extra}: xla {p_x}±{s_x} vs pallas {p_p}±{s_p}"

    def test_one_asset_limit_matches_single_asset_engine(self):
        from optpricer_tpu import basket_exotic_mc, exotic_price_mc

        p_b, se_b = basket_exotic_mc(
            [100.0], [1.0], 100.0, 1.0, 0.04, sigmas=[0.2], corr=[[1.0]],
            payoff="worstof_barrier", barrier=130.0,
            barrier_type="up-and-out", n_steps=16, n_paths=1 << 15,
            seed=5, dtype="float32", backend="pallas")
        p_s, se_s = exotic_price_mc(
            "barrier", 100.0, 100.0, 1.0, 0.04, sigma=0.2, barrier=130.0,
            barrier_type="up-and-out", backend="xla", dtype="float64",
            n_steps=16, n_paths=200_000, seed=5)
        assert abs(p_b - p_s) < 5 * np.hypot(se_b, se_s) + 1e-3

    def test_in_out_parity(self):
        # knock-in + knock-out (same barrier, zero rebate) = plain payoff
        # on the SAME kernel draws — exact identity per path, so the sums
        # must match to f32 roundoff
        from optpricer_tpu.ops.pallas_basket_mc import \
            basket_path_sumstats_pallas

        chol = np.linalg.cholesky(self.CORR)
        call = (5, 1 << 14, 8, self.S0, self.W, 100.0, 1.0, 0.03,
                None, self.SIG, chol, True)
        kw = dict(payoff="basket_barrier", barrier=115.0, interpret=True)
        s_in = np.asarray(basket_path_sumstats_pallas(
            *call, barrier_type="up-and-in", **kw), np.float64)
        s_out = np.asarray(basket_path_sumstats_pallas(
            *call, barrier_type="up-and-out", **kw), np.float64)
        s_van = np.asarray(basket_path_sumstats_pallas(
            *call, payoff="basket_barrier", barrier=1e12,
            barrier_type="up-and-out", interpret=True), np.float64)
        assert abs((s_in[1] + s_out[1]) - s_van[1]) < 1e-3 * abs(s_van[1])

    def test_sharded_matches_single(self):
        from optpricer_tpu.ops.pallas_basket_mc import (
            basket_path_sumstats_pallas, basket_path_sumstats_pallas_sharded)
        from optpricer_tpu.parallel.mesh import get_mesh

        chol = np.linalg.cholesky(self.CORR)
        call = (7, 100_000, 8, self.S0, self.W, 100.0, 1.0, 0.03,
                None, self.SIG, chol, True)
        ref = np.asarray(basket_path_sumstats_pallas(
            *call, payoff="asian_basket", interpret=True))
        out = np.asarray(basket_path_sumstats_pallas_sharded(
            get_mesh(8), *call, payoff="asian_basket"))
        assert ref[0] == 100_000 and ref[1] != 0.0
        np.testing.assert_allclose(out, ref, rtol=3e-6)

    def test_backend_guards(self):
        from optpricer_tpu import basket_exotic_mc

        a = 20  # beyond the register-resident asset cap
        with pytest.raises(ValueError, match="16 assets"):
            basket_exotic_mc(np.full(a, 100.0), np.full(a, 1 / a), 100.0,
                             1.0, 0.03, sigmas=np.full(a, 0.2),
                             corr=np.eye(a), payoff="asian_basket",
                             dtype="float32", backend="pallas")
        with pytest.raises(ValueError, match="backend"):
            self._price("mxu", "asian_basket")
