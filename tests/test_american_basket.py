"""Multi-asset American LSMC: published benchmarks and structural limits.

Oracle anchor is the Andersen & Broadie (2004) 2-asset Bermudan max-call
table (the standard test problem for multi-asset early exercise); the
no-dividend rainbow call must collapse to its European value (max of
driftless-under-carry assets never exercises early), and the single-asset
degenerate case must agree with the vanilla LSMC engine.
"""
import numpy as np
import pytest

from optpricer_tpu import (
    CALL, OptionSpec, basket_price_mc, lsmc_price, lsmc_price_basket,
)

AB = dict(sigmas=[0.2, 0.2], corr=np.eye(2), qs=[0.10, 0.10],
          payoff="rainbow_max", kind="call", n_steps=9)


class TestAndersenBroadieMaxCall:
    def test_atm_benchmark(self):
        # Andersen & Broadie (2004), table 2: S0=100 -> 13.902
        p, se = lsmc_price_basket([100., 100.], [0.5, 0.5], 100., 3.0,
                                  0.05, n_paths=400_000, seed=11, **AB)
        assert se < 0.05
        assert abs(p - 13.902) < 0.08, p

    def test_itm_benchmark_two_pass(self):
        # S0=110 -> 21.345; the two-pass estimate is honestly low-biased
        # so it may sit slightly under, never materially over
        p, se = lsmc_price_basket([110., 110.], [0.5, 0.5], 100., 3.0,
                                  0.05, n_paths=400_000, seed=11,
                                  bound="lower", **AB)
        assert abs(p - 21.345) < 0.10, p

    def test_exceeds_european(self):
        # with q=10% > r=5% early exercise is genuinely valuable
        am, _ = lsmc_price_basket([100., 100.], [0.5, 0.5], 100., 3.0,
                                  0.05, n_paths=200_000, seed=3, **AB)
        eu, eu_se = basket_price_mc(
            [100., 100.], [0.5, 0.5], 100., 3.0, 0.05, qs=[0.10, 0.10],
            sigmas=[0.2, 0.2], corr=np.eye(2), payoff="rainbow_max",
            kind="call", n_paths=2**20, seed=3)
        assert am > eu + 2.0 * eu_se


class TestStructuralLimits:
    def test_no_dividend_max_call_is_european(self):
        # q=0: each discounted asset is a martingale, the max a
        # submartingale -> never exercise early; LSMC must match the
        # European rainbow price within MC noise
        args = ([95., 105.], [0.5, 0.5], 100., 1.0, 0.05)
        kw = dict(sigmas=[0.25, 0.2],
                  corr=np.array([[1.0, 0.3], [0.3, 1.0]]))
        am, am_se = lsmc_price_basket(*args, payoff="rainbow_max",
                                      kind="call", n_paths=400_000,
                                      n_steps=12, seed=5, **kw)
        eu, eu_se = basket_price_mc(*args, payoff="rainbow_max",
                                    kind="call", n_paths=2**21, seed=5,
                                    **kw)
        assert abs(am - eu) < 3.0 * (am_se + eu_se) + 0.02

    def test_single_asset_reduces_to_vanilla_lsmc(self):
        opt = OptionSpec(S0=100., K=105., T=1.0, r=0.05, sigma=0.25)
        ref, ref_se = lsmc_price(opt, "put", n_paths=200_000, n_steps=25,
                                 seed=7)
        got, got_se = lsmc_price_basket(
            [100.], [1.0], 105., 1.0, 0.05, sigmas=[0.25],
            corr=np.eye(1), payoff="basket", kind="put",
            n_paths=200_000, n_steps=25, seed=7)
        assert abs(got - ref) < 3.0 * (ref_se + got_se) + 0.02

    def test_american_basket_put_above_european(self):
        args = ([100., 100.], [0.6, 0.4], 105., 1.0, 0.06)
        kw = dict(sigmas=[0.2, 0.3],
                  corr=np.array([[1.0, 0.5], [0.5, 1.0]]))
        am, _ = lsmc_price_basket(*args, payoff="basket", kind="put",
                                  n_paths=200_000, n_steps=25, seed=9,
                                  **kw)
        eu, eu_se = basket_price_mc(*args, payoff="basket", kind="put",
                                    n_paths=2**20, seed=9, **kw)
        assert am > eu + 2.0 * eu_se

    def test_two_pass_close_to_single(self):
        kw = dict(sigmas=[0.2, 0.2], corr=np.eye(2), qs=[0.1, 0.1],
                  payoff="rainbow_max", kind="call", n_steps=9,
                  n_paths=200_000, seed=13)
        p1, se1 = lsmc_price_basket([100., 100.], [0.5, 0.5], 100., 3.0,
                                    0.05, **kw)
        p2, se2 = lsmc_price_basket([100., 100.], [0.5, 0.5], 100., 3.0,
                                    0.05, bound="lower", **kw)
        assert abs(p1 - p2) < 4.0 * (se1 + se2)

    def test_worst_of_put_below_best_of_put(self):
        args = ([100., 100.], [0.5, 0.5], 100., 1.0, 0.05)
        kw = dict(sigmas=[0.2, 0.25],
                  corr=np.array([[1.0, 0.2], [0.2, 1.0]]),
                  kind="put", n_paths=100_000, n_steps=12, seed=2)
        worst, _ = lsmc_price_basket(*args, payoff="rainbow_max", **kw)
        best, _ = lsmc_price_basket(*args, payoff="rainbow_min", **kw)
        # a put on the MIN is worth more than a put on the MAX
        assert best > worst


class TestValidation:
    def test_bad_args_raise(self):
        ok = dict(sigmas=[0.2, 0.2], corr=np.eye(2))
        with pytest.raises(ValueError):
            lsmc_price_basket([100., 100.], [0.5, 0.5], 100., 1.0, 0.05,
                              payoff="spread", **ok)
        with pytest.raises(ValueError):
            lsmc_price_basket([100., 100.], [0.5, 0.5], 100., 1.0, 0.05,
                              bound="both", **ok)
        with pytest.raises(ValueError):
            lsmc_price_basket([100., 100.], [0.7, 0.5], 100., 1.0, 0.05,
                              **ok)  # weights off the simplex
        with pytest.raises(ValueError):
            lsmc_price_basket([100., 100.], [0.5, 0.5], 100., 1.0, 0.05,
                              sigmas=[0.2], corr=np.eye(2))
        with pytest.raises(np.linalg.LinAlgError):
            lsmc_price_basket([100., 100.], [0.5, 0.5], 100., 1.0, 0.05,
                              sigmas=[0.2, 0.2],
                              corr=np.array([[1.0, 2.0], [2.0, 1.0]]))
