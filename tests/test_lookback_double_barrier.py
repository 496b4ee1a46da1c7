"""Continuously-monitored lookbacks and double barriers: closed forms vs
the PDE corridor solver and discretely-monitored MC.

The reference has neither contract in closed form (its lookbacks are MC
only, ``exotics.py:215-273``; its barrier machinery is single-sided,
``exotics.py:33-96``, ``pde.py:271-329``) — these suites pin the new
oracles against each other three ways:

* exact algebraic identities (knock-in/out parity, the fixed/floating
  lookback parity, degenerations to the single-barrier reflection
  formula and to vanilla Black-Scholes);
* the in-operator PDE on an absorbing corridor, a fully independent
  discretisation of the same contract;
* discretely-monitored MC, which must approach the continuous price
  from the correct side (discrete extrema are less extreme).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optpricer_tpu.core import OptionSpec
from optpricer_tpu.models.analytic import (barrier_price_bs,
                                           double_barrier_price_bs,
                                           lookback_price_bs)
from optpricer_tpu.models.exotics import double_barrier_price, lookback_price
from optpricer_tpu.models.pde import fd_price_double_barrier
from optpricer_tpu.models.processes import gbm_paths
from optpricer_tpu.ops.black_scholes import bs_price_vec

S0, K, T, R, Q, SIG = 100.0, 100.0, 1.0, 0.05, 0.02, 0.2
L, U = 80.0, 130.0


class TestDoubleBarrierAnalytic:
    def test_wide_corridor_is_vanilla(self):
        v = float(bs_price_vec(S0, K, T, R, Q, SIG, "call"))
        db = float(double_barrier_price_bs(
            S0, K, T, R, Q, sigma=SIG, lower=1e-4, upper=1e6, kind="call"))
        assert abs(db - v) < 1e-9

    @pytest.mark.parametrize("kind", ["call", "put"])
    def test_in_out_parity(self, kind):
        v = float(bs_price_vec(S0, K, T, R, Q, SIG, kind))
        ko = float(double_barrier_price_bs(
            S0, K, T, R, Q, sigma=SIG, lower=L, upper=U, kind=kind))
        ki = float(double_barrier_price_bs(
            S0, K, T, R, Q, sigma=SIG, lower=L, upper=U, kind=kind,
            knock="in"))
        assert abs(ko + ki - v) < 1e-10
        assert 0.0 <= ko <= v + 1e-12

    def test_degenerates_to_single_barrier(self):
        # L → 0 leaves only the upper barrier: Reiner-Rubinstein up-and-out
        uo = float(barrier_price_bs(S0, K, T, R, Q, sigma=SIG, barrier=U,
                                    barrier_type="up-and-out", kind="call"))
        db = float(double_barrier_price_bs(
            S0, K, T, R, Q, sigma=SIG, lower=1e-3, upper=U, kind="call",
            n_images=8))
        assert abs(db - uo) < 1e-8
        # U → ∞ leaves only the lower barrier: down-and-out
        do = float(barrier_price_bs(S0, K, T, R, Q, sigma=SIG, barrier=L,
                                    barrier_type="down-and-out", kind="put"))
        db2 = float(double_barrier_price_bs(
            S0, K, T, R, Q, sigma=SIG, lower=L, upper=1e5, kind="put",
            n_images=8))
        assert abs(db2 - do) < 1e-8

    def test_strike_outside_corridor(self):
        # K ≤ L: the KO call pays S_T − K on every surviving path, so the
        # price is the survival-forward minus K × survival probability —
        # cross-check against strike-at-L plus (L−K) × corridor digital,
        # which the integral form must reproduce identically
        k_low = 60.0
        a = float(double_barrier_price_bs(S0, k_low, T, R, Q, sigma=SIG,
                                          lower=L, upper=U, kind="call"))
        at_L = float(double_barrier_price_bs(S0, L, T, R, Q, sigma=SIG,
                                             lower=L, upper=U, kind="call"))
        # corridor digital via strike difference of two puts beyond U
        pu1 = float(double_barrier_price_bs(S0, U + 1.0, T, R, Q, sigma=SIG,
                                            lower=L, upper=U, kind="put"))
        pu0 = float(double_barrier_price_bs(S0, U, T, R, Q, sigma=SIG,
                                            lower=L, upper=U, kind="put"))
        digital = pu1 - pu0
        assert abs(a - (at_L + (L - k_low) * digital)) < 1e-9

    def test_already_knocked(self):
        ko = float(double_barrier_price_bs(79.0, K, T, R, Q, sigma=SIG,
                                           lower=L, upper=U, kind="call",
                                           rebate=3.0))
        assert abs(ko - 3.0 * math.exp(-R * T)) < 1e-12
        ki = float(double_barrier_price_bs(131.0, K, T, R, Q, sigma=SIG,
                                           lower=L, upper=U, kind="call",
                                           knock="in"))
        v = float(bs_price_vec(131.0, K, T, R, Q, SIG, "call"))
        assert abs(ki - v) < 1e-10

    def test_grad_finite(self):
        g = jax.grad(lambda s: double_barrier_price_bs(
            s, K, T, R, Q, sigma=SIG, lower=L, upper=U, kind="call"))(
                jnp.asarray(S0, jnp.float64))
        assert np.isfinite(float(g))
        # KO delta near the upper barrier is negative (value falls to 0)
        gU = jax.grad(lambda s: double_barrier_price_bs(
            s, K, T, R, Q, sigma=SIG, lower=L, upper=U, kind="call"))(
                jnp.asarray(125.0, jnp.float64))
        assert float(gU) < 0.0

    def test_batch_on_any_input(self):
        # the batch axis may live on K/T/sigma with a SCALAR spot — and a
        # batch length equal to the image count (2·5+1=11) must not be
        # silently paired with the image axis
        Ks = jnp.linspace(85.0, 125.0, 3)
        pk = double_barrier_price_bs(S0, Ks, T, R, Q, sigma=SIG,
                                     lower=L, upper=U, kind="call")
        assert pk.shape == (3,)
        for i, k in enumerate(np.asarray(Ks)):
            ps = float(double_barrier_price_bs(S0, float(k), T, R, Q,
                                               sigma=SIG, lower=L, upper=U,
                                               kind="call"))
            assert abs(float(pk[i]) - ps) < 1e-12
        Ts = jnp.linspace(0.1, 1.1, 11)
        pt = double_barrier_price_bs(S0, K, Ts, R, Q, sigma=SIG,
                                     lower=L, upper=U, kind="call")
        assert pt.shape == (11,)
        mid = float(double_barrier_price_bs(S0, K, float(Ts[5]), R, Q,
                                            sigma=SIG, lower=L, upper=U,
                                            kind="call"))
        assert abs(float(pt[5]) - mid) < 1e-12

    def test_wide_corridor_high_drift_no_overflow(self):
        # n·m1·ln(U/L) > 709 overflows exp() in the naive image weights;
        # the log-space evaluation must degenerate to the vanilla price
        # instead of inf·0 = NaN
        px = float(double_barrier_price_bs(100.0, 100.0, 1.0, 0.05, 0.0,
                                           sigma=0.1, lower=1.0,
                                           upper=10_000.0, kind="call"))
        v = float(bs_price_vec(100.0, 100.0, 1.0, 0.05, 0.0, 0.1, "call"))
        assert np.isfinite(px)
        assert abs(px - v) < 1e-6


class TestDoubleBarrierPDE:
    @pytest.mark.parametrize("kind,knock,rebate", [
        ("call", "out", 0.0), ("put", "out", 2.0),
        ("call", "in", 1.5), ("put", "in", 0.0)])
    def test_matches_analytic(self, kind, knock, rebate):
        opt = OptionSpec(S0=S0, K=K, T=T, r=R, q=Q, sigma=SIG)
        an = float(double_barrier_price_bs(
            S0, K, T, R, Q, sigma=SIG, lower=L, upper=U, kind=kind,
            knock=knock, rebate=rebate))
        got = fd_price_double_barrier(opt, kind, lower=L, upper=U,
                                      knock=knock, rebate=rebate,
                                      N_S=400, N_t=400)
        # measured: ≤ 5e-5 KO / ≤ 3.5e-4 KI (the KI legs add the
        # vanilla-grid error) at 400×400 on this fixture
        assert abs(got - an) < 2e-3, (got, an)

    def test_already_knocked_spot(self):
        opt = OptionSpec(S0=70.0, K=K, T=T, r=R, q=Q, sigma=SIG)
        assert fd_price_double_barrier(opt, "call", lower=L, upper=U,
                                       rebate=2.0) \
            == pytest.approx(2.0 * math.exp(-R * T))

    def test_rejects_bad_inputs(self):
        opt = OptionSpec(S0=S0, K=K, T=T, r=R, q=Q, sigma=SIG)
        with pytest.raises(ValueError):
            fd_price_double_barrier(opt, "call", lower=U, upper=L)
        with pytest.raises(ValueError):
            fd_price_double_barrier(opt, "call", lower=L, upper=U,
                                    knock="sideways")


class TestDoubleBarrierMC:
    def test_parity_and_side(self):
        paths = gbm_paths(S0, R, Q, SIG, T, 512, 100_000, seed=11)
        ko, se_ko = double_barrier_price(paths, K, R, T, "call", L, U)
        ki, _ = double_barrier_price(paths, K, R, T, "call", L, U,
                                     knock="in")
        v = float(bs_price_vec(S0, K, T, R, Q, SIG, "call"))
        # same paths ⇒ KO + KI = vanilla MC estimate; vanilla MC is within
        # its own error of BS
        cont = float(double_barrier_price_bs(
            S0, K, T, R, Q, sigma=SIG, lower=L, upper=U, kind="call"))
        assert abs((ko + ki) - v) < 0.15          # MC noise on vanilla
        # discrete monitoring under-detects crossings: KO above continuous
        assert ko > cont
        assert ko - cont < 0.5                     # but not wildly so

    def test_monitoring_refinement_moves_toward_continuous(self):
        cont = float(double_barrier_price_bs(
            S0, K, T, R, Q, sigma=SIG, lower=L, upper=U, kind="call"))
        gaps = []
        for n_steps in (64, 1024):
            paths = gbm_paths(S0, R, Q, SIG, T, n_steps, 100_000, seed=3)
            px, _ = double_barrier_price(paths, K, R, T, "call", L, U)
            gaps.append(px - cont)
        assert gaps[1] < gaps[0]
        assert gaps[1] > -0.05

    def test_validation(self):
        paths = gbm_paths(S0, R, Q, SIG, T, 8, 1000, seed=0)
        with pytest.raises(ValueError):
            double_barrier_price(paths, K, R, T, "call", U, L)
        with pytest.raises(ValueError):
            double_barrier_price(paths, K, R, T, "call", L, U, knock="x")


class TestLookbackClosedForm:
    def test_fixed_floating_parity(self):
        # M₀ = m₀ = S0: fixed call struck at S0 pays M_T − S0 surely,
        # the floating put pays M_T − S_T — they differ by a forward
        cf = float(lookback_price_bs(S0, T, R, Q, sigma=SIG, kind="call",
                                     strike_type="floating"))
        pf = float(lookback_price_bs(S0, T, R, Q, sigma=SIG, kind="put",
                                     strike_type="floating"))
        cK = float(lookback_price_bs(S0, T, R, Q, sigma=SIG, kind="call",
                                     strike_type="fixed", K=S0))
        pK = float(lookback_price_bs(S0, T, R, Q, sigma=SIG, kind="put",
                                     strike_type="fixed", K=S0))
        carry = S0 * (math.exp(-Q * T) - math.exp(-R * T))
        assert abs(cK - (pf + carry)) < 1e-10
        assert abs(pK - (cf - carry)) < 1e-10

    def test_dominates_vanilla(self):
        v = float(bs_price_vec(S0, K, T, R, Q, SIG, "call"))
        cK = float(lookback_price_bs(S0, T, R, Q, sigma=SIG, kind="call",
                                     strike_type="fixed", K=K))
        assert cK > v          # max ≥ terminal, strictly in distribution

    def test_zero_carry_limit_continuous(self):
        # r = q hits the σ²/2b singularity: the exact limit must sit on
        # the b → 0 continuation of the general formula
        at0 = float(lookback_price_bs(S0, T, 0.03, 0.03, sigma=SIG,
                                      kind="call", strike_type="floating"))
        eps = 1e-6
        lo = float(lookback_price_bs(S0, T, 0.03, 0.03 + eps, sigma=SIG,
                                     kind="call", strike_type="floating"))
        hi = float(lookback_price_bs(S0, T, 0.03, 0.03 - eps, sigma=SIG,
                                     kind="call", strike_type="floating"))
        assert lo < at0 < hi                  # monotone in carry
        assert abs(0.5 * (lo + hi) - at0) < 1e-6

    def test_seasoned_contracts(self):
        # a lower already-observed minimum makes the floating call richer
        fresh = float(lookback_price_bs(S0, T, R, Q, sigma=SIG,
                                        kind="call"))
        seasoned = float(lookback_price_bs(S0, T, R, Q, sigma=SIG,
                                           kind="call",
                                           running_extremum=90.0))
        assert seasoned > fresh
        # fixed call: a running max beyond K adds its locked-in value
        deep = float(lookback_price_bs(S0, T, R, Q, sigma=SIG, kind="call",
                                       strike_type="fixed", K=K,
                                       running_extremum=140.0))
        base = float(lookback_price_bs(S0, T, R, Q, sigma=SIG, kind="call",
                                       strike_type="fixed", K=K))
        assert deep > base + (140.0 - K) * math.exp(-R * T) - 1e-9

    @pytest.mark.parametrize("kind,stype", [("call", "floating"),
                                            ("put", "floating"),
                                            ("call", "fixed"),
                                            ("put", "fixed")])
    def test_mc_approaches_from_below(self, kind, stype):
        # discrete extrema are less extreme ⇒ discretely-monitored MC
        # prices sit BELOW the continuous closed form and close in as the
        # monitoring grid refines (O(1/√n) Broadie-Glasserman gap)
        cont = float(lookback_price_bs(S0, T, R, Q, sigma=SIG, kind=kind,
                                       strike_type=stype, K=K))
        gaps = []
        for n_steps in (32, 512):
            paths = gbm_paths(S0, R, Q, SIG, T, n_steps, 100_000, seed=5)
            px, se = lookback_price(paths, R, T, kind, K=K,
                                    strike_type=stype)
            gaps.append(cont - px)
        assert gaps[0] > 0.0
        assert gaps[1] > -3.0 * se
        assert gaps[1] < 0.6 * gaps[0]

    def test_grads_finite(self):
        for stype in ("floating", "fixed"):
            g = jax.grad(lambda s: lookback_price_bs(
                s, T, R, Q, sigma=SIG, kind="call", strike_type=stype,
                K=K))(jnp.asarray(S0, jnp.float64))
            assert np.isfinite(float(g))
        # vega of a fresh floating call is large and positive
        vega = jax.grad(lambda sig: lookback_price_bs(
            S0, T, R, Q, sigma=sig, kind="call"))(
                jnp.asarray(SIG, jnp.float64))
        assert float(vega) > 0.0
