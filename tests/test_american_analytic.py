"""Analytic American approximations vs the CRR lattice and exact oracles.

* BS2002 / BAW accuracy gates are set from their literature error
  profiles (BS2002 a few parts in 1e4 of spot; BAW up to ~1% of spot on
  long-dated high-vol inputs) against a CRR N=2048 oracle — the same
  oracle contract the reference's American prices rest on
  (``/root/reference/src/optpricer/binomial.py:28-36``).
* RGW is EXACT under the escrowed-dividend model, so it is tested to
  1e-8 against kink-split Gauss-Legendre quadrature of the two-date
  problem.
"""
import itertools
import math

import jax
import numpy as np
import pytest

from optpricer_tpu.models.american_analytic import (
    baw_price, bjerksund_stensland_price, rgw_price)
from optpricer_tpu.models.binomial import crr_vec
from optpricer_tpu.ops.black_scholes import bs_price_vec

S0 = 100.0
KS = np.array([80.0, 100.0, 120.0])


def _crr_grid(T, r, q, sig, kind, N=2048):
    return np.asarray(crr_vec(S0, KS, T, r, q, sig, kind, N=N,
                              american=True))


class TestBjerksundStensland:
    def test_accuracy_vs_crr(self):
        worst = 0.0
        for T, sig, r, q, kind in itertools.product(
                [0.25, 1.0, 3.0], [0.2, 0.4], [0.02, 0.08],
                [0.0, 0.04, 0.12], ["call", "put"]):
            ref = _crr_grid(T, r, q, sig, kind)
            got = np.asarray(bjerksund_stensland_price(
                S0, KS, T, r, q, sigma=sig, kind=kind))
            worst = max(worst, float(np.max(np.abs(got - ref))))
        # measured worst 0.16 on this grid (3y 40-vol put); gate at 0.25
        assert worst < 0.25, worst

    def test_no_dividend_call_is_european(self):
        for T, sig, r in itertools.product([0.25, 3.0], [0.2, 0.4],
                                           [0.02, 0.08]):
            eu = float(bs_price_vec(S0, np.array([100.0]), T, r, 0.0,
                                    sig, "call")[0])
            v = float(bjerksund_stensland_price(S0, 100.0, T, r, 0.0,
                                                sigma=sig, kind="call"))
            assert abs(v - eu) < 1e-9

    def test_deep_itm_immediate_exercise(self):
        # S far above the boundary: the call is worth intrinsic
        v = float(bjerksund_stensland_price(300.0, 100.0, 1.0, 0.03,
                                            0.10, sigma=0.2, kind="call"))
        assert abs(v - 200.0) < 1e-9

    def test_dominates_european_and_intrinsic(self):
        for kind in ("call", "put"):
            got = np.asarray(bjerksund_stensland_price(
                S0, KS, 1.0, 0.05, 0.07, sigma=0.3, kind=kind))
            eu = np.asarray(bs_price_vec(S0, KS, 1.0, 0.05, 0.07, 0.3,
                                         kind))
            intr = np.maximum((S0 - KS) if kind == "call" else (KS - S0),
                              0.0)
            assert np.all(got >= eu - 1e-12)
            assert np.all(got >= intr - 1e-12)

    def test_jit_grad_broadcast(self):
        f = jax.jit(lambda s: bjerksund_stensland_price(
            s, 100.0, 1.0, 0.05, 0.03, sigma=0.3, kind="put"))
        assert np.isfinite(float(f(100.0)))
        delta = jax.grad(lambda s: bjerksund_stensland_price(
            s, 100.0, 1.0, 0.05, 0.03, sigma=0.3, kind="put"))(100.0)
        assert -1.0 < float(delta) < 0.0
        batch = bjerksund_stensland_price(
            np.full(5, S0), np.linspace(80, 120, 5), 1.0, 0.05, 0.03,
            sigma=0.3, kind="put")
        assert batch.shape == (5,)
        assert bool(np.all(np.diff(np.asarray(batch)) > 0))  # ↑ in K

    def test_put_call_transformation_symmetry(self):
        # P(S,K,r,q) = C(K,S,q,r) must hold EXACTLY (same code path)
        p = float(bjerksund_stensland_price(90.0, 110.0, 2.0, 0.06,
                                            0.02, sigma=0.35, kind="put"))
        c = float(bjerksund_stensland_price(110.0, 90.0, 2.0, 0.02,
                                            0.06, sigma=0.35, kind="call"))
        assert abs(p - c) < 1e-9


class TestBaroneAdesiWhaley:
    def test_accuracy_vs_crr(self):
        worst = 0.0
        for T, sig, r, q, kind in itertools.product(
                [0.25, 1.0, 3.0], [0.2, 0.4], [0.02, 0.08],
                [0.0, 0.04, 0.12], ["call", "put"]):
            ref = _crr_grid(T, r, q, sig, kind)
            got = np.asarray(baw_price(S0, KS, T, r, q, sigma=sig,
                                       kind=kind))
            worst = max(worst, float(np.max(np.abs(got - ref))))
        # measured worst 1.02 (3y 40-vol ITM put — BAW's known weak
        # corner); gate at 1.3
        assert worst < 1.3, worst

    def test_short_dated_is_tight(self):
        for sig, r, q, kind in itertools.product(
                [0.2, 0.4], [0.02, 0.08], [0.0, 0.12], ["call", "put"]):
            ref = _crr_grid(0.25, r, q, sig, kind)
            got = np.asarray(baw_price(S0, KS, 0.25, r, q, sigma=sig,
                                       kind=kind))
            assert float(np.max(np.abs(got - ref))) < 0.10

    def test_no_dividend_call_is_european(self):
        eu = float(bs_price_vec(S0, np.array([100.0]), 1.0, 0.05, 0.0,
                                0.3, "call")[0])
        v = float(baw_price(S0, 100.0, 1.0, 0.05, 0.0, sigma=0.3,
                            kind="call"))
        assert abs(v - eu) < 1e-9

    def test_zero_rate_put_is_european(self):
        eu = float(bs_price_vec(S0, np.array([110.0]), 1.0, 0.0, 0.02,
                                0.3, "put")[0])
        v = float(baw_price(S0, 110.0, 1.0, 0.0, 0.02, sigma=0.3,
                            kind="put"))
        assert abs(v - eu) < 1e-9

    def test_dominates_european_and_intrinsic(self):
        got = np.asarray(baw_price(S0, KS, 2.0, 0.06, 0.03, sigma=0.25,
                                   kind="put"))
        eu = np.asarray(bs_price_vec(S0, KS, 2.0, 0.06, 0.03, 0.25,
                                     "put"))
        assert np.all(got >= eu - 1e-12)
        assert np.all(got >= np.maximum(KS - S0, 0.0) - 1e-12)


# ---------------------------------------------------------------------------
# Roll-Geske-Whaley: exact under the escrowed-dividend model
# ---------------------------------------------------------------------------

def _bs_call_np(S, K, T, r, sig):
    sq = sig * math.sqrt(T)
    d1 = (np.log(S / K) + (r + 0.5 * sig * sig) * T) / sq
    d2 = d1 - sq
    Phi = lambda x: 0.5 * (1.0 + np.vectorize(math.erf)(
        x / math.sqrt(2.0)))
    return S * Phi(d1) - K * math.exp(-r * T) * Phi(d2)


_GL_X, _GL_W = np.polynomial.legendre.leggauss(400)


def _rgw_oracle(S0_, K, T, r, sig, D, t1):
    """Exact two-date value: e^{−rt₁}E[max(S+D−K, c_BS(S,K,T−t₁))],
    S = escrowed GBM at t₁.  Kink-split Gauss-Legendre (the max() kink
    would cost plain quadrature ~3 digits)."""
    Se = S0_ - D * math.exp(-r * t1)
    tau = T - t1
    Sx = lambda z: Se * np.exp((r - 0.5 * sig * sig) * t1
                               + sig * math.sqrt(t1) * z)
    gap = lambda z: _bs_call_np(Sx(z), K, tau, r, sig) - (Sx(z) + D - K)
    lo, hi = -12.0, 12.0
    if gap(hi) > 0:
        zk = hi
    else:
        for _ in range(200):
            mid = 0.5 * (lo + hi)
            lo, hi = (mid, hi) if gap(mid) > 0 else (lo, mid)
        zk = 0.5 * (lo + hi)
    val = 0.0
    for a, b in ((-12.0, zk), (zk, 12.0)):
        if b <= a:
            continue
        z = 0.5 * (b - a) * _GL_X + 0.5 * (a + b)
        w = 0.5 * (b - a) * _GL_W
        pdf = np.exp(-0.5 * z * z) / math.sqrt(2.0 * math.pi)
        s = Sx(z)
        f = np.maximum(s + D - K, _bs_call_np(s, K, tau, r, sig))
        val += float(np.sum(w * pdf * f))
    return math.exp(-r * t1) * val


class TestRollGeskeWhaley:
    def test_exact_vs_quadrature(self):
        for K, T, sig, r, D, t1 in itertools.product(
                [90.0, 100.0, 110.0], [0.5, 1.0], [0.2, 0.35],
                [0.03, 0.06], [1.0, 4.0, 8.0], [0.25, 0.75]):
            if t1 >= T:
                continue
            v = float(rgw_price(S0, K, T, r, sigma=sig, D=D, t_div=t1))
            o = _rgw_oracle(S0, K, T, r, sig, D, t1)
            assert abs(v - o) < 1e-8, (K, T, sig, r, D, t1, v, o)

    def test_small_dividend_is_escrowed_european(self):
        # D below K(1 − e^{−rτ}): early exercise never pays
        r, T, t1, sig, K = 0.08, 1.0, 0.5, 0.25, 100.0
        D = 0.9 * K * (1.0 - math.exp(-r * (T - t1)))
        Se = S0 - D * math.exp(-r * t1)
        eu = float(bs_price_vec(Se, np.array([K]), T, r, 0.0, sig,
                                "call")[0])
        v = float(rgw_price(S0, K, T, r, sigma=sig, D=D, t_div=t1))
        assert abs(v - eu) < 1e-10

    def test_dominates_escrowed_european(self):
        for D in (2.0, 6.0, 10.0):
            Se = S0 - D * math.exp(-0.05 * 0.5)
            eu = float(bs_price_vec(Se, np.array([100.0]), 1.0, 0.05,
                                    0.0, 0.3, "call")[0])
            v = float(rgw_price(S0, 100.0, 1.0, 0.05, sigma=0.3, D=D,
                                t_div=0.5))
            assert v >= eu - 1e-12

    def test_t_div_validation(self):
        with pytest.raises(ValueError):
            rgw_price(S0, 100.0, 1.0, 0.05, sigma=0.3, D=2.0, t_div=1.5)
        with pytest.raises(ValueError):
            rgw_price(S0, 100.0, 1.0, 0.05, sigma=0.3, D=2.0, t_div=0.0)

    def test_jit_and_batch(self):
        f = jax.jit(lambda s: rgw_price(s, 100.0, 1.0, 0.05, sigma=0.3,
                                        D=3.0, t_div=0.4))
        assert np.isfinite(float(f(100.0)))
        batch = rgw_price(np.full(4, S0), np.array([90.0, 100.0, 110.0,
                                                    120.0]),
                          1.0, 0.05, sigma=0.3, D=3.0, t_div=0.4)
        assert batch.shape == (4,)
        assert bool(np.all(np.diff(np.asarray(batch)) < 0))  # ↓ in K
