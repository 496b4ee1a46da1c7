"""Fast analytic American-option approximations.

The reference prices Americans only by CRR backward induction
(``/root/reference/src/optpricer/binomial.py:28-36``) — exact in the
N → ∞ limit but O(N²) work per option.  These desk-standard closed(ish)
forms price an American option in O(1):

* :func:`bjerksund_stensland_price` — Bjerksund & Stensland (2002)
  two-step flat-boundary approximation.  Pure closed form (Φ and the
  Φ₂ of :func:`~optpricer_tpu.ops.bvn.bvn_cdf`), typically within a
  few tenths of a percent of the CRR-converged price.
* :func:`baw_price` — Barone-Adesi & Whaley (1987) quadratic
  approximation.  One jittable log-space bisection for the critical
  price, then a power-law early-exercise premium.
* :func:`rgw_price` — Roll-Geske-Whaley: the EXACT price of an
  American call on a stock paying one cash dividend under the
  escrowed-dividend model (early exercise is only ever optimal the
  instant before the stock goes ex).

All three broadcast over their inputs, jit cleanly (no data-dependent
control flow — region selection is ``jnp.where``), and differentiate:
the critical prices enter through value-matching/smooth-pasting
conditions, so treating them as constants under AD leaves first-order
Greeks intact (envelope theorem).

Everything here EXTENDS the reference surface (it has no analytic
American engine); parity anchor is the CRR oracle both repos share.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.stats import norm

from ..dtypes import canonical
from ..ops.black_scholes import d1_d2, is_call_mask, price_core
from ..ops.bvn import bvn_cdf

__all__ = ["bjerksund_stensland_price", "baw_price", "rgw_price"]

_EPS = 1e-12


# --------------------------------------------------------------------------
# Bjerksund-Stensland (2002)
# --------------------------------------------------------------------------

def _bs2002_phi(S, T, gamma, H, I, r, b, sigma):
    """φ(S,T,γ,H,I) = E[e^{−rT} S_T^γ 1{S_T ≤ H, max S ≤ I}] under the
    flat-boundary heuristic — the single-barrier building block."""
    sq = sigma * jnp.sqrt(T)
    lam = (-r + gamma * b + 0.5 * gamma * (gamma - 1.0) * sigma * sigma) * T
    d = -(jnp.log(S / H) + (b + (gamma - 0.5) * sigma * sigma) * T) / sq
    kappa = 2.0 * b / (sigma * sigma) + 2.0 * gamma - 1.0
    lIS = jnp.log(I / S)
    return jnp.exp(lam) * S ** gamma * (
        norm.cdf(d) - jnp.exp(kappa * lIS) * norm.cdf(d - 2.0 * lIS / sq))


def _bs2002_psi(S, T2, gamma, H, I2, I1, t1, r, b, sigma):
    """ψ(S,T₂,γ,H,I₂,I₁,t₁) — the two-period extension of φ: stay below
    the near boundary I₂ on [0,t₁] and below I₁ on (t₁,T₂], finish
    below H.  Four Φ₂ rectangles with ρ = ±√(t₁/T₂)."""
    sq1 = sigma * jnp.sqrt(t1)
    sq2 = sigma * jnp.sqrt(T2)
    drift = b + (gamma - 0.5) * sigma * sigma
    e1 = (jnp.log(S / I1) + drift * t1) / sq1
    e2 = (jnp.log(I2 * I2 / (S * I1)) + drift * t1) / sq1
    e3 = (jnp.log(S / I1) - drift * t1) / sq1
    e4 = (jnp.log(I2 * I2 / (S * I1)) - drift * t1) / sq1
    f1 = (jnp.log(S / H) + drift * T2) / sq2
    f2 = (jnp.log(I2 * I2 / (S * H)) + drift * T2) / sq2
    f3 = (jnp.log(I1 * I1 / (S * H)) + drift * T2) / sq2
    f4 = (jnp.log(S * I1 * I1 / (H * I2 * I2)) + drift * T2) / sq2
    rho = jnp.sqrt(t1 / T2)
    lam = (-r + gamma * b + 0.5 * gamma * (gamma - 1.0) * sigma * sigma) * T2
    kappa = 2.0 * b / (sigma * sigma) + 2.0 * gamma - 1.0
    pI2 = jnp.exp(kappa * jnp.log(I2 / S))
    pI1 = jnp.exp(kappa * jnp.log(I1 / S))
    pI12 = jnp.exp(kappa * jnp.log(I1 / I2))
    return jnp.exp(lam) * S ** gamma * (
        bvn_cdf(-e1, -f1, rho) - pI2 * bvn_cdf(-e2, -f2, rho)
        - pI1 * bvn_cdf(-e3, -f3, -rho) + pI12 * bvn_cdf(-e4, -f4, -rho))


def _bs2002_call(S, K, T, r, b, sigma):
    """American CALL under cost of carry b < r (b ≥ r is selected to the
    European price by the caller)."""
    sig2 = sigma * sigma
    # b < r here, but the b ≥ r lane still flows through: clamp the
    # denominators so the unselected branch stays finite for jnp.where
    r_b = jnp.maximum(r - b, _EPS)
    beta = (0.5 - b / sig2) + jnp.sqrt(
        jnp.maximum((b / sig2 - 0.5) ** 2 + 2.0 * r / sig2, _EPS))
    beta = jnp.maximum(beta, 1.0 + 1e-6)
    B_inf = beta / (beta - 1.0) * K
    B0 = jnp.maximum(K, r / r_b * K)
    span = jnp.maximum(B_inf - B0, _EPS)
    t1 = 0.5 * (jnp.sqrt(5.0) - 1.0) * T
    h_t1 = -(b * t1 + 2.0 * sigma * jnp.sqrt(t1)) * K * K / (span * B0)
    h_T = -(b * T + 2.0 * sigma * jnp.sqrt(T)) * K * K / (span * B0)
    I1 = B0 + span * (1.0 - jnp.exp(h_t1))    # boundary on (t1, T]
    I2 = B0 + span * (1.0 - jnp.exp(h_T))     # boundary on [0, t1]
    a1 = (I1 - K) * I1 ** (-beta)
    a2 = (I2 - K) * I2 ** (-beta)

    phi = lambda g, H, I: _bs2002_phi(S, t1, g, H, I, r, b, sigma)
    psi = lambda g, H: _bs2002_psi(S, T, g, H, I2, I1, t1, r, b, sigma)

    amer = (a2 * S ** beta
            - a2 * phi(beta, I2, I2)
            + phi(1.0, I2, I2) - phi(1.0, I1, I2)
            - K * phi(0.0, I2, I2) + K * phi(0.0, I1, I2)
            + a1 * phi(beta, I1, I2)
            - a1 * psi(beta, I1)
            + psi(1.0, I1) - psi(1.0, K)
            - K * psi(0.0, I1) + K * psi(0.0, K))
    return jnp.where(S >= I2, S - K, amer)


def bjerksund_stensland_price(S0, K, T, r, q=0.0, *, sigma,
                              kind: str = "call", dtype=None):
    """American option price, Bjerksund-Stensland (2002) approximation.

    The exercise boundary is approximated by a two-step flat barrier
    (levels I₂ on [0,t₁] and I₁ on (t₁,T], t₁ = ½(√5−1)T); the premium
    is then the CLOSED-FORM value of stopping at a flat barrier —
    single-normal φ terms for the first step plus bivariate-normal ψ
    terms (:func:`~optpricer_tpu.ops.bvn.bvn_cdf`) for the second.
    Accuracy is a few parts in 10⁴ of spot for typical equity inputs
    (tested against CRR N=4096, ``tests/test_american_analytic.py``).

    Puts use the exact McDonald-Schroder transformation
    ``P(S,K,T,r,q) = C(K,S,T,q,r)`` — the put's early-exercise region
    maps onto the call's under swapped rate/yield.  ``q ≤ 0`` calls
    (cost of carry ≥ r) collapse to the European price exactly: early
    exercise is never optimal.  Broadcasting, jittable, AD-ready
    (boundary levels are closed-form in the inputs).

    Reference anchor: same contract as ``crr`` / reference
    ``binomial.py:28-36``, at O(1) cost per option instead of O(N²).
    """
    dt_ = canonical(dtype)
    S0, K, T, r, q, sigma = (
        jnp.asarray(v, dt_) for v in (S0, K, T, r, q, sigma))
    is_call = jnp.asarray(is_call_mask(kind))
    S0, K, T, r, q, sigma, is_call = jnp.broadcast_arrays(
        S0, K, T, r, q, sigma, is_call)

    # put(S,K,r,q) = call(K,S,q,r): price the transformed call lane-wise
    Sx = jnp.where(is_call, S0, K)
    Kx = jnp.where(is_call, K, S0)
    rx = jnp.where(is_call, r, q)
    qx = jnp.where(is_call, q, r)
    bx = rx - qx

    euro = price_core(S0, K, T, r, q, sigma, is_call)
    # b ≥ r ⇒ never exercise ⇒ European (also dodges the r−b=0 poles)
    b_safe = jnp.minimum(bx, rx - 1e-6)
    amer = _bs2002_call(Sx, Kx, T, rx, b_safe, sigma)
    out = jnp.where(bx >= rx, euro, jnp.maximum(amer, euro))
    intrinsic = jnp.maximum(jnp.where(is_call, S0 - K, K - S0), 0.0)
    out = jnp.maximum(out, intrinsic)
    return out if out.ndim else out[()]


# --------------------------------------------------------------------------
# Barone-Adesi & Whaley (1987)
# --------------------------------------------------------------------------

def _baw_critical(K, T, r, b, sigma, qq, is_call):
    """Critical price by 100-step log-space bisection of the
    value-matching condition (monotone in S, jittable)."""
    d1_at = lambda S: d1_d2(S, K, T, r, r - b, sigma)[0]
    ebr = jnp.exp((b - r) * T)

    def gap(S):
        # call: c(S) + (1 − e^{(b−r)T}Φ(d1)) S/q2 − (S − K)   (↓ in S)
        # put:  p(S) − (1 − e^{(b−r)T}Φ(−d1)) S/q1 − (K − S)  (↑ in S)
        v = price_core(S, K, T, r, r - b, sigma, is_call)
        d1 = d1_at(S)
        prem_c = (1.0 - ebr * norm.cdf(d1)) * S / qq
        prem_p = -(1.0 - ebr * norm.cdf(-d1)) * S / qq
        return jnp.where(is_call,
                         v + prem_c - (S - K),
                         v + prem_p - (K - S))

    lo = jnp.log(jnp.where(is_call, K, 1e-6 * K))
    hi = jnp.log(jnp.where(is_call, 1e6 * K, K))

    def body(_, bounds):
        lo, hi = bounds
        mid = 0.5 * (lo + hi)
        g = gap(jnp.exp(mid))
        go_up = jnp.where(is_call, g > 0.0, g < 0.0)
        return jnp.where(go_up, mid, lo), jnp.where(go_up, hi, mid)

    lo, hi = jax.lax.fori_loop(0, 100, body, (lo, hi))
    return jnp.exp(0.5 * (lo + hi))


def baw_price(S0, K, T, r, q=0.0, *, sigma, kind: str = "call",
              dtype=None):
    """American option price, Barone-Adesi & Whaley (1987) quadratic
    approximation.

    The early-exercise premium ε(S,τ) approximately satisfies the
    stationary Black-Scholes ODE after the time-decay term is absorbed
    into the coefficient h(τ) = 1 − e^{−rτ}; the admissible solution is
    the power law A·(S/S*)^γ with exponent

        γ = [−(N−1) ± √((N−1)² + 4M/h)] / 2,  M = 2r/σ², N = 2b/σ²

    (+ root for calls, − for puts).  S* solves value matching — here a
    100-step jittable log-space bisection — and A follows from smooth
    pasting, so AD Greeks through the fixed S* are first-order exact
    (envelope theorem).  Faster but less accurate than
    :func:`bjerksund_stensland_price` (≈0.1-1% of premium on long-dated
    deep-ITM inputs); kept because it is THE desk-standard quick
    American quote.  ``q ≤ 0`` calls and ``r ≤ 0`` puts return the
    European price exactly (no early exercise under the model).
    """
    dt_ = canonical(dtype)
    S0, K, T, r, q, sigma = (
        jnp.asarray(v, dt_) for v in (S0, K, T, r, q, sigma))
    is_call = jnp.asarray(is_call_mask(kind))
    S0, K, T, r, q, sigma, is_call = jnp.broadcast_arrays(
        S0, K, T, r, q, sigma, is_call)
    b = r - q
    sig2 = sigma * sigma

    euro = price_core(S0, K, T, r, q, sigma, is_call)

    # degenerate lanes (call with b≥r, put with r≤0) are selected to
    # `euro` below; clamp so their unselected branch stays finite
    r_s = jnp.maximum(r, 1e-6)
    b_s = jnp.where(is_call, jnp.minimum(b, r_s - 1e-6), b)
    M = 2.0 * r_s / sig2
    N = 2.0 * b_s / sig2
    h = jnp.maximum(1.0 - jnp.exp(-r_s * T), _EPS)
    root = jnp.sqrt(jnp.maximum((N - 1.0) ** 2 + 4.0 * M / h, _EPS))
    qq = 0.5 * (-(N - 1.0) + jnp.where(is_call, root, -root))

    Sc = _baw_critical(K, T, r_s, b_s, sigma, qq, is_call)
    d1_c = d1_d2(Sc, K, T, r_s, r_s - b_s, sigma)[0]
    ebr = jnp.exp((b_s - r_s) * T)
    A = jnp.where(is_call,
                  (Sc / qq) * (1.0 - ebr * norm.cdf(d1_c)),
                  -(Sc / qq) * (1.0 - ebr * norm.cdf(-d1_c)))
    euro_s = price_core(S0, K, T, r_s, r_s - b_s, sigma, is_call)
    prem = A * jnp.exp(qq * jnp.log(jnp.maximum(S0, _EPS) / Sc))
    inside = jnp.where(is_call, S0 < Sc, S0 > Sc)
    intrinsic = jnp.maximum(jnp.where(is_call, S0 - K, K - S0), 0.0)
    amer = jnp.where(inside, euro_s + prem, intrinsic)

    no_early = jnp.where(is_call, b >= r, r <= 0.0)
    out = jnp.where(no_early, euro, jnp.maximum(amer, euro))
    out = jnp.maximum(out, intrinsic)
    return out if out.ndim else out[()]


# --------------------------------------------------------------------------
# Roll-Geske-Whaley: American call, one cash dividend
# --------------------------------------------------------------------------

def rgw_price(S0, K, T, r, *, sigma, D, t_div, dtype=None):
    """American call on a stock paying ONE cash dividend ``D`` at
    ``t_div`` ∈ (0, T) — Roll-Geske-Whaley closed form.

    Model: escrowed dividend — S'₀ = S₀ − D·e^{−r·t_div} follows GBM
    with volatility σ and the stock drops by exactly D at t_div.  Under
    it early exercise is only ever optimal the instant BEFORE the drop,
    so the American call is a two-date compound claim and the formula
    is EXACT (not an approximation): with S̄ the ex-dividend spot where
    continuing equals the cum-dividend exercise value
    (c_BS(S̄,K,T−t_div) = S̄ + D − K, log-space bisection) and
    ρ = −√(t_div/T),

        C = S'[Φ(b₁) + Φ₂(a₁,−b₁;ρ)] − Ke^{−rT}Φ₂(a₂,−b₂;ρ)
            − (K−D)e^{−r·t_div}Φ(b₂).

    If D ≤ K(1 − e^{−r(T−t_div)}) the dividend never justifies losing
    the strike's remaining time value and the price collapses to the
    European call on the escrowed spot.  Oracle test: exact Gaussian
    quadrature of the two-date problem (``tests/test_american_analytic.py``).
    Complements the PDE engine's cash-drop dividend model
    (``pde.py:218-229``) with the escrowed-model desk quote; the
    reference prices no dividend-paying Americans at all.
    """
    if not 0.0 < float(t_div) < float(T):
        raise ValueError("need 0 < t_div < T")
    dt_ = canonical(dtype)
    S0, K, T, r, sigma, D, t1 = (
        jnp.asarray(v, dt_) for v in (S0, K, T, r, sigma, D, t_div))
    Se = S0 - D * jnp.exp(-r * t1)          # escrowed spot
    tau = T - t1
    true_ = jnp.asarray(True)

    euro = price_core(Se, K, T, r, jnp.zeros_like(r), sigma, true_)

    # S̄: ex-dividend spot where c_BS(S̄, K, τ) = S̄ + D − K (↓ in gap)
    lo = jnp.log(1e-6 * K)
    hi = jnp.log(1e6 * K)

    def body(_, bounds):
        lo, hi = bounds
        mid = 0.5 * (lo + hi)
        Sm = jnp.exp(mid)
        gap = price_core(Sm, K, tau, r, jnp.zeros_like(r), sigma,
                         true_) - (Sm + D - K)
        return jnp.where(gap > 0.0, mid, lo), jnp.where(gap > 0.0, hi, mid)

    lo, hi = jax.lax.fori_loop(0, 100, body, (lo, hi))
    S_bar = jnp.exp(0.5 * (lo + hi))

    sqT = sigma * jnp.sqrt(T)
    sq1 = sigma * jnp.sqrt(t1)
    a1 = (jnp.log(Se / K) + (r + 0.5 * sigma * sigma) * T) / sqT
    a2 = a1 - sqT
    b1 = (jnp.log(Se / S_bar) + (r + 0.5 * sigma * sigma) * t1) / sq1
    b2 = b1 - sq1
    rho = -jnp.sqrt(t1 / T)
    amer = (Se * (norm.cdf(b1) + bvn_cdf(a1, -b1, rho))
            - K * jnp.exp(-r * T) * bvn_cdf(a2, -b2, rho)
            - (K - D) * jnp.exp(-r * t1) * norm.cdf(b2))

    never = D <= K * (1.0 - jnp.exp(-r * tau))
    out = jnp.where(never, euro, jnp.maximum(amer, euro))
    out = jnp.maximum(out, jnp.maximum(S0 - K, 0.0))
    return out if out.ndim else out[()]
