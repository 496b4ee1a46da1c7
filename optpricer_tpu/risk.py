"""Bump-and-reprice risk engine (model-agnostic) + AD Greeks.

API parity with reference ``risk.py``: :func:`numerical_greeks`,
:func:`scenario_grid`, :func:`portfolio_risk`, :func:`var_historical`,
:func:`cvar_historical` all take an arbitrary
``pricer_func(S, K, T, r, q, sigma, kind) -> float`` callable
(reference ``risk.py:27-57``), so Greeks/VaR stay decoupled from engine
choice.

TPU extensions beyond the reference:

* :func:`ad_greeks` — exact Greeks by ``jax.grad`` through any traceable
  pricer (no bump noise, one compile).
* ``scenario_grid(..., vectorized=True)`` — the 2-D spot×vol sweep as one
  vmapped kernel instead of a nested Python loop (reference
  ``risk.py:131-133``).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "numerical_greeks", "scenario_grid", "portfolio_risk",
    "portfolio_risk_fast", "var_historical", "cvar_historical", "ad_greeks",
]


def numerical_greeks(pricer_func: Callable[..., float], S, K, T, r, q, sigma,
                     kind: str, *, bump_pct: float = 0.01) -> dict:
    """Central-FD Greeks on an arbitrary pricer (reference ``risk.py:27-92``):
    spot bump ``bump_pct·S`` for Δ/Γ, vol bump ``max(bump_pct·σ, 1e-4)``,
    forward 1-day theta, absolute ``bump_pct`` rate bump for rho."""
    P0 = pricer_func(S, K, T, r, q, sigma, kind)

    eps_S = bump_pct * S
    P_up = pricer_func(S + eps_S, K, T, r, q, sigma, kind)
    P_dn = pricer_func(S - eps_S, K, T, r, q, sigma, kind)
    delta = (P_up - P_dn) / (2.0 * eps_S)
    gamma = (P_up - 2.0 * P0 + P_dn) / (eps_S**2)

    eps_v = max(bump_pct * sigma, 1e-4)
    P_vup = pricer_func(S, K, T, r, q, sigma + eps_v, kind)
    P_vdn = pricer_func(S, K, T, r, q, max(sigma - eps_v, 1e-6), kind)
    vega = (P_vup - P_vdn) / (2.0 * eps_v)

    dt = 1.0 / 365.0
    if T > dt:
        P_t = pricer_func(S, K, T - dt, r, q, sigma, kind)
        theta_val = (P_t - P0) / dt
    else:
        theta_val = 0.0

    eps_r = bump_pct
    P_rup = pricer_func(S, K, T, r + eps_r, q, sigma, kind)
    P_rdn = pricer_func(S, K, T, r - eps_r, q, sigma, kind)
    rho = (P_rup - P_rdn) / (2.0 * eps_r)

    return {
        "delta": float(delta), "gamma": float(gamma), "vega": float(vega),
        "theta": float(theta_val), "rho": float(rho),
    }


def ad_greeks(pricer_core: Callable, S, K, T, r, q, sigma, kind: str) -> dict:
    """Exact Greeks via automatic differentiation through a traceable pricer.

    ``pricer_core(S, K, T, r, q, sigma, is_call) -> scalar`` must be
    jax-traceable. Theta follows the market convention dPrice/d(−T)·(−1) =
    −dPrice/dT … reported as dPrice/dt (calendar decay), matching the sign of
    the reference's forward-difference theta.
    """
    from .ops.black_scholes import is_call_mask

    is_call = jnp.asarray(is_call_mask(kind))

    def f(S, sigma, T, r):
        return pricer_core(S, K, T, r, q, sigma, is_call)

    delta = jax.grad(f, argnums=0)(S, sigma, T, r)
    gamma = jax.grad(jax.grad(f, argnums=0), argnums=0)(S, sigma, T, r)
    vega = jax.grad(f, argnums=1)(S, sigma, T, r)
    theta = -jax.grad(f, argnums=2)(S, sigma, T, r)
    rho = jax.grad(f, argnums=3)(S, sigma, T, r)
    return {k: float(v) for k, v in
            dict(delta=delta, gamma=gamma, vega=vega, theta=theta,
                 rho=rho).items()}


def scenario_grid(pricer_func: Callable[..., float], S, K, T, r, q, sigma,
                  kind: str, spot_range, vol_range, *,
                  vectorized: bool = False) -> dict:
    """2-D spot×vol price grid (reference ``risk.py:99-139``).

    With ``vectorized=True`` the pricer must accept array S/sigma (all the
    optpricer_tpu vectorised pricers do) and the grid is one broadcast call.
    """
    spot_range = np.asarray(spot_range, dtype=float)
    vol_range = np.asarray(vol_range, dtype=float)

    if vectorized:
        SS = spot_range[:, None]
        VV = vol_range[None, :]
        prices = np.asarray(pricer_func(SS, K, T, r, q, VV, kind))
    else:
        prices = np.empty((len(spot_range), len(vol_range)))
        for i, s in enumerate(spot_range):
            for j, v in enumerate(vol_range):
                prices[i, j] = pricer_func(float(s), K, T, r, q, float(v), kind)

    return {
        "spot_values": spot_range.copy(),
        "vol_values": vol_range.copy(),
        "prices": prices,
    }


def portfolio_risk(instruments: list, pricer_func: Callable[..., float], *,
                   bump_pct: float = 0.01) -> dict:
    """Aggregate portfolio Greeks: per-instrument bump Greeks × signed
    position, summed (reference ``risk.py:146-200``)."""
    totals = {"delta": 0.0, "gamma": 0.0, "vega": 0.0, "theta": 0.0,
              "rho": 0.0}
    total_value = 0.0
    inst_greeks = []

    for inst in instruments:
        pos = inst["position"]
        g = numerical_greeks(
            pricer_func, inst["S"], inst["K"], inst["T"], inst["r"],
            inst["q"], inst["sigma"], inst["kind"], bump_pct=bump_pct)
        price = pricer_func(inst["S"], inst["K"], inst["T"], inst["r"],
                            inst["q"], inst["sigma"], inst["kind"])
        scaled = {k: pos * v for k, v in g.items()}
        for k in totals:
            totals[k] += scaled[k]
        total_value += pos * float(price)
        inst_greeks.append({**scaled, "price": pos * float(price)})

    return {
        "total_delta": totals["delta"],
        "total_gamma": totals["gamma"],
        "total_vega": totals["vega"],
        "total_theta": totals["theta"],
        "total_rho": totals["rho"],
        "total_value": total_value,
        "instrument_greeks": inst_greeks,
    }


def portfolio_risk_fast(instruments: list) -> dict:
    """Whole-book analytic Greeks in ONE vectorised kernel call.

    Same output schema as :func:`portfolio_risk` but uses closed-form BS
    Greeks for every instrument instead of 8 bump repricings each — the
    production path for vanilla books (the generic callable version stays
    for exotic/engine-agnostic use).
    """
    from .ops.black_scholes import bs_greeks_vec, bs_price_vec

    cols = {c: np.array([float(i[c]) for i in instruments])
            for c in ("S", "K", "T", "r", "q", "sigma", "position")}
    kinds = np.array([i["kind"] for i in instruments])

    g = bs_greeks_vec(cols["S"], cols["K"], cols["T"], cols["r"], cols["q"],
                      cols["sigma"], kinds)
    px = np.asarray(bs_price_vec(cols["S"], cols["K"], cols["T"], cols["r"],
                                 cols["q"], cols["sigma"], kinds))
    pos = cols["position"]
    scaled = {k: np.asarray(v) * pos for k, v in g.items()}
    value = px * pos
    inst_greeks = [
        {**{k: float(scaled[k][i]) for k in scaled},
         "price": float(value[i])}
        for i in range(len(instruments))
    ]
    return {
        "total_delta": float(scaled["delta"].sum()),
        "total_gamma": float(scaled["gamma"].sum()),
        "total_vega": float(scaled["vega"].sum()),
        "total_theta": float(scaled["theta"].sum()),
        "total_rho": float(scaled["rho"].sum()),
        "total_value": float(value.sum()),
        "instrument_greeks": inst_greeks,
    }


def var_historical(returns, confidence: float = 0.99, horizon: int = 1) -> float:
    """Historical VaR at the (1 − confidence) quantile, √horizon-scaled,
    returned positive (reference ``risk.py:207-221``)."""
    returns = jnp.asarray(returns)
    q = jnp.percentile(returns, (1.0 - confidence) * 100.0)
    return float(-q * np.sqrt(horizon))


def cvar_historical(returns, confidence: float = 0.99, horizon: int = 1) -> float:
    """Conditional VaR (expected shortfall): mean loss beyond the VaR
    threshold, √horizon-scaled, positive (reference ``risk.py:224-240``)."""
    returns = jnp.asarray(returns)
    q = jnp.percentile(returns, (1.0 - confidence) * 100.0)
    mask = returns <= q
    n_tail = jnp.sum(mask)
    tail_mean = jnp.where(
        n_tail > 0, jnp.sum(jnp.where(mask, returns, 0.0)) /
        jnp.maximum(n_tail, 1), q)
    return float(-tail_mean * np.sqrt(horizon))
