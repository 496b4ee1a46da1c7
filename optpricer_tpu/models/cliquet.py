"""Forward-start options and cliquets (ratchets).

Structured-product staples built on PERIOD RETURNS S_{t_i}/S_{t_{i−1}} —
the natural next consumer of the path engines, and a family the reference
does not price at all.

* :func:`forward_start_price` — max(S_T − k·S_{T0}, 0) paid at T.  Under
  GBM the payoff is degree-1 homogeneous in S_{T0}, giving Rubinstein's
  closed form: the price is S0·e^{−q·T0} times a Black-Scholes price with
  spot 1, strike k, maturity T − T0 — the oracle the MC route is pinned
  to.  MC runs under any of the package's dynamics (GBM / Heston-QE /
  Merton) from the stored path matrix.
* :func:`cliquet_price_bs` — closed form for the capped/floored cliquet
  WITHOUT a global floor under GBM: each period's contribution
  min(max(R_i − 1, f), c) decomposes as f + callspread(1+f, 1+c) on the
  period return, each leg a forward-start call, each period independent
  and lognormal — so the cliquet is a SUM of Rubinstein spreads.
* :func:`cliquet_price_mc` — the general contract (global floor/cap,
  any dynamics), ``(price, stderr)``; pinned to the closed form when the
  global floor is inactive.

All MC routes share the generators in ``models/processes.py`` (exact GBM
steps, Andersen-QE Heston, Merton jumps) and therefore the package seed
contract.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..dtypes import canonical
from .monte_carlo import resolve_seed
from .varswap import _mc_paths

__all__ = ["forward_start_price", "cliquet_price_bs", "cliquet_price_mc"]


def forward_start_price(S0: float, k: float, T0: float, T: float,
                        r: float, q: float = 0.0, *,
                        kind: str = "call",
                        sigma: Optional[float] = None,
                        heston: Optional[dict] = None,
                        merton: Optional[dict] = None,
                        method: str = "auto", n_steps: int = 64,
                        n_paths: int = 262_144,
                        antithetic: bool = True,
                        seed: Optional[int] = None, dtype=None):
    """Forward-start option: max(±(S_T − k·S_{T0}), 0) paid at T.

    ``method="closed"`` (GBM only) returns the Rubinstein closed form
    S0·e^{−q·T0}·BS(1, k, T−T0); ``method="mc"`` simulates; ``"auto"``
    picks closed for GBM, MC otherwise.  MC returns ``(price, stderr)``;
    the closed form a float.
    """
    if not 0.0 < T0 < T:
        raise ValueError(f"need 0 < T0 < T, got T0={T0}, T={T}")
    if k <= 0.0:
        raise ValueError(f"strike ratio k must be positive, got {k}")
    if kind not in ("call", "put"):
        raise ValueError("kind must be 'call' or 'put'")
    if method not in ("auto", "closed", "mc"):
        raise ValueError("method must be 'auto', 'closed' or 'mc'")
    if method == "auto":
        method = "closed" if sigma is not None and heston is None \
            and merton is None else "mc"
    if method == "closed":
        if sigma is None:
            raise ValueError("method='closed' is the GBM Rubinstein "
                             "form; it needs sigma=")
        from ..ops.black_scholes import price_core

        dt_ = canonical(dtype)
        unit = price_core(jnp.asarray(1.0, dt_), jnp.asarray(k, dt_),
                          jnp.asarray(T - T0, dt_), jnp.asarray(r, dt_),
                          jnp.asarray(q, dt_), jnp.asarray(sigma, dt_),
                          jnp.asarray(kind == "call"))
        # e^{−rT0}·E[S_{T0}]·BS_unit = S0·e^{−qT0}·BS(1, k, T−T0)
        return float(S0 * np.exp(-q * T0)
                     * np.asarray(jax.device_get(unit), np.float64))
    dt_ = canonical(dtype)
    # land T0 exactly on the step grid
    n_steps = int(n_steps)
    i0 = max(1, round(n_steps * T0 / T))
    if abs(i0 * T / n_steps - T0) > 1e-9 * T:
        raise ValueError(f"T0={T0} must land on the {n_steps}-step grid "
                         f"of T={T} (nearest node {i0 * T / n_steps})")
    paths = _mc_paths(S0, r, q, T, n_steps, int(n_paths),
                      resolve_seed(seed), dt_, sigma=sigma,
                      heston=heston, merton=merton,
                      antithetic=antithetic)
    S = np.asarray(jax.device_get(paths), np.float64)
    sign = 1.0 if kind == "call" else -1.0
    pay = np.maximum(sign * (S[-1] - k * S[i0]), 0.0) * np.exp(-r * T)
    n = pay.size
    return float(pay.mean()), float(pay.std(ddof=1) / np.sqrt(n))


def _period_spread_bs(sigma, dt_period, r, q, local_floor, local_cap):
    """E[min(max(R − 1, f), c)] for one lognormal period return R,
    UNdiscounted, via the call-spread decomposition
    f + C(1+f) − C(1+c) with C(k) the unit-spot forward Black-Scholes
    call on the period return."""
    from math import erfc, exp, log, sqrt

    def unit_call(k):
        if k <= 0.0:
            # a call struck at or below zero on a positive return is the
            # forward itself minus the strike
            return exp((r - q) * dt_period) - k
        vol = sigma * sqrt(dt_period)
        d1 = (log(1.0 / k) + (r - q + 0.5 * sigma * sigma) * dt_period) \
            / vol
        d2 = d1 - vol
        Phi = lambda x: 0.5 * erfc(-x / sqrt(2.0))
        return exp((r - q) * dt_period) * Phi(d1) - k * Phi(d2)

    return local_floor + unit_call(1.0 + local_floor) \
        - unit_call(1.0 + local_cap)


def cliquet_price_bs(S0: float, T: float, r: float, q: float = 0.0, *,
                     sigma: float, n_periods: int = 12,
                     local_floor: float = 0.0,
                     local_cap: float = 0.08,
                     notional: float = 1.0) -> float:
    """Closed-form GBM cliquet WITHOUT a global floor: the sum of capped/
    floored period returns decomposes period-by-period into forward-start
    call spreads (independent lognormal returns), discounted to t=0.

    Pays notional·Σᵢ min(max(S_{t_i}/S_{t_{i−1}} − 1, floor), cap) at T.
    """
    if local_cap < local_floor:
        raise ValueError("local_cap must be >= local_floor")
    if n_periods < 1 or T <= 0.0:
        raise ValueError("need n_periods >= 1 and T > 0")
    dt_p = T / n_periods
    per = _period_spread_bs(sigma, dt_p, r, q, local_floor, local_cap)
    return float(notional * n_periods * per * np.exp(-r * T))


def cliquet_price_mc(S0: float, T: float, r: float, q: float = 0.0, *,
                     sigma: Optional[float] = None,
                     heston: Optional[dict] = None,
                     merton: Optional[dict] = None,
                     n_periods: int = 12,
                     local_floor: float = 0.0, local_cap: float = 0.08,
                     global_floor: Optional[float] = None,
                     global_cap: Optional[float] = None,
                     notional: float = 1.0,
                     steps_per_period: int = 1,
                     n_paths: int = 262_144, antithetic: bool = True,
                     seed: Optional[int] = None,
                     dtype=None) -> tuple[float, float]:
    """General cliquet by MC, ``(price, stderr)``: capped/floored period
    returns, optional GLOBAL floor/cap on the sum, any of the package's
    dynamics.  GBM with no global floor/cap must match
    :func:`cliquet_price_bs` (the parity test).  ``steps_per_period`` > 1
    refines the path between fixing dates (needed only for dynamics with
    time-stepping bias; GBM and QE transitions are exact per step).
    """
    if local_cap < local_floor:
        raise ValueError("local_cap must be >= local_floor")
    if n_periods < 1:
        raise ValueError("need n_periods >= 1")
    dt_ = canonical(dtype)
    n_steps = int(n_periods) * int(steps_per_period)
    paths = _mc_paths(S0, r, q, T, n_steps, int(n_paths),
                      resolve_seed(seed), dt_, sigma=sigma,
                      heston=heston, merton=merton,
                      antithetic=antithetic)
    S = np.asarray(jax.device_get(paths), np.float64)
    fix = S[::int(steps_per_period)]          # (n_periods+1, n_paths)
    rets = fix[1:] / fix[:-1] - 1.0
    per = np.clip(rets, local_floor, local_cap).sum(axis=0)
    if global_floor is not None:
        per = np.maximum(per, global_floor)
    if global_cap is not None:
        per = np.minimum(per, global_cap)
    pay = notional * per * np.exp(-r * T)
    n = pay.size
    return float(pay.mean()), float(pay.std(ddof=1) / np.sqrt(n))
