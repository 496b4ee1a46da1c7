"""Variance swaps: log-contract replication, Heston closed form, MC.

Volatility derivatives are the canonical consumer of a fitted vanilla
surface, and the fair variance strike is where a surface, a stochastic-vol
model and a path engine must all agree — so this module is both a product
(desk-quotable var-swap strikes) and a cross-engine consistency check the
reference has no analogue of (its surface is never consumed by a pricer,
``calibration.py``).

Three independent routes to K_var = E[(1/T)∫σ²dt]:

* :func:`varswap_strike_replication` — the model-free log-contract static
  replication (Demeterfi-Derman-Kamal-Zou 1999, Carr-Madan):

      K_var = (2e^{rT}/T) [∫₀^F P(K)/K² dK + ∫_F^∞ C(K)/K² dK]

  evaluated from ANY implied-vol surface on a log-strike grid — one
  vectorised Black-Scholes call + a trapezoid reduction, all on device.
  Exact for continuous paths (any local/stochastic vol); biased by jump
  cubes under jump dynamics (documented, tested).
* :func:`varswap_strike_heston` — the exact Heston integrated-variance
  expectation, E[(1/T)∫v_t dt] = θ + (v0 − θ)(1 − e^{−κT})/(κT).
* :func:`varswap_strike_mc` — discrete monitoring, K_d = (1/T)E[Σ(ln
  S_{i+1}/S_i)²] on the package's own path generators (GBM / Heston-QE /
  Merton), converging to the continuous strike as n_steps → ∞ (up to the
  well-known drift-squared O(dt) term and, for Merton, the jump
  contribution E[J²]λ which discrete monitoring DOES capture).

Vol swaps quote ≤ √K_var (Jensen); :func:`volswap_strike_mc` measures the
convexity gap directly.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..dtypes import canonical
from .monte_carlo import resolve_seed

__all__ = ["varswap_strike_replication", "varswap_strike_heston",
           "varswap_strike_mc", "volswap_strike_mc"]


def varswap_strike_replication(surface_iv, S0: float, r: float,
                               q: float, T: float, *,
                               n_strikes: int = 2048,
                               width: float = 10.0,
                               dtype=None) -> float:
    """Model-free fair variance by log-contract replication.

    ``surface_iv``: either a constant vol (float — then the result must
    be σ² exactly, the oracle test), or a callable ``(K_array, T) -> iv``
    (e.g. a :class:`~optpricer_tpu.models.calibration.VolSurface`'s
    ``.iv``), or the surface object itself (its ``.iv`` is used).

    The OTM option strip is integrated on a log-strike trapezoid grid of
    ``n_strikes`` points spanning ``±width·σ_ATM·√T`` around the forward —
    wide enough that the truncated tails contribute < 1e-10 of the strike
    at width=10.  Everything (BS prices at surface vols + the 1/K²
    quadrature) is one jitted vector computation.  Returns K_var in
    variance units (annualised); quote √K_var·100 as the vol strike.
    """
    if hasattr(surface_iv, "iv"):
        iv_fn = surface_iv.iv
    elif callable(surface_iv):
        iv_fn = surface_iv
    else:
        sig_const = float(surface_iv)
        iv_fn = lambda K, t: jnp.full_like(K, sig_const)  # noqa: E731
    if T <= 0.0:
        raise ValueError(f"T must be positive, got {T}")
    dt_ = canonical(dtype)
    F = S0 * np.exp((r - q) * T)
    sig_atm = float(np.mean(np.asarray(jax.device_get(
        iv_fn(jnp.asarray([F], dt_), T)))))
    w = width * sig_atm * np.sqrt(T)
    y = np.linspace(np.log(F) - w, np.log(F) + w, n_strikes)
    K = jnp.asarray(np.exp(y), dt_)
    iv_np = np.asarray(jax.device_get(iv_fn(K, T)), np.float64)
    # Deep wings of a NUMERICAL surface (e.g. IVs inverted from COS
    # prices) go NaN where the option price underflows vega; their strip
    # contribution is tail-exponentially small, so flat-extrapolate the
    # last solvable vol rather than poisoning the quadrature.
    good = np.isfinite(iv_np) & (iv_np > 0.0)
    if not good.any():
        raise ValueError("surface_iv returned no usable vols on the "
                         "replication grid")
    if not good.all():
        iv_np = np.interp(y, y[good], iv_np[good])
    iv = jnp.asarray(iv_np, dt_)

    from ..ops.black_scholes import price_core

    # OTM strip: puts below the forward, calls above
    is_call = K >= F
    prices = price_core(jnp.asarray(S0, dt_), K, jnp.asarray(T, dt_),
                        jnp.asarray(r, dt_), jnp.asarray(q, dt_), iv,
                        is_call)
    # trapezoid in y: dK = K dy, so ∫ O(K)/K² dK = ∫ O(K)/K dy
    integrand = prices / K
    dy = y[1] - y[0]
    integral = (jnp.sum(integrand) - 0.5 * (integrand[0] + integrand[-1])
                ) * dy
    k_var = 2.0 * np.exp(r * T) / T * float(integral)
    return k_var


def varswap_strike_heston(v0: float, kappa: float, theta: float,
                          T: float) -> float:
    """Exact continuous-monitoring Heston fair variance:
    E[(1/T)∫₀ᵀ v_t dt] = θ + (v0 − θ)(1 − e^{−κT})/(κT) — the mean of the
    CIR variance integrates in closed form (ξ and ρ do not enter)."""
    if T <= 0.0:
        raise ValueError(f"T must be positive, got {T}")
    if kappa <= 0.0:
        raise ValueError(f"kappa must be positive, got {kappa}")
    x = kappa * T
    return float(theta + (v0 - theta) * (1.0 - np.exp(-x)) / x)


def _logret_sq_sum(paths: jax.Array) -> jax.Array:
    """(n_paths,) per-path Σ(ln S_{i+1}/S_i)² from a stored path matrix."""
    lr = jnp.diff(jnp.log(paths), axis=0)
    return jnp.sum(lr * lr, axis=0)


def _mc_paths(S0, r, q, T, n_steps, n_paths, seed, dt_, *,
              sigma=None, heston=None, merton=None, antithetic=True):
    if sum(x is not None for x in (sigma, heston, merton)) != 1:
        raise ValueError("give exactly one of sigma=, heston= or merton=")
    if sigma is not None:
        from .processes import gbm_paths

        return gbm_paths(S0, r, q, sigma, T, n_steps, n_paths,
                         antithetic=antithetic, seed=seed, dtype=dt_)
    if heston is not None:
        from .processes import heston_paths

        hp = {k: float(heston[k])
              for k in ("v0", "kappa", "theta", "xi", "rho")}
        return heston_paths(S0, r, q, hp["v0"], hp["kappa"], hp["theta"],
                            hp["xi"], hp["rho"], T, n_steps, n_paths,
                            antithetic=antithetic, seed=seed, dtype=dt_,
                            scheme="qe")
    from .processes import merton_jump_paths

    mp = {k: float(merton[k]) for k in ("sigma", "lam", "mJ", "sJ")}
    return merton_jump_paths(S0, r, q, mp["sigma"], T, n_steps, n_paths,
                             lam=mp["lam"], mJ=mp["mJ"], sJ=mp["sJ"],
                             antithetic=antithetic, seed=seed, dtype=dt_)


def varswap_strike_mc(S0: float, r: float, q: float, T: float, *,
                      sigma: Optional[float] = None,
                      heston: Optional[dict] = None,
                      merton: Optional[dict] = None,
                      n_steps: int = 252, n_paths: int = 65_536,
                      antithetic: bool = True,
                      seed: Optional[int] = None,
                      dtype=None) -> tuple[float, float]:
    """Discretely-monitored fair variance, (strike, stderr).

    K_d = (1/T) E[Σᵢ (ln S_{i+1}/S_i)²] over ``n_steps`` equally spaced
    fixings — the actual term-sheet payoff.  GBM (``sigma=``), Heston
    (``heston=`` dict, Andersen-QE transitions) or Merton jumps
    (``merton=`` dict: sigma, lam, mJ, sJ).  Converges to the continuous
    strike + drift-squared O(dt); under jumps the discrete sum ALSO
    carries λ·E[J²], which the log-contract replication misses by the
    jump-cube bias — comparing the two isolates that bias.
    """
    dt_ = canonical(dtype)
    seed_val = resolve_seed(seed)
    paths = _mc_paths(S0, r, q, T, int(n_steps), int(n_paths), seed_val,
                      dt_, sigma=sigma, heston=heston, merton=merton,
                      antithetic=antithetic)
    rv = np.asarray(jax.device_get(_logret_sq_sum(paths)),
                    np.float64) / T
    n = rv.size
    return float(rv.mean()), float(rv.std(ddof=1) / np.sqrt(n))


def volswap_strike_mc(S0: float, r: float, q: float, T: float, *,
                      sigma: Optional[float] = None,
                      heston: Optional[dict] = None,
                      merton: Optional[dict] = None,
                      n_steps: int = 252, n_paths: int = 65_536,
                      antithetic: bool = True,
                      seed: Optional[int] = None,
                      dtype=None) -> tuple[float, float]:
    """Discretely-monitored fair VOLATILITY strike, (strike, stderr):
    E[√(RV/T)] — strictly below √K_var by Jensen's inequality; the gap is
    the vol-swap convexity correction that desks charge for."""
    dt_ = canonical(dtype)
    seed_val = resolve_seed(seed)
    paths = _mc_paths(S0, r, q, T, int(n_steps), int(n_paths), seed_val,
                      dt_, sigma=sigma, heston=heston, merton=merton,
                      antithetic=antithetic)
    vol = np.sqrt(np.asarray(jax.device_get(_logret_sq_sum(paths)),
                             np.float64) / T)
    n = vol.size
    return float(vol.mean()), float(vol.std(ddof=1) / np.sqrt(n))
