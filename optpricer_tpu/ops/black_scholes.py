"""Black-Scholes closed forms: price, Greeks, implied vol.

TPU-native re-architecture of the reference scalar module
(``black_scholes.py:10-69``) and vectorised module
(``black_scholes_vec.py:37-153``): here there is **one** implementation — a
pure, jitted, broadcasting core — and the scalar API is a thin view of it.
``kind`` strings are converted to a boolean mask on the host (strings cannot
cross the jit boundary); everything under jit is branch-free ``where`` selects.

Scalar implied vol uses a bracketed bisection ``lax.while_loop`` (replacing
scipy ``brentq``, reference ``black_scholes.py:58-69``); the vectorised
implied vol is a Newton iteration on vega under ``lax.while_loop`` with the
same convergence / NaN-marking contract as reference
``black_scholes_vec.py:104-153``.
"""
from __future__ import annotations

from dataclasses import replace
from functools import partial
from typing import Dict, Literal

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.stats import norm

from ..core import CALL, PUT, OptionSpec
from ..dtypes import canonical

__all__ = [
    "price", "greeks", "implied_vol",
    "bs_price_vec", "bs_greeks_vec", "bs_implied_vol_vec",
    "bs_higher_greeks_vec",
]


# ---------------------------------------------------------------------------
# kind handling — strings are host-side; jit sees a boolean mask
# ---------------------------------------------------------------------------
def is_call_mask(kind) -> np.ndarray:
    """Boolean mask: True where kind == 'call'.

    Accepts a scalar string, an array of strings, booleans, or an existing
    boolean array (parity with reference ``black_scholes_vec.py:26-31``).
    """
    if isinstance(kind, (bool, np.bool_)):
        return np.bool_(kind)
    if isinstance(kind, str):
        if kind not in (CALL, PUT):
            raise ValueError(f"kind must be 'call' or 'put', got {kind!r}")
        return np.bool_(kind == CALL)
    if isinstance(kind, jax.Array):
        # already a device/traced mask (e.g. under jit): pass through
        if not jnp.issubdtype(kind.dtype, jnp.bool_):
            raise ValueError("array-valued kind must be boolean")
        return kind
    arr = np.asarray(kind)
    if arr.dtype == bool:
        return arr
    if isinstance(arr, jnp.ndarray) and jnp.issubdtype(arr.dtype, jnp.bool_):
        return np.asarray(arr)
    out = np.array([str(k) == CALL for k in arr.flat], dtype=bool).reshape(arr.shape)
    bad = np.array([str(k) not in (CALL, PUT) for k in arr.flat], dtype=bool)
    if bad.any():
        raise ValueError("kind entries must be 'call' or 'put'")
    return out


# ---------------------------------------------------------------------------
# jitted cores (pure array functions)
# ---------------------------------------------------------------------------
def d1_d2(S, K, T, r, q, sigma):
    """d1, d2 of the Black-Scholes formula. Pure; broadcasts."""
    sig_sqrt_T = sigma * jnp.sqrt(T)
    d1 = (jnp.log(S / K) + (r - q + 0.5 * sigma * sigma) * T) / sig_sqrt_T
    return d1, d1 - sig_sqrt_T


def price_core(S, K, T, r, q, sigma, is_call):
    """Branch-free Black-Scholes price. Traceable / differentiable."""
    d1, d2 = d1_d2(S, K, T, r, q, sigma)
    disc_r = jnp.exp(-r * T)
    disc_q = jnp.exp(-q * T)
    call_px = disc_q * S * norm.cdf(d1) - disc_r * K * norm.cdf(d2)
    put_px = disc_r * K * norm.cdf(-d2) - disc_q * S * norm.cdf(-d1)
    return jnp.where(is_call, call_px, put_px)


def greeks_core(S, K, T, r, q, sigma, is_call):
    """delta/gamma/vega/theta/rho, vega absolute (dPrice/dSigma), theta per
    year — same conventions as reference ``black_scholes.py:29-56``."""
    d1, d2 = d1_d2(S, K, T, r, q, sigma)
    disc_r = jnp.exp(-r * T)
    disc_q = jnp.exp(-q * T)
    sqrt_T = jnp.sqrt(T)
    n_d1 = norm.pdf(d1)
    N_d1 = norm.cdf(d1)
    N_d2 = norm.cdf(d2)
    N_md1 = norm.cdf(-d1)
    N_md2 = norm.cdf(-d2)

    gamma = disc_q * n_d1 / (S * sigma * sqrt_T)
    vega = S * disc_q * n_d1 * sqrt_T

    delta = jnp.where(is_call, disc_q * N_d1, disc_q * (N_d1 - 1.0))
    theta_common = -S * disc_q * n_d1 * sigma / (2.0 * sqrt_T)
    theta = jnp.where(
        is_call,
        theta_common - r * K * disc_r * N_d2 + q * S * disc_q * N_d1,
        theta_common + r * K * disc_r * N_md2 - q * S * disc_q * N_md1,
    )
    rho = jnp.where(is_call, K * T * disc_r * N_d2, -K * T * disc_r * N_md2)
    return {"delta": delta, "gamma": gamma, "vega": vega, "theta": theta, "rho": rho}


def higher_greeks_core(S, K, T, r, q, sigma, is_call):
    """Second/third-order sensitivities in closed form: vanna (∂Δ/∂σ),
    volga (∂Vega/∂σ), charm (−∂Δ/∂T, per year), speed (∂Γ/∂S) and
    zomma (∂Γ/∂σ) — the vanna-volga quoting set plus the gamma ladder.
    AD through ``price_core`` is the exactness oracle in tests; these
    closed forms exist because one fused evaluation of the whole set is
    what a book-level risk sweep actually calls."""
    d1, d2 = d1_d2(S, K, T, r, q, sigma)
    disc_q = jnp.exp(-q * T)
    sqrt_T = jnp.sqrt(T)
    n_d1 = norm.pdf(d1)
    vanna = -disc_q * n_d1 * d2 / sigma
    vega = S * disc_q * n_d1 * sqrt_T
    volga = vega * d1 * d2 / sigma
    gamma = disc_q * n_d1 / (S * sigma * sqrt_T)
    speed = -gamma / S * (d1 / (sigma * sqrt_T) + 1.0)
    zomma = gamma * (d1 * d2 - 1.0) / sigma
    # charm: −∂Δ/∂T (calendar drift of the hedge), kind-dependent
    common = disc_q * n_d1 * (
        2.0 * (r - q) * T - d2 * sigma * sqrt_T) / (2.0 * T * sigma
                                                    * sqrt_T)
    charm = jnp.where(is_call,
                      q * disc_q * norm.cdf(d1) - common,
                      -q * disc_q * norm.cdf(-d1) - common)
    return {"vanna": vanna, "volga": volga, "charm": charm,
            "speed": speed, "zomma": zomma}


def vega_core(S, K, T, r, q, sigma):
    d1, _ = d1_d2(S, K, T, r, q, sigma)
    return S * jnp.exp(-q * T) * norm.pdf(d1) * jnp.sqrt(T)


_price_jit = jax.jit(price_core)
_greeks_jit = jax.jit(greeks_core)
_higher_greeks_jit = jax.jit(higher_greeks_core)


def _prep(dtype, *args):
    dt = canonical(dtype)
    return tuple(jnp.asarray(a, dt) for a in args)


# ---------------------------------------------------------------------------
# Vectorised public API (accepts scalars or arrays; broadcasts)
# ---------------------------------------------------------------------------
def bs_price_vec(S, K, T, r, q, sigma, kind, *, dtype=None) -> jax.Array:
    """Vectorised Black-Scholes price (broadcasting, jitted).

    API parity with reference ``black_scholes_vec.py:37-56``.
    """
    S, K, T, r, q, sigma = _prep(dtype, S, K, T, r, q, sigma)
    return _price_jit(S, K, T, r, q, sigma, jnp.asarray(is_call_mask(kind)))


def bs_greeks_vec(S, K, T, r, q, sigma, kind, *, dtype=None) -> Dict[str, jax.Array]:
    """Vectorised Greeks dict (delta/gamma/vega/theta/rho).

    API parity with reference ``black_scholes_vec.py:62-98``.
    """
    S, K, T, r, q, sigma = _prep(dtype, S, K, T, r, q, sigma)
    return _greeks_jit(S, K, T, r, q, sigma, jnp.asarray(is_call_mask(kind)))


# ---------------------------------------------------------------------------
# Scalar convenience API over OptionSpec
# ---------------------------------------------------------------------------
def bs_higher_greeks_vec(S, K, T, r, q, sigma, kind, *,
                         dtype=None) -> Dict[str, jax.Array]:
    """Vectorised vanna/volga/charm/speed/zomma (see
    ``higher_greeks_core``); broadcasting like :func:`bs_greeks_vec`."""
    S, K, T, r, q, sigma = _prep(dtype, S, K, T, r, q, sigma)
    return _higher_greeks_jit(S, K, T, r, q, sigma,
                              jnp.asarray(is_call_mask(kind)))


def price(opt: OptionSpec, kind: Literal["call", "put"] = CALL) -> float:
    """Scalar Black-Scholes price (reference ``black_scholes.py:18-27``)."""
    return float(bs_price_vec(opt.S0, opt.K, opt.T, opt.r, opt.q, opt.sigma, kind))


def greeks(opt: OptionSpec, kind: Literal["call", "put"] = CALL) -> Dict[str, float]:
    """Scalar Greeks (reference ``black_scholes.py:29-56``).

    Vega is dPrice/dSigma in absolute units, not per-1%.
    """
    g = bs_greeks_vec(opt.S0, opt.K, opt.T, opt.r, opt.q, opt.sigma, kind)
    return {k: float(v) for k, v in g.items()}


# ---------------------------------------------------------------------------
# Implied volatility
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("maxiter",))
def _iv_bisect_core(S, K, T, r, q, target, is_call, lo, hi, tol, maxiter=128):
    """Bracketed bisection for sigma — robust scalar/batch root find.

    Replaces scipy ``brentq`` (reference ``black_scholes.py:58-69``) with a
    jit-friendly fixed-structure loop; bisection to ``tol`` in sigma.
    """

    def body(state):
        lo, hi, it = state
        mid = 0.5 * (lo + hi)
        f_mid = price_core(S, K, T, r, q, mid, is_call) - target
        f_lo = price_core(S, K, T, r, q, lo, is_call) - target
        same_side = jnp.sign(f_mid) == jnp.sign(f_lo)
        new_lo = jnp.where(same_side, mid, lo)
        new_hi = jnp.where(same_side, hi, mid)
        return new_lo, new_hi, it + 1

    def cond(state):
        lo, hi, it = state
        return jnp.logical_and(it < maxiter, jnp.max(hi - lo) > tol)

    lo, hi, _ = jax.lax.while_loop(cond, body, (lo, hi, 0))
    return 0.5 * (lo + hi)


def implied_vol(
    opt: OptionSpec,
    target_price: float,
    kind: Literal["call", "put"] = CALL,
    *,
    tol: float = 1e-8,
    maxiter: int = 100,
    bracket=(1e-6, 5.0),
) -> float:
    """Scalar implied vol via bracketed bisection.

    Keeps the reference's bracket-widening heuristic
    (``black_scholes.py:64-68``): if f(a) and f(b) have the same sign the
    bracket is reset to ``(1e-6, max(5, 2*sigma))``.
    """
    del maxiter  # structure is fixed; tol governs termination
    a, b = bracket
    f = lambda sig: price(replace(opt, sigma=float(sig)), kind) - target_price
    if f(a) * f(b) > 0:
        a, b = 1e-6, max(5.0, 2.0 * opt.sigma if opt.sigma > 0 else 1.0)
        if f(a) * f(b) > 0:
            # No sign change even after widening — the target is outside the
            # attainable price range (scipy brentq would raise here too).
            raise ValueError(
                f"implied_vol: target price {target_price} is not bracketed "
                f"by sigma in [{a}, {b}]")
    dt = canonical(None)
    args = _prep(None, opt.S0, opt.K, opt.T, opt.r, opt.q, target_price, a, b)
    S, K, T, r, q, tgt, lo, hi = args
    sig = _iv_bisect_core(
        S, K, T, r, q, tgt, jnp.asarray(is_call_mask(kind)), lo, hi,
        jnp.asarray(tol, dt),
    )
    return float(sig)


@partial(jax.jit, static_argnames=("maxiter",))
def _iv_newton_core(S, K, T, r, q, target, is_call, sigma0, tol, maxiter=50):
    """Vectorised Newton-Raphson on vega (reference
    ``black_scholes_vec.py:126-146``): clamp sigma to [1e-6, 10], stop when
    every |step| < tol or maxiter reached."""

    def body(state):
        sigma, _, it = state
        px = price_core(S, K, T, r, q, sigma, is_call)
        vega = vega_core(S, K, T, r, q, sigma)
        vega_safe = jnp.where(vega > 1e-15, vega, jnp.nan)
        step = (px - target) / vega_safe
        new_sigma = jnp.clip(sigma - step, 1e-6, 10.0)
        converged = jnp.all(jnp.abs(step) < tol)
        return new_sigma, converged, it + 1

    def cond(state):
        _, converged, it = state
        return jnp.logical_and(~converged, it < maxiter)

    sigma, _, _ = jax.lax.while_loop(
        cond, body, (sigma0, jnp.asarray(False), 0)
    )
    # Mark non-converged entries NaN (reference black_scholes_vec.py:149-152).
    # The acceptance band is dtype-aware: the reference's absolute 100·tol
    # presumes f64; in f32 the attainable price residual is ~eps·|price|.
    px_final = price_core(S, K, T, r, q, sigma, is_call)
    eps = jnp.finfo(sigma.dtype).eps
    band = jnp.maximum(tol * 100.0,
                       100.0 * eps * jnp.maximum(1.0, jnp.abs(target)))
    bad = jnp.abs(px_final - target) > band
    return jnp.where(bad, jnp.nan, sigma)


def bs_implied_vol_vec(
    S, K, T, r, q, target_prices, kind,
    *, tol: float = 1e-8, maxiter: int = 50, init_vol: float = 0.3, dtype=None,
) -> jax.Array:
    """Vectorised implied vol via Newton-Raphson; non-converged entries NaN.

    API parity with reference ``black_scholes_vec.py:104-153``.
    """
    dt = canonical(dtype)
    S, K, T, r, q, target_prices = _prep(dtype, S, K, T, r, q, target_prices)
    shape = jnp.broadcast_shapes(
        S.shape, K.shape, T.shape, r.shape, q.shape, target_prices.shape
    )
    sigma0 = jnp.full(shape, init_vol, dtype=dt)
    return _iv_newton_core(
        S, K, T, r, q, target_prices, jnp.asarray(is_call_mask(kind)), sigma0,
        jnp.asarray(tol, dt), maxiter=maxiter,
    )
