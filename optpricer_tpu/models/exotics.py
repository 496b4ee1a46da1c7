"""Path-dependent exotic payoffs over pre-generated paths.

Parity with reference ``exotics.py``: every function accepts paths of shape
``(n_steps+1, n_paths_eff)`` including the t=0 row, and returns
``(price, stderr)``. Payoff evaluation is one jitted reduction over the path
matrix — the path/payoff decoupling of the reference (``exotics.py:4-9``) is
preserved so any process feeds any payoff.

For production workloads the compat path-matrix mode is complemented by
*fused* pricing in :mod:`optpricer_tpu.models.mc_fused`, which accumulates
running max/min/sum/crossed state inside the path-generation scan and never
materialises ``(n_steps, n_paths)`` in HBM.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["barrier_price", "asian_price", "digital_price", "lookback_price",
           "double_barrier_price"]

_VALID_BARRIERS = {"up-and-out", "up-and-in", "down-and-out", "down-and-in"}


def _check_kind(kind: str):
    if kind not in ("call", "put"):
        raise ValueError("kind must be 'call' or 'put'")


@jax.jit
def _mean_se(X: jax.Array):
    """(mean, stderr) with the reference's ddof=1 convention
    (``exotics.py:18-27``)."""
    n = X.size
    mean = jnp.mean(X)
    var = jnp.sum((X - mean) ** 2) / (n - 1)
    return mean, jnp.sqrt(var / n)


def _price_from_payoff(payoff: jax.Array, r, T):
    X = jnp.exp(-jnp.asarray(r, payoff.dtype) * jnp.asarray(T, payoff.dtype)) * payoff
    mean, se = _mean_se(X)
    return float(mean), float(se)


def _vanilla(ST, K, kind):
    return jnp.maximum(ST - K, 0.0) if kind == "call" else jnp.maximum(K - ST, 0.0)


def barrier_price(paths, K, r, T, kind, barrier, barrier_type,
                  rebate: float = 0.0):
    """European barrier option, discrete monitoring over the supplied paths
    (reference ``exotics.py:33-96``)."""
    if barrier_type not in _VALID_BARRIERS:
        raise ValueError(
            f"barrier_type must be one of {_VALID_BARRIERS}, got {barrier_type!r}")
    _check_kind(kind)
    paths = jnp.asarray(paths)
    ST = paths[-1, :]
    if barrier_type.startswith("up"):
        crossed = jnp.any(paths >= barrier, axis=0)
    else:
        crossed = jnp.any(paths <= barrier, axis=0)
    vanilla = _vanilla(ST, K, kind)
    if barrier_type.endswith("out"):
        payoff = jnp.where(crossed, rebate, vanilla)
    else:
        payoff = jnp.where(crossed, vanilla, rebate)
    return _price_from_payoff(payoff, r, T)


def asian_price(paths, K, r, T, kind, average_type: str = "arithmetic",
                strike_type: str = "fixed"):
    """European Asian option; the t=0 row is excluded from the average
    (reference ``exotics.py:102-163``)."""
    _check_kind(kind)
    if average_type not in ("arithmetic", "geometric"):
        raise ValueError("average_type must be 'arithmetic' or 'geometric'")
    if strike_type not in ("fixed", "floating"):
        raise ValueError("strike_type must be 'fixed' or 'floating'")
    paths = jnp.asarray(paths)
    monitoring = paths[1:, :]
    ST = paths[-1, :]
    if average_type == "arithmetic":
        avg = jnp.mean(monitoring, axis=0)
    else:
        avg = jnp.exp(jnp.mean(jnp.log(monitoring), axis=0))
    if strike_type == "fixed":
        payoff = _vanilla(avg, K, kind)
    else:
        payoff = (jnp.maximum(ST - avg, 0.0) if kind == "call"
                  else jnp.maximum(avg - ST, 0.0))
    return _price_from_payoff(payoff, r, T)


def digital_price(paths, K, r, T, kind, payout: float = 1.0):
    """Cash-or-nothing digital (reference ``exotics.py:169-209``)."""
    _check_kind(kind)
    paths = jnp.asarray(paths)
    ST = paths[-1, :]
    itm = (ST > K) if kind == "call" else (ST < K)
    payoff = jnp.where(itm, payout, 0.0).astype(paths.dtype)
    return _price_from_payoff(payoff, r, T)


def lookback_price(paths, r, T, kind, K: float = 0.0,
                   strike_type: str = "floating"):
    """Lookback option via path max/min (reference ``exotics.py:215-273``).

    Floating call: S_T − S_min; floating put: S_max − S_T;
    fixed call: max(S_max − K, 0); fixed put: max(K − S_min, 0).
    """
    _check_kind(kind)
    if strike_type not in ("floating", "fixed"):
        raise ValueError("strike_type must be 'floating' or 'fixed'")
    paths = jnp.asarray(paths)
    S_max = jnp.max(paths, axis=0)
    S_min = jnp.min(paths, axis=0)
    ST = paths[-1, :]
    if strike_type == "floating":
        payoff = (ST - S_min) if kind == "call" else (S_max - ST)
    else:
        payoff = (jnp.maximum(S_max - K, 0.0) if kind == "call"
                  else jnp.maximum(K - S_min, 0.0))
    return _price_from_payoff(payoff, r, T)


def double_barrier_price(paths, K, r, T, kind, lower, upper,
                         knock: str = "out", rebate: float = 0.0):
    """European double-barrier option, discrete monitoring over the
    supplied paths: knocked if the path ever leaves the corridor
    ``(lower, upper)``.  ``knock="out"`` pays the vanilla only on
    surviving paths (rebate at expiry otherwise); ``"in"`` the reverse —
    the conventions of :func:`barrier_price` with two barriers.

    The n_steps→∞ limit is the Ikeda-Kunitomo closed form
    (:func:`~optpricer_tpu.models.analytic.double_barrier_price_bs`);
    with discrete monitoring the KO price converges to it from ABOVE
    (a discrete extremum undershoots the continuous one).  The
    reference's barrier machinery is single-sided only
    (``exotics.py:33-96``).
    """
    _check_kind(kind)
    if knock not in ("in", "out"):
        raise ValueError("knock must be 'in' or 'out'")
    if not lower < upper:
        raise ValueError("need lower < upper")
    paths = jnp.asarray(paths)
    ST = paths[-1, :]
    crossed = jnp.any((paths >= upper) | (paths <= lower), axis=0)
    vanilla = _vanilla(ST, K, kind)
    if knock == "out":
        payoff = jnp.where(crossed, rebate, vanilla)
    else:
        payoff = jnp.where(crossed, vanilla, rebate)
    return _price_from_payoff(payoff, r, T)
