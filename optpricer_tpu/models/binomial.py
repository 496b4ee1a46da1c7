"""Cox-Ross-Rubinstein binomial lattice, TPU-native.

Re-architecture of reference ``binomial.py``: the backward-induction Python
loop (``binomial.py:28-36,99-107``) becomes a single ``lax.scan`` over time
on a fixed-width value array (the valid prefix shrinks by one node per step;
stale tail entries are never read). ``crr_vec`` shares one tree across an
arbitrary strike/kind batch exactly like the reference (``binomial.py:44-109``)
— the batch axis is the TPU-friendly vector dimension, so a 1k-strike
American sweep is one compiled kernel.

Node prices are computed in log space: S(k, j) = S0·exp(σ√dt·(2j−k)), which
avoids the u**j overflow of repeated powers and is exact for CRR (u = 1/d).
"""
from __future__ import annotations

from functools import partial
from math import exp, sqrt
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from ..core import CALL, OptionSpec
from ..dtypes import canonical
from ..ops.black_scholes import is_call_mask

__all__ = ["crr", "crr_vec", "american_implied_vol"]


def _tree_params(T: float, r: float, q: float, sigma: float, N: int):
    """Host-side tree parameters + validity check (reference
    ``binomial.py:11-17,80-86``)."""
    if N <= 0:
        raise ValueError("N must be positive.")
    dt = T / N
    u = exp(sigma * sqrt(dt))
    d = 1.0 / u
    disc = exp(-r * dt)
    p = (exp((r - q) * dt) - d) / (u - d)
    if not (0.0 < p < 1.0):
        raise ValueError(
            "Risk-neutral prob p out of (0,1); try larger N or different params.")
    return dt, u, d, disc, p


@partial(jax.jit, static_argnames=("N", "american", "dtype",
                                   "has_bermudan"))
def _crr_core(S0, K, sig_sqrt_dt, disc, p, is_call, ex_levels=None, *,
              N, american, dtype, has_bermudan=False):
    """Backward induction over a (batch, N+1) value array.

    K and is_call have shape (batch,); returns (batch,) prices.
    ``has_bermudan``: ``ex_levels`` ((N,) bool, indexed by tree level
    k = N−1 … 0 in scan order) restricts the exercise projection to the
    marked levels — Bermudan induction (maturity is the terminal
    payoff).
    """
    j = jnp.arange(N + 1, dtype=dtype)

    def payoff(S_nodes):
        # S_nodes (N+1,), K (batch,1) → (batch, N+1)
        call_pay = jnp.maximum(S_nodes[None, :] - K[:, None], 0.0)
        put_pay = jnp.maximum(K[:, None] - S_nodes[None, :], 0.0)
        return jnp.where(is_call[:, None], call_pay, put_pay)

    ST = S0 * jnp.exp(sig_sqrt_dt * (2.0 * j - N))
    V = payoff(ST)

    def step(V, inp):
        k = inp[0] if has_bermudan else inp
        # Continuation value at tree level k (valid nodes j = 0..k)
        cont = disc * (p * V[:, 1:] + (1.0 - p) * V[:, :-1])
        V_new = jnp.concatenate([cont, jnp.zeros_like(V[:, :1])], axis=1)
        if american:
            S_k = S0 * jnp.exp(sig_sqrt_dt * (2.0 * j - k))
            V_new = jnp.maximum(V_new, payoff(S_k))
        elif has_bermudan:
            S_k = S0 * jnp.exp(sig_sqrt_dt * (2.0 * j - k))
            V_new = jnp.where(inp[1], jnp.maximum(V_new, payoff(S_k)),
                              V_new)
        return V_new, None

    ks = jnp.arange(N - 1, -1, -1, dtype=dtype)
    xs = (ks, ex_levels) if has_bermudan else ks
    V, _ = jax.lax.scan(step, V, xs)
    return V[:, 0]


def crr(opt: OptionSpec, kind: Literal["call", "put"] = CALL, N: int = 500,
        *, american: bool = False, exercise_dates=None,
        dtype=None) -> float:
    """Scalar CRR price, European or American (reference ``binomial.py:7-38``).

    ``exercise_dates=[t_1, …]`` prices a BERMUDAN: exercise only at the
    listed dates (snapped to the nearest tree level; maturity is the
    terminal payoff) — the deterministic lattice oracle the GBM LSMC
    dual bracket is tested against.  Mutually exclusive with
    ``american=True``.
    """
    if exercise_dates is not None and american:
        raise ValueError("exercise_dates (Bermudan) and american=True "
                         "are mutually exclusive")
    dt_, u, d, disc, p = _tree_params(opt.T, opt.r, opt.q, opt.sigma, N)
    dt = canonical(dtype)
    sig_sqrt_dt = opt.sigma * sqrt(opt.T / N)
    ex_kw = {}
    args_ex = ()
    if exercise_dates is not None:
        lv = {int(round(float(t) / dt_)) for t in exercise_dates}
        lv = {m for m in lv if 1 <= m <= N - 1}
        # scan order is k = N−1 … 0
        ex_levels = np.array([(N - 1 - i) in lv for i in range(N)], bool)
        args_ex = (jnp.asarray(ex_levels),)
        ex_kw = dict(has_bermudan=True)
    out = _crr_core(
        jnp.asarray(opt.S0, dt), jnp.asarray([opt.K], dt),
        jnp.asarray(sig_sqrt_dt, dt), jnp.asarray(disc, dt), jnp.asarray(p, dt),
        jnp.asarray(is_call_mask(kind)).reshape(1), *args_ex,
        N=int(N), american=bool(american), dtype=dt, **ex_kw,
    )
    return float(out[0])


def crr_vec(S0: float, K, T: float, r: float, q: float, sigma: float,
            kind, N: int = 500, *, american: bool = False,
            dtype=None) -> jax.Array:
    """Batch CRR: one tree for (S0, T, r, q, sigma), every (K, kind) priced in
    a single backward pass (reference ``binomial.py:44-109``).

    Returns prices with the same shape as ``K``.
    """
    K_arr = np.atleast_1d(np.asarray(K, dtype=float))
    kind_mask = np.atleast_1d(is_call_mask(kind))
    if kind_mask.shape != K_arr.shape:
        kind_mask = np.broadcast_to(kind_mask, K_arr.shape)

    dt_, u, d, disc, p = _tree_params(T, r, q, sigma, N)
    dt = canonical(dtype)
    sig_sqrt_dt = sigma * sqrt(T / N)
    out = _crr_core(
        jnp.asarray(S0, dt), jnp.asarray(K_arr, dt),
        jnp.asarray(sig_sqrt_dt, dt), jnp.asarray(disc, dt), jnp.asarray(p, dt),
        jnp.asarray(kind_mask),
        N=int(N), american=bool(american), dtype=dt,
    )
    return out.reshape(np.shape(K_arr))


@partial(jax.jit, static_argnames=("N", "american"))
def _crr_sigma_batch(S0, K, T, r, q, sigma, is_call, *, N: int,
                     american: bool):
    """CRR prices for a batch where EVERY entry carries its own σ
    (the inverse-pricing workhorse): per-entry tree constants broadcast
    against the node axis, same backward scan as ``_crr_core``."""
    dtype = sigma.dtype
    dt = T / N
    ssd = sigma * jnp.sqrt(dt)                       # (batch,)
    u = jnp.exp(ssd)
    d = 1.0 / u
    a = jnp.exp((r - q) * dt)
    p = jnp.clip((a - d) / jnp.maximum(u - d, 1e-12), 0.0, 1.0)[:, None]
    disc = jnp.exp(-r * dt)
    j = jnp.arange(N + 1, dtype=dtype)

    def payoff(S_nodes):
        pay_c = jnp.maximum(S_nodes - K[:, None], 0.0)
        pay_p = jnp.maximum(K[:, None] - S_nodes, 0.0)
        return jnp.where(is_call[:, None], pay_c, pay_p)

    V = payoff(S0 * jnp.exp(ssd[:, None] * (2.0 * j - N)[None, :]))

    def step(V, k):
        cont = disc * (p * V[:, 1:] + (1.0 - p) * V[:, :-1])
        V_new = jnp.concatenate([cont, jnp.zeros_like(V[:, :1])], axis=1)
        if american:
            S_k = S0 * jnp.exp(ssd[:, None] * (2.0 * j - k)[None, :])
            V_new = jnp.maximum(V_new, payoff(S_k))
        return V_new, None

    ks = jnp.arange(N - 1, -1, -1, dtype=dtype)
    V, _ = jax.lax.scan(step, V, ks)
    return V[:, 0]


@partial(jax.jit, static_argnames=("N", "n_iter"))
def _amer_iv_bisect(target, S0, K, T, r, q, is_call, lo, hi, *, N: int,
                    n_iter: int = 48):
    def body(_, bounds):
        lo, hi = bounds
        mid = 0.5 * (lo + hi)
        px = _crr_sigma_batch(S0, K, T, r, q, mid, is_call, N=N,
                              american=True)
        too_low = px < target
        return jnp.where(too_low, mid, lo), jnp.where(too_low, hi, mid)

    lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
    return 0.5 * (lo + hi)


@partial(jax.jit, static_argnames=("n_iter",))
def _amer_iv_bisect_bs2002(target, S0, K, T, r, q, is_call, lo, hi, *,
                           n_iter: int = 48):
    """σ-bisection through the Bjerksund-Stensland 2002 closed form —
    the O(1) inverse (no lattice in the loop).  The BS2002 price is
    monotone ↑ in σ like the lattice price, so the same bracket logic
    applies."""
    from .american_analytic import bjerksund_stensland_price

    def body(_, bounds):
        lo, hi = bounds
        mid = 0.5 * (lo + hi)
        px = bjerksund_stensland_price(S0, K, T, r, q, sigma=mid,
                                       kind=is_call)
        too_low = px < target
        return jnp.where(too_low, mid, lo), jnp.where(too_low, hi, mid)

    lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
    return 0.5 * (lo + hi)


def american_implied_vol(price, S0: float, K, T: float, r: float,
                         q: float = 0.0, kind="put", *, N: int = 500,
                         sigma_lo: float = 1e-3, sigma_hi: float = 5.0,
                         engine: str = "crr", dtype=None):
    """DE-AMERICANISATION: implied vol from American option prices.

    Listed single-stock options are American; quoting them through the
    European Black-Scholes inverse misprices the early-exercise premium
    (worst for ITM puts and high carry).  This inverts the CRR lattice
    instead — 48 bisections, each pricing the WHOLE chain in one
    per-entry-σ batched tree (``_crr_sigma_batch``), so a full strike
    board costs ~48 lattice passes regardless of chain length.

    Entries whose price is at or below intrinsic (immediate exercise —
    σ unidentifiable) or above the no-arbitrage cap come back NaN,
    matching ``bs_implied_vol_vec``'s convention.  Scalar in → float
    out; the reference has no American inverse at all (its
    ``implied_volatility`` is European-only, ``black_scholes.py``).

    ``engine="bs2002"`` inverts the Bjerksund-Stensland closed form
    instead — no lattice inside the bisection, so a chain inverts in
    ~1 ms instead of ~48 tree passes.  Its vol error is the BS2002
    price error divided by vega: ≲1e-3 vol points on typical boards
    (tested against the lattice inverse), with the worst corners on
    long-dated high-vol ITM puts.
    """
    if engine not in ("crr", "bs2002"):
        raise ValueError("engine must be 'crr' or 'bs2002'")
    dt_ = canonical(dtype)
    price_arr = np.atleast_1d(np.asarray(price, np.float64))
    K_arr = np.atleast_1d(np.asarray(K, np.float64))
    kind_mask = np.broadcast_to(np.atleast_1d(is_call_mask(kind)),
                                np.broadcast_shapes(price_arr.shape,
                                                    K_arr.shape))
    price_arr, K_arr = np.broadcast_arrays(
        price_arr, np.broadcast_to(K_arr, kind_mask.shape))
    intrinsic = np.where(kind_mask, np.maximum(S0 - K_arr, 0.0),
                         np.maximum(K_arr - S0, 0.0))
    cap = np.where(kind_mask, S0, K_arr)

    args = (jnp.asarray(price_arr, dt_), jnp.asarray(S0, dt_),
            jnp.asarray(K_arr, dt_), jnp.asarray(T, dt_),
            jnp.asarray(r, dt_), jnp.asarray(q, dt_),
            jnp.asarray(kind_mask),
            jnp.full(price_arr.shape, sigma_lo, dt_),
            jnp.full(price_arr.shape, sigma_hi, dt_))
    if engine == "bs2002":
        iv = _amer_iv_bisect_bs2002(*args)
    else:
        iv = _amer_iv_bisect(*args, N=int(N))
    iv = np.asarray(jax.device_get(iv), np.float64)
    bad = (price_arr <= intrinsic + 1e-12) | (price_arr >= cap)
    iv = np.where(bad, np.nan, iv)
    return iv if np.ndim(price) or np.ndim(K) else float(iv[0])
