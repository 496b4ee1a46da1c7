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

__all__ = ["crr", "crr_vec"]


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


@partial(jax.jit, static_argnames=("N", "american", "dtype"))
def _crr_core(S0, K, sig_sqrt_dt, disc, p, is_call, *, N, american, dtype):
    """Backward induction over a (batch, N+1) value array.

    K and is_call have shape (batch,); returns (batch,) prices.
    """
    j = jnp.arange(N + 1, dtype=dtype)

    def payoff(S_nodes):
        # S_nodes (N+1,), K (batch,1) → (batch, N+1)
        call_pay = jnp.maximum(S_nodes[None, :] - K[:, None], 0.0)
        put_pay = jnp.maximum(K[:, None] - S_nodes[None, :], 0.0)
        return jnp.where(is_call[:, None], call_pay, put_pay)

    ST = S0 * jnp.exp(sig_sqrt_dt * (2.0 * j - N))
    V = payoff(ST)

    def step(V, k):
        # Continuation value at tree level k (valid nodes j = 0..k)
        cont = disc * (p * V[:, 1:] + (1.0 - p) * V[:, :-1])
        V_new = jnp.concatenate([cont, jnp.zeros_like(V[:, :1])], axis=1)
        if american:
            S_k = S0 * jnp.exp(sig_sqrt_dt * (2.0 * j - k))
            V_new = jnp.maximum(V_new, payoff(S_k))
        return V_new, None

    ks = jnp.arange(N - 1, -1, -1, dtype=dtype)
    V, _ = jax.lax.scan(step, V, ks)
    return V[:, 0]


def crr(opt: OptionSpec, kind: Literal["call", "put"] = CALL, N: int = 500,
        *, american: bool = False, dtype=None) -> float:
    """Scalar CRR price, European or American (reference ``binomial.py:7-38``)."""
    dt_, u, d, disc, p = _tree_params(opt.T, opt.r, opt.q, opt.sigma, N)
    dt = canonical(dtype)
    sig_sqrt_dt = opt.sigma * sqrt(opt.T / N)
    out = _crr_core(
        jnp.asarray(opt.S0, dt), jnp.asarray([opt.K], dt),
        jnp.asarray(sig_sqrt_dt, dt), jnp.asarray(disc, dt), jnp.asarray(p, dt),
        jnp.asarray(is_call_mask(kind)).reshape(1),
        N=int(N), american=bool(american), dtype=dt,
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
