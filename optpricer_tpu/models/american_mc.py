"""American Monte-Carlo: Longstaff-Schwartz with MXU regression.

Beyond the reference's scope (its American engines are the CRR lattice,
``binomial.py``, and the projected PDE, ``pde.py:205-207``) — LSMC is the
natural Monte-Carlo American engine and a showcase for TPU batched linear
algebra: at every exercise date the continuation value is a polynomial
regression over all in-the-money paths, and the normal-equation products
XᵀWX / XᵀWY are (k × n_paths)·(n_paths × k) matmuls that run on the MXU.
The whole backward induction is one ``lax.scan`` over the stored path
matrix; a strike ladder shares one path matrix and vmaps the backward pass.

Method (Longstaff & Schwartz 2001):
  * regress the discounted realised continuation cashflow on a polynomial
    basis of moneyness x = S/K, ITM paths only (zero-weighted via a 0/1
    mask, which keeps shapes static for XLA);
  * exercise when intrinsic > fitted continuation;
  * the t=0 price is the discounted cashflow mean (no regression at t=0);
    immediate exercise is enforced by flooring at intrinsic.

The regression matrix is normalised by the ITM count and solved with a tiny
ridge so dates with few (or zero) ITM paths stay well-posed; matmuls run at
``Precision.HIGHEST`` — the default bf16 MXU path is fatal for normal
equations in f32.
"""
from __future__ import annotations

from functools import partial
from typing import Literal, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import CALL, OptionSpec
from ..dtypes import canonical
from ..ops.black_scholes import is_call_mask
from .monte_carlo import resolve_seed
from .processes import gbm_paths

__all__ = ["lsmc_price", "lsmc_price_batch", "lsmc_price_sharded"]


@partial(jax.jit, static_argnames=("basis_dim",))
def _lsmc_backward(paths, K, r, dt, is_call, *, basis_dim: int):
    """(price, stderr) from a stored path matrix, one backward scan.

    ``K``/``is_call`` may be scalars or (B,)-batched (vmapped ladder)."""
    dtype = paths.dtype
    n_paths = paths.shape[1]
    disc = jnp.exp(-jnp.asarray(r, dtype) * dt)
    sign = jnp.where(is_call, 1.0, -1.0).astype(dtype)

    def intrinsic(S):
        return jnp.maximum(sign * (S - K), 0.0)

    ridge = jnp.asarray(1e-7, dtype)
    eye = jnp.eye(basis_dim, dtype=dtype)

    def date(cashflow, S_t):
        cont_realised = disc * cashflow
        ex = intrinsic(S_t)
        w = (ex > 0.0).astype(dtype)
        n_itm = jnp.maximum(jnp.sum(w), 1.0)
        # centred Vandermonde basis in moneyness: powers of (S/K − 1) keep
        # the normal equations well-conditioned in f32 (raw powers of S/K
        # cost ~2 decimal digits at k=4)
        x = S_t / K - 1.0
        X = jnp.stack([x**p for p in range(basis_dim)], axis=-1)
        Xw = X * w[:, None]
        # normal equations, ITM-count normalised for conditioning
        A = jnp.matmul(Xw.T, X, precision=jax.lax.Precision.HIGHEST) / n_itm
        b = jnp.matmul(Xw.T, cont_realised,
                       precision=jax.lax.Precision.HIGHEST) / n_itm
        beta = jnp.linalg.solve(A + ridge * eye, b)
        fitted = jnp.matmul(X, beta, precision=jax.lax.Precision.HIGHEST)
        exercise = (w > 0.0) & (ex > fitted)
        return jnp.where(exercise, ex, cont_realised), None

    cashflow = intrinsic(paths[-1])
    # exercise dates t = n_steps−1 … 1 (reversed interior rows)
    cashflow, _ = jax.lax.scan(date, cashflow, paths[1:-1][::-1])
    value = disc * cashflow  # discount the t=1 cashflow to t=0
    mean = jnp.mean(value)
    se = jnp.sqrt(jnp.maximum(
        jnp.sum((value - mean) ** 2) / (n_paths - 1), 0.0) / n_paths)
    # t=0 exercise decision: American value is floored at intrinsic
    return jnp.maximum(mean, intrinsic(paths[0, 0])), se


def lsmc_price(opt: OptionSpec, kind: Literal["call", "put"] = CALL, *,
               n_paths: int = 100_000, n_steps: int = 50,
               basis_dim: int = 4, antithetic: bool = True,
               seed: Optional[int] = None, dtype=None,
               return_stderr: bool = True):
    """American vanilla price via Longstaff-Schwartz.

    Returns ``(price, stderr)`` (reference MC convention). The stderr is the
    plain cashflow stderr — it does not account for the in-sample regression
    bias (standard LSMC caveat; the low bias is covered by the CRR/PSOR
    agreement tests).
    """
    dt_ = canonical(dtype)
    paths = gbm_paths(opt.S0, opt.r, opt.q, opt.sigma, opt.T,
                      n_steps, n_paths, antithetic=antithetic,
                      seed=resolve_seed(seed), dtype=dt_)
    price, se = _lsmc_backward(
        paths, jnp.asarray(opt.K, dt_), jnp.asarray(opt.r, dt_),
        jnp.asarray(opt.T / n_steps, dt_), jnp.asarray(is_call_mask(kind)),
        basis_dim=int(basis_dim))
    return (float(price), float(se)) if return_stderr else float(price)


@partial(jax.jit, static_argnames=("basis_dim",))
def _lsmc_backward_batch(paths, K_b, r, dt, is_call_b, *, basis_dim: int):
    """Backward pass for a whole strike/kind ladder over one path matrix.

    The basis lives in the strike-INDEPENDENT variable s = S_t/S0, so the
    design matrix X and the per-path outer features X⊗X are shared across
    the ladder; per-strike normal equations reduce to two dense matmuls per
    date — (B, n)·(n, k²) for XᵀWX and (B, n)·(n, k) for XᵀWy — exactly the
    MXU's shape. Nothing of size (B, n, k) is ever materialised.
    """
    dtype = paths.dtype
    n_paths = paths.shape[1]
    k = basis_dim
    disc = jnp.exp(-jnp.asarray(r, dtype) * dt)
    sign = jnp.where(is_call_b, 1.0, -1.0).astype(dtype)[:, None]  # (B, 1)
    K_col = K_b[:, None]                                           # (B, 1)
    S_ref = paths[0, 0]
    hi = jax.lax.Precision.HIGHEST
    ridge = jnp.asarray(1e-7, dtype)
    eye = jnp.eye(k, dtype=dtype)

    def intrinsic(S_row):
        return jnp.maximum(sign * (S_row[None, :] - K_col), 0.0)  # (B, n)

    def date(cash, S_t):
        y = disc * cash                                  # (B, n)
        ex = intrinsic(S_t)
        w = (ex > 0.0).astype(dtype)
        n_itm = jnp.maximum(jnp.sum(w, axis=1), 1.0)     # (B,)
        x = S_t / S_ref - 1.0
        X = jnp.stack([x**p for p in range(k)], axis=-1)           # (n, k)
        F = (X[:, :, None] * X[:, None, :]).reshape(n_paths, k * k)
        A = jnp.matmul(w, F, precision=hi).reshape(-1, k, k) \
            / n_itm[:, None, None]
        b = jnp.matmul(w * y, X, precision=hi) / n_itm[:, None]    # (B, k)
        beta = jnp.linalg.solve(A + ridge * eye, b[..., None])[..., 0]
        fitted = jnp.matmul(beta, X.T, precision=hi)               # (B, n)
        return jnp.where((w > 0.0) & (ex > fitted), ex, y), None

    cash = intrinsic(paths[-1])
    cash, _ = jax.lax.scan(date, cash, paths[1:-1][::-1])
    value = disc * cash
    mean = jnp.mean(value, axis=1)
    return jnp.maximum(mean, intrinsic(paths[:1, 0])[:, 0])


def lsmc_price_sharded(mesh, opt: OptionSpec,
                       kind: Literal["call", "put"] = CALL, *,
                       n_paths: int = 100_000, n_steps: int = 50,
                       basis_dim: int = 4, antithetic: bool = True,
                       seed: Optional[int] = None, dtype=None):
    """Mesh data-parallel Longstaff-Schwartz: a GLOBAL exercise policy.

    Paths shard across devices (per-device streams from
    ``fold_in(key, device_idx)``); at every exercise date the per-device
    normal-equation blocks XᵀWX, XᵀWy and the ITM count ride one ``psum``
    over ICI, every device solves the same (k, k) system, and exercise
    decisions apply locally. The regression therefore fits ALL paths — the
    sharded policy is statistically identical to a single-device run at the
    same total path count, unlike naive per-device LSMC whose policies
    degrade with device count. Returns ``(price, stderr)``.
    """
    from jax.sharding import PartitionSpec as P

    from .processes import _gbm_core

    dt_ = canonical(dtype)
    from ..parallel.mesh import mesh_axes

    axis = mesh_axes(mesh)
    n_dev = int(mesh.devices.size)
    n_local = -(-int(n_paths) // n_dev)
    key = jax.random.key(resolve_seed(seed))
    sign = jnp.asarray(1.0 if is_call_mask(kind) else -1.0, dt_)
    K = jnp.asarray(opt.K, dt_)
    dt_step = jnp.asarray(opt.T / n_steps, dt_)
    disc = jnp.exp(-jnp.asarray(opt.r, dt_) * dt_step)
    ridge = jnp.asarray(1e-7, dt_)
    eye = jnp.eye(basis_dim, dtype=dt_)
    mkt = [jnp.asarray(v, dt_)
           for v in (opt.S0, opt.r, opt.q, opt.sigma, opt.T)]

    @partial(jax.shard_map, mesh=mesh, in_specs=P(axis), out_specs=P(),
             check_vma=False)
    def shard_fn(dev_ids):
        local_key = jax.random.fold_in(key, dev_ids[0])
        paths = _gbm_core(local_key, *mkt, n_steps=n_steps,
                          n_paths=n_local, antithetic=antithetic, dtype=dt_)

        def intrinsic(S):
            return jnp.maximum(sign * (S - K), 0.0)

        def date(cashflow, S_t):
            y = disc * cashflow
            ex = intrinsic(S_t)
            w = (ex > 0.0).astype(dt_)
            x = S_t / mkt[0] - 1.0
            X = jnp.stack([x**p for p in range(basis_dim)], axis=-1)
            Xw = X * w[:, None]
            hi = jax.lax.Precision.HIGHEST
            # global normal equations: one psum of (k², k, 1) floats
            A = jax.lax.psum(jnp.matmul(Xw.T, X, precision=hi), axis)
            b = jax.lax.psum(jnp.matmul(Xw.T, y, precision=hi), axis)
            n_itm = jnp.maximum(jax.lax.psum(jnp.sum(w), axis), 1.0)
            beta = jnp.linalg.solve(A / n_itm + ridge * eye, b / n_itm)
            fitted = jnp.matmul(X, beta, precision=hi)
            return jnp.where((w > 0.0) & (ex > fitted), ex, y), None

        cashflow, _ = jax.lax.scan(date, intrinsic(paths[-1]),
                                   paths[1:-1][::-1])
        value = disc * cashflow
        stats = jnp.stack([jnp.asarray(value.size, dt_), jnp.sum(value),
                           jnp.sum(value * value)])
        return jax.lax.psum(stats, axis)

    n, sv, sv2 = np.asarray(
        jax.device_get(shard_fn(jnp.arange(n_dev))), np.float64)
    mean = sv / n
    var = max(0.0, (sv2 - n * mean * mean) / max(n - 1.0, 1.0))
    price = max(mean, float(np.maximum(
        (1.0 if is_call_mask(kind) else -1.0) * (opt.S0 - opt.K), 0.0)))
    return float(price), float(np.sqrt(var / n))


def lsmc_price_batch(S0, K, T, r, q, sigma, kind, *, n_paths: int = 100_000,
                     n_steps: int = 50, basis_dim: int = 4,
                     antithetic: bool = True, seed: Optional[int] = None,
                     dtype=None) -> jax.Array:
    """American strike/kind ladder sharing ONE path matrix.

    The forward simulation (the expensive half) is amortised across the
    ladder and the per-date regressions for ALL strikes collapse into two
    MXU matmuls (see ``_lsmc_backward_batch``). TPU extension — no
    reference equivalent.
    """
    dt_ = canonical(dtype)
    K_arr = np.atleast_1d(np.asarray(K, dtype=float))
    mask = np.broadcast_to(np.atleast_1d(is_call_mask(kind)), K_arr.shape)
    paths = gbm_paths(S0, r, q, sigma, T, n_steps, n_paths,
                      antithetic=antithetic, seed=resolve_seed(seed),
                      dtype=dt_)
    prices = _lsmc_backward_batch(
        paths, jnp.asarray(K_arr, dt_), jnp.asarray(r, dt_),
        jnp.asarray(T / n_steps, dt_), jnp.asarray(mask),
        basis_dim=int(basis_dim))
    return prices.reshape(np.shape(K_arr))
