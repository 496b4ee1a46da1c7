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

__all__ = ["lsmc_price", "lsmc_price_batch", "lsmc_price_sharded",
           "lsmc_price_basket"]


@partial(jax.jit, static_argnames=("basis_dim",))
def _lsmc_backward(paths, K, r, dt, is_call, ex_mask=None, *,
                   basis_dim: int):
    """(price, stderr) from a stored path matrix, one backward scan.

    ``K``/``is_call`` may be scalars or (B,)-batched (vmapped ladder).
    ``ex_mask`` (optional, (n_steps−1,) bool over the interior dates)
    restricts exercise to the True dates — the BERMUDAN contract;
    maturity is always exercisable through the terminal payoff."""
    dtype = paths.dtype
    n_paths = paths.shape[1]
    disc = jnp.exp(-jnp.asarray(r, dtype) * dt)
    sign = jnp.where(is_call, 1.0, -1.0).astype(dtype)

    def intrinsic(S):
        return jnp.maximum(sign * (S - K), 0.0)

    ridge = jnp.asarray(1e-7, dtype)
    eye = jnp.eye(basis_dim, dtype=dtype)

    def date(cashflow, xs):
        S_t = xs if ex_mask is None else xs[0]
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
        if ex_mask is not None:
            exercise = exercise & xs[1]
        return jnp.where(exercise, ex, cont_realised), None

    cashflow = intrinsic(paths[-1])
    # exercise dates t = n_steps−1 … 1 (reversed interior rows)
    xs = paths[1:-1][::-1] if ex_mask is None \
        else (paths[1:-1][::-1], ex_mask[::-1])
    cashflow, _ = jax.lax.scan(date, cashflow, xs)
    value = disc * cashflow  # discount the t=1 cashflow to t=0
    mean = jnp.mean(value)
    se = jnp.sqrt(jnp.maximum(
        jnp.sum((value - mean) ** 2) / (n_paths - 1), 0.0) / n_paths)
    if ex_mask is not None:
        # Bermudan: t=0 is not an exercise date, no intrinsic floor
        return mean, se
    # t=0 exercise decision: American value is floored at intrinsic
    return jnp.maximum(mean, intrinsic(paths[0, 0])), se


@partial(jax.jit, static_argnames=("basis_dim",))
def _lsmc_backward_betas(paths, K, r, dt, is_call, *, basis_dim: int):
    """Backward induction that also RETURNS the per-date regression
    coefficients — the exercise policy — so a second, independent path set
    can be priced under a FIXED policy (two-pass LSMC) and the
    Andersen-Broadie martingale can be built from the same value-function
    approximation. ``betas[j]`` belongs to exercise date t_{j+1}
    (j = 0 … n_steps−2)."""
    dtype = paths.dtype
    disc = jnp.exp(-jnp.asarray(r, dtype) * dt)
    sign = jnp.where(is_call, 1.0, -1.0).astype(dtype)
    ridge = jnp.asarray(1e-7, dtype)
    eye = jnp.eye(basis_dim, dtype=dtype)

    def intrinsic(S):
        return jnp.maximum(sign * (S - K), 0.0)

    def date(cashflow, S_t):
        cont = disc * cashflow
        ex = intrinsic(S_t)
        w = (ex > 0.0).astype(dtype)
        n_itm = jnp.maximum(jnp.sum(w), 1.0)
        x = S_t / K - 1.0
        X = jnp.stack([x**p for p in range(basis_dim)], axis=-1)
        Xw = X * w[:, None]
        hi = jax.lax.Precision.HIGHEST
        A = jnp.matmul(Xw.T, X, precision=hi) / n_itm
        b = jnp.matmul(Xw.T, cont, precision=hi) / n_itm
        beta = jnp.linalg.solve(A + ridge * eye, b)
        fitted = jnp.matmul(X, beta, precision=hi)
        return jnp.where((w > 0.0) & (ex > fitted), ex, cont), beta

    cashflow, betas_rev = jax.lax.scan(date, intrinsic(paths[-1]),
                                       paths[1:-1][::-1])
    return betas_rev[::-1]          # date order t_1 … t_{n_steps−1}


@partial(jax.jit, static_argnames=("basis_dim",))
def _lsmc_forward_fixed_policy(paths, betas, K, r, dt, is_call, *,
                               basis_dim: int):
    """Price a path set under a FIXED policy (stop when intrinsic exceeds
    the β-fitted continuation). On a path set independent of the fit this
    is a genuine LOW-biased estimator — any implementable policy is
    sub-optimal — with an honest stderr (two-pass LSMC)."""
    dtype = paths.dtype
    n_paths = paths.shape[1]
    sign = jnp.where(is_call, 1.0, -1.0).astype(dtype)
    r_ = jnp.asarray(r, dtype)

    def intrinsic(S):
        return jnp.maximum(sign * (S - K), 0.0)

    def date(carry, inp):
        alive, value = carry
        S_t, beta, k = inp
        ex = intrinsic(S_t)
        x = S_t / K - 1.0
        X = jnp.stack([x**p for p in range(basis_dim)], axis=-1)
        fitted = jnp.matmul(X, beta, precision=jax.lax.Precision.HIGHEST)
        stop = alive & (ex > 0.0) & (ex > fitted)
        df = jnp.exp(-r_ * dt * k.astype(dtype))
        value = value + jnp.where(stop, df * ex, 0.0)
        return (alive & ~stop, value), None

    n_dates = betas.shape[0]
    ks = jnp.arange(1, n_dates + 1)
    alive0 = jnp.ones((n_paths,), bool)
    (alive, value), _ = jax.lax.scan(
        date, (alive0, jnp.zeros((n_paths,), dtype)),
        (paths[1:-1], betas, ks))
    df_T = jnp.exp(-r_ * dt * (n_dates + 1.0))
    value = value + jnp.where(alive, df_T * intrinsic(paths[-1]), 0.0)
    mean = jnp.mean(value)
    se = jnp.sqrt(jnp.maximum(
        jnp.sum((value - mean) ** 2) / (n_paths - 1), 0.0) / n_paths)
    return jnp.maximum(mean, intrinsic(paths[0, 0])), se


@partial(jax.jit, static_argnames=("basis_dim", "n_inner", "n_steps",
                                   "n_paths"))
def _lsmc_dual_upper(key, betas, S0, K, T, r, q, sigma, is_call, *,
                     basis_dim: int, n_inner: int, n_steps: int,
                     n_paths: int = 20_000):
    """Andersen-Broadie (2004) dual UPPER bound, stopping-rule martingale.

    For ANY martingale M, V_0 ≤ E[max_k (Z_k − M_k)] (Rogers / Haugh-
    Kogan duality; Z_k = time-0-discounted intrinsic). The near-optimal
    martingale compensates the LOWER-BOUND value process of the fitted
    policy: L_k = Z_k where the policy stops, else Ĉ_k — the policy's
    continuation value estimated by ``n_inner`` nested sub-simulations
    that FOLLOW the policy forward from (k, S_k). (The cheap alternative
    — a value-function martingale from the regression polynomials — is
    NOT usable here: β is fitted on ITM paths only, and evaluating the
    polynomial out-of-region explodes the martingale increments; measured
    gaps were ~100× worse.) Martingale increments along the outer path:

        M_k − M_{k−1} = L_k − (Ĉ_{k−1} if the policy stopped at k−1
                               else L_{k−1})

    — exactly E[L_k | F_{k−1}] under the policy, so M is a martingale
    regardless of policy quality, and sub-simulation noise only ever
    RAISES E[max]: the estimate stays a valid upper bound in expectation.

    Nested cost is O(n_steps² · n_paths · n_inner) GBM steps, fully
    vectorised: the inner policy-rollout is a masked full-length scan, so
    the whole dual is a scan-of-scans — TPU-shaped, no Python loops.
    """
    dtype = betas.dtype
    dt = jnp.asarray(T / n_steps, dtype)
    sign = jnp.where(is_call, 1.0, -1.0).astype(dtype)
    r_ = jnp.asarray(r, dtype)
    c = (r_ - jnp.asarray(q, dtype) - 0.5 * sigma * sigma) * dt
    sdt = sigma * jnp.sqrt(dt)
    hi = jax.lax.Precision.HIGHEST

    def intrinsic(S):
        return jnp.maximum(sign * (S - K), 0.0)

    def policy_stop(S, beta):
        """Exercise decision of the fitted policy at an interior date."""
        ex = intrinsic(S)
        x = S / K - 1.0
        X = jnp.stack([x**p for p in range(basis_dim)], axis=-1)
        fitted = jnp.matmul(X, beta, precision=hi)
        return (ex > 0.0) & (ex > fitted), ex

    # interior-date betas padded with a terminal row (switched on j == N)
    betas_pad = jnp.concatenate([betas, jnp.zeros((1, basis_dim), dtype)])
    js = jnp.arange(1, n_steps + 1)

    def euro_value(S, tau):
        """Time-0-UNdiscounted European value at (S, τ), closed form —
        the inner control variate's exactly-known mean."""
        from jax.scipy.stats import norm

        tau_s = jnp.maximum(tau, jnp.asarray(1e-12, dtype))
        vol = sigma * jnp.sqrt(tau_s)
        d1 = (jnp.log(S / K) + (r_ - q + 0.5 * sigma * sigma) * tau_s) / vol
        d2 = d1 - vol
        fwd = S * jnp.exp(-jnp.asarray(q, dtype) * tau_s)
        kd = K * jnp.exp(-r_ * tau_s)
        call = fwd * norm.cdf(d1) - kd * norm.cdf(d2)
        euro = jnp.where(sign > 0, call, call - fwd + kd)
        return jnp.where(tau > 0, euro, intrinsic(S))

    half = max(n_inner // 2, 1)

    def continuation(key_k, S_k, k):
        """Ĉ_k: E[Z_τ | S_k], τ > k under the policy — antithetic policy
        rollouts per outer path (masked to dates j > k), variance-reduced
        by the OPTIONAL-STOPPING control variate: the European value AT
        the policy's stopping time, Y = df_τ·euro(S_τ, T−t_τ).  df_t·
        euro(S_t, ·) is a Q-martingale, so E[Y|F_k] = df_k·euro(S_k, τ_k)
        EXACTLY (the GBM step is the exact lognormal transition — no
        scheme bias, unlike the Heston dual's QE caveat), and Y tracks
        the stopped payoff df_τ·intrinsic(S_τ) with corr ≈ 0.99 (euro =
        intrinsic + smooth time value at the same state) vs ≈ 0.4 for
        the terminal-payoff CV this replaced.  β̂ = ⟨val,c⟩/⟨c,c⟩
        (date-pooled over n_paths·n_inner samples) keeps the correction
        variance-optimal; the O(1/n) pooling bias is negligible."""
        def inner_date(carry, inp):
            S, alive, val, S_s, j_s = carry
            beta_j, j = inp
            active = j > k
            zi = jax.random.normal(
                jax.random.fold_in(key_k, j), (half, S.shape[1]), dtype)
            zi = jnp.concatenate([zi, -zi], axis=0)
            S_new = jnp.where(active, S * jnp.exp(c + sdt * zi), S)
            stop_j, ex = policy_stop(S_new, beta_j)
            stop = active & alive & (stop_j | (j == n_steps))
            df = jnp.exp(-r_ * dt * j.astype(dtype))
            val = val + jnp.where(stop, df * ex, 0.0)
            S_s = jnp.where(stop, S_new, S_s)
            j_s = jnp.where(stop, j.astype(dtype), j_s)
            return (S_new, alive & ~stop, val, S_s, j_s), None

        S_in = jnp.broadcast_to(S_k[None, :], (2 * half, S_k.shape[0]))
        zerosf = jnp.zeros(S_in.shape, dtype)
        (_, _, val, S_s, j_s), _ = jax.lax.scan(
            inner_date,
            (S_in, jnp.ones(S_in.shape, bool), zerosf, S_in, zerosf),
            (betas_pad, js))
        tau_s = dt * (jnp.asarray(n_steps, dtype) - j_s)
        y = jnp.exp(-r_ * dt * j_s) * euro_value(S_s, tau_s)
        tau_k = dt * jnp.asarray(n_steps - k, dtype)
        df_k = jnp.exp(-r_ * dt * jnp.asarray(k, dtype))
        cv = y - df_k * euro_value(S_k, tau_k)[None, :]
        cv = cv - jnp.mean(cv)
        beta_cv = jnp.sum(val * cv) / jnp.maximum(jnp.sum(cv * cv), 1e-30)
        cv = jnp.where(jnp.asarray(k) < n_steps, beta_cv * cv, 0.0)
        return jnp.mean(val - cv, axis=0)

    key_paths, key_inner = jax.random.split(key)
    z = jax.random.normal(key_paths, (n_steps, n_paths), dtype)
    S0v = jnp.full((n_paths,), S0, dtype)

    # L_0 = Ĉ_0 (the policy never exercises at t=0; see lsmc_price)
    L0 = continuation(jax.random.fold_in(key_inner, 0), S0v, 0)
    U0 = jnp.full((n_paths,), intrinsic(jnp.asarray(S0, dtype)), dtype)

    def outer_date(carry, inp):
        S_prev, L_prev, C_prev, stop_prev, M, U = carry
        z_k, beta, k = inp
        S_k = S_prev * jnp.exp(c + sdt * z_k)
        df = jnp.exp(-r_ * dt * k.astype(dtype))
        stop_k, ex = policy_stop(S_k, beta)
        stop_k = stop_k | (k == n_steps)
        Z_k = df * ex
        C_k = continuation(jax.random.fold_in(key_inner, k), S_k, k)
        L_k = jnp.where(stop_k, Z_k, C_k)
        E_L = jnp.where(stop_prev, C_prev, L_prev)
        M = M + L_k - E_L
        U = jnp.maximum(U, Z_k - M)
        return (S_k, L_k, C_k, stop_k, M, U), None

    zerosb = jnp.zeros((n_paths,), bool)
    (_, _, _, _, _, U), _ = jax.lax.scan(
        outer_date,
        (S0v, L0, L0, zerosb, jnp.zeros((n_paths,), dtype), U0),
        (z, betas_pad, js))
    mean = jnp.mean(U)
    se = jnp.sqrt(jnp.maximum(
        jnp.sum((U - mean) ** 2) / (n_paths - 1), 0.0) / n_paths)
    return mean, se


_SV_INNER_CV = True   # trace-time A/B toggle for the COS inner CV (tests)


@partial(jax.jit, static_argnames=("basis_dim", "n_inner", "n_steps",
                                   "n_paths"))
def _lsmc_dual_upper_sv(key, betas, S0, v0, kappa, theta_h, xi, rho,
                        K, T, r, q, is_call, *, basis_dim: int,
                        n_inner: int, n_steps: int,
                        n_paths: int = 8_192):
    """Andersen-Broadie dual upper bound under HESTON dynamics.

    Same stopping-rule-martingale construction as the GBM dual
    (:func:`_lsmc_dual_upper`): M compensates the policy's lower-bound
    value process, inner continuation values come from antithetic policy
    rollouts — here over the (S, v) state with the SAME Andersen-QE
    transition as the outer paths (``processes.qe_transition``), so the
    inner and outer measures agree exactly.  The inner estimate is
    variance-reduced by the European terminal payoff along the same
    sub-paths, exactly like the GBM dual — here the CV's conditional
    mean is the per-path COS European value exp(C(u)+D(u)·v_k+iu·x_k)
    (one vmapped complex matvec per outer date; C, D shared across
    paths within each call, truncation interval per path).  Two honest
    caveats, both far below the bound's own noise: (a) COS truncation
    error ~1e-6; (b) the CV mean is the CONTINUOUS-time expectation
    while the inner paths follow the discrete QE scheme, so the CV
    carries the QE weak error O(dt) — measured ≪ the ~3-5× gap
    reduction it buys (gap 0.34 → 0.10 on the test fixture at
    ``n_inner=64``).
    """
    from .processes import qe_transition

    dtype = betas.dtype
    dt = jnp.asarray(T / n_steps, dtype)
    sign = jnp.where(is_call, 1.0, -1.0).astype(dtype)
    r_ = jnp.asarray(r, dtype)
    hi = jax.lax.Precision.HIGHEST
    qe_kw = dict(r=r_, q=jnp.asarray(q, dtype), kappa=kappa,
                 theta=theta_h, xi=xi, rho=rho, dt=dt)

    def intrinsic(S):
        return jnp.maximum(sign * (S - K), 0.0)

    def policy_stop(S, v, beta):
        ex = intrinsic(S)
        X = _sv_basis(S, v, K, basis_dim)
        fitted = jnp.matmul(X, beta, precision=hi)
        return (ex > 0.0) & (ex > fitted), ex

    betas_pad = jnp.concatenate([betas,
                                 jnp.zeros((1, basis_dim), dtype)])
    js = jnp.arange(1, n_steps + 1)
    half = max(n_inner // 2, 1)

    def euro_value(S, v, tau):
        """Time-0-UNdiscounted per-sample European value at (S, v, τ) —
        the COS core vmapped over samples, each with its own cumulant
        truncation interval and remaining maturity.  N=64 terms: the CV
        only needs the value to ~1e-4 (its pooled mean error is centred
        away below), and 64 halves the per-sample cf cost."""
        from .analytic import _heston_cos_core

        K1 = jnp.atleast_1d(jnp.asarray(K, dtype))
        pp = [jnp.asarray(p, dtype)
              for p in (kappa, theta_h, xi, rho)]
        is_call_ = sign > 0

        def one(s, vv, t):
            t_s = jnp.maximum(t, 0.25 * dt)
            return _heston_cos_core(
                s, K1, t_s, r_, qe_kw["q"], vv, pp[0], pp[1], pp[2],
                pp[3], is_call_, jnp.asarray(12.0, dtype), N=64)[0]

        euro = jax.vmap(one)(S, jnp.maximum(v, 1e-8),
                             jnp.broadcast_to(tau, S.shape))
        return jnp.where(tau > 0, euro, jnp.maximum(sign * (S - K), 0.0))

    def continuation(key_k, S_k, v_k, k):
        """Ĉ_k = E[Z_τ | S_k, v_k], τ > k under the policy — antithetic
        QE rollouts per outer path, masked to dates j > k, variance-
        reduced by the OPTIONAL-STOPPING control variate: the European
        value AT THE POLICY'S STOPPING TIME, Y = df_τ·euro(S_τ, v_τ,
        T−t_τ).  Because df_t·euro(S_t, v_t) is a Q-martingale, E[Y|F_k]
        = df_k·euro(S_k, v_k, τ_k) exactly (continuous time); and Y
        tracks the stopped payoff df_τ·intrinsic(S_τ) with corr ≈ 0.99
        (euro = intrinsic + smooth time value at the same state), vs
        ≈ 0.4 for the terminal-payoff CV the GBM dual uses — measured
        85× inner-variance reduction on the test fixture."""
        def inner_date(carry, inp):
            S, v, alive, val, S_s, v_s, t_s = carry
            beta_j, j = inp
            active = j > k
            kj = jax.random.fold_in(key_k, j)
            zi = jax.random.normal(kj, (2, half, S.shape[1]), dtype)
            zv = jnp.concatenate([zi[0], -zi[0]], axis=0)
            zs = jnp.concatenate([zi[1], -zi[1]], axis=0)
            S_new, v_new = qe_transition(S, v, zv, zs, **qe_kw)
            S_new = jnp.where(active, S_new, S)
            v_new = jnp.where(active, v_new, v)
            stop_j, ex = policy_stop(S_new, v_new, beta_j)
            stop = active & alive & (stop_j | (j == n_steps))
            df = jnp.exp(-r_ * dt * j.astype(dtype))
            val = val + jnp.where(stop, df * ex, 0.0)
            # record the stopping state; τ_rem and df fold into t_s via
            # the date index (negative = not yet stopped)
            S_s = jnp.where(stop, S_new, S_s)
            v_s = jnp.where(stop, v_new, v_s)
            t_s = jnp.where(stop, j.astype(dtype), t_s)
            return (S_new, v_new, alive & ~stop, val, S_s, v_s, t_s), None

        S_in = jnp.broadcast_to(S_k[None, :], (2 * half, S_k.shape[0]))
        v_in = jnp.broadcast_to(v_k[None, :], (2 * half, v_k.shape[0]))
        zerosf = jnp.zeros(S_in.shape, dtype)
        (_, _, _, val, S_s, v_s, j_s), _ = jax.lax.scan(
            inner_date,
            (S_in, v_in, jnp.ones(S_in.shape, bool), zerosf,
             S_in, v_in, zerosf),
            (betas_pad, js))
        tau_s = dt * (jnp.asarray(n_steps, dtype) - j_s)
        df_s = jnp.exp(-r_ * dt * j_s)
        flat = lambda a: a.reshape(-1)
        y = df_s * euro_value(flat(S_s), flat(v_s),
                              flat(tau_s)).reshape(S_s.shape)
        tau_k = dt * jnp.asarray(n_steps - k, dtype)
        df_k = jnp.exp(-r_ * dt * jnp.asarray(k, dtype))
        cv = y - df_k * euro_value(S_k, v_k,
                                   jnp.broadcast_to(tau_k, S_k.shape)
                                   )[None, :]
        # Centre across ALL samples at this date: the COS mean is the
        # continuous-time expectation while the inner paths follow the
        # discrete QE scheme, whose weak error (+0.03 on the fixture at
        # dt=1/9) would otherwise bias every Ĉ_k and drift the
        # martingale.  β̂ = ⟨val,c⟩/⟨c,c⟩ (date-pooled) makes the
        # correction variance-optimal — it can never add noise.  Both
        # pool n_paths·n_inner samples, so the induced cross-path
        # coupling and O(1/n) β bias are negligible.
        cv = cv - jnp.mean(cv)
        beta_cv = jnp.sum(val * cv) / jnp.maximum(jnp.sum(cv * cv), 1e-30)
        cv = beta_cv * cv
        cv = jnp.where(jnp.asarray(k) < n_steps, cv, 0.0)
        if not _SV_INNER_CV:          # trace-time A/B toggle (tests only)
            cv = jnp.zeros_like(cv)
        return jnp.mean(val - cv, axis=0)

    key_paths, key_inner = jax.random.split(key)
    zo = jax.random.normal(key_paths, (n_steps, 2, n_paths), dtype)
    S0v = jnp.full((n_paths,), S0, dtype)
    v0v = jnp.full((n_paths,), jnp.maximum(v0, 0.0), dtype)

    L0 = continuation(jax.random.fold_in(key_inner, 0), S0v, v0v, 0)
    U0 = jnp.full((n_paths,), intrinsic(jnp.asarray(S0, dtype)), dtype)

    def outer_date(carry, inp):
        S_prev, v_prev, L_prev, C_prev, stop_prev, M, U = carry
        z_k, beta, k = inp
        S_k, v_k = qe_transition(S_prev, v_prev, z_k[0], z_k[1], **qe_kw)
        df = jnp.exp(-r_ * dt * k.astype(dtype))
        stop_k, ex = policy_stop(S_k, v_k, beta)
        stop_k = stop_k | (k == n_steps)
        Z_k = df * ex
        C_k = continuation(jax.random.fold_in(key_inner, k), S_k, v_k, k)
        L_k = jnp.where(stop_k, Z_k, C_k)
        E_L = jnp.where(stop_prev, C_prev, L_prev)
        M = M + L_k - E_L
        U = jnp.maximum(U, Z_k - M)
        return (S_k, v_k, L_k, C_k, stop_k, M, U), None

    zerosb = jnp.zeros((n_paths,), bool)
    (_, _, _, _, _, _, U), _ = jax.lax.scan(
        outer_date,
        (S0v, v0v, L0, L0, zerosb, jnp.zeros((n_paths,), dtype), U0),
        (zo, betas_pad, js))
    mean = jnp.mean(U)
    se = jnp.sqrt(jnp.maximum(
        jnp.sum((U - mean) ** 2) / (n_paths - 1), 0.0) / n_paths)
    return mean, se


_LSV_INNER_CV = True  # trace-time A/B toggle for the Black-budget CV (tests)


@partial(jax.jit, static_argnames=("basis_dim", "n_inner", "n_steps",
                                   "n_paths"))
def _lsmc_dual_upper_lsv(key, betas, model, K, is_call, *, basis_dim: int,
                         n_inner: int, n_steps: int, n_paths: int = 8_192):
    """Andersen-Broadie dual upper bound under CALIBRATED LSV dynamics.

    Same stopping-rule-martingale construction as the Heston dual
    (:func:`_lsmc_dual_upper_sv`); the only new machinery is that every
    transition — outer paths and nested policy rollouts alike — is the
    leverage-scaled step of :func:`~optpricer_tpu.models.lsv._advance_particles`
    with the per-step leverage looked up from the model's table at the
    state's log-moneyness (exactly :func:`~optpricer_tpu.models.lsv.lsv_path_matrix`'s
    step, so inner, outer and policy-fitting measures agree). ``n_steps``
    is the number of leverage-grid steps in use (``n_use ≤ model.n_steps``
    when the contract expires before the table's horizon). No closed-form
    European value exists under a leverage surface, so the inner estimate
    cannot reuse the Heston dual's COS control variate; instead it uses
    a EUROPEAN-GRADE optional-stopping CV with an exact mean and no
    model assumption: the **Black-with-variance-budget martingale**
    M_j = e^{−rT}·Black(F_j, w_j), where F_j = S_j·e^{μ(T−t_j)} is the
    carry-forward and w_j is a per-path variance BUDGET decremented by
    the variance the Euler log-step actually consumed,
    w_j = w_{j−1} − L²v̂_{j−1}Δt.  Because the Euler asset step is
    conditionally lognormal with F_{j−1}-measurable variance u, the
    Gaussian convolution semigroup of the Black formula gives
    E[Black(F e^{−u/2+√u ζ}, w−u)] = Black(F, w) EXACTLY — M is a
    discrete martingale whatever v and the leverage do, so
    Y = M_τ − M_k has E[Y|F_k] = 0 with no new assumption, and the
    bound's validity is untouched.  The budget starts at the expected
    remaining variance (ATM leverage × E[v_t] schedule) plus a 75%
    margin so exhaustion (w < 0, where the Black floor would bend the
    exactness) is a tail event.  Unlike the spot CV this tracks the
    stopped payoff through both moneyness AND remaining time, so the
    correlation is European-value-grade (~0.98 vs ~0.85 on the QE test
    fixture).  (Under ``scheme="qe"`` the asset step is Gaussian given
    the v-draw but its drift is not exactly the martingale −u/2 form;
    the small defect is absorbed by the date-pooled centering, exactly
    like the Heston dual's QE-weak-error caveat.)  The pooled β̂ makes
    the correction variance-optimal, so it can only help.
    """
    from jax.scipy.stats import norm as _norm

    from .lsv import _advance_particles, _interp_row, _qe_asset_coupling
    from .mc_fused import _exp_for, _log_for

    dtype = betas.dtype
    dt = jnp.asarray(model.T / model.n_steps, dtype)
    sign = jnp.where(is_call, 1.0, -1.0).astype(dtype)
    r_ = jnp.asarray(model.r, dtype)
    mu = jnp.asarray(model.r - model.q, dtype)
    hi = jax.lax.Precision.HIGHEST
    exp_, log_ = _exp_for(dtype), _log_for(dtype)
    n_bins = model.leverage.shape[1]
    x0 = jnp.asarray(model.x_bins[0], dtype)
    dx = jnp.asarray(model.x_bins[1] - model.x_bins[0], dtype)
    S0 = jnp.asarray(model.S0, dtype)
    log_S0 = log_(S0)
    rho = jnp.asarray(model.rho, dtype)
    adv_kw = dict(mu=mu, kappa=jnp.asarray(model.kappa, dtype),
                  theta_v=jnp.asarray(model.theta, dtype),
                  xi=jnp.asarray(model.xi, dtype), rho=rho,
                  rho_perp=jnp.sqrt(jnp.maximum(0.0, 1.0 - rho * rho)),
                  dt=dt, sqrt_dt=jnp.sqrt(dt), exp_=exp_, dt_=dtype,
                  scheme=model.scheme)
    lev_rows = jnp.asarray(model.leverage[:n_steps], dtype)  # row j−1 → date j

    def lsv_step(S, v, z2, zp, lev_row, j):
        """One leverage-scaled transition from date j−1 to date j.
        Also returns u = the asset log-step's conditional variance —
        the amount the Black-budget martingale's w must decrement."""
        x = log_(S) - (log_S0 + mu * ((j - 1).astype(dtype) * dt))
        L = _interp_row(lev_row, (x - x0) / dx, n_bins)
        S_new, v_new = _advance_particles(S, v, L, z2, zp, **adv_kw)
        v_eff = jnp.maximum(v, 0.0)
        if model.scheme == "qe":
            vbar, _ = _qe_asset_coupling(v_eff, v_new, adv_kw["kappa"],
                                         adv_kw["theta_v"], adv_kw["xi"],
                                         rho, dt, dtype)
            u = L * L * vbar * dt
        else:
            u = L * L * v_eff * dt
        return S_new, v_new, u

    K_ = jnp.asarray(K, dtype)
    n_f = jnp.asarray(n_steps, dtype)

    def black(F, w):
        """Undiscounted Black value at forward F with total variance w.
        The 1e-10 floor only ever binds on budget-exhausted tail paths."""
        sq = jnp.sqrt(jnp.maximum(w, 1e-10))
        d1 = log_(F / K_) / sq + 0.5 * sq
        d2 = d1 - sq
        call = F * _norm.cdf(d1) - K_ * _norm.cdf(d2)
        return jnp.where(is_call, call, call - F + K_)  # parity: put

    # expected remaining variance from date k (ATM leverage × E[v_t]):
    # only the CV's *correlation* depends on this schedule, never its mean
    t_i = jnp.arange(n_steps, dtype=dtype) * dt
    kap = adv_kw["kappa"]
    Ev = adv_kw["theta_v"] + (jnp.asarray(model.v0, dtype)
                              - adv_kw["theta_v"]) * jnp.exp(-kap * t_i)
    u_atm = (0.0 - x0) / dx
    i_atm = jnp.clip(jnp.floor(u_atm).astype(jnp.int32), 0, n_bins - 2)
    fr_atm = jnp.clip(u_atm - i_atm.astype(dtype), 0.0, 1.0)
    L_atm = (lev_rows[:, i_atm] * (1.0 - fr_atm)
             + lev_rows[:, i_atm + 1] * fr_atm)
    ubar = L_atm * L_atm * Ev * dt                       # (n_steps,)
    wrem = jnp.concatenate([jnp.cumsum(ubar[::-1])[::-1],
                            jnp.zeros((1,), dtype)])      # (n_steps+1,)

    def intrinsic(S):
        return jnp.maximum(sign * (S - K), 0.0)

    def policy_stop(S, v, beta):
        ex = intrinsic(S)
        X = _sv_basis(S, v, K, basis_dim)
        fitted = jnp.matmul(X, beta, precision=hi)
        return (ex > 0.0) & (ex > fitted), ex

    betas_pad = jnp.concatenate([betas,
                                 jnp.zeros((1, basis_dim), dtype)])
    js = jnp.arange(1, n_steps + 1)
    half = max(n_inner // 2, 1)

    def continuation(key_k, S_k, v_k, k):
        """Ĉ_k = E[Z_τ | S_k, v_k], τ > k under the policy — antithetic
        leverage-scaled rollouts per outer path, masked to dates j > k,
        variance-reduced by the exact-mean Black-with-variance-budget
        optional-stopping CV (see the function docstring)."""
        k_f = jnp.asarray(k, dtype)
        w_start = 1.75 * wrem[k] + jnp.asarray(1e-3, dtype)

        def inner_date(carry, inp):
            S, v, w, alive, val, m_s = carry
            beta_j, j, lev_row = inp
            active = j > k
            kj = jax.random.fold_in(key_k, j)
            zi = jax.random.normal(kj, (2, half, S.shape[1]), dtype)
            z2 = jnp.concatenate([zi[0], -zi[0]], axis=0)
            zp = jnp.concatenate([zi[1], -zi[1]], axis=0)
            S_new, v_new, u = lsv_step(S, v, z2, zp, lev_row, j)
            S_new = jnp.where(active, S_new, S)
            v_new = jnp.where(active, v_new, v)
            w_new = jnp.where(active, w - u, w)
            stop_j, ex = policy_stop(S_new, v_new, beta_j)
            stop = active & alive & (stop_j | (j == n_steps))
            df = jnp.exp(-r_ * dt * j.astype(dtype))
            val = val + jnp.where(stop, df * ex, 0.0)
            F_j = S_new * jnp.exp(mu * dt * (n_f - j.astype(dtype)))
            m_s = jnp.where(stop, black(F_j, w_new), m_s)
            return (S_new, v_new, w_new, alive & ~stop, val, m_s), None

        S_in = jnp.broadcast_to(S_k[None, :], (2 * half, S_k.shape[0]))
        v_in = jnp.broadcast_to(v_k[None, :], (2 * half, v_k.shape[0]))
        w_in = jnp.full(S_in.shape, w_start, dtype)
        zerosf = jnp.zeros(S_in.shape, dtype)
        (_, _, _, _, val, m_s), _ = jax.lax.scan(
            inner_date,
            (S_in, v_in, w_in, jnp.ones(S_in.shape, bool), zerosf,
             zerosf),
            (betas_pad, js, lev_rows))
        # Y = e^{−rT}(M_τ − M_k): exact-mean martingale increment
        F_k = S_k[None, :] * jnp.exp(mu * dt * (n_f - k_f))
        cv = jnp.exp(-r_ * n_f * dt) * (m_s - black(F_k, w_start))
        cv = cv - jnp.mean(cv)
        beta_cv = jnp.sum(val * cv) / jnp.maximum(jnp.sum(cv * cv), 1e-30)
        cv = jnp.where(jnp.asarray(k) < n_steps, beta_cv * cv, 0.0)
        if not _LSV_INNER_CV:         # trace-time A/B toggle (tests only)
            cv = jnp.zeros_like(cv)
        return jnp.mean(val - cv, axis=0)

    key_paths, key_inner = jax.random.split(key)
    zo = jax.random.normal(key_paths, (n_steps, 2, n_paths), dtype)
    S0v = jnp.full((n_paths,), S0, dtype)
    v0v = jnp.full((n_paths,), jnp.maximum(model.v0, 0.0), dtype)

    L0 = continuation(jax.random.fold_in(key_inner, 0), S0v, v0v, 0)
    U0 = jnp.full((n_paths,), intrinsic(S0), dtype)

    def outer_date(carry, inp):
        S_prev, v_prev, L_prev, C_prev, stop_prev, M, U = carry
        z_k, beta, k, lev_row = inp
        S_k, v_k, _ = lsv_step(S_prev, v_prev, z_k[0], z_k[1], lev_row, k)
        df = jnp.exp(-r_ * dt * k.astype(dtype))
        stop_k, ex = policy_stop(S_k, v_k, beta)
        stop_k = stop_k | (k == n_steps)
        Z_k = df * ex
        C_k = continuation(jax.random.fold_in(key_inner, k), S_k, v_k, k)
        L_k = jnp.where(stop_k, Z_k, C_k)
        E_L = jnp.where(stop_prev, C_prev, L_prev)
        M = M + L_k - E_L
        U = jnp.maximum(U, Z_k - M)
        return (S_k, v_k, L_k, C_k, stop_k, M, U), None

    zerosb = jnp.zeros((n_paths,), bool)
    (_, _, _, _, _, _, U), _ = jax.lax.scan(
        outer_date,
        (S0v, v0v, L0, L0, zerosb, jnp.zeros((n_paths,), dtype), U0),
        (zo, betas_pad, js, lev_rows))
    mean = jnp.mean(U)
    se = jnp.sqrt(jnp.maximum(
        jnp.sum((U - mean) ** 2) / (n_paths - 1), 0.0) / n_paths)
    return mean, se


def _bermudan_mask(exercise_dates, T: float, n_steps: int) -> np.ndarray:
    """(n_steps−1,) bool over interior dates: True where the Bermudan
    contract grants exercise. Dates snap to the step grid; a date that
    rounds to 0 is clamped to node 1 (the first representable grid time,
    same convention as ``_div_schedule``), never silently dropped."""
    mask = np.zeros(n_steps - 1, bool)
    for t_e in exercise_dates:
        if not 0.0 < t_e <= T:
            raise ValueError(f"exercise date {t_e} outside (0, T={T}]")
        i = max(1, int(round(t_e / T * n_steps)))
        if i <= n_steps - 1:
            mask[i - 1] = True
    return mask


def _sv_basis(S_t, v_t, K_ref, k: int):
    """The stochastic-vol regression design matrix, shared by every
    Heston-LSMC pass (fit, fixed-policy forward, sharded): powers of
    moneyness x = S/K_ref − 1 up to k−3, plus the variance state v and
    the cross term v·x. k ≥ 3; k = 6 is the standard
    [1, x, x², x³, v, v·x]. ONE definition — betas fitted by one pass
    are consumed by another, so the bases must never diverge."""
    x = S_t / K_ref - 1.0
    cols = [x**p for p in range(k - 2)] + [v_t, v_t * x]
    return jnp.stack(cols, axis=-1)


@partial(jax.jit, static_argnames=("basis_dim", "two_pass"))
def _lsmc_backward_sv(paths, v_paths, K, r, dt, is_call, ex_mask=None, *,
                      basis_dim: int, two_pass: bool = False):
    """Stochastic-vol LSMC backward pass: the regression state is
    (S_t, v_t), basis [1, x, x², x³, v, v·x] with x = S/K − 1 — the
    standard Longstaff-Schwartz basis extension for Heston (continuation
    value depends on the variance state, not just moneyness; omitting v
    biases the policy low wherever vol-of-vol is material).

    ``ex_mask`` (optional, (n_steps−1,) bool over interior dates)
    restricts exercise to the True dates — the BERMUDAN contract under
    Heston; maturity is always exercisable through the terminal payoff
    and t=0 carries no exercise right (no intrinsic floor).

    ``two_pass=True`` returns the per-date betas instead (fit half), so
    an independent (paths, v_paths) set can be priced under the frozen
    policy by :func:`_lsmc_forward_fixed_policy_sv`.
    """
    dtype = paths.dtype
    n_paths = paths.shape[1]
    disc = jnp.exp(-jnp.asarray(r, dtype) * dt)
    sign = jnp.where(is_call, 1.0, -1.0).astype(dtype)
    ridge = jnp.asarray(1e-7, dtype)
    k = basis_dim
    eye = jnp.eye(k, dtype=dtype)
    hi = jax.lax.Precision.HIGHEST

    def intrinsic(S):
        return jnp.maximum(sign * (S - K), 0.0)

    def basis(S_t, v_t):
        return _sv_basis(S_t, v_t, K, k)

    def date(cashflow, xs):
        if ex_mask is None:
            S_t, v_t = xs
        else:
            S_t, v_t, allowed = xs
        cont = disc * cashflow
        ex = intrinsic(S_t)
        w = (ex > 0.0).astype(dtype)
        n_itm = jnp.maximum(jnp.sum(w), 1.0)
        X = basis(S_t, v_t)
        Xw = X * w[:, None]
        A = jnp.matmul(Xw.T, X, precision=hi) / n_itm
        b = jnp.matmul(Xw.T, cont, precision=hi) / n_itm
        beta = jnp.linalg.solve(A + ridge * eye, b)
        fitted = jnp.matmul(X, beta, precision=hi)
        exercise = (w > 0.0) & (ex > fitted)
        if ex_mask is not None:
            exercise = exercise & allowed
        return jnp.where(exercise, ex, cont), beta

    xs = (paths[1:-1][::-1], v_paths[1:-1][::-1]) if ex_mask is None \
        else (paths[1:-1][::-1], v_paths[1:-1][::-1], ex_mask[::-1])
    cashflow, betas_rev = jax.lax.scan(date, intrinsic(paths[-1]), xs)
    if two_pass:
        return betas_rev[::-1]
    value = disc * cashflow
    mean = jnp.mean(value)
    se = jnp.sqrt(jnp.maximum(
        jnp.sum((value - mean) ** 2) / (n_paths - 1), 0.0) / n_paths)
    if ex_mask is not None:
        # Bermudan: t=0 is not an exercise date, no intrinsic floor
        return mean, se
    return jnp.maximum(mean, intrinsic(paths[0, 0])), se


@partial(jax.jit, static_argnames=("basis_dim",))
def _lsmc_forward_fixed_policy_sv(paths, v_paths, betas, K, r, dt, is_call,
                                  *, basis_dim: int):
    """Fixed-policy forward pass on an independent (S, v) path set —
    the genuine low-biased two-pass estimator, stochastic-vol basis."""
    dtype = paths.dtype
    n_paths = paths.shape[1]
    sign = jnp.where(is_call, 1.0, -1.0).astype(dtype)
    r_ = jnp.asarray(r, dtype)
    k = basis_dim
    hi = jax.lax.Precision.HIGHEST

    def intrinsic(S):
        return jnp.maximum(sign * (S - K), 0.0)

    def basis(S_t, v_t):
        return _sv_basis(S_t, v_t, K, k)

    def date(carry, inp):
        alive, value = carry
        S_t, v_t, beta, kk = inp
        ex = intrinsic(S_t)
        fitted = jnp.matmul(basis(S_t, v_t), beta, precision=hi)
        stop = alive & (ex > 0.0) & (ex > fitted)
        df = jnp.exp(-r_ * dt * kk.astype(dtype))
        value = value + jnp.where(stop, df * ex, 0.0)
        return (alive & ~stop, value), None

    n_dates = betas.shape[0]
    ks = jnp.arange(1, n_dates + 1)
    (alive, value), _ = jax.lax.scan(
        date, (jnp.ones((n_paths,), bool), jnp.zeros((n_paths,), dtype)),
        (paths[1:-1], v_paths[1:-1], betas, ks))
    df_T = jnp.exp(-r_ * dt * (n_dates + 1.0))
    value = value + jnp.where(alive, df_T * intrinsic(paths[-1]), 0.0)
    mean = jnp.mean(value)
    se = jnp.sqrt(jnp.maximum(
        jnp.sum((value - mean) ** 2) / (n_paths - 1), 0.0) / n_paths)
    return jnp.maximum(mean, intrinsic(paths[0, 0])), se


def lsmc_price(opt: OptionSpec, kind: Literal["call", "put"] = CALL, *,
               n_paths: int = 100_000, n_steps: int = 50,
               basis_dim: int = 4, antithetic: bool = True,
               seed: Optional[int] = None, dtype=None,
               return_stderr: bool = True, bound: Optional[str] = None,
               n_inner: int = 256, n_upper_paths: int = 8_192,
               heston: Optional[dict] = None, lsv=None,
               vg: Optional[dict] = None, nig: Optional[dict] = None,
               exercise_dates=None):
    """American vanilla price via Longstaff-Schwartz.

    Default (``bound=None``): single-pass LSMC, returns ``(price,
    stderr)`` (reference MC convention). The stderr is the plain cashflow
    stderr — it does not account for the in-sample regression bias.

    ``bound="lower"``: TWO-PASS LSMC — the policy is fitted on one path
    set and priced on an independent one, making the estimate genuinely
    low-biased with an honest confidence interval. Returns ``(price,
    stderr)``.

    ``bound="both"``: additionally computes the Andersen-Broadie dual
    UPPER bound from the same fitted policy (``n_inner`` one-step inner
    simulations per path/date over ``n_upper_paths`` fresh paths) and
    returns ``{"lower": (price, se), "upper": (price, se),
    "gap": upper − lower}`` — a true bias bracket: the BERMUDAN price
    with exercise at the ``n_steps`` simulation dates lies in
    [lower − 2se, upper + 2se] with high confidence.  (The bracket is
    now tight enough to RESOLVE the Bermudan-n price from the
    continuous American limit — a looser dual hides that distinction;
    push ``n_steps`` up to approach the continuous price.)

    ``heston={'v0','kappa','theta','xi','rho'}`` prices the American
    under HESTON dynamics instead of GBM (``opt.sigma`` is ignored): the
    exercise policy regresses on the (S, v) state with the extended
    basis [1, x, x², x³, v, v·x] — omitting v biases the policy low
    wherever vol-of-vol is material. ``bound="both"`` runs the
    Andersen-Broadie dual with nested QE rollouts over the (S, v) state
    (:func:`_lsmc_dual_upper_sv`), variance-reduced by the optional-
    stopping COS control variate — the per-path European value AT the
    policy's stopping time, whose conditional mean df_k·euro(S_k, v_k,
    τ_k) is closed-form because df·euro is a Q-martingale (5× tighter
    gap than the plain-antithetic dual at equal ``n_inner``); the ADI
    PDE (:func:`~optpricer_tpu.models.heston_pde.heston_fd_price` with
    ``exercise_dates=``) is the deterministic Bermudan oracle the
    bracket is tested against.

    ``lsv=LSVModel`` prices the American under the CALIBRATED
    local-stochastic-vol dynamics — the leverage-scaled Heston paths of
    :func:`~optpricer_tpu.models.lsv.lsv_path_matrix`, so the early-
    exercise value is consistent with the vanilla surface the leverage
    table was fitted to. Exercise dates are the leverage grid's own
    steps (``n_steps`` is ignored); ``opt.T`` may be any earlier point
    on that grid; ``opt.S0/r/q`` must match the model (``opt.sigma`` is
    ignored — the model carries the vol). Same (S, v) regression basis
    and ``bound`` support as ``heston=``.

    ``vg={'sigma','theta','nu'}`` / ``nig={'alpha','beta','delta'}``
    price the American under pure-jump LÉVY dynamics on the exact
    subordinated path matrices of :mod:`~optpricer_tpu.models.levy`
    (``opt.sigma`` is ignored).  The processes are Markov in the spot
    alone, so the standard spot-polynomial basis applies unchanged.
    Single-pass, Bermudan ``exercise_dates=`` and the two-pass
    ``bound="lower"`` are supported; ``bound="both"`` raises (the dual's
    nested rollouts are not wired for the Lévy transitions).

    ``exercise_dates=[t1, t2, ...]`` prices the BERMUDAN contract:
    exercise only at the given dates (snapped to the step grid;
    maturity is always exercisable, t=0 never). An empty list is the
    European limit; the full grid reproduces the American run exactly
    wherever the American's t=0 intrinsic floor does not bind (the
    Bermudan, lacking a t=0 right, is never floored). GBM or ``heston=``
    dynamics, single-pass only.
    """
    if bound not in (None, "lower", "both"):
        raise ValueError("bound must be None, 'lower' or 'both'")
    if sum(x is not None for x in (heston, lsv, vg, nig)) > 1:
        raise ValueError("pass at most one of heston= / lsv= / vg= / "
                         "nig= (GBM when none)")
    dt_ = canonical(dtype)
    seed_val = resolve_seed(seed)
    if lsv is not None:
        if heston is not None:
            raise ValueError("pass either heston= or lsv=, not both")
        for name in ("S0", "r", "q"):
            if abs(getattr(opt, name) - getattr(lsv, name)) > 1e-9:
                raise ValueError(
                    f"opt.{name}={getattr(opt, name)} disagrees with the "
                    f"calibrated model's {name}={getattr(lsv, name)}")
        from .lsv import lsv_path_matrix

        # generate first: lsv_path_matrix validates that opt.T lands on
        # the leverage grid (n_use ≥ 1), so the dt below is well-defined
        S, v = lsv_path_matrix(lsv, n_paths=n_paths, T=opt.T,
                               antithetic=antithetic, seed=seed_val,
                               dtype=dt_)
        n_use = S.shape[0] - 1
        k_sv = max(int(basis_dim), 6)
        args = (jnp.asarray(opt.K, dt_), jnp.asarray(opt.r, dt_),
                jnp.asarray(opt.T / n_use, dt_),
                jnp.asarray(is_call_mask(kind)))
        if exercise_dates is not None:
            if bound is not None:
                raise ValueError("exercise_dates (Bermudan) supports "
                                 "the single-pass estimator only "
                                 "(bound=None)")
            # dates snap to the LEVERAGE grid (the model's own steps)
            mask = _bermudan_mask(exercise_dates, opt.T, n_use)
            price, se = _lsmc_backward_sv(S, v, *args,
                                          jnp.asarray(mask),
                                          basis_dim=k_sv)
            return (float(price), float(se)) if return_stderr \
                else float(price)
        if bound is None:
            price, se = _lsmc_backward_sv(S, v, *args, basis_dim=k_sv)
            return (float(price), float(se)) if return_stderr \
                else float(price)
        betas = _lsmc_backward_sv(S, v, *args, basis_dim=k_sv,
                                  two_pass=True)
        S2, v2 = lsv_path_matrix(lsv, n_paths=n_paths, T=opt.T,
                                 antithetic=antithetic,
                                 seed=seed_val + 0x5EED, dtype=dt_)
        lo, lo_se = _lsmc_forward_fixed_policy_sv(S2, v2, betas, *args,
                                                  basis_dim=k_sv)
        if bound == "lower":
            return float(lo), float(lo_se)
        up, up_se = _lsmc_dual_upper_lsv(
            jax.random.key(seed_val + 0xD0A1), betas, lsv,
            jnp.asarray(opt.K, dt_), args[3], basis_dim=k_sv,
            n_inner=int(n_inner), n_steps=int(n_use),
            n_paths=int(n_upper_paths))
        lo_f, up_f = float(lo), float(up)
        return {"lower": (lo_f, float(lo_se)),
                "upper": (up_f, float(up_se)),
                "gap": up_f - lo_f}
    if heston is not None:
        from .processes import heston_paths

        k_sv = max(int(basis_dim), 6)
        args = (jnp.asarray(opt.K, dt_), jnp.asarray(opt.r, dt_),
                jnp.asarray(opt.T / n_steps, dt_),
                jnp.asarray(is_call_mask(kind)))
        hp = {k: float(heston[k])
              for k in ("v0", "kappa", "theta", "xi", "rho")}
        # Andersen QE paths: full-truncation Euler's O(Δt) bias (+0.20 of
        # spot at 50 steps on Feller-violating books) would swamp the
        # policy bias this estimator is supposed to measure
        S, v = heston_paths(opt.S0, opt.r, opt.q, hp["v0"], hp["kappa"],
                            hp["theta"], hp["xi"], hp["rho"], opt.T,
                            n_steps, n_paths, antithetic=antithetic,
                            seed=seed_val, return_variance=True, dtype=dt_,
                            scheme="qe")
        if exercise_dates is not None:
            if bound is not None:
                raise ValueError("exercise_dates (Bermudan) supports "
                                 "the single-pass estimator only "
                                 "(bound=None)")
            mask = _bermudan_mask(exercise_dates, opt.T, n_steps)
            price, se = _lsmc_backward_sv(S, v, *args,
                                          jnp.asarray(mask),
                                          basis_dim=k_sv)
            return (float(price), float(se)) if return_stderr \
                else float(price)
        if bound is None:
            price, se = _lsmc_backward_sv(S, v, *args, basis_dim=k_sv)
            return (float(price), float(se)) if return_stderr \
                else float(price)
        betas = _lsmc_backward_sv(S, v, *args, basis_dim=k_sv,
                                  two_pass=True)
        S2, v2 = heston_paths(opt.S0, opt.r, opt.q, hp["v0"], hp["kappa"],
                              hp["theta"], hp["xi"], hp["rho"], opt.T,
                              n_steps, n_paths, antithetic=antithetic,
                              seed=seed_val + 0x5EED, return_variance=True,
                              dtype=dt_, scheme="qe")
        lo, lo_se = _lsmc_forward_fixed_policy_sv(S2, v2, betas, *args,
                                                  basis_dim=k_sv)
        if bound == "lower":
            return float(lo), float(lo_se)
        up, up_se = _lsmc_dual_upper_sv(
            jax.random.key(seed_val + 0xD0A1), betas,
            jnp.asarray(opt.S0, dt_), jnp.asarray(hp["v0"], dt_),
            jnp.asarray(hp["kappa"], dt_), jnp.asarray(hp["theta"], dt_),
            jnp.asarray(hp["xi"], dt_), jnp.asarray(hp["rho"], dt_),
            *args[:1], jnp.asarray(opt.T, dt_), *args[1:2],
            jnp.asarray(opt.q, dt_), args[3], basis_dim=k_sv,
            n_inner=int(n_inner), n_steps=int(n_steps),
            n_paths=int(n_upper_paths))
        lo_f, up_f = float(lo), float(up)
        return {"lower": (lo_f, float(lo_se)),
                "upper": (up_f, float(up_se)),
                "gap": up_f - lo_f}
    args = (jnp.asarray(opt.K, dt_), jnp.asarray(opt.r, dt_),
            jnp.asarray(opt.T / n_steps, dt_),
            jnp.asarray(is_call_mask(kind)))

    if vg is not None or nig is not None:
        # Pure-jump Lévy dynamics (Markov in S, so the same spot-only
        # regression basis is valid): exact subordinated path matrices
        # from models.levy; opt.sigma is ignored — the model carries the
        # vol. The Andersen-Broadie dual needs in-rollout transitions
        # from intermediate states, which is not wired for the Lévy
        # generators — two-pass lower bound only.
        if bound == "both":
            raise ValueError(
                "bound='both' under vg=/nig= is not supported (the dual's "
                "nested rollouts are not wired for the Lévy transitions) "
                "— use bound='lower' for the honest low-biased estimate")
        from .levy import nig_paths, vg_paths

        def levy_paths(seed_k):
            if vg is not None:
                return vg_paths(opt.S0, opt.T, opt.r, opt.q,
                                sigma=vg["sigma"], theta=vg["theta"],
                                nu=vg["nu"], n_steps=n_steps,
                                n_paths=n_paths, antithetic=antithetic,
                                seed=seed_k, dtype=dt_)
            return nig_paths(opt.S0, opt.T, opt.r, opt.q,
                             alpha=nig["alpha"], beta=nig["beta"],
                             delta=nig["delta"], n_steps=n_steps,
                             n_paths=n_paths, antithetic=antithetic,
                             seed=seed_k, dtype=dt_)

        paths = levy_paths(seed_val)
        if exercise_dates is not None:
            if bound is not None:
                raise ValueError("exercise_dates (Bermudan) supports the "
                                 "single-pass estimator only (bound=None)")
            mask = _bermudan_mask(exercise_dates, opt.T, n_steps)
            price, se = _lsmc_backward(paths, *args, jnp.asarray(mask),
                                       basis_dim=int(basis_dim))
            return (float(price), float(se)) if return_stderr \
                else float(price)
        if bound is None:
            price, se = _lsmc_backward(paths, *args,
                                       basis_dim=int(basis_dim))
            return (float(price), float(se)) if return_stderr \
                else float(price)
        betas = _lsmc_backward_betas(paths, *args,
                                     basis_dim=int(basis_dim))
        paths2 = levy_paths(seed_val + 0x5EED)
        lo, lo_se = _lsmc_forward_fixed_policy(paths2, betas, *args,
                                               basis_dim=int(basis_dim))
        return float(lo), float(lo_se)

    paths = gbm_paths(opt.S0, opt.r, opt.q, opt.sigma, opt.T,
                      n_steps, n_paths, antithetic=antithetic,
                      seed=seed_val, dtype=dt_)
    if exercise_dates is not None:
        # BERMUDAN: exercise restricted to the given dates (snapped to
        # the step grid; maturity always exercisable via the terminal
        # payoff, t=0 never). Single-pass GBM estimator.
        if bound is not None:
            raise ValueError("exercise_dates (Bermudan) supports the "
                             "single-pass estimator only (bound=None)")
        mask = _bermudan_mask(exercise_dates, opt.T, n_steps)
        price, se = _lsmc_backward(paths, *args, jnp.asarray(mask),
                                   basis_dim=int(basis_dim))
        return (float(price), float(se)) if return_stderr else float(price)
    if bound is None:
        price, se = _lsmc_backward(paths, *args, basis_dim=int(basis_dim))
        return (float(price), float(se)) if return_stderr else float(price)

    betas = _lsmc_backward_betas(paths, *args, basis_dim=int(basis_dim))
    # pass 2: an INDEPENDENT path set priced under the frozen policy
    paths2 = gbm_paths(opt.S0, opt.r, opt.q, opt.sigma, opt.T,
                       n_steps, n_paths, antithetic=antithetic,
                       seed=seed_val + 0x5EED, dtype=dt_)
    lo, lo_se = _lsmc_forward_fixed_policy(paths2, betas, *args,
                                           basis_dim=int(basis_dim))
    if bound == "lower":
        return float(lo), float(lo_se)
    key_up = jax.random.fold_in(jax.random.key(seed_val), 0xAB)
    up, up_se = _lsmc_dual_upper(
        key_up, betas, jnp.asarray(opt.S0, dt_), jnp.asarray(opt.K, dt_),
        jnp.asarray(opt.T, dt_), jnp.asarray(opt.r, dt_),
        jnp.asarray(opt.q, dt_), jnp.asarray(opt.sigma, dt_), args[3],
        basis_dim=int(basis_dim), n_inner=int(n_inner),
        n_steps=int(n_steps), n_paths=int(n_upper_paths))
    return {"lower": (float(lo), float(lo_se)),
            "upper": (float(up), float(up_se)),
            "gap": float(up) - float(lo)}


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
                       seed: Optional[int] = None, dtype=None,
                       heston: Optional[dict] = None):
    """Mesh data-parallel Longstaff-Schwartz: a GLOBAL exercise policy.

    Paths shard across devices (per-device streams from
    ``fold_in(key, device_idx)``); at every exercise date the per-device
    normal-equation blocks XᵀWX, XᵀWy and the ITM count ride one ``psum``
    over ICI, every device solves the same (k, k) system, and exercise
    decisions apply locally. The regression therefore fits ALL paths — the
    sharded policy is statistically identical to a single-device run at the
    same total path count, unlike naive per-device LSMC whose policies
    degrade with device count. Returns ``(price, stderr)``.

    ``heston=`` switches to Heston dynamics: Andersen-QE paths generated
    per device, (S, v) regression basis [1, x, x², x³, v, v·x] — the
    sharded twin of ``lsmc_price(heston=...)``.
    """
    from jax.sharding import PartitionSpec as P

    from .processes import _gbm_core, _heston_qe_core

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
    k_dim = max(int(basis_dim), 6) if heston is not None else basis_dim
    eye = jnp.eye(k_dim, dtype=dt_)
    mkt = [jnp.asarray(v, dt_)
           for v in (opt.S0, opt.r, opt.q, opt.sigma, opt.T)]
    hp = None if heston is None else [
        jnp.asarray(heston[k], dt_)
        for k in ("v0", "kappa", "theta", "xi", "rho")]

    @partial(jax.shard_map, mesh=mesh, in_specs=P(axis), out_specs=P(),
             check_vma=False)
    def shard_fn(dev_ids):
        local_key = jax.random.fold_in(key, dev_ids[0])
        if heston is None:
            paths = _gbm_core(local_key, *mkt, n_steps=n_steps,
                              n_paths=n_local, antithetic=antithetic,
                              dtype=dt_)
            # basis() ignores v under GBM; a (rows, 1) zero broadcasts
            # through the scan xs without the dead O(paths) HBM traffic
            v_paths = jnp.zeros((paths.shape[0], 1), dt_)
        else:
            paths, v_paths = _heston_qe_core(
                local_key, mkt[0], mkt[1], mkt[2], *hp, mkt[4],
                n_steps=n_steps, n_paths=n_local, antithetic=antithetic,
                dtype=dt_)

        def intrinsic(S):
            return jnp.maximum(sign * (S - K), 0.0)

        def basis(S_t, v_t):
            if heston is None:
                x = S_t / mkt[0] - 1.0
                return jnp.stack([x**p for p in range(k_dim)], axis=-1)
            return _sv_basis(S_t, v_t, mkt[0], k_dim)

        def date(cashflow, xs):
            S_t, v_t = xs
            y = disc * cashflow
            ex = intrinsic(S_t)
            w = (ex > 0.0).astype(dt_)
            X = basis(S_t, v_t)
            Xw = X * w[:, None]
            hi = jax.lax.Precision.HIGHEST
            # global normal equations: one psum of (k², k, 1) floats
            A = jax.lax.psum(jnp.matmul(Xw.T, X, precision=hi), axis)
            b = jax.lax.psum(jnp.matmul(Xw.T, y, precision=hi), axis)
            n_itm = jnp.maximum(jax.lax.psum(jnp.sum(w), axis), 1.0)
            beta = jnp.linalg.solve(A / n_itm + ridge * eye, b / n_itm)
            fitted = jnp.matmul(X, beta, precision=hi)
            return jnp.where((w > 0.0) & (ex > fitted), ex, y), None

        cashflow, _ = jax.lax.scan(
            date, intrinsic(paths[-1]),
            (paths[1:-1][::-1], v_paths[1:-1][::-1]))
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


# ---------------------------------------------------------------------------
# Multi-asset American: LSMC on correlated-GBM path matrices
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("n_steps", "n_paths", "antithetic"))
def _ma_path_matrix(key, S0s, r, qs, sigmas, chol, T, *,
                    n_steps: int, n_paths: int, antithetic: bool):
    """Correlated-GBM path matrix (n_steps+1, n_paths, n_assets).

    Exact per-date transitions (cumsum of exact log increments, matching
    the terminal law of ``basket.py``'s one-shot map); correlation is one
    ``z @ L.T`` matmul per date batch — MXU work, not a per-asset loop."""
    dtype = S0s.dtype
    a = S0s.shape[0]
    dt = T / n_steps
    half = n_paths // 2 if antithetic else n_paths
    z = jax.random.normal(key, (n_steps, half, a), dtype)
    if antithetic:
        z = jnp.concatenate([z, -z], axis=1)
    eps = jnp.matmul(z, chol.T, precision=jax.lax.Precision.HIGHEST)
    drift = (r - qs - 0.5 * sigmas * sigmas) * dt
    inc = drift[None, None, :] + sigmas[None, None, :] \
        * jnp.sqrt(dt) * eps
    logS = jnp.log(S0s)[None, None, :] + jnp.cumsum(inc, axis=0)
    S = jnp.exp(logS)
    return jnp.concatenate(
        [jnp.broadcast_to(S0s, (1, S.shape[1], a)), S], axis=0)


def _ma_intrinsic(S_t, w, K, sign, payoff: str):
    if payoff == "basket":
        stat = jnp.matmul(S_t, w, precision=jax.lax.Precision.HIGHEST)
    elif payoff == "rainbow_max":
        stat = jnp.max(S_t, axis=-1)
    else:  # rainbow_min
        stat = jnp.min(S_t, axis=-1)
    return jnp.maximum(sign * (stat - K), 0.0)


def _ma_basis(S_t, w, K):
    """Regression features for the multi-asset continuation value:
    basket moneyness + the two largest (sorted) normalised prices with
    their squares and cross term — the standard Longstaff-Schwartz basis
    for max/basket options (Andersen & Broadie 2004 use the same sorted-
    asset polynomials). 9 features; single-asset books degenerate y2 to
    y1 and the ridge keeps the normal equations solvable."""
    b = jnp.matmul(S_t, w, precision=jax.lax.Precision.HIGHEST) / K - 1.0
    ys = -jnp.sort(-(S_t / K), axis=-1)
    y1 = ys[..., 0] - 1.0
    y2 = ys[..., 1] - 1.0 if S_t.shape[-1] > 1 else jnp.zeros_like(y1)
    one = jnp.ones_like(b)
    return jnp.stack([one, b, b * b, y1, y1 * y1, y1 * y1 * y1,
                      y2, y2 * y2, y1 * y2], axis=-1)


_MA_K = 9  # features in _ma_basis


@partial(jax.jit, static_argnames=("payoff", "two_pass"))
def _lsmc_backward_ma(paths, w, K, r, dt, sign, *, payoff: str,
                      two_pass: bool = False):
    """Multi-asset backward induction — same scan/normal-equation design
    as :func:`_lsmc_backward`, regression state = the full asset vector."""
    dtype = paths.dtype
    n_paths = paths.shape[1]
    disc = jnp.exp(-jnp.asarray(r, dtype) * dt)
    ridge = jnp.asarray(1e-7, dtype)
    eye = jnp.eye(_MA_K, dtype=dtype)
    hi = jax.lax.Precision.HIGHEST

    def date(cashflow, S_t):
        cont = disc * cashflow
        ex = _ma_intrinsic(S_t, w, K, sign, payoff)
        wgt = (ex > 0.0).astype(dtype)
        n_itm = jnp.maximum(jnp.sum(wgt), 1.0)
        X = _ma_basis(S_t, w, K)
        Xw = X * wgt[:, None]
        A = jnp.matmul(Xw.T, X, precision=hi) / n_itm
        b = jnp.matmul(Xw.T, cont, precision=hi) / n_itm
        beta = jnp.linalg.solve(A + ridge * eye, b)
        fitted = jnp.matmul(X, beta, precision=hi)
        return jnp.where((wgt > 0.0) & (ex > fitted), ex, cont), beta

    cashflow, betas_rev = jax.lax.scan(
        date, _ma_intrinsic(paths[-1], w, K, sign, payoff),
        paths[1:-1][::-1])
    if two_pass:
        return betas_rev[::-1]
    value = disc * cashflow
    mean = jnp.mean(value)
    se = jnp.sqrt(jnp.maximum(
        jnp.sum((value - mean) ** 2) / (n_paths - 1), 0.0) / n_paths)
    ex0 = _ma_intrinsic(paths[0, :1], w, K, sign, payoff)[0]
    return jnp.maximum(mean, ex0), se


@partial(jax.jit, static_argnames=("payoff",))
def _lsmc_forward_fixed_policy_ma(paths, betas, w, K, r, dt, sign, *,
                                  payoff: str):
    """Fixed-policy forward pass on an independent multi-asset path set
    (two-pass low-biased estimator, multi-asset basis)."""
    dtype = paths.dtype
    n_paths = paths.shape[1]
    r_ = jnp.asarray(r, dtype)
    hi = jax.lax.Precision.HIGHEST

    def date(carry, inp):
        alive, value = carry
        S_t, beta, kk = inp
        ex = _ma_intrinsic(S_t, w, K, sign, payoff)
        fitted = jnp.matmul(_ma_basis(S_t, w, K), beta, precision=hi)
        stop = alive & (ex > 0.0) & (ex > fitted)
        df = jnp.exp(-r_ * dt * kk.astype(dtype))
        value = value + jnp.where(stop, df * ex, 0.0)
        return (alive & ~stop, value), None

    n_dates = betas.shape[0]
    ks = jnp.arange(1, n_dates + 1)
    (alive, value), _ = jax.lax.scan(
        date, (jnp.ones((n_paths,), bool), jnp.zeros((n_paths,), dtype)),
        (paths[1:-1], betas, ks))
    df_T = jnp.exp(-r_ * dt * (n_dates + 1.0))
    value = value + jnp.where(
        alive, df_T * _ma_intrinsic(paths[-1], w, K, sign, payoff), 0.0)
    mean = jnp.mean(value)
    se = jnp.sqrt(jnp.maximum(
        jnp.sum((value - mean) ** 2) / (n_paths - 1), 0.0) / n_paths)
    ex0 = _ma_intrinsic(paths[0, :1], w, K, sign, payoff)[0]
    return jnp.maximum(mean, ex0), se


def lsmc_price_basket(S0s, weights, K, T, r, qs=None, *, sigmas, corr,
                      kind: str = "call", payoff: str = "basket",
                      n_paths: int = 200_000, n_steps: int = 50,
                      antithetic: bool = True, seed: Optional[int] = None,
                      dtype=None, bound: Optional[str] = None):
    """American/Bermudan MULTI-ASSET option via Longstaff-Schwartz.

    Correlated-GBM exercise over ``n_steps`` equally spaced dates (the
    Bermudan-with-n-dates contract; large ``n_steps`` approaches the
    American). ``payoff``: ``"basket"`` (Σw·S vs K, weights on the
    simplex), ``"rainbow_max"`` (best-of) or ``"rainbow_min"`` (worst-of)
    — ``weights`` only price the basket; rainbow intrinsics ignore them
    but they still shape the regression basis. Regression features are
    the basket moneyness plus sorted-asset polynomials (Andersen &
    Broadie 2004); the per-date normal equations are MXU matmuls exactly
    as in the single-asset engine.

    ``bound=None`` — single-pass LSMC, ``(price, stderr)``.
    ``bound="lower"`` — two-pass: policy fitted on one path set, priced
    on an independent one (honest low-biased estimate).

    Oracle anchor: the Andersen-Broadie (2004) 2-asset Bermudan max-call
    (S0=100, K=100, r=5%, q=10%, σ=20%, ρ=0, T=3, 9 dates) = 13.902,
    reproduced in tests/test_american_basket.py. Multi-asset extension
    of the reference's single-asset American engines (binomial.py:28-36,
    pde.py:205-207). European limit cross-checked against
    :func:`~optpricer_tpu.models.basket.basket_price_mc`.
    """
    if payoff not in ("basket", "rainbow_max", "rainbow_min"):
        raise ValueError("payoff must be 'basket', 'rainbow_max' or "
                         "'rainbow_min'")
    if bound not in (None, "lower"):
        raise ValueError("bound must be None or 'lower' (the dual upper "
                         "bound is single-asset only)")
    if kind not in ("call", "put"):
        raise ValueError("kind must be 'call' or 'put'")
    dt_ = canonical(dtype)
    S0s = np.atleast_1d(np.asarray(S0s, np.float64))
    a = S0s.size
    w = np.atleast_1d(np.asarray(weights, np.float64))
    qs_np = np.zeros(a) if qs is None else np.atleast_1d(
        np.asarray(qs, np.float64))
    sig = np.atleast_1d(np.asarray(sigmas, np.float64))
    corr = np.asarray(corr, np.float64)
    if not (w.shape == qs_np.shape == sig.shape == (a,)) \
            or corr.shape != (a, a):
        raise ValueError("S0s, weights, qs, sigmas must be length-a "
                         "vectors and corr an (a, a) matrix")
    if payoff == "basket" and (np.any(w < 0.0)
                               or abs(w.sum() - 1.0) > 1e-9):
        raise ValueError("basket weights must be non-negative and sum "
                         "to 1")
    chol = np.linalg.cholesky(corr)
    seed_val = resolve_seed(seed)

    gen_args = (jnp.asarray(S0s, dt_), jnp.asarray(r, dt_),
                jnp.asarray(qs_np, dt_), jnp.asarray(sig, dt_),
                jnp.asarray(chol, dt_), jnp.asarray(T, dt_))
    bw_args = (jnp.asarray(w, dt_), jnp.asarray(K, dt_),
               jnp.asarray(r, dt_), jnp.asarray(T / n_steps, dt_),
               jnp.asarray(1.0 if kind == "call" else -1.0, dt_))
    static = dict(n_steps=int(n_steps), n_paths=int(n_paths),
                  antithetic=bool(antithetic))
    paths = _ma_path_matrix(jax.random.key(seed_val), *gen_args, **static)
    if bound is None:
        price, se = _lsmc_backward_ma(paths, *bw_args, payoff=payoff)
        return float(price), float(se)
    betas = _lsmc_backward_ma(paths, *bw_args, payoff=payoff,
                              two_pass=True)
    paths2 = _ma_path_matrix(jax.random.key(seed_val + 0x5EED),
                             *gen_args, **static)
    lo, lo_se = _lsmc_forward_fixed_policy_ma(paths2, betas, *bw_args,
                                              payoff=payoff)
    return float(lo), float(lo_se)
