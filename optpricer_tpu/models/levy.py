"""Infinite-activity Lévy models: Variance Gamma, NIG, CGMY.

The reference's only jump model is Merton's compound Poisson
(``processes.py:62-111``) — finite activity, Gaussian jumps.  This module
extends the jump family with the three standard infinite-activity pure-jump
models, reusing the package's COS machinery (the cumulant-truncated cosine
expansion of Fang-Oosterlee, one complex matvec per strike batch on the
MXU — see ``analytic._heston_cos_core``) with the models' closed-form
characteristic functions:

* **Variance Gamma** (Madan-Carr-Chang 1998): Brownian motion with drift
  time-changed by a gamma subordinator.
* **NIG** (Barndorff-Nielsen 1997): Brownian motion with drift time-changed
  by an inverse-Gaussian subordinator.
* **CGMY** (Carr-Geman-Madan-Yor 2002): tempered-stable generalisation
  containing VG as its Y→0 limit.

Each pricer enforces the risk-neutral martingale correction ω so that
E[S_T] = S0·e^{(r−q)T} by construction.  ``vg_paths`` / ``nig_paths``
simulate the EXACT subordinated transitions (gamma increments via
``jax.random.gamma``; inverse-Gaussian via the Michael-Schucany-Haas
transform, branchless) and follow the package's paths protocol —
``(n_steps+1, n_paths_eff)`` with a t=0 row, antithetic doubling columns
(reference ``processes.py:3-5``) — so every path-matrix exotic consumes
them unchanged.  CGMY has no elementary subordinator; it is priced COS-only
here (simulation would need its shot-noise series representation).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..dtypes import canonical
from ..ops.black_scholes import is_call_mask
from .monte_carlo import resolve_seed

__all__ = [
    "vg_price_cos",
    "nig_price_cos",
    "cgmy_price_cos",
    "vg_paths",
    "nig_paths",
    "fit_vg",
]


# ---------------------------------------------------------------------------
# Generic Lévy COS core
# ---------------------------------------------------------------------------

def _levy_cos_put_call(S0, K, T, r, q, phi, c1, c2, c4, is_call, N: int):
    """COS price given the log-return cf φ(u) (drift + ω included) and its
    cumulants.  Truncation [a, b] = c1 ∓ L√(c2 + √c4) with L = 10 — the
    Fang-Oosterlee recipe for Lévy models, where the 4th cumulant guards
    the heavy tails that c2 alone under-covers.  Same put-first /
    parity-recovered-call, exactly-range-reduced phase and binary-doubled
    phasor construction as ``analytic._heston_cos_core`` (complex matvec
    → MXU)."""
    from .analytic import _cos_chi_psi

    dt_ = S0.dtype
    cdt = jnp.complex128 if dt_ == jnp.float64 else jnp.complex64

    L = jnp.asarray(10.0, dt_)
    spread = L * jnp.sqrt(jnp.maximum(c2 + jnp.sqrt(jnp.maximum(c4, 0.0)),
                                      1e-12))
    a = c1 - spread
    b = c1 + spread

    ks = jnp.arange(N, dtype=dt_)
    u = ks * jnp.pi / (b - a)
    phi_k = phi(u.astype(cdt))

    chi, psi = _cos_chi_psi(ks, a, b, a, jnp.minimum(b, 0.0), dt_)
    Uk = 2.0 / (b - a) * (psi - chi)      # put payoff K(1 − e^y)⁺ / K

    x = jnp.log(S0 / K)                   # (n_K,)
    w = jnp.ones((N,), dt_).at[0].set(0.5)
    coef = (phi_k * (w * Uk).astype(cdt))
    theta1 = (jnp.pi * (x - a) / (b - a)).astype(dt_)
    cur = (jnp.cos(theta1) + 1j * jnp.sin(theta1)).astype(cdt)[:, None]
    pows = jnp.ones((x.shape[0], 1), cdt)
    while pows.shape[1] < N:
        pows = jnp.concatenate([pows, pows * cur], axis=1)
        cur = cur * cur
    phase = pows[:, :N]
    put = jnp.exp(-r * T) * K * jnp.real(phase @ coef)
    put = jnp.maximum(put, 0.0)
    call = put + S0 * jnp.exp(-q * T) - K * jnp.exp(-r * T)
    return jnp.where(is_call, call, put)


def _prep(S0, K, T, r, q, kind, extra, dtype):
    dt_ = canonical(dtype) if dtype is not None else (
        jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    vals = [jnp.asarray(v, dt_) for v in (S0, K, T, r, q, *extra)]
    is_call = jnp.asarray(is_call_mask(kind))
    scalar = jnp.ndim(K) == 0 and jnp.ndim(is_call) == 0
    vals[1] = jnp.atleast_1d(vals[1])
    return dt_, vals, is_call, scalar


# ---------------------------------------------------------------------------
# Variance Gamma
# ---------------------------------------------------------------------------

def _expm1_c(z):
    """Complex expm1, elementarily (TPU supports real expm1/exp/trig but
    not the complex composite): e^{x+iy} − 1 = (expm1(x)·cos y −
    2 sin²(y/2)) + i·e^x·sin y — every term well-conditioned near 0."""
    x, y = jnp.real(z), jnp.imag(z)
    re = jnp.expm1(x) * jnp.cos(y) - 2.0 * jnp.sin(0.5 * y) ** 2
    return jax.lax.complex(re, jnp.exp(x) * jnp.sin(y))


def _vg_omega(theta, nu, sigma):
    """Martingale correction: ω = ln(1 − θν − σ²ν/2)/ν, finite only when
    θν + σ²ν/2 < 1 (the moment condition E[S_T] < ∞).  ``log1p`` keeps
    the ν→0 limit exact in f32 — plain log rounds 1 − O(ν) to 1.0 below
    ν ≈ 1e-5 and silently drops the whole correction."""
    return jnp.log1p(-(theta * nu + 0.5 * sigma * sigma * nu)) / nu


@partial(jax.jit, static_argnames=("kind", "N", "dtype"))
def vg_price_cos(S0, K, T, r, q=0.0, *, sigma, theta, nu,
                 kind: str = "call", N: int = 256, dtype=None):
    """European option under VARIANCE GAMMA via the COS method.

    VG is Brownian motion with drift θ and volatility σ run on a gamma
    clock with unit mean rate and variance rate ν: φ_VG(u) =
    (1 − iuθν + ½σ²νu²)^{−T/ν}, times the risk-neutral drift factor
    e^{iu(r−q+ω)T} with ω = ln(1 − θν − σ²ν/2)/ν so the discounted spot
    is a martingale by construction.  ν→0 collapses to Black-Scholes;
    θ < 0 produces the equity skew.  Strike batches price as one complex
    matvec (MXU).  Oracle for :func:`vg_paths` (exact transitions — the
    gamma increment law is the subordinator restricted to Δt, so
    terminal-payoff MC agrees to within stderr at ANY step count).
    """
    dt_, (S0, K, T, r, q, sig, th, nu_), is_call, scalar = _prep(
        S0, K, T, r, q, kind, (sigma, theta, nu), dtype)
    om = _vg_omega(th, nu_, sig)

    def phi(u):
        # (1 + z)^{−T/ν} with z = −iuθν + ½σ²νu²: complex log1p so the
        # ν→0 limit stays exact in f32 (see _vg_omega)
        from .analytic import _log1p_c

        iu = 1j * u
        z = -iu * th * nu_ + 0.5 * sig * sig * nu_ * u * u
        return jnp.exp(iu * (r - q + om) * T - (T / nu_) * _log1p_c(z))

    c1 = (r - q + om + th) * T
    c2 = (sig * sig + nu_ * th * th) * T
    c4 = 3.0 * (sig**4 * nu_ + 2.0 * th**4 * nu_**3
                + 4.0 * sig * sig * th * th * nu_ * nu_) * T
    out = _levy_cos_put_call(S0, K, T, r, q, phi, c1, c2, c4, is_call,
                             int(N))
    return out[0] if scalar and out.shape == (1,) else out


@partial(jax.jit,
         static_argnames=("n_steps", "n_paths", "antithetic", "dtype"))
def _vg_paths_jit(key, S0, T, r, q, sigma, theta, nu, *, n_steps: int,
                  n_paths: int, antithetic: bool, dtype):
    dt_ = dtype
    dt = T / n_steps
    k_g, k_z = jax.random.split(key)
    # Gamma subordinator increments: shape Δt/ν, scale ν (mean Δt)
    g = jax.random.gamma(k_g, jnp.asarray(dt / nu, dt_),
                         (n_steps, n_paths), dt_) * nu
    Z = jax.random.normal(k_z, (n_steps, n_paths), dt_)
    if antithetic:
        # pairs share the subordinator clock; the conditionally-Gaussian
        # part is negated (same scheme as Merton's shared jump counts,
        # reference processes.py:92-101)
        g = jnp.concatenate([g, g], axis=1)
        Z = jnp.concatenate([Z, -Z], axis=1)
    om = _vg_omega(jnp.asarray(theta, dt_), jnp.asarray(nu, dt_),
                   jnp.asarray(sigma, dt_))
    inc = ((r - q + om) * dt + theta * g
           + sigma * jnp.sqrt(g) * Z).astype(dt_)
    log_rel = jnp.cumsum(inc, axis=0)
    n_eff = 2 * n_paths if antithetic else n_paths
    top = jnp.zeros((1, n_eff), dt_)
    return S0 * jnp.exp(jnp.concatenate([top, log_rel], axis=0))


def vg_paths(S0: float, T: float, r: float, q: float = 0.0, *,
             sigma: float, theta: float, nu: float, n_steps: int = 252,
             n_paths: int = 10_000, antithetic: bool = True,
             seed: Optional[int] = None, dtype=None) -> jax.Array:
    """Exact Variance-Gamma paths (gamma-subordinated Brownian motion).

    Each increment draws the gamma clock g ~ Γ(Δt/ν, ν) then the
    conditional Gaussian θg + σ√g·Z — the exact VG transition, so there
    is no discretisation bias at any step count.  Paths protocol as the
    reference (``processes.py:3-5``): shape ``(n_steps+1, n_paths_eff)``,
    t=0 row, antithetic doubles columns (pairs share the clock).  Feeds
    the path-matrix exotics API directly; :func:`vg_price_cos` is the
    vanilla oracle.
    """
    if n_steps <= 0 or n_paths <= 0:
        raise ValueError("n_steps and n_paths must be positive.")
    if not 0.0 < 1.0 - theta * nu - 0.5 * sigma * sigma * nu:
        raise ValueError("VG moment condition violated: need "
                         "theta*nu + sigma^2*nu/2 < 1")
    dt_ = canonical(dtype) if dtype is not None else (
        jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    key = jax.random.key(resolve_seed(seed))
    return _vg_paths_jit(key, jnp.asarray(S0, dt_), jnp.asarray(T, dt_),
                         jnp.asarray(r, dt_), jnp.asarray(q, dt_),
                         jnp.asarray(sigma, dt_), jnp.asarray(theta, dt_),
                         jnp.asarray(nu, dt_), n_steps=int(n_steps),
                         n_paths=int(n_paths), antithetic=bool(antithetic),
                         dtype=dt_)


# ---------------------------------------------------------------------------
# Normal Inverse Gaussian
# ---------------------------------------------------------------------------

def _nig_gamma(alpha, beta):
    return jnp.sqrt(alpha * alpha - beta * beta)


@partial(jax.jit, static_argnames=("kind", "N", "dtype"))
def nig_price_cos(S0, K, T, r, q=0.0, *, alpha, beta, delta,
                  kind: str = "call", N: int = 256, dtype=None):
    """European option under NORMAL INVERSE GAUSSIAN via the COS method.

    NIG(α, β, δ): φ(u) = exp(Tδ(√(α²−β²) − √(α²−(β+iu)²))) times the
    drift factor with ω = δ(√(α²−(β+1)²) − √(α²−β²)) (finite iff
    α > |β+1| — the risk-neutral moment condition, validated).  α sets
    tail heaviness, β skew, δ scale; α→∞ with δ = σ²α collapses to
    Black-Scholes.  Semi-heavy tails make NIG the standard fit for
    short-dated FX/equity smiles where VG's kurtosis decay is too slow.
    """
    dt_, (S0, K, T, r, q, al, be, de), is_call, scalar = _prep(
        S0, K, T, r, q, kind, (alpha, beta, delta), dtype)
    gam = _nig_gamma(al, be)
    om = de * (jnp.sqrt(al * al - (be + 1.0) ** 2) - gam)

    def phi(u):
        iu = 1j * u
        root = jnp.sqrt(al * al - (be + iu) ** 2)
        return jnp.exp(T * de * (gam - root) + iu * (r - q + om) * T)

    c1 = (r - q + om) * T + de * be * T / gam
    c2 = de * al * al * T / gam**3
    c4 = 3.0 * de * al * al * (al * al + 4.0 * be * be) * T / gam**7
    out = _levy_cos_put_call(S0, K, T, r, q, phi, c1, c2, c4, is_call,
                             int(N))
    return out[0] if scalar and out.shape == (1,) else out


def _sample_ig(key, mu, lam, shape, dt_):
    """Inverse-Gaussian IG(μ, λ) sampler — Michael-Schucany-Haas (1976)
    many-to-one transform, branchless: y = μχ²₁; x = μ(1 + (y −
    √(4λy + y²))/(2λ)); return x with prob μ/(μ+x), else μ²/x."""
    k_n, k_u = jax.random.split(key)
    Zc = jax.random.normal(k_n, shape, dt_)
    U = jax.random.uniform(k_u, shape, dt_)
    y = mu * Zc * Zc
    x = mu * (1.0 + (y - jnp.sqrt(4.0 * lam * y + y * y)) / (2.0 * lam))
    x = jnp.maximum(x, jnp.asarray(1e-30, dt_))
    take_x = U <= mu / (mu + x)
    return jnp.where(take_x, x, mu * mu / x)


@partial(jax.jit,
         static_argnames=("n_steps", "n_paths", "antithetic", "dtype"))
def _nig_paths_jit(key, S0, T, r, q, alpha, beta, delta, *, n_steps: int,
                   n_paths: int, antithetic: bool, dtype):
    dt_ = dtype
    dt = T / n_steps
    gam = _nig_gamma(alpha, beta)
    k_ig, k_z = jax.random.split(key)
    # IG subordinator increment for NIG(α, β, δΔt): IG(δΔt/γ, (δΔt)²)
    mu_ig = delta * dt / gam
    lam_ig = (delta * dt) ** 2
    I = _sample_ig(k_ig, mu_ig, lam_ig, (n_steps, n_paths), dt_)
    Z = jax.random.normal(k_z, (n_steps, n_paths), dt_)
    if antithetic:
        I = jnp.concatenate([I, I], axis=1)
        Z = jnp.concatenate([Z, -Z], axis=1)
    om = delta * (jnp.sqrt(alpha * alpha - (beta + 1.0) ** 2) - gam)
    inc = ((r - q + om) * dt + beta * I + jnp.sqrt(I) * Z).astype(dt_)
    log_rel = jnp.cumsum(inc, axis=0)
    n_eff = 2 * n_paths if antithetic else n_paths
    top = jnp.zeros((1, n_eff), dt_)
    return S0 * jnp.exp(jnp.concatenate([top, log_rel], axis=0))


def nig_paths(S0: float, T: float, r: float, q: float = 0.0, *,
              alpha: float, beta: float, delta: float, n_steps: int = 252,
              n_paths: int = 10_000, antithetic: bool = True,
              seed: Optional[int] = None, dtype=None) -> jax.Array:
    """Exact NIG paths (inverse-Gaussian-subordinated Brownian motion).

    Each increment draws the IG clock (Michael-Schucany-Haas transform —
    one normal + one uniform, branchless ``where`` select) then the
    conditional Gaussian βI + √I·Z — the exact NIG transition, no
    discretisation bias.  Same paths protocol/antithetic scheme as
    :func:`vg_paths`; :func:`nig_price_cos` is the vanilla oracle.
    """
    if n_steps <= 0 or n_paths <= 0:
        raise ValueError("n_steps and n_paths must be positive.")
    if not alpha > abs(beta + 1.0):
        raise ValueError("NIG moment condition violated: need "
                         "alpha > |beta + 1|")
    if not alpha > abs(beta):
        # NOT implied by the moment condition when beta < -0.5:
        # gamma = sqrt(alpha^2 - beta^2) must be real
        raise ValueError("NIG needs alpha > |beta|")
    if delta <= 0.0 or alpha <= 0.0:
        raise ValueError("need delta > 0 and alpha > 0")
    dt_ = canonical(dtype) if dtype is not None else (
        jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    key = jax.random.key(resolve_seed(seed))
    return _nig_paths_jit(key, jnp.asarray(S0, dt_), jnp.asarray(T, dt_),
                          jnp.asarray(r, dt_), jnp.asarray(q, dt_),
                          jnp.asarray(alpha, dt_), jnp.asarray(beta, dt_),
                          jnp.asarray(delta, dt_), n_steps=int(n_steps),
                          n_paths=int(n_paths),
                          antithetic=bool(antithetic), dtype=dt_)


# ---------------------------------------------------------------------------
# CGMY
# ---------------------------------------------------------------------------

def cgmy_price_cos(S0, K, T, r, q=0.0, *, C, G, M, Y,
                   kind: str = "call", N: int = 256, dtype=None):
    """Host-side parameter gate for :func:`_cgmy_price_cos_jit`.

    Y = 1 zeroes sin(πY) so Γ(−Y) is ±inf, and M ≤ 1 makes the
    martingale compensator ω complex — both would return a silent NaN
    price from the jitted body, so they are rejected here, before
    tracing, while the parameters are still Python floats.
    """
    if not 0.0 < float(Y) < 2.0 or float(Y) == 1.0:
        raise ValueError("CGMY needs Y in (0, 2) with Y != 1")
    if not float(M) > 1.0:
        raise ValueError("CGMY martingale condition needs M > 1")
    if float(G) <= 0.0 or float(C) <= 0.0:
        raise ValueError("CGMY needs C > 0 and G > 0")
    return _cgmy_price_cos_jit(S0, K, T, r, q, C=C, G=G, M=M, Y=Y,
                               kind=kind, N=N, dtype=dtype)


@partial(jax.jit, static_argnames=("kind", "N", "dtype"))
def _cgmy_price_cos_jit(S0, K, T, r, q=0.0, *, C, G, M, Y,
                        kind: str = "call", N: int = 256, dtype=None):
    """European option under CGMY (tempered stable) via the COS method.

    ψ(u) = CΓ(−Y)[(M−iu)^Y − M^Y + (G+iu)^Y − G^Y] with Y ∈ (0, 2),
    Y ≠ 1; Γ(−Y) is evaluated by the reflection formula
    Γ(−Y) = −π / (sin(πY)·Γ(1+Y)) so only ``gammaln`` of a positive
    argument is needed.  ω = −ψ(−i) enforces the martingale condition
    (finite iff M > 1, validated at the cf level by the caller's
    parameters).  Y→0 recovers Variance Gamma with ν = 1/C,
    θν = 1/M − 1/G, σ²ν = 2/(MG) — pinned in tests; Y ∈ (1, 2) gives
    infinite variation that neither VG nor NIG can express.  COS-only:
    CGMY has no elementary subordinator representation to simulate.
    """
    from jax.scipy.special import gammaln

    dt_, (S0, K, T, r, q, C_, G_, M_, Y_), is_call, scalar = _prep(
        S0, K, T, r, q, kind, (C, G, M, Y), dtype)
    gneg = -jnp.pi / (jnp.sin(jnp.pi * Y_)
                      * jnp.exp(gammaln(1.0 + Y_)))      # Γ(−Y)
    MY, GY = M_ ** Y_, G_ ** Y_

    def psi(u):
        # (M−iu)^Y − M^Y as M^Y·expm1(Y·log1p(−iu/M)): the direct
        # difference cancels catastrophically in f32 for small Y, where
        # the Γ(−Y) ~ −1/Y prefactor amplifies the rounding residual
        from .analytic import _log1p_c

        iu = 1j * u
        return C_ * gneg * (MY * _expm1_c(Y_ * _log1p_c(-iu / M_))
                            + GY * _expm1_c(Y_ * _log1p_c(iu / G_)))

    om = -C_ * gneg * (MY * jnp.expm1(Y_ * jnp.log1p(-1.0 / M_))
                       + GY * jnp.expm1(Y_ * jnp.log1p(1.0 / G_)))

    def phi(u):
        return jnp.exp(T * psi(u) + 1j * u * (r - q + om) * T)

    g1 = jnp.exp(gammaln(1.0 - Y_))
    g2 = jnp.exp(gammaln(2.0 - Y_))
    g4 = jnp.exp(gammaln(4.0 - Y_))
    c1 = (r - q + om) * T + C_ * T * g1 * (M_ ** (Y_ - 1.0)
                                           - G_ ** (Y_ - 1.0))
    c2 = C_ * T * g2 * (M_ ** (Y_ - 2.0) + G_ ** (Y_ - 2.0))
    c4 = C_ * T * g4 * (M_ ** (Y_ - 4.0) + G_ ** (Y_ - 4.0))
    out = _levy_cos_put_call(S0, K, T, r, q, phi, c1, c2, c4, is_call,
                             int(N))
    return out[0] if scalar and out.shape == (1,) else out


# ---------------------------------------------------------------------------
# VG smile calibration
# ---------------------------------------------------------------------------

_VG_LOWER = (1e-3, -1.5, 1e-4)        # sigma, theta, nu
_VG_UPPER = (1.5, 1.5, 1.5)


@partial(jax.jit, static_argnames=("n_cos", "max_iter"))
def _fit_vg_core(Kv, Tv, px_mkt, wv, S0, r, q, x0, lower, upper, *,
                 n_cos: int, max_iter: int):
    from .calibration import _lm_loop

    def residuals(x):
        sig, th, nu = x

        def one(K, T):
            return vg_price_cos(S0, K, T, r, q, sigma=sig, theta=th,
                                nu=nu, N=n_cos)

        res = (jax.vmap(one)(Kv, Tv) - px_mkt) * wv
        # soft wall on the moment condition thetanu + sigma^2 nu/2 < 1
        # (the bound box alone cannot express the joint constraint)
        viol = jnp.maximum(th * nu + 0.5 * sig * sig * nu - 0.95, 0.0)
        return res + 1e3 * viol

    return _lm_loop(residuals, x0, lower, upper, max_iter)


def fit_vg(strikes, expiries, market_ivs, S0, r, q=0.0, *, x0=None,
           n_cos: int = 128, max_iter: int = 200):
    """Calibrate Variance Gamma ``(sigma, theta, nu)`` to a vanilla smile.

    Same design as :func:`~optpricer_tpu.models.analytic.fit_heston`:
    quotes → call prices, vega-weighted price residuals (≈ IV residuals
    to first order), the shared bound-projected Levenberg-Marquardt loop
    with exact ``jacfwd`` Jacobians through the COS transform — one XLA
    program, each iteration prices the whole quote set as a batched COS
    matvec.  A soft penalty keeps the optimizer inside the VG moment
    condition θν + σ²ν/2 < 1 (the martingale correction diverges at the
    boundary).  Three parameters fit a single-expiry smile's level,
    skew and kurtosis; calendar structure needs a term-dependent model
    (the reference has no parametric-dynamics calibration at all —
    ``fit_svi`` is its only fitter, ``calibration.py:166-229``).

    Returns ``{"sigma", "theta", "nu", "rmse"}``; ``rmse`` is the RMS
    vega-weighted price error (≈ RMS IV error).
    """
    import numpy as np

    from ..ops.black_scholes import bs_price_vec, vega_core

    f64 = jax.config.jax_enable_x64
    dt_ = jnp.float64 if f64 else jnp.float32
    Kv = jnp.asarray(np.ravel(strikes), dt_)
    Tv = jnp.asarray(np.ravel(expiries), dt_)
    iv = jnp.asarray(np.ravel(market_ivs), dt_)
    if not (Kv.shape == Tv.shape == iv.shape):
        raise ValueError("strikes, expiries and market_ivs must be "
                         "same-length vectors")
    S0_, r_, q_ = (jnp.asarray(v, dt_) for v in (S0, r, q))
    px_mkt = bs_price_vec(S0_, Kv, Tv, r_, q_, iv, "call")
    vega = vega_core(S0_, Kv, Tv, r_, q_, iv)
    wv = 1.0 / jnp.maximum(vega, 1e-4)
    if x0 is None:
        x0 = (float(jnp.median(iv)), -0.1, 0.2)
    x, _ = _fit_vg_core(
        Kv, Tv, px_mkt, wv, S0_, r_, q_, jnp.asarray(x0, dt_),
        jnp.asarray(_VG_LOWER, dt_), jnp.asarray(_VG_UPPER, dt_),
        n_cos=int(n_cos), max_iter=int(max_iter))
    sig, th, nu = (float(v) for v in x)
    fit_px = jax.vmap(
        lambda K, T: vg_price_cos(S0_, K, T, r_, q_, sigma=sig, theta=th,
                                  nu=nu, N=int(n_cos)))(Kv, Tv)
    rmse = float(jnp.sqrt(jnp.mean(((fit_px - px_mkt) * wv) ** 2)))
    return {"sigma": sig, "theta": th, "nu": nu, "rmse": rmse}
