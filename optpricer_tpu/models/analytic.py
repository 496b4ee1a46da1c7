"""Semi-analytic pricers for the jump/stochastic-vol models.

The reference prices Merton/Heston/SABR by Monte Carlo only
(``processes.py:62-217``) and validates them statistically.  These
engines give the same models true oracles — and fast batched pricers in
their own right:

* :func:`merton_price` — Merton (1976) conditioning on the jump count:
  a Poisson-weighted series of Black-Scholes prices.
* :func:`heston_price_cos` — Fang & Oosterlee's COS expansion of the
  Heston (1993) characteristic function.  A strike batch is priced as
  ONE complex matvec over the cosine frequencies, which XLA maps onto
  the MXU.
* :func:`sabr_implied_vol` / :func:`sabr_price_hagan` — the Hagan et al.
  (2002) asymptotic smile, the desk-standard SABR quoting convention.

Everything is jittable, broadcasting, and differentiable (AD Greeks via
``jax.grad`` work through all three).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..dtypes import canonical
from ..ops.black_scholes import is_call_mask, price_core

__all__ = ["merton_price", "heston_price_cos", "bates_price_cos",
           "quanto_price", "quanto_adjusted_carry",
           "sabr_implied_vol",
           "sabr_price_hagan", "geometric_asian_price", "fit_heston",
           "heston_greeks_cos", "barrier_price_bs", "lookback_price_bs",
           "double_barrier_price_bs"]


# --------------------------------------------------------------------------
# Discrete geometric Asian — exact closed form (GBM)
# --------------------------------------------------------------------------

def geometric_asian_price_f64(S0, K, T, r, q=0.0, sigma=0.2, *,
                              kind="call", n_steps: int = 252) -> float:
    """Host-float64 scalar version of :func:`geometric_asian_price` —
    the control-variate mean must not inherit the device f32 precision."""
    import math

    m = float(n_steps)
    c = r - q - 0.5 * sigma * sigma
    mu_g = math.log(S0) + c * T * (m + 1.0) / (2.0 * m)
    var_g = sigma * sigma * T * (m + 1.0) * (2.0 * m + 1.0) / (6.0 * m * m)
    sig_g = math.sqrt(var_g)
    df = math.exp(-r * T)
    F_g = math.exp(mu_g + 0.5 * var_g)
    d2 = (mu_g - math.log(K)) / sig_g
    d1 = d2 + sig_g
    Phi = lambda x: 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))
    if kind == "call":
        return df * (F_g * Phi(d1) - K * Phi(d2))
    return df * (K * Phi(-d2) - F_g * Phi(-d1))


def geometric_asian_price(S0, K, T, r, q=0.0, sigma=0.2, *, kind="call",
                          n_steps: int = 252):
    """Fixed-strike geometric-average Asian under GBM, exact closed form.

    Monitoring matches the MC engines (``mc_fused._terminal_payoff``,
    reference ``exotics.py:102-163``): the average runs over the n_steps
    grid points t_i = i·T/m, i=1..m, with t=0 excluded.  ln G is Gaussian
    with

        mu_G    = ln S0 + c·T(m+1)/(2m),          c = r − q − σ²/2
        sigma_G² = σ²·T·(m+1)(2m+1)/(6m²)

    so the price is a Black-Scholes formula on (mu_G, sigma_G).  Serves
    as the control-variate mean for arithmetic-Asian pricing
    (``exotic_price_mc(..., control_variate=True)``) and as an exact
    oracle for the geometric-Asian MC path.
    """
    f64 = jax.config.jax_enable_x64
    dt_ = jnp.float64 if f64 else jnp.float32
    S0, K, T, r, q, sigma = (
        jnp.asarray(v, dt_) for v in (S0, K, T, r, q, sigma))
    is_call = jnp.asarray(is_call_mask(kind))
    m = float(n_steps)
    c = r - q - 0.5 * sigma * sigma
    mu_g = jnp.log(S0) + c * T * (m + 1.0) / (2.0 * m)
    var_g = sigma * sigma * T * (m + 1.0) * (2.0 * m + 1.0) / (6.0 * m * m)
    sig_g = jnp.sqrt(var_g)
    df = jnp.exp(-r * T)
    F_g = jnp.exp(mu_g + 0.5 * var_g)
    d2 = (mu_g - jnp.log(K)) / sig_g
    d1 = d2 + sig_g
    Phi = jax.scipy.stats.norm.cdf
    call = df * (F_g * Phi(d1) - K * Phi(d2))
    put = df * (K * Phi(-d2) - F_g * Phi(-d1))
    return jnp.where(is_call, call, put)


# --------------------------------------------------------------------------
# Merton jump diffusion — exact series
# --------------------------------------------------------------------------

def merton_price(S0, K, T, r, q=0.0, sigma=0.2, *, lam=0.0, mJ=0.0,
                 sJ=0.0, kind="call", n_terms: int = 48, dtype=None):
    """European price under Merton jump diffusion, exact to ``n_terms``.

    Conditional on ``k`` jumps the log-spot is Gaussian, so the price is
    a Poisson mixture of Black-Scholes prices with per-count inputs

        sigma_k^2 = sigma^2 + k*sJ^2/T,
        r_k       = r - lam*kappa + k*(mJ + sJ^2/2)/T,   kappa = e^{mJ+sJ^2/2}-1.

    Matches the compensated log-Euler dynamics of
    ``processes.merton_jump_paths`` (reference ``processes.py:62-111``)
    in the n_steps→∞ limit; for terminal-only payoffs the discretisation
    is exact, so MC agrees to within its stderr.  Broadcasting over any
    of the scalar inputs; ``kind`` may be a string or array of strings.
    """
    dt_ = canonical(dtype) if dtype is not None else jnp.float64 \
        if jax.config.jax_enable_x64 else jnp.float32
    S0, K, T, r, q, sigma, lam, mJ, sJ = (
        jnp.asarray(v, dt_) for v in (S0, K, T, r, q, sigma, lam, mJ, sJ))
    is_call = jnp.asarray(is_call_mask(kind))
    kappa = jnp.exp(mJ + 0.5 * sJ * sJ) - 1.0
    lam_p = lam * (1.0 + kappa)          # risk-neutral jump intensity ×(1+κ)
    ks = jnp.arange(n_terms, dtype=dt_)

    def term(k):
        sig_k = jnp.sqrt(sigma * sigma + k * sJ * sJ / T)
        r_k = r - lam * kappa + k * (mJ + 0.5 * sJ * sJ) / T
        # Poisson weight in log space for stability at large λ'T
        logw = -lam_p * T + k * jnp.log(jnp.maximum(lam_p * T, 1e-300)) \
            - jax.lax.lgamma(k + 1.0)
        w = jnp.where(lam_p * T > 0.0, jnp.exp(logw),
                      jnp.where(k == 0.0, 1.0, 0.0))
        return w * price_core(S0, K, T, r_k, q, sig_k, is_call)

    return jnp.sum(jax.vmap(term)(ks), axis=0)


# --------------------------------------------------------------------------
# Heston — COS method
# --------------------------------------------------------------------------

def _log1p_c(z):
    """Complex log1p: series for small |z| (f32 log(1+z) loses the small-z
    information that the 1/ξ² prefactor in the Heston cf then amplifies)."""
    small = jnp.abs(z) < 1e-3
    zs = jnp.where(small, z, 0.0)
    series = zs * (1.0 - zs * (0.5 - zs / 3.0))
    return jnp.where(small, series, jnp.log(jnp.where(small, 1.0, 1.0 + z)))


def _heston_cf(u, T, r, q, v0, kappa, theta, xi, rho):
    """φ(u) = E[e^{iu·ln(S_T/S_0)}] — Heston characteristic function.

    Albrecher et al.'s "little Heston trap" branch (take ``-d``), with the
    ξ→0 limit made f32-stable: α−d is formed as −ξ²(iu+u²)/(α+d)
    (cancellation-free), so (α−d)/ξ² never divides a rounding residual by
    ξ², and the C log uses a complex log1p so κθ/ξ²·log(1+O(ξ²)) keeps
    its significant digits. Degenerate parameters (ξ ~ 1e-4) now reduce
    to Black-Scholes in f32 too.
    """
    iu = 1j * u
    alpha = kappa - rho * xi * iu
    d = jnp.sqrt(alpha * alpha + xi * xi * (iu + u * u))
    amd_over_xi2 = -(iu + u * u) / (alpha + d)       # (α−d)/ξ², exact
    g = amd_over_xi2 * xi * xi / (alpha + d)         # (α−d)/(α+d)
    edt = jnp.exp(-d * T)
    # log((1−g·edt)/(1−g)) = log1p(−g·edt) − log1p(−g)
    log_ratio = _log1p_c(-g * edt) - _log1p_c(-g)
    C = (r - q) * iu * T + kappa * theta * (
        amd_over_xi2 * T - 2.0 * log_ratio / (xi * xi))
    D = amd_over_xi2 * (1.0 - edt) / (1.0 - g * edt)
    return jnp.exp(C + D * v0)


def _trig_kpi(k, frac, dt_):
    """(cos, sin) of kπ·frac for integer k and frac ∈ [0, 1].

    In f32 the raw argument reaches N·π ≈ 800 radians, where single-
    precision trig loses ~all significant digits (the TPU CLI priced a
    degenerate Heston 12% off before this).  k·frac is reduced mod 2
    EXACTLY instead: frac quantises to 23 bits, the uint32 product wraps
    at 2^24 (= mod 2 in fixed point), and the reduced angle is < 2π where
    f32 trig is accurate.  The quantisation is a coherent ~2^-24 shift of
    frac — equivalent to a sub-ppm strike shift, not an oscillatory
    error.  f64 keeps the direct computation.
    """
    if dt_ == jnp.float64:
        th = k.astype(dt_) * jnp.pi * frac
        return jnp.cos(th), jnp.sin(th)
    nf = jnp.round(jnp.asarray(frac, jnp.float32)
                   * (1 << 23)).astype(jnp.uint32)
    m = (k.astype(jnp.uint32) * nf) & jnp.uint32((1 << 24) - 1)
    import math

    th = m.astype(jnp.float32) * jnp.float32(math.pi / (1 << 23))
    return jnp.cos(th), jnp.sin(th)


def _cos_chi_psi(k, a, b, c, d, dt_):
    """∫_c^d e^y cos(kπ(y−a)/(b−a)) dy and ∫_c^d cos(·) dy (COS paper eq. 22-23)."""
    w = k * jnp.pi / (b - a)
    cos_d, sin_d = _trig_kpi(k, (d - a) / (b - a), dt_)
    cos_c, sin_c = _trig_kpi(k, (c - a) / (b - a), dt_)
    chi = (cos_d * jnp.exp(d) - cos_c * jnp.exp(c)
           + w * (sin_d * jnp.exp(d) - sin_c * jnp.exp(c))) / (1.0 + w * w)
    psi0 = d - c
    psik = (sin_d - sin_c) / jnp.where(k == 0, 1.0, w)
    psi = jnp.where(k == 0, psi0, psik)
    return chi, psi


def _jump_cf(u, T, lam, mJ, sJ):
    """Compound-Poisson lognormal-jump factor of the log-return cf
    (Bates 1996): exp(λT(e^{iu·mJ − u²sJ²/2} − 1) − iu·λT·κ̄) with
    κ̄ = e^{mJ + sJ²/2} − 1 the martingale compensator.  λ = 0 returns
    exactly 1, so the Heston path is untouched."""
    iu = 1j * u
    kbar = jnp.exp(mJ + 0.5 * sJ * sJ) - 1.0
    return jnp.exp(lam * T * (jnp.exp(iu * mJ - 0.5 * u * u * sJ * sJ)
                              - 1.0) - iu * lam * T * kbar)


@partial(jax.jit, static_argnames=("N",))
def _heston_cos_core(S0, K, T, r, q, v0, kappa, theta, xi, rho, is_call,
                     L, *, N: int, lam=None, mJ=None, sJ=None):
    """Jitted COS body — the TPU backend supports complex64 only inside
    compiled programs (eager complex dispatch raises UNIMPLEMENTED).
    Optional (lam, mJ, sJ) multiply in the Bates jump factor and widen
    the cumulant truncation accordingly."""
    dt_ = S0.dtype
    cdt = jnp.complex128 if dt_ == jnp.float64 else jnp.complex64

    # cumulant-based truncation (COS paper table 11)
    lam_ = xi  # vol-of-vol in the paper's notation
    c1 = (r - q) * T + (1.0 - jnp.exp(-kappa * T)) \
        * (theta - v0) / (2.0 * kappa) - 0.5 * theta * T
    ekt = jnp.exp(-kappa * T)
    c2 = 1.0 / (8.0 * kappa**3) * (
        lam_ * T * kappa * ekt * (v0 - theta) * (8.0 * kappa * rho - 4.0 * lam_)
        + kappa * rho * lam_ * (1.0 - ekt) * (16.0 * theta - 8.0 * v0)
        + 2.0 * theta * kappa * T * (-4.0 * kappa * rho * lam_ + lam_**2
                                     + 4.0 * kappa**2)
        + lam_**2 * ((theta - 2.0 * v0) * jnp.exp(-2.0 * kappa * T)
                     + theta * (6.0 * ekt - 7.0) + 2.0 * v0)
        + 8.0 * kappa**2 * (v0 - theta) * (1.0 - ekt))
    if lam is not None:
        # Bates: jump cumulants shift the mean by λT(mJ − κ̄) and widen
        # the variance by λT(mJ² + sJ²) (+ 4th-cumulant safety margin)
        kbar = jnp.exp(mJ + 0.5 * sJ * sJ) - 1.0
        c1 = c1 + lam * T * (mJ - kbar)
        c2 = c2 + lam * T * (mJ * mJ + sJ * sJ)
    spread = L * jnp.sqrt(jnp.maximum(jnp.abs(c2), 1e-12))
    a = c1 - spread
    b = c1 + spread

    ks = jnp.arange(N, dtype=dt_)
    u = ks * jnp.pi / (b - a)
    phi = _heston_cf(u.astype(cdt), T, r, q, v0, kappa, theta, xi, rho)
    if lam is not None:
        phi = phi * _jump_cf(u.astype(cdt), T, lam, mJ, sJ)

    # put payoff cosine coefficients on [a, 0]
    chi, psi = _cos_chi_psi(ks, a, b, a, jnp.minimum(b, 0.0), dt_)
    Uk = 2.0 / (b - a) * (psi - chi)     # put: K(1 − e^y)⁺ / K

    x = jnp.log(S0 / K)                   # (n_K,)
    # Σ' Re[φ(u_k) e^{iu_k(x−a)}]·U_k — one complex matvec over k; the
    # phase angle kπ(x−a)/(b−a) is range-reduced exactly (see _trig_kpi)
    w = jnp.ones((N,), dt_).at[0].set(0.5)
    coef = (phi * (w * Uk).astype(cdt))   # (N,)
    # phase matrix e^{iπk(x−a)/(b−a)} by binary doubling of the unit
    # base phasor: one trig per strike, N complex multiplies per strike,
    # error ≤ ~log2(N) ulps per entry. (Direct f32 trig of kπ·frac is
    # meaningless at k ~ 256 without range reduction, and uint32 fixed-
    # point reduction costs 20× in emulated integer multiplies.)
    theta1 = (jnp.pi * (x - a) / (b - a)).astype(dt_)       # (n_K,)
    cur = (jnp.cos(theta1) + 1j * jnp.sin(theta1)).astype(cdt)[:, None]
    pows = jnp.ones((x.shape[0], 1), cdt)
    while pows.shape[1] < N:
        pows = jnp.concatenate([pows, pows * cur], axis=1)
        cur = cur * cur
    phase = pows[:, :N]                                     # (n_K, N)
    put = jnp.exp(-r * T) * K * jnp.real(phase @ coef)
    put = jnp.maximum(put, 0.0)
    call = put + S0 * jnp.exp(-q * T) - K * jnp.exp(-r * T)
    return jnp.where(is_call, call, put)


@partial(jax.jit, static_argnames=("kind", "N"))
def heston_price_cos(S0, K, T, r, q=0.0, *, v0, kappa, theta, xi, rho,
                     kind="call", N: int = 256, L: float = 14.0):
    """European option under Heston via the COS method (Fang-Oosterlee 2008).

    Truncation range [a,b] = c1 ± L·√c2 from the log-return cumulants;
    N cosine terms (error decays exponentially in N for Heston).  A
    strike vector prices as one (n_K × N) · (N,) complex matvec — XLA
    tiles it onto the MXU, so 10k strikes cost barely more than one.
    Put is computed directly (bounded payoff ⇒ stable coefficients) and
    the call recovered by put-call parity.

    Gives the fused Heston MC engines (``mc_fused.exotic_price_mc`` with
    ``heston=``, ``ops/pallas_path_mc``) a true oracle; reference has MC
    only (``processes.py:117-162``).
    """
    f64 = jax.config.jax_enable_x64
    dt_ = jnp.float64 if f64 else jnp.float32
    S0, K, T, r, q, v0, kappa, theta, xi, rho, L_ = (
        jnp.asarray(v, dt_) for v in (S0, K, T, r, q, v0, kappa, theta,
                                      xi, rho, L))
    is_call = jnp.asarray(is_call_mask(kind))
    scalar_k = jnp.ndim(K) == 0 and jnp.ndim(is_call) == 0
    out = _heston_cos_core(S0, jnp.atleast_1d(K), T, r, q, v0, kappa,
                           theta, xi, rho, is_call, L_, N=int(N))
    return out[0] if scalar_k and out.shape == (1,) else out


def bates_price_cos(S0, K, T, r, q=0.0, *, v0, kappa, theta, xi, rho,
                    lam, mJ, sJ, kind="call", N: int = 256,
                    L: float = 14.0):
    """European option under BATES (1996) — Heston diffusion + lognormal
    Merton jumps — via the COS method.

    The log-return characteristic function factorises,
    φ_Bates = φ_Heston · φ_jumps, so the whole Heston COS machinery
    (cumulant truncation, exact phase reduction, strike-batch matvec on
    the MXU) is reused with one extra complex factor per frequency.
    Exact limits pinned in tests: λ=0 is :func:`heston_price_cos`
    bit-for-bit, ξ→0 with v0=θ is the Merton Poisson-BS series
    (:func:`merton_price`), and the QE-paths × compound-Poisson MC
    cross-checks the smile away from both limits.  Jump size ~
    N(mJ, sJ²) in log space with intensity λ; the drift compensator
    κ̄ = e^{mJ+sJ²/2} − 1 keeps S·e^{−(r−q)t} a martingale.
    """
    f64 = jax.config.jax_enable_x64
    dt_ = jnp.float64 if f64 else jnp.float32
    if float(lam) < 0.0 or float(sJ) < 0.0:
        raise ValueError("lam and sJ must be non-negative")
    (S0, K, T, r, q, v0, kappa, theta, xi, rho, lam_, mJ_, sJ_, L_) = (
        jnp.asarray(v, dt_) for v in (S0, K, T, r, q, v0, kappa, theta,
                                      xi, rho, lam, mJ, sJ, L))
    is_call = jnp.asarray(is_call_mask(kind))
    scalar_k = jnp.ndim(K) == 0 and jnp.ndim(is_call) == 0
    out = _heston_cos_core(S0, jnp.atleast_1d(K), T, r, q, v0, kappa,
                           theta, xi, rho, is_call, L_, N=int(N),
                           lam=lam_, mJ=mJ_, sJ=sJ_)
    return out[0] if scalar_k and out.shape == (1,) else out


# --------------------------------------------------------------------------
# SABR — Hagan asymptotic implied vol
# --------------------------------------------------------------------------

def sabr_implied_vol(F, K, T, alpha, beta, nu, rho):
    """Hagan et al. (2002) lognormal implied vol σ_BS(F, K) under SABR.

    The industry quoting convention for the model MC-simulated by
    ``processes.sabr_paths`` (reference ``processes.py:168-217``).
    O((nu²+...)·T) asymptotic — accurate to ~1% of vol for moderate
    maturities/vol-of-vol.  Broadcasting; ATM limit handled smoothly via
    a series in ln(F/K).
    """
    f64 = jax.config.jax_enable_x64
    dt_ = jnp.float64 if f64 else jnp.float32
    F, K, T, alpha, beta, nu, rho = (
        jnp.asarray(v, dt_) for v in (F, K, T, alpha, beta, nu, rho))
    lnFK = jnp.log(F / K)
    FKb = (F * K) ** (0.5 * (1.0 - beta))
    omb = 1.0 - beta
    # z/x(z) with a series for small z (removable singularity at ATM)
    z = (nu / alpha) * FKb * lnFK
    sqt = jnp.sqrt(1.0 - 2.0 * rho * z + z * z)
    xz = jnp.log((sqt + z - rho) / (1.0 - rho))
    small = jnp.abs(z) < 1e-6
    zx = jnp.where(small, 1.0 - 0.5 * rho * z,
                   z / jnp.where(small, 1.0, xz))
    denom = FKb * (1.0 + omb**2 / 24.0 * lnFK**2
                   + omb**4 / 1920.0 * lnFK**4)
    corr = 1.0 + (omb**2 / 24.0 * alpha**2 / FKb**2
                  + 0.25 * rho * beta * nu * alpha / FKb
                  + (2.0 - 3.0 * rho**2) / 24.0 * nu**2) * T
    return alpha / denom * zx * corr


def sabr_price_hagan(S0, K, T, r, q=0.0, *, alpha, beta=1.0, nu, rho,
                     kind="call"):
    """European price under SABR: Hagan implied vol plugged into BS.

    ``alpha`` is the spot-vol α₀ of ``processes.sabr_paths``; the Hagan
    formula quotes on the forward F = S0·e^{(r−q)T}.
    """
    f64 = jax.config.jax_enable_x64
    dt_ = jnp.float64 if f64 else jnp.float32
    S0, K, T, r, q = (jnp.asarray(v, dt_) for v in (S0, K, T, r, q))
    F = S0 * jnp.exp((r - q) * T)
    # α in Hagan's formula multiplies F^β; sabr_paths diffuses the SPOT
    # with σ_t·S^β, so translate the initial level to forward terms
    alpha_f = jnp.asarray(alpha, dt_) * (F / S0) ** (jnp.asarray(beta, dt_)
                                                     - 1.0)
    iv = sabr_implied_vol(F, K, T, alpha_f, beta, nu, rho)
    return price_core(S0, K, T, r, q, iv, jnp.asarray(is_call_mask(kind)))


# --------------------------------------------------------------------------
# Heston calibration — LM on vega-weighted COS price residuals
# --------------------------------------------------------------------------

_HESTON_LOWER = (1e-4, 1e-2, 1e-4, 1e-2, -0.999)   # v0, kappa, theta, xi, rho
_HESTON_UPPER = (2.0, 20.0, 2.0, 3.0, 0.999)


@partial(jax.jit, static_argnames=("n_cos", "max_iter"))
def _fit_heston_core(Kv, Tv, px_mkt, wv, S0, r, q, x0, lower, upper,
                     *, n_cos: int, max_iter: int):
    from .calibration import _lm_loop

    def residuals(x):
        v0, kappa, theta, xi, rho = x

        def one(K, T):
            return heston_price_cos(S0, K, T, r, q, v0=v0, kappa=kappa,
                                    theta=theta, xi=xi, rho=rho,
                                    N=n_cos)

        return (jax.vmap(one)(Kv, Tv) - px_mkt) * wv

    return _lm_loop(residuals, x0, lower, upper, max_iter)


def fit_heston(strikes, expiries, market_ivs, S0, r, q=0.0, *,
               x0=None, n_cos: int = 128, max_iter: int = 200):
    """Calibrate Heston ``(v0, kappa, theta, xi, rho)`` to a vanilla smile.

    ``strikes``/``expiries``/``market_ivs`` are same-length quote vectors
    (one expiry repeated per slice is fine).  Quotes are converted to call
    prices and fitted with the shared bound-projected Levenberg-Marquardt
    loop (exact ``jacfwd`` Jacobians through the COS transform —
    everything jit-compiles to one XLA program; each iteration prices the
    whole quote set as one batched COS matvec).  Residuals are
    vega-weighted prices ≈ implied-vol residuals to first order, the
    desk-standard objective.  Analogue of ``fit_svi`` (reference
    ``calibration.py:166-229``) for a parametric *dynamics* model the
    reference cannot calibrate at all.

    Returns ``{"v0","kappa","theta","xi","rho","rmse"}`` with ``rmse`` the
    RMS vega-weighted price error (≈ RMS IV error).
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
        iv_atm = float(jnp.median(iv))
        x0 = (iv_atm**2, 2.0, iv_atm**2, 0.5, -0.5)
    x, _ = _fit_heston_core(
        Kv, Tv, px_mkt, wv, S0_, r_, q_,
        jnp.asarray(x0, dt_), jnp.asarray(_HESTON_LOWER, dt_),
        jnp.asarray(_HESTON_UPPER, dt_), n_cos=int(n_cos),
        max_iter=int(max_iter))
    v0, kappa, theta, xi, rho = (float(v) for v in x)
    fit_px = jax.vmap(
        lambda K, T: heston_price_cos(S0_, K, T, r_, q_, v0=v0, kappa=kappa,
                                      theta=theta, xi=xi, rho=rho,
                                      N=int(n_cos)))(Kv, Tv)
    rmse = float(jnp.sqrt(jnp.mean(((fit_px - px_mkt) * wv) ** 2)))
    return {"v0": v0, "kappa": kappa, "theta": theta, "xi": xi,
            "rho": rho, "rmse": rmse}


def heston_greeks_cos(S0, K, T, r, q=0.0, *, v0, kappa, theta, xi, rho,
                      kind="call", N: int = 256):
    """Full AD Greek set through the COS transform — no bumping, no MC.

    ``jax.grad`` differentiates the characteristic function, the cumulant
    truncation and the cosine coefficients exactly, so every sensitivity
    is analytic to machine precision. Returns ``{"price", "delta",
    "gamma", "rho", "theta", "vega_v0", "vega_theta", "vega_xi",
    "vega_rho", "vega_kappa"}`` (the model-parameter vegas are the
    calibration-risk set; theta is −∂V/∂T, reference sign convention).
    """
    f64 = jax.config.jax_enable_x64
    dt_ = jnp.float64 if f64 else jnp.float32

    def price(s0, t_, r_, v0_, kap_, th_, xi_, rho_):
        return heston_price_cos(s0, K, t_, r_, q, v0=v0_, kappa=kap_,
                                theta=th_, xi=xi_, rho=rho_, kind=kind,
                                N=N)

    args = tuple(jnp.asarray(v, dt_)
                 for v in (S0, T, r, v0, kappa, theta, xi, rho))
    px = price(*args)
    d = jax.grad(price, argnums=tuple(range(8)))(*args)
    gamma = jax.grad(lambda s0: jax.grad(price, 0)(
        s0, *args[1:]))(args[0])
    return {"price": float(px), "delta": float(d[0]),
            "gamma": float(gamma), "theta": float(-d[1]),
            "rho": float(d[2]), "vega_v0": float(d[3]),
            "vega_kappa": float(d[4]), "vega_theta": float(d[5]),
            "vega_xi": float(d[6]), "vega_rho": float(d[7])}


def _ncx2_cdf(z, k, lam, n_terms: int):
    """Noncentral chi-square CDF by the Poisson mixture of central
    gammas: χ²(z; k, λ) = Σ_j Pois(j; λ/2)·P(k/2 + j, z/2), weights in
    log space. Adequate term count: n_terms ≳ λ/2 + 10·√(λ/2 + 1)."""
    from jax.scipy.special import gammainc, gammaln

    j = jnp.arange(n_terms, dtype=z.dtype)
    half = lam[..., None] * 0.5
    logw = (j * jnp.log(jnp.maximum(half, 1e-300)) - half
            - gammaln(j + 1.0))
    p = gammainc(k * 0.5 + j, z[..., None] * 0.5)
    return jnp.sum(jnp.exp(logw) * p, axis=-1)


@partial(jax.jit, static_argnames=("kind", "n_terms"))
def cev_price(S0, K, T, r, q=0.0, *, sigma, beta, kind: str = "call",
              n_terms: int = 2048):
    """CEV closed form (absorbing boundary at zero), 0 < β < 1.

    dS = (r−q)S dt + σ S^β dW with zero absorbing — the martingale CEV,
    so put-call parity holds against the plain forward. Priced by the
    noncentral chi-square representation (Schroder 1989; Hull's
    formulation with the deterministic time change
    τ = (e^{2(r−q)(1−β)T} − 1)/(2(r−q)(1−β)) for carry):

        a = K^{2(1−β)}/((1−β)²v),  c = F^{2(1−β)}/((1−β)²v),  b = 1/(1−β)
        C = e^{−rT}·( F·[1 − χ²(a; b+2, c)] − K·χ²(c; b, a) )

    (cross-checked against the Hagan ATM expansion and converged Euler MC
    — tests/test_analytic.py::TestCEV; note some texts double a and c,
    which belongs to a v = σ²τ/2 convention, not this one)

    with v = σ²τ and F = S0·e^{(r−q)T}. NOTE ``sigma`` is the CEV scale
    (units S^{1−β}): the lognormal-vol equivalent near S0 is σ·S0^{1−β}.
    Broadcasts over strikes. ``n_terms`` bounds the Poisson mixture —
    raise it when 2c is large (high S0^{2(1−β)}/σ²T); f64 (CPU x64
    harness) is the oracle mode, f32 on TPU is ~1e-3-accurate.

    This is the exact target for the SABR CEV backbone at ν = 0
    (``models/processes.sabr_paths``) — the oracle behind the
    absorption-bias test in tests/test_analytic.py. The reference has no
    CEV pricer (/root/reference/src/optpricer/analytic has no such
    module; nearest is its SABR MC, processes.py:168-217).
    """
    if kind not in ("call", "put"):
        raise ValueError("kind must be 'call' or 'put'")
    dt_ = canonical(None)
    S0, K, T, r, q, sigma, beta = (
        jnp.asarray(v, dt_) for v in (S0, K, T, r, q, sigma, beta))
    one_m = 1.0 - beta
    drift = 2.0 * (r - q) * one_m
    # τ → T as r→q (limit of the time change); branchless blend
    small = jnp.abs(drift) < 1e-12
    tau = jnp.where(small, T,
                    (jnp.exp(jnp.where(small, 0.0, drift) * T) - 1.0)
                    / jnp.where(small, 1.0, drift))
    v = sigma * sigma * tau
    F = S0 * jnp.exp((r - q) * T)
    a = K ** (2.0 * one_m) / (one_m * one_m * v)
    c = F ** (2.0 * one_m) / (one_m * one_m * v)
    b = 1.0 / one_m
    df = jnp.exp(-r * T)
    call = df * (F * (1.0 - _ncx2_cdf(a, b + 2.0, c, n_terms))
                 - K * _ncx2_cdf(c, b, a, n_terms))
    if kind == "call":
        return call
    return call - df * (F - K)   # absorbed CEV is a true martingale


@partial(jax.jit, static_argnames=("kind", "barrier_type"))
def barrier_price_bs(S0, K, T, r, q=0.0, *, sigma, barrier,
                     barrier_type: str = "up-and-out", kind: str = "call",
                     rebate=0.0):
    """Closed-form CONTINUOUSLY-monitored barrier option under GBM
    (Merton 1973 / Reiner-Rubinstein 1991 reflection formulas).

    All eight {up,down} × {in,out} × {call,put} combinations, broadcasting
    over inputs, differentiable. ``rebate`` is paid AT EXPIRY — knock-outs
    collect it when the barrier is hit, knock-ins when it is not — the
    same convention as the MC engines (``mc_fused._terminal_payoff``) and
    the PDE solver, so the engines can be pinned against this oracle
    directly. A spot already at/beyond the barrier is treated as hit.

    The reference has no analytic barrier pricer (its barriers are MC
    over discretely-monitored paths, ``exotics.py:33-96``, and FDM with
    after-step node overrides, ``pde.py:209-211``); this closed form is
    the truth the in-operator PDE mode (`fd_price_barrier(
    barrier_mode="operator")`) and the bridge-conditioned MLMC estimator
    converge to.
    """
    if kind not in ("call", "put"):
        raise ValueError("kind must be 'call' or 'put'")
    parts = barrier_type.split("-")
    if (len(parts) != 3 or parts[0] not in ("up", "down")
            or parts[1] != "and" or parts[2] not in ("in", "out")):
        raise ValueError(f"unknown barrier_type {barrier_type!r}")
    up = parts[0] == "up"
    knock_in = parts[2] == "in"
    dt_ = canonical(None)
    S0, K, T, r, q, sigma, H, rebate = (
        jnp.asarray(v, dt_) for v in (S0, K, T, r, q, sigma, barrier,
                                      rebate))
    from jax.scipy.stats import norm

    st = sigma * jnp.sqrt(T)
    mu = (r - q) / (sigma * sigma) - 0.5
    phi = 1.0 if kind == "call" else -1.0
    eta = -1.0 if up else 1.0
    dfq = jnp.exp(-q * T)
    dfr = jnp.exp(-r * T)
    hs = H / S0

    def block(x):
        return (phi * S0 * dfq * norm.cdf(phi * x)
                - phi * K * dfr * norm.cdf(phi * (x - st)))

    def rblock(y):
        return (phi * S0 * dfq * hs ** (2.0 * (mu + 1.0))
                * norm.cdf(eta * y)
                - phi * K * dfr * hs ** (2.0 * mu)
                * norm.cdf(eta * (y - st)))

    x1 = jnp.log(S0 / K) / st + (1.0 + mu) * st
    x2 = jnp.log(S0 / H) / st + (1.0 + mu) * st
    y1 = jnp.log(H * H / (S0 * K)) / st + (1.0 + mu) * st
    y2 = jnp.log(H / S0) / st + (1.0 + mu) * st
    A, B, C, D = block(x1), block(x2), rblock(y1), rblock(y2)

    k_beyond = (K > H)
    if not up and kind == "call":
        in0 = jnp.where(k_beyond, C, A - B + D)
    elif up and kind == "call":
        in0 = jnp.where(k_beyond, A, B - C + D)
    elif not up:  # down put
        in0 = jnp.where(k_beyond, B - C + D, A)
    else:         # up put
        in0 = jnp.where(k_beyond, A - B + D, C)

    # P(barrier hit before T), continuous monitoring of the GBM log-path
    nu = r - q - 0.5 * sigma * sigma
    b = jnp.log(H / S0) if up else jnp.log(S0 / H)   # > 0 pre-hit
    drift = nu if up else -nu
    p_hit = (norm.cdf((drift * T - b) / st)
             + jnp.exp(2.0 * drift * b / (sigma * sigma))
             * norm.cdf((-b - drift * T) / st))
    p_hit = jnp.clip(p_hit, 0.0, 1.0)

    already = (S0 >= H) if up else (S0 <= H)
    if knock_in:
        live = in0 + rebate * dfr * (1.0 - p_hit)
        return jnp.where(already, A, live)
    live = (A - in0) + rebate * dfr * p_hit
    return jnp.where(already, rebate * dfr, live)


def quanto_adjusted_carry(q: float, sigma_S: float, sigma_fx: float,
                          rho_sfx: float) -> float:
    """The quanto drift correction: under the DOMESTIC measure a foreign
    asset paid in domestic currency at a fixed FX rate carries an extra
    −ρ·σ_S·σ_FX drift, equivalent to a dividend-yield shift

        q_eff = q + ρ_SFX · σ_S · σ_FX.

    Feed ``q_eff`` to ANY engine in this package (MC, PDE, lattice,
    exotics, Greeks) and it prices the quanto version of its contract —
    no new engines needed, which is the point of keeping the carry a
    first-class input everywhere."""
    return float(q + rho_sfx * sigma_S * sigma_fx)


def quanto_price(S0, K, T, r_d: float, q: float = 0.0, *, sigma_S: float,
                 sigma_fx: float, rho_sfx: float, kind: str = "call",
                 dtype=None):
    """Quanto vanilla: foreign-asset option paid in domestic currency at
    a fixed conversion rate (notional 1 domestic per foreign unit).

    Closed form = Black-Scholes at the quanto-adjusted carry
    (:func:`quanto_adjusted_carry`), discounted at the domestic rate.
    ``sigma_fx = 0`` or ``rho_sfx = 0`` reduces EXACTLY to the vanilla
    price — the oracle test — and an MC cross-check is one
    ``euro_price_mc`` call at ``q_eff``.  Strike/kind broadcast like
    ``bs_price_vec``."""
    if sigma_fx < 0.0 or sigma_S < 0.0:
        raise ValueError("sigma_S and sigma_fx must be non-negative")
    if not -1.0 <= rho_sfx <= 1.0:
        raise ValueError(f"rho_sfx must be in [-1, 1], got {rho_sfx}")
    q_eff = quanto_adjusted_carry(q, sigma_S, sigma_fx, rho_sfx)
    from ..ops.black_scholes import bs_price_vec

    return bs_price_vec(S0, K, T, r_d, q_eff, sigma_S, kind, dtype=dtype)


# --------------------------------------------------------------------------
# Chooser and compound options — the two-timescale closed forms
# --------------------------------------------------------------------------

def chooser_price(S0, K, T, r, q=0.0, *, sigma, t_choose, dtype=None):
    """Simple chooser ("as-you-like-it"): at ``t_choose`` the holder
    picks whichever of the strike-K, maturity-T call or put is worth
    more.

    Closed form (Rubinstein 1991): max(C, P) at t₁ = C + max(0, P − C)
    and put-call parity turn the choice into a vanilla call to T plus a
    put to t₁ on the forward-discounted strike:

        V = C(S₀, K, T) + e^{−q(T−t₁)}·P(S₀, K·e^{−(r−q)(T−t₁)}, t₁)

    Exact oracle test: MC readout E[e^{−r t₁} max(C_BS, P_BS)(S_{t₁})]
    — and degenerate limits t₁→0 (straddle-ish: C + P(S₀e^{…})) and
    t₁→T (C + P = straddle).  Extends the surface: the reference has no
    chooser (full scan of ``/root/reference/src/optpricer``)."""
    if not 0.0 < t_choose <= T:
        raise ValueError("t_choose must lie in (0, T]")
    dt_ = canonical(dtype)
    S0, K, T_, r_, q_, sig, t1 = (
        jnp.asarray(v, dt_) for v in (S0, K, T, r, q, sigma, t_choose))
    call = price_core(S0, K, T_, r_, q_, sig, jnp.asarray(True))
    K_adj = K * jnp.exp(-(r_ - q_) * (T_ - t1))
    put = price_core(S0, K_adj, t1, r_, q_, sig, jnp.asarray(False))
    out = call + jnp.exp(-q_ * (T_ - t1)) * put
    return float(out) if out.ndim == 0 else out


def _compound_critical(K1, K2, tau, r, q, sigma, inner_call, dtype):
    """S* at which the UNDERLYING option's t₁ value equals K₁ — 100-step
    log-space bisection (jittable; the BS value is monotone in S)."""
    lo = jnp.log(jnp.asarray(1e-6, dtype) * K2)
    hi = jnp.log(jnp.asarray(1e6, dtype) * K2)
    is_c = jnp.asarray(inner_call)

    def body(_, bounds):
        lo, hi = bounds
        mid = 0.5 * (lo + hi)
        v = price_core(jnp.exp(mid), K2, tau, r, q, sigma, is_c)
        # call value increases in S, put value decreases
        go_up = jnp.where(is_c, v < K1, v > K1)
        return jnp.where(go_up, mid, lo), jnp.where(go_up, hi, mid)

    lo, hi = jax.lax.fori_loop(0, 100, body, (lo, hi))
    return jnp.exp(0.5 * (lo + hi))


def compound_price(S0, K1, K2, t1, T2, r, q=0.0, *, sigma,
                   kind: str = "call", underlying: str = "call",
                   dtype=None):
    """Compound option (Geske 1979): a ``kind`` option expiring at t₁
    with strike K₁ on an ``underlying`` vanilla (strike K₂, maturity
    T₂ > t₁).  All four combinations: call-on-call, call-on-put,
    put-on-call, put-on-put.

    Closed form = bivariate-normal rectangle probabilities
    (:func:`~optpricer_tpu.ops.bvn.bvn_cdf`) with correlation
    ρ = √(t₁/T₂), around the critical spot S* where the underlying's
    t₁ value crosses K₁ (log-space bisection, jittable).  Oracle test:
    MC readout E[e^{−r t₁}·payoff(BS(S_{t₁}))] under exact GBM — which
    catches any sign error in the eight Φ₂ arguments.  The reference
    has no compound options."""
    if kind not in ("call", "put"):
        raise ValueError("kind must be 'call' or 'put'")
    if underlying not in ("call", "put"):
        raise ValueError("underlying must be 'call' or 'put'")
    if not 0.0 < t1 < T2:
        raise ValueError("need 0 < t1 < T2")
    dt_ = canonical(dtype)
    S, K1_, K2_, t1_, T2_, r_, q_, sig = (
        jnp.asarray(v, dt_)
        for v in (S0, K1, K2, t1, T2, r, q, sigma))
    inner_call = underlying == "call"
    Sx = _compound_critical(K1_, K2_, T2_ - t1_, r_, q_, sig,
                            inner_call, dt_)

    from ..ops.bvn import bvn_cdf
    from jax.scipy.stats import norm

    sq1 = sig * jnp.sqrt(t1_)
    sq2 = sig * jnp.sqrt(T2_)
    b = r_ - q_
    y1 = (jnp.log(S / Sx) + (b + 0.5 * sig * sig) * t1_) / sq1
    y2 = y1 - sq1
    z1 = (jnp.log(S / K2_) + (b + 0.5 * sig * sig) * T2_) / sq2
    z2 = z1 - sq2
    rho = jnp.sqrt(t1_ / T2_)
    fwd = S * jnp.exp((b - r_) * T2_)     # = S e^{−qT₂}
    dK2 = K2_ * jnp.exp(-r_ * T2_)
    dK1 = K1_ * jnp.exp(-r_ * t1_)

    if inner_call and kind == "call":
        out = (fwd * bvn_cdf(z1, y1, rho) - dK2 * bvn_cdf(z2, y2, rho)
               - dK1 * norm.cdf(y2))
    elif inner_call:                      # put-on-call
        out = (dK2 * bvn_cdf(z2, -y2, -rho) - fwd * bvn_cdf(z1, -y1, -rho)
               + dK1 * norm.cdf(-y2))
    elif kind == "call":                  # call-on-put
        out = (dK2 * bvn_cdf(-z2, -y2, rho) - fwd * bvn_cdf(-z1, -y1, rho)
               - dK1 * norm.cdf(-y2))
    else:                                 # put-on-put
        out = (fwd * bvn_cdf(-z1, y1, -rho) - dK2 * bvn_cdf(-z2, y2, -rho)
               + dK1 * norm.cdf(y2))
    return float(out) if out.ndim == 0 else out


# --------------------------------------------------------------------------
# Continuously-monitored lookbacks — Goldman-Sosin-Gatto / Conze-Viswanathan
# --------------------------------------------------------------------------

def _lb_bonus(lnX, e1, bb, sigma, T, eta):
    """The lookback "strike bonus" S·e^{−rT}·A common to all four GSG/CV
    formulas.  ``eta=+1``:

        A = (σ²/2b)·[ e^{2b·lnX/σ²·(−1)}… ]  — concretely
        A = (σ²/2b)·[ X^{−2b/σ²}·Φ(−e1 + 2b√T/σ) − e^{bT}·Φ(−e1) ]

    and ``eta=−1`` the mirrored pattern

        A = (σ²/2b)·[ e^{bT}·Φ(e1) − X^{−2b/σ²}·Φ(e1 − 2b√T/σ) ].

    Both vanish linearly at b = 0; the exact b→0 limit (derivative of the
    bracket) is blended in branchlessly so r = q prices and their AD
    derivatives stay finite:

        A₀ = η·[ η·(lnX + σ²T/2)·Φ(−η·e1) ]  →  see the two lines below.
    """
    from jax.scipy.stats import norm

    sqT = jnp.sqrt(T)
    small = jnp.abs(bb) < 1e-7
    b_safe = jnp.where(small, 1.0, bb)
    pref = sigma * sigma / (2.0 * b_safe)
    pow_term = jnp.exp(-(2.0 * bb / (sigma * sigma)) * lnX)
    shift = (2.0 * bb / sigma) * sqT
    if eta > 0:
        gen = pref * (pow_term * norm.cdf(-e1 + shift)
                      - jnp.exp(bb * T) * norm.cdf(-e1))
        lim = (-(lnX + 0.5 * sigma * sigma * T) * norm.cdf(-e1)
               + sigma * sqT * norm.pdf(-e1))
    else:
        gen = pref * (jnp.exp(bb * T) * norm.cdf(e1)
                      - pow_term * norm.cdf(e1 - shift))
        lim = ((lnX + 0.5 * sigma * sigma * T) * norm.cdf(e1)
               + sigma * sqT * norm.pdf(e1))
    return jnp.where(small, lim, gen)


@partial(jax.jit, static_argnames=("kind", "strike_type"))
def lookback_price_bs(S0, T, r, q=0.0, *, sigma, kind: str = "call",
                      strike_type: str = "floating", K=0.0,
                      running_extremum=None):
    """Closed-form CONTINUOUSLY-monitored lookback under GBM.

    Floating strike (Goldman-Sosin-Gatto 1979): call pays S_T − min S,
    put pays max S − S_T.  Fixed strike (Conze-Viswanathan 1991): call
    pays (max S − K)⁺, put pays (K − min S)⁺.  ``running_extremum`` is
    the already-observed extremum for seasoned contracts — the running
    MIN for floating calls / fixed puts, the running MAX for floating
    puts / fixed calls; it defaults to S0 (a fresh contract).

    Broadcasting, differentiable; r = q (zero carry) is handled by the
    exact limit inside :func:`_lb_bonus`, not a numerical nudge.  The
    reference prices lookbacks only by discretely-monitored MC
    (``exotics.py:215-273``); this is the continuous-monitoring truth
    its n_steps→∞ limit — and this package's bridge-free MLMC estimator
    (``models/mlmc.py``) — converge to.
    """
    if kind not in ("call", "put"):
        raise ValueError("kind must be 'call' or 'put'")
    if strike_type not in ("floating", "fixed"):
        raise ValueError("strike_type must be 'floating' or 'fixed'")
    dt_ = canonical(None)
    S, T_, r_, q_, sig, K_ = (jnp.asarray(v, dt_)
                              for v in (S0, T, r, q, sigma, K))
    E = S if running_extremum is None else jnp.asarray(running_extremum, dt_)
    from jax.scipy.stats import norm

    bb = r_ - q_
    s = sig * jnp.sqrt(T_)
    dfr = jnp.exp(-r_ * T_)
    dfb = jnp.exp((bb - r_) * T_)

    def d1_of(X):      # X = S/level
        return (jnp.log(X) + (bb + 0.5 * sig * sig) * T_) / s

    if strike_type == "floating":
        if kind == "call":        # pays S_T − m;  E = running min ≤ S
            X = S / E
            a1 = d1_of(X)
            out = (S * dfb * norm.cdf(a1) - E * dfr * norm.cdf(a1 - s)
                   + S * dfr * _lb_bonus(jnp.log(X), a1, bb, sig, T_, +1))
        else:                     # pays M − S_T;  E = running max ≥ S
            X = S / E
            b1 = d1_of(X)
            out = (E * dfr * norm.cdf(-(b1 - s)) - S * dfb * norm.cdf(-b1)
                   + S * dfr * _lb_bonus(jnp.log(X), b1, bb, sig, T_, -1))
        return out

    # fixed strike: blend the K-beyond-extremum and seasoned branches
    if kind == "call":            # pays (max − K)⁺;  E = running max
        def F(level):
            X = S / level
            d1 = d1_of(X)
            return (S * dfb * norm.cdf(d1) - level * dfr * norm.cdf(d1 - s)
                    + S * dfr * _lb_bonus(jnp.log(X), d1, bb, sig, T_, -1))

        out = jnp.where(K_ > E, F(jnp.maximum(K_, E)),
                        dfr * (E - K_) + F(jnp.minimum(K_, E)))
    else:                         # pays (K − min)⁺;  E = running min
        def F(level):
            X = S / level
            d1 = d1_of(X)
            return (level * dfr * norm.cdf(-(d1 - s))
                    - S * dfb * norm.cdf(-d1)
                    + S * dfr * _lb_bonus(jnp.log(X), d1, bb, sig, T_, +1))

        out = jnp.where(K_ < E, F(jnp.minimum(K_, E)),
                        dfr * (K_ - E) + F(jnp.maximum(K_, E)))
    return out


# --------------------------------------------------------------------------
# Double barriers — Ikeda-Kunitomo image series, integral form
# --------------------------------------------------------------------------

def _dbko_sums(S, A, B, L, U, T, r, q, sigma, n_images: int):
    """(∫_A^B x·p(x)dx·e^{−bT}/S, ∫_A^B p(x)dx) for the density p of S_T
    restricted to paths that stay inside (L, U) — the Ikeda-Kunitomo
    (1992) image expansion with flat barriers, stated as INTEGRALS so any
    strike placement (inside or outside the corridor) reduces to clipped
    bounds instead of formula special cases.  2·n_images+1 image terms,
    vectorised over the image index; ~5 images converge to f64 roundoff
    for practical barrier widths.
    """
    from jax.scipy.stats import norm

    # The batch shape may live on ANY input (a strike ladder with scalar
    # spot, a maturity sweep, ...), so broadcast everything to the common
    # shape before prepending the image axis.
    S, A, B, L, U, T, r, q, sigma = jnp.broadcast_arrays(
        S, A, B, L, U, T, r, q, sigma)
    bb = r - q
    st = sigma * jnp.sqrt(T)
    m1 = 2.0 * bb / (sigma * sigma) + 1.0
    n = jnp.arange(-n_images, n_images + 1, dtype=S.dtype)
    shp = n.shape + (1,) * S.ndim
    n = n.reshape(shp)                      # broadcast images × inputs
    lnU_L = jnp.log(U / L)
    drift = (bb + 0.5 * sigma * sigma) * T

    def d(level):       # direct-image argument at integration bound
        return (jnp.log(S / level) + 2.0 * n * lnU_L + drift) / st

    def dp(level):      # reflected-image argument
        return ((2.0 * (n + 1.0) * jnp.log(L) - 2.0 * n * jnp.log(U)
                 - jnp.log(S * level)) + drift) / st

    def term(lg, hi, lo):
        # exp(lg)·(Φ(hi) − Φ(lo)) computed in log space: for wide
        # corridors with large 2b/σ² the image weight exp(lg) overflows
        # while the cdf difference underflows to exactly 0 — the product
        # is finite (the series converges) but inf·0 = NaN.  hi ≥ lo by
        # construction (integration bounds A ≤ B), so diff ≥ 0.
        diff = norm.cdf(hi) - norm.cdf(lo)
        logdiff = jnp.log(jnp.where(diff > 0.0, diff, 1.0))
        return jnp.where(diff > 0.0, jnp.exp(lg + logdiff), 0.0)

    lgR1 = n * m1 * lnU_L
    lgR2 = m1 * ((n + 1.0) * jnp.log(L) - n * jnp.log(U) - jnp.log(S))
    lgR1k = n * (m1 - 2.0) * lnU_L
    lgR2k = (m1 - 2.0) * ((n + 1.0) * jnp.log(L) - n * jnp.log(U)
                          - jnp.log(S))
    dA, dB, dpA, dpB = d(A), d(B), dp(A), dp(B)
    xint = jnp.sum(term(lgR1, dA, dB) - term(lgR2, dpA, dpB), axis=0)
    pint = jnp.sum(term(lgR1k, dA - st, dB - st)
                   - term(lgR2k, dpA - st, dpB - st), axis=0)
    return xint, pint


@partial(jax.jit, static_argnames=("kind", "knock", "n_images"))
def double_barrier_price_bs(S0, K, T, r, q=0.0, *, sigma, lower, upper,
                            kind: str = "call", knock: str = "out",
                            rebate=0.0, n_images: int = 5):
    """Closed-form CONTINUOUSLY-monitored double-barrier option under GBM
    (Ikeda-Kunitomo 1992 image series, flat barriers L < U).

    ``knock="out"`` dies (collecting ``rebate`` AT EXPIRY) if either
    barrier is touched; ``knock="in"`` is alive only if one is
    (rebate paid at expiry when it never is) — the same rebate-at-expiry
    convention as :func:`barrier_price_bs` and the MC/PDE engines.  A
    spot at/beyond either barrier counts as already hit.  Strikes
    outside (L, U) are legitimate (a K ≤ L knock-out call is a leveraged
    corridor bet) and handled by the integral form of the expansion.

    Broadcasting over inputs, differentiable.  The reference has no
    double-barrier support at all; here the same contract is also
    priced by MC (``exotics.double_barrier_price``) and by the PDE on
    an absorbing corridor (``pde.fd_price_double_barrier``) — this
    series is the truth both converge to.
    """
    if kind not in ("call", "put"):
        raise ValueError("kind must be 'call' or 'put'")
    if knock not in ("in", "out"):
        raise ValueError("knock must be 'in' or 'out'")
    dt_ = canonical(None)
    S, K_, T_, r_, q_, sig, L, U, reb = (
        jnp.asarray(v, dt_)
        for v in (S0, K, T, r, q, sigma, lower, upper, rebate))
    dfr = jnp.exp(-r_ * T_)
    dfb = jnp.exp(-q_ * T_)                # e^{(b−r)T} = e^{−qT}
    if kind == "call":
        A = jnp.clip(K_, L, U)
        xint, pint = _dbko_sums(S, A, U, L, U, T_, r_, q_, sig,
                                int(n_images))
        ko = S * dfb * xint - K_ * dfr * pint
    else:
        B = jnp.clip(K_, L, U)
        xint, pint = _dbko_sums(S, L, B, L, U, T_, r_, q_, sig,
                                int(n_images))
        ko = K_ * dfr * pint - S * dfb * xint
    _, p_surv = _dbko_sums(S, L, U, L, U, T_, r_, q_, sig, int(n_images))
    p_surv = jnp.clip(p_surv, 0.0, 1.0)
    ko = jnp.maximum(ko, 0.0)
    already = (S <= L) | (S >= U)
    vanilla = price_core(S, K_, T_, r_, q_, sig,
                         jnp.asarray(kind == "call"))
    if knock == "out":
        live = ko + reb * dfr * (1.0 - p_surv)
        return jnp.where(already, reb * dfr, live)
    live = (vanilla - ko) + reb * dfr * p_surv
    return jnp.where(already, vanilla, live)
