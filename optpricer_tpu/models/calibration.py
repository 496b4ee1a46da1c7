"""SVI surface calibration and Dupire local volatility, TPU-native.

Re-architecture of reference ``calibration.py``:

* :class:`SVIParams` — raw-SVI slice with analytic ``dw_dk``/``d2w_dk2``
  (reference ``calibration.py:13-66``), registered as a JAX pytree so slices
  flow through jit/vmap/grad.
* :func:`fit_svi` — scipy TRF least-squares (reference
  ``calibration.py:166-229``) is replaced by a jitted Levenberg-Marquardt
  loop with exact ``jax.jacfwd`` Jacobians and bound projection; the same
  default bounds and initial guess are kept. Slices fit independently, so
  :func:`fit_svi_surface` vmaps when the strike grids share a shape.
* :class:`VolSurface` — slice container with linear **total-variance**
  interpolation in T and flat-vol extrapolation beyond the ends. NOTE: the
  reference interpolates in "total variance × T" space
  (``calibration.py:134-148``), which is dimensionally inconsistent with its
  own exact-expiry branch and biases Dupire's ∂w/∂T between slices; this
  build interpolates total variance itself, which is continuous through the
  slice expiries and makes a flat surface yield exactly flat local vol.
* :func:`dupire_local_vol` — Gatheral's formula in (w, y) coordinates with
  the reference's floors/clips (``calibration.py:332-355``); spatial
  derivatives are analytic SVI, ∂w/∂T is a centered FD on the interpolated
  surface (``calibration.py:339-343``). Fully traceable: the returned
  ``sigma_loc(S, t)`` closure runs *inside* the MC/PDE scans.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..dtypes import canonical

__all__ = [
    "SVIParams", "VolSurface", "fit_svi", "fit_svi_surface",
    "fit_essvi",
    "dupire_local_vol", "dupire_local_vol_func",
    "svi_butterfly_g", "svi_density", "check_butterfly",
    "check_calendar", "arbitrage_report",
]


# ---------------------------------------------------------------------------
# SVI raw parameterisation
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class SVIParams:
    """Raw SVI slice: w(k) = a + b(ρ(k−m) + √((k−m)² + σ²)), k = ln(K/F)."""

    a: float
    b: float
    rho: float
    m: float
    sigma: float
    expiry: float

    def total_var(self, k):
        """Total variance w(k)."""
        k = jnp.asarray(k)
        km = k - self.m
        return self.a + self.b * (
            self.rho * km + jnp.sqrt(km * km + self.sigma * self.sigma))

    def iv(self, k):
        """Implied vol from log-moneyness."""
        return jnp.sqrt(jnp.maximum(self.total_var(k), 0.0) / self.expiry)

    def dw_dk(self, k):
        """dw/dk = b(ρ + (k−m)/√((k−m)² + σ²))."""
        u = jnp.asarray(k) - self.m
        return self.b * (self.rho + u / jnp.sqrt(u * u + self.sigma**2))

    def d2w_dk2(self, k):
        """d²w/dk² = bσ²/((k−m)² + σ²)^{3/2}."""
        u = jnp.asarray(k) - self.m
        return self.b * self.sigma**2 / (u * u + self.sigma**2) ** 1.5


jax.tree_util.register_pytree_node(
    SVIParams,
    lambda p: ((p.a, p.b, p.rho, p.m, p.sigma, p.expiry), None),
    lambda _, c: SVIParams(*c),
)


def _stack_params(slices: dict) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Stack sorted slices into (expiries (n,), params (n,5))."""
    Ts = sorted(slices.keys())
    P = np.array([[slices[T].a, slices[T].b, slices[T].rho,
                   slices[T].m, slices[T].sigma] for T in Ts])
    return jnp.asarray(np.asarray(Ts, dtype=float)), jnp.asarray(P)


def _w_of_slices(params: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Total variance of every slice at k: (n_slices, *k.shape)."""
    a, b, rho, m, sig = (params[:, i] for i in range(5))
    shape = (-1,) + (1,) * jnp.ndim(k)
    a, b, rho, m, sig = (v.reshape(shape) for v in (a, b, rho, m, sig))
    km = k[None, ...] - m
    return a + b * (rho * km + jnp.sqrt(km * km + sig * sig))


# ---------------------------------------------------------------------------
# VolSurface
# ---------------------------------------------------------------------------
class VolSurface:
    """Interpolating vol surface built from SVI slices
    (API parity: reference ``calibration.py:72-160``).

    Between calibrated expiries, **total variance** is interpolated linearly
    in T (calendar-arbitrage free for monotone slices); beyond the ends the
    nearest slice's implied vol is used unchanged (flat-vol extrapolation,
    matching reference behaviour at ``calibration.py:139-143``).
    """

    def __init__(self, slices: dict, forward_curve: Optional[dict] = None):
        if not slices:
            raise ValueError("At least one SVI slice is required.")
        self._slices = dict(sorted(slices.items()))
        self._expiries = np.array(sorted(slices.keys()), dtype=float)
        self._forward_curve = forward_curve or {}
        # Stacked arrays for traced evaluation
        self._T_arr, self._P_arr = _stack_params(self._slices)
        if self._forward_curve:
            fts = sorted(self._forward_curve.keys())
            self._fwd_T = jnp.asarray(np.asarray(fts, dtype=float))
            self._fwd_F = jnp.asarray(
                np.asarray([self._forward_curve[t] for t in fts], dtype=float))
        else:
            self._fwd_T = self._fwd_F = None

    @property
    def slices(self) -> dict:
        return dict(self._slices)

    @property
    def expiries(self) -> np.ndarray:
        return self._expiries.copy()

    def _get_forward(self, T):
        """Forward at T, interpolated/extrapolated from the curve. Traceable."""
        if self._fwd_T is None:
            raise ValueError(
                f"Forward not available for T={T}. Provide forward_curve or "
                "pass log-moneyness directly to iv_from_logm().")
        if self._fwd_T.shape[0] == 1:
            return self._fwd_F[0]
        # log-linear in T with end-slope extrapolation: forwards follow
        # F(T) = S0·e^{∫(r−q)}, so ln F is the natural interpolation
        # variable and clamping (jnp.interp's default) would mis-state
        # the forward — and hence Dupire's moneyness — below the first
        # and beyond the last quoted expiry
        Ts, logF = self._fwd_T, jnp.log(self._fwd_F)
        i = jnp.clip(jnp.searchsorted(Ts, T), 1, Ts.shape[0] - 1)
        slope = (logF[i] - logF[i - 1]) / (Ts[i] - Ts[i - 1])
        return jnp.exp(logF[i - 1] + slope * (T - Ts[i - 1]))

    def total_var_from_logm(self, k, T):
        """Total variance at (k, T); linear in T between slices, end-slice
        w·(T/T_end)… no — flat *vol* beyond ends: w_end scaled so that
        iv(k, T) = iv_end(k)."""
        k = jnp.asarray(k)
        T = jnp.asarray(T)
        w_all = _w_of_slices(self._P_arr, k)          # (n, *k)
        Ts = self._T_arr
        n = Ts.shape[0]
        if n == 1:
            # single slice: flat vol across T
            return w_all[0] / Ts[0] * T
        idx = jnp.clip(jnp.searchsorted(Ts, T), 1, n - 1)
        T_lo, T_hi = Ts[idx - 1], Ts[idx]
        w_lo, w_hi = w_all[idx - 1], w_all[idx]
        alpha = (T - T_lo) / (T_hi - T_lo)
        w_mid = (1.0 - alpha) * w_lo + alpha * w_hi
        # Flat-vol extrapolation outside [T_0, T_{n-1}]
        w_short = w_all[0] / Ts[0] * T
        w_long = w_all[-1] / Ts[-1] * T
        w = jnp.where(T <= Ts[0], w_short,
                      jnp.where(T >= Ts[-1], w_long, w_mid))
        return w

    def iv_from_logm(self, k, T):
        """Implied vol from log-moneyness k = ln(K/F) at expiry T. Traceable."""
        w = self.total_var_from_logm(k, T)
        return jnp.sqrt(jnp.maximum(w, 0.0) / jnp.maximum(jnp.asarray(T), 1e-12))

    def iv(self, K, T):
        """Implied vol from absolute strike(s); needs the forward curve."""
        F = self._get_forward(T)
        k = jnp.log(jnp.asarray(K, jnp.result_type(float)) / F)
        result = self.iv_from_logm(k, T)
        if result.ndim == 0:
            return float(result)
        return result


# ---------------------------------------------------------------------------
# SVI fitting — jitted Levenberg-Marquardt with exact Jacobians
# ---------------------------------------------------------------------------
def _svi_w(params, k):
    a, b, rho, m, sig = params
    km = k - m
    return a + b * (rho * km + jnp.sqrt(km * km + sig * sig))


def _lm_loop(residuals, x0, lower, upper, max_iter: int):
    """Bound-projected Levenberg-Marquardt core — traceable; callers jit.

    ``residuals(x) -> (N,)`` may close over traced data. Shared by the SVI
    slice fitter below and the Heston surface fitter
    (``models.analytic.fit_heston``).
    """

    def cost(x):
        r = residuals(x)
        return 0.5 * jnp.sum(r * r)

    jac = jax.jacfwd(residuals)

    def body(state):
        x, lam, c, it, _ = state
        J = jac(x)                       # (N, 5)
        r = residuals(x)
        g = J.T @ r                      # gradient
        # J.T @ J is a true matmul → MXU bf16 at default TPU precision;
        # 1e-3-relative noise in H stalls LM near the optimum.
        H = jnp.matmul(J.T, J, precision=jax.lax.Precision.HIGHEST)
        D = jnp.diag(jnp.maximum(jnp.diag(H), 1e-12))
        step = jnp.linalg.solve(H + lam * D, g)
        x_new = jnp.clip(x - step, lower, upper)
        c_new = cost(x_new)
        accept = c_new < c
        x = jnp.where(accept, x_new, x)
        lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-12), lam * 3.0)
        c_next = jnp.where(accept, c_new, c)
        converged = jnp.logical_and(accept, jnp.abs(c - c_new) < 1e-16 * (1.0 + c))
        return x, lam, c_next, it + 1, converged

    def cond(state):
        _, lam, _, it, converged = state
        return jnp.logical_and(it < max_iter,
                               jnp.logical_and(~converged, lam < 1e10))

    x, _, c, _, _ = jax.lax.while_loop(
        cond, body, (x0, jnp.asarray(1e-3, x0.dtype), cost(x0), 0,
                     jnp.asarray(False)))
    return x, c


@partial(jax.jit, static_argnames=("max_iter",))
def _lm_fit(k, w_market, x0, lower, upper, *, max_iter: int = 200):
    """Levenberg-Marquardt on SVI total-variance residuals."""

    def residuals(x):
        return _svi_w(x, k) - w_market

    return _lm_loop(residuals, x0, lower, upper, max_iter)


def fit_svi(strikes, forward: float, expiry: float, market_ivs, *,
            initial_guess: Optional[tuple] = None,
            bounds: Optional[tuple] = None, dtype=None) -> SVIParams:
    """Fit raw SVI to one smile slice (API parity: reference
    ``calibration.py:166-229``; same default bounds / initial guess)."""
    dt = canonical(dtype)
    strikes = np.asarray(strikes, dtype=float)
    market_ivs = np.asarray(market_ivs, dtype=float)
    k = jnp.asarray(np.log(strikes / forward), dt)
    w_market = jnp.asarray(market_ivs**2 * expiry, dt)

    if initial_guess is None:
        a0 = float(np.mean(np.asarray(w_market)))
        initial_guess = (a0, 0.1, 0.0, 0.0, 0.1)
    if bounds is None:
        lower = (-0.5, 1e-6, -0.999, -2.0, 1e-4)
        upper = (2.0, 5.0, 0.999, 2.0, 5.0)
        bounds = (lower, upper)

    x, _ = _lm_fit(
        k, w_market, jnp.asarray(initial_guess, dt),
        jnp.asarray(bounds[0], dt), jnp.asarray(bounds[1], dt))
    a, b, rho, m, sig = (float(v) for v in x)
    return SVIParams(a=a, b=b, rho=rho, m=m, sigma=sig, expiry=expiry)


def fit_svi_surface(strikes_by_expiry: dict, forwards: dict,
                    market_ivs_by_expiry: dict, *,
                    dtype=None) -> VolSurface:
    """Fit SVI slice-by-slice → :class:`VolSurface`
    (reference ``calibration.py:232-261``).

    When every expiry quotes the same number of strikes, all slices fit in
    one vmapped Levenberg-Marquardt call (a whole surface costs one solver
    compile + one batched run); ragged surfaces fall back to per-slice fits.
    """
    Ts = sorted(strikes_by_expiry.keys())
    sizes = {len(np.asarray(strikes_by_expiry[T])) for T in Ts}
    if len(Ts) > 1 and len(sizes) == 1:
        dt = canonical(dtype)
        ks, ws, x0s = [], [], []
        for T in Ts:
            strikes = np.asarray(strikes_by_expiry[T], dtype=float)
            ivs = np.asarray(market_ivs_by_expiry[T], dtype=float)
            k = np.log(strikes / forwards[T])
            w = ivs**2 * T
            ks.append(k)
            ws.append(w)
            x0s.append((float(np.mean(w)), 0.1, 0.0, 0.0, 0.1))
        lower = jnp.asarray((-0.5, 1e-6, -0.999, -2.0, 1e-4), dt)
        upper = jnp.asarray((2.0, 5.0, 0.999, 2.0, 5.0), dt)
        fit = jax.vmap(lambda k, w, x0: _lm_fit(k, w, x0, lower, upper)[0])
        X = fit(jnp.asarray(np.stack(ks), dt), jnp.asarray(np.stack(ws), dt),
                jnp.asarray(np.stack(x0s), dt))
        X = np.asarray(X)
        slices = {T: SVIParams(a=float(X[i, 0]), b=float(X[i, 1]),
                               rho=float(X[i, 2]), m=float(X[i, 3]),
                               sigma=float(X[i, 4]), expiry=T)
                  for i, T in enumerate(Ts)}
        return VolSurface(slices, forward_curve=forwards)

    slices = {}
    for T in Ts:
        slices[T] = fit_svi(strikes_by_expiry[T], forwards[T], T,
                            market_ivs_by_expiry[T])
    return VolSurface(slices, forward_curve=forwards)


def _essvi_unpack(x, n_exp):
    """Raw optimiser vector → (θ (n,), ρ, η, γ), all constraints BUILT IN:
    θ strictly increasing via cumulative softplus (calendar monotonicity),
    ρ ∈ (−0.99, 0.99), η > 0, γ ∈ (0, 0.5) (power-law wing decay)."""
    theta = jnp.cumsum(jax.nn.softplus(x[:n_exp]) + 1e-8)
    rho = 0.99 * jnp.tanh(x[n_exp])
    eta = jax.nn.softplus(x[n_exp + 1]) + 1e-8
    gam = 0.5 * jax.nn.sigmoid(x[n_exp + 2])
    return theta, rho, eta, gam


def _essvi_w(theta_i, rho, phi_i, k):
    return 0.5 * theta_i * (1.0 + rho * phi_i * k + jnp.sqrt(
        (phi_i * k + rho) ** 2 + 1.0 - rho * rho))


@partial(jax.jit, static_argnames=("n_exp", "max_iter"))
def _essvi_fit_core(k_pad, w_pad, wt_pad, x0, *, n_exp: int,
                    max_iter: int = 400):
    """Joint LM over every quote of every expiry + soft no-butterfly
    penalties (Gatheral-Jacquier: θφ(1+|ρ|) ≤ 4 and θφ²(1+|ρ|) ≤ 4)."""

    def residuals(x):
        theta, rho, eta, gam = _essvi_unpack(x, n_exp)
        phi = eta / theta**gam
        w = _essvi_w(theta[:, None], rho, phi[:, None], k_pad)
        fit_res = ((w - w_pad) * wt_pad).ravel()
        cap = theta * phi * (1.0 + jnp.abs(rho))
        pen1 = 10.0 * jnp.maximum(cap - 4.0, 0.0)
        pen2 = 10.0 * jnp.maximum(cap * phi - 4.0, 0.0)
        return jnp.concatenate([fit_res, pen1, pen2])

    dim = n_exp + 3
    lower = jnp.full((dim,), -25.0, x0.dtype)
    upper = jnp.full((dim,), 25.0, x0.dtype)
    return _lm_loop(residuals, x0, lower, upper, max_iter)


def fit_essvi(strikes_by_expiry: dict, forwards: dict,
              market_ivs_by_expiry: dict, *, dtype=None,
              max_iter: int = 400) -> tuple[VolSurface, dict]:
    """GLOBAL arbitrage-free surface fit — eSSVI (Gatheral 2014 SSVI /
    Hendriks-Martini extended SSVI with power-law φ).

    One Levenberg-Marquardt solve over EVERY quote of EVERY expiry
    jointly, with the no-arbitrage structure built into the
    parameterisation rather than checked after the fact:

    * calendar: θ_T (ATM total variance) is strictly increasing by
      construction (cumulative softplus), ρ is shared, and the power-law
      φ(θ) = η/θ^γ with γ ∈ (0, ½) makes θφ(θ) increasing and φ
      decreasing — the Hendriks-Martini sufficient conditions;
    * butterfly: the Gatheral-Jacquier bounds θφ(1+|ρ|) ≤ 4 and
      θφ²(1+|ρ|) ≤ 4 enter the LM residuals as hinge penalties.

    Each fitted expiry is then EXPORTED as exact raw-SVI parameters
    (eSSVI at fixed T *is* SVI: a = θ(1−ρ²)/2, b = θφ/2, m = −ρ/φ,
    σ = √(1−ρ²)/φ), so the returned :class:`VolSurface` drives every
    downstream consumer — Dupire, the forward PDE, the arbitrage
    screens — unchanged.  Per-slice :func:`fit_svi_surface` fits tighter
    on noiseless single-slice data but can embed calendar crossings;
    this is the production surface when arbitrage-freeness matters.

    Returns ``(surface, info)`` with ``info`` carrying the eSSVI
    parameters, per-expiry θ/φ, the butterfly margins and the fit RMSE
    in total variance.  Reference baseline: per-slice scipy fits with no
    cross-expiry structure at all (``calibration.py:232-261``).
    """
    dt = canonical(dtype)
    Ts = sorted(strikes_by_expiry.keys())
    n_exp = len(Ts)
    if n_exp < 1:
        raise ValueError("need at least one expiry")
    m_max = max(len(np.asarray(strikes_by_expiry[T])) for T in Ts)
    k_pad = np.zeros((n_exp, m_max))
    w_pad = np.zeros((n_exp, m_max))
    wt_pad = np.zeros((n_exp, m_max))
    atm_w = np.zeros(n_exp)
    for i, T in enumerate(Ts):
        strikes = np.asarray(strikes_by_expiry[T], dtype=float)
        ivs = np.asarray(market_ivs_by_expiry[T], dtype=float)
        if strikes.shape != ivs.shape:
            raise ValueError(f"expiry {T}: strikes/ivs shape mismatch")
        m = strikes.size
        k = np.log(strikes / forwards[T])
        w = ivs**2 * T
        k_pad[i, :m] = k
        w_pad[i, :m] = w
        wt_pad[i, :m] = 1.0
        atm_w[i] = w[np.argmin(np.abs(k))]

    # raw init: θ from the ATM quotes (inverse of the cumulative
    # softplus), ρ = 0, η = 1, γ = 0.3
    inc = np.maximum(np.diff(atm_w, prepend=0.0), 1e-4)
    inv_softplus = lambda y: np.log(np.expm1(np.maximum(y, 1e-8)))
    x0 = np.concatenate([inv_softplus(inc),
                         [0.0, inv_softplus(1.0), -0.35]])

    x, cost = _essvi_fit_core(jnp.asarray(k_pad, dt),
                              jnp.asarray(w_pad, dt),
                              jnp.asarray(wt_pad, dt),
                              jnp.asarray(x0, dt), n_exp=n_exp,
                              max_iter=int(max_iter))
    theta, rho, eta, gam = (np.asarray(jax.device_get(v), np.float64)
                            for v in _essvi_unpack(x, n_exp))
    rho, eta, gam = float(rho), float(eta), float(gam)
    phi = eta / theta**gam

    slices = {}
    for i, T in enumerate(Ts):
        th, ph = float(theta[i]), float(phi[i])
        slices[T] = SVIParams(
            a=0.5 * th * (1.0 - rho * rho), b=0.5 * th * ph,
            rho=rho, m=-rho / ph,
            sigma=np.sqrt(1.0 - rho * rho) / ph, expiry=T)
    surface = VolSurface(slices, forward_curve=dict(forwards))
    n_quotes = int(wt_pad.sum())
    info = {
        "theta": theta, "rho": rho, "eta": eta, "gamma": gam,
        "phi": phi,
        "rmse_w": float(np.sqrt(2.0 * float(cost) / max(n_quotes, 1))),
        "butterfly_margin": 4.0 - theta * phi * (1.0 + abs(rho)),
        "butterfly_margin2": 4.0 - theta * phi**2 * (1.0 + abs(rho)),
    }
    return surface, info


# ---------------------------------------------------------------------------
# Dupire local volatility
# ---------------------------------------------------------------------------
def dupire_local_vol(surface: VolSurface, S, t, r: float, q: float, *,
                     dT: float = 1e-4):
    """Dupire local vol σ_loc(S, t) in total-variance/log-moneyness
    coordinates (Gatheral), with the reference's guards: w ≥ 1e-12,
    numerator ≥ 1e-12, denominator ≥ 1e-8, σ_loc clipped to [0.01, 5]
    (reference ``calibration.py:268-359``). Traceable in S and t."""
    scalar_in = jnp.ndim(S) == 0
    S_arr = jnp.atleast_1d(jnp.asarray(S, jnp.result_type(float)))
    t = jnp.maximum(jnp.asarray(t, S_arr.dtype), 1e-8)

    if surface._fwd_T is not None:
        F = surface._get_forward(t)
    else:
        F = jnp.mean(S_arr)
    k = jnp.log(S_arr / F)

    # Spatial quantities (w, ∂w/∂k, ∂²w/∂k²) from the INTERPOLATED
    # surface at t — the same linear-in-total-variance weights as
    # total_var_from_logm, applied to the analytic slice derivatives
    # (interpolation is linear at fixed k, so derivatives interpolate
    # with identical weights; flat-vol extrapolation scales all three
    # by t/T_end). Using the nearest slice instead mixes a slice-level
    # denominator with an interpolated-surface numerator and biases
    # σ_loc between/outside expiries (worst at t ≪ T_0, where the slice
    # w overstates the true w ∝ t and the d²w/2 term is ~T_0/t too big).
    Ts = surface._T_arr
    n_sl = Ts.shape[0]
    P = surface._P_arr
    a, b, rho, m, sig = (P[:, i][:, None] for i in range(5))
    km = k[None, :] - m
    root = jnp.sqrt(km * km + sig * sig)
    w_all = a + b * (rho * km + root)            # (n_slices, n_k)
    dw_all = b * (rho + km / root)
    d2w_all = b * sig**2 / root**3

    def _blend(q_all):
        if n_sl == 1:
            return q_all[0] * (t / Ts[0])
        i = jnp.clip(jnp.searchsorted(Ts, t), 1, n_sl - 1)
        alpha = (t - Ts[i - 1]) / (Ts[i] - Ts[i - 1])
        mid = (1.0 - alpha) * q_all[i - 1] + alpha * q_all[i]
        short = q_all[0] * (t / Ts[0])
        long = q_all[-1] * (t / Ts[-1])
        return jnp.where(t <= Ts[0], short,
                         jnp.where(t >= Ts[-1], long, mid))

    w = jnp.maximum(_blend(w_all), 1e-12)
    dw = _blend(dw_all)
    d2w = _blend(d2w_all)

    # ∂w/∂T via centered FD on the interpolated surface
    t_up = t + dT
    t_dn = jnp.maximum(t - dT, 1e-8)
    w_up = surface.total_var_from_logm(k, t_up)
    w_dn = surface.total_var_from_logm(k, t_dn)
    dwdT = (w_up - w_dn) / (t_up - t_dn)

    numer = jnp.maximum(dwdT, 1e-12)
    y = k
    denom = (1.0 - (y / w) * dw
             + 0.25 * (-0.25 - 1.0 / w + (y / w) ** 2) * dw**2
             + 0.5 * d2w)
    denom = jnp.maximum(denom, 1e-8)
    sigma_loc = jnp.clip(jnp.sqrt(jnp.maximum(numer / denom, 0.0)), 0.01, 5.0)
    if scalar_in:
        return sigma_loc[0]
    return sigma_loc


def dupire_local_vol_func(surface: VolSurface, r: float, q: float) -> Callable:
    """Closure ``sigma_loc(S_array, t) -> sigma_array`` compatible with
    :func:`~optpricer_tpu.models.processes.local_vol_paths`,
    :func:`~optpricer_tpu.models.pde.fd_price_local_vol` and
    :func:`~optpricer_tpu.models.processes.milstein_local_vol_paths` — and,
    unlike the reference's NumPy closure (``calibration.py:362-390``),
    traceable inside jit/scan so the whole local-vol engine compiles."""

    def _sigma_loc(S_arr, t):
        return dupire_local_vol(surface, S_arr, t, r, q)

    return _sigma_loc


# ---------------------------------------------------------------------------
# Static no-arbitrage diagnostics (Gatheral & Jacquier 2014)
# ---------------------------------------------------------------------------

def svi_butterfly_g(params: SVIParams, k):
    """Gatheral's butterfly factor g(k) for a raw-SVI slice.

        g(k) = (1 − k·w′/(2w))² − (w′²/4)(1/w + 1/4) + w″/2

    The slice is free of butterfly arbitrage iff g(k) ≥ 0 for all k —
    g is the factor by which the Black-Scholes lognormal density is
    modulated, so g < 0 anywhere means a negative risk-neutral density
    (a costless butterfly with positive payoff). Broadcasting, jittable.

    The reference fits SVI slices with no arbitrage screen at all
    (``calibration.py:166-229``); its fitted surfaces can embed static
    arbitrage silently. This diagnostic closes that gap.
    """
    k = jnp.asarray(k)
    w = jnp.maximum(params.total_var(k), 1e-12)
    wp = params.dw_dk(k)
    wpp = params.d2w_dk2(k)
    return ((1.0 - 0.5 * k * wp / w) ** 2
            - 0.25 * wp * wp * (1.0 / w + 0.25) + 0.5 * wpp)


def svi_density(params: SVIParams, k):
    """Risk-neutral density of log-moneyness k = ln(K/F) implied by a
    raw-SVI slice (Breeden-Litzenberger in Gatheral-Jacquier form):

        p(k) = g(k)/√(2π·w(k)) · exp(−d₋(k)²/2),
        d₋ = −k/√w − √w/2.

    Integrates to 1 and has E[e^k] = 1 (martingale) for an arbitrage-
    free slice; goes negative exactly where :func:`svi_butterfly_g`
    does.
    """
    k = jnp.asarray(k)
    w = jnp.maximum(params.total_var(k), 1e-12)
    sw = jnp.sqrt(w)
    d_minus = -k / sw - 0.5 * sw
    g = svi_butterfly_g(params, k)
    return g / jnp.sqrt(2.0 * jnp.pi * w) * jnp.exp(-0.5 * d_minus ** 2)


def check_butterfly(params: SVIParams, *, k_lo: float = -2.0,
                    k_hi: float = 2.0, n: int = 801) -> dict:
    """Scan one slice for butterfly arbitrage on a log-moneyness grid.

    Returns ``{"ok", "min_g", "k_at_min"}``; ``ok`` is True when
    min g(k) ≥ 0 over the scanned band.
    """
    k = jnp.linspace(k_lo, k_hi, int(n))
    g = svi_butterfly_g(params, k)
    i = int(jnp.argmin(g))
    return {"ok": bool(g[i] >= 0.0), "min_g": float(g[i]),
            "k_at_min": float(k[i])}


def check_calendar(surface: VolSurface, *, k_lo: float = -2.0,
                   k_hi: float = 2.0, n: int = 801) -> dict:
    """Scan a surface for calendar-spread arbitrage.

    Total variance must be non-decreasing in T at fixed log-moneyness
    (Gatheral-Jacquier Lemma 2.1: crossing slices admit a calendar
    spread with negative price). Checks every adjacent expiry pair on
    the grid; returns ``{"ok", "min_gap", "pair", "k_at_min"}`` with
    ``min_gap`` = min over pairs and k of w(k, T_{i+1}) − w(k, T_i).
    """
    Ts = [float(t) for t in surface.expiries]
    if len(Ts) < 2:
        return {"ok": True, "min_gap": float("inf"), "pair": None,
                "k_at_min": float("nan")}
    k = jnp.linspace(k_lo, k_hi, int(n))
    worst = (float("inf"), None, float("nan"))
    for t0, t1 in zip(Ts, Ts[1:]):
        gap = (surface.slices[t1].total_var(k)
               - surface.slices[t0].total_var(k))
        i = int(jnp.argmin(gap))
        if float(gap[i]) < worst[0]:
            worst = (float(gap[i]), (t0, t1), float(k[i]))
    return {"ok": worst[0] >= 0.0, "min_gap": worst[0],
            "pair": worst[1], "k_at_min": worst[2]}


def arbitrage_report(surface: VolSurface, *, k_lo: float = -2.0,
                     k_hi: float = 2.0, n: int = 801) -> dict:
    """Full static-arbitrage screen of a fitted surface.

    Returns ``{"ok", "butterfly": {T: check_butterfly(...)},
    "calendar": check_calendar(...)}``. Run it after
    :func:`fit_svi_surface` — a least-squares fit to noisy quotes can
    embed both kinds of arbitrage without any fitting-loss signal.
    """
    kw = dict(k_lo=k_lo, k_hi=k_hi, n=n)
    butterfly = {T: check_butterfly(p, **kw)
                 for T, p in surface.slices.items()}
    calendar = check_calendar(surface, **kw)
    ok = calendar["ok"] and all(b["ok"] for b in butterfly.values())
    return {"ok": ok, "butterfly": butterfly, "calendar": calendar}
