"""Rough volatility: rBergomi by exact Gaussian simulation on the MXU.

The rough Bergomi model (Bayer, Friz & Gatheral 2016):

    v_t = ξ0(t) · exp(η·W̃_t − ½η²·t^{2H}),
    W̃_t = √(2H) ∫₀ᵗ (t−u)^{H−1/2} dW_u          (Riemann-Liouville),
    dS_t/S_t = (r−q)dt + √v_t (ρ dW_t + √(1−ρ²) dW⊥_t),

with Hurst index H < 1/2 producing the power-law ATM-skew explosion
observed in equity markets — a model family the reference does not have,
and the standard modern benchmark beyond Markovian stochastic vol.

TPU-first design: instead of the literature's hybrid scheme (FFT
convolution, awkward under jit) this uses EXACT joint Gaussian
simulation. (W̃_{t_1..t_n}, ΔW_{1..n}) is a Gaussian vector whose
covariance is known in (semi-)closed form:

    Cov(W̃_u, W̃_v)  = 2H u^{2H} ∫₀¹ (v/u − x)^{H−1/2}(1−x)^{H−1/2} dx
                       (v ≥ u; Gauss-Jacobi quadrature absorbs the
                        (1−x)^{H−1/2} endpoint singularity exactly),
    Cov(W̃_t, ΔW_j) = √(2H)/(H+½)·[(t−t_{j−1})^{H+½} − (t−t_j)^{H+½}]
                       for t_j ≤ t, else the kernel support is empty,
    Cov(ΔW_i, ΔW_j) = δ_ij·Δt.

The (2n × 2n) covariance is assembled and Cholesky-factored ONCE on the
host in f64 (n ≤ a few hundred time steps), and every path batch is then
ONE (2n × 2n)·(2n × n_paths) matmul on the MXU — the Volterra kernel has
no bias at the grid times, unlike Euler discretisations of the singular
kernel. Only the log-Euler integration of S carries O(Δt) bias.

``rbergomi_paths`` returns the standard ``(n_steps+1, n_paths)`` path
matrix, so every path-matrix consumer in the package (``exotics.py``
barrier/Asian/lookback/digital pricers, realised-variance tools) prices
rough-vol products with no new code.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from ..dtypes import canonical
from .monte_carlo import resolve_seed

__all__ = ["rbergomi_paths", "rbergomi_price"]


def _volterra_cov(times: np.ndarray, H: float, n_quad: int = 64):
    """(n, n) covariance of the Riemann-Liouville Volterra process at
    ``times`` (all > 0), f64 host numpy. Diagonal is exact (t^{2H});
    off-diagonals integrate the smooth factor against the Gauss-Jacobi
    weight (1−x)^{H−1/2} so the endpoint singularity never meets the
    quadrature."""
    from scipy.special import roots_jacobi

    n = times.size
    # weight (1-x)^alpha on [-1, 1] with alpha = H - 1/2; map to [0, 1]
    xk, wk = roots_jacobi(n_quad, H - 0.5, 0.0)
    x01 = 0.5 * (xk + 1.0)
    # jacobian of the map: dx = dt/2, and (1-x)^a on [-1,1] becomes
    # (2(1-u))^a -> scale weights by (1/2)^{a+1}
    w01 = wk * 0.5 ** (H + 0.5)

    tv = times[:, None]            # v (rows) >= u (cols) used below
    tu = times[None, :]
    c = np.maximum(tv, tu) / np.minimum(tv, tu)
    # I(c) = int_0^1 (c - x)^{H-1/2} (1-x)^{H-1/2} dx
    I = np.einsum("k,ijk->ij",
                  w01, (c[:, :, None] - x01[None, None, :]) ** (H - 0.5))
    cov = 2.0 * H * np.minimum(tv, tu) ** (2.0 * H) * I
    np.fill_diagonal(cov, times ** (2.0 * H))
    return cov


def _joint_chol(n_steps: int, dt: float, H: float) -> np.ndarray:
    """Cholesky factor (2n × 2n, f64) of the joint law of
    (W̃_{t_1..t_n}, ΔW_{1..n})."""
    t = dt * np.arange(1, n_steps + 1)
    C = np.zeros((2 * n_steps, 2 * n_steps))
    C[:n_steps, :n_steps] = _volterra_cov(t, H)
    # Cov(W~_{t_i}, dW_j), kernel support [t_{j-1}, t_j] subset [0, t_i]
    g = H + 0.5
    ti = t[:, None]
    tj = t[None, :]
    tjm = tj - dt
    cwd = np.sqrt(2.0 * H) / g * (
        np.maximum(ti - tjm, 0.0) ** g - np.maximum(ti - tj, 0.0) ** g)
    cwd[ti < tj - 1e-15 * dt] = 0.0
    C[:n_steps, n_steps:] = cwd
    C[n_steps:, :n_steps] = cwd.T
    C[n_steps:, n_steps:] = dt * np.eye(n_steps)
    # tiny jitter: the Volterra block is near-singular for H -> 0 at
    # adjacent times; scaled to the largest variance on the diagonal
    jit = 1e-12 * max(float(t[-1] ** (2.0 * H)), dt)
    return np.linalg.cholesky(C + jit * np.eye(2 * n_steps))


@partial(jax.jit, static_argnames=("n_steps", "n_paths", "antithetic"))
def _rbergomi_core(key, L, xi_grid, t_grid, S0, r, q, eta, H2, rho, dt,
                   *, n_steps: int, n_paths: int, antithetic: bool):
    dtype = L.dtype
    half = n_paths // 2 if antithetic else n_paths
    k1, k2 = jax.random.split(key)
    Z = jax.random.normal(k1, (2 * n_steps, half), dtype)
    Zp = jax.random.normal(k2, (n_steps, half), dtype)
    if antithetic:
        Z = jnp.concatenate([Z, -Z], axis=1)
        Zp = jnp.concatenate([Zp, -Zp], axis=1)
    X = jnp.matmul(L, Z, precision=jax.lax.Precision.HIGHEST)
    Wt = X[:n_steps]              # Volterra at t_1..t_n
    dW = X[n_steps:]              # increments of the driving BM
    # variance at the LEFT endpoints t_0..t_{n-1}: W~_0 = 0
    Wt_left = jnp.concatenate([jnp.zeros((1, Wt.shape[1]), dtype),
                               Wt[:-1]], axis=0)
    t_left = jnp.concatenate([jnp.zeros((1,), dtype), t_grid[:-1]])
    v = xi_grid[:, None] * jnp.exp(
        eta * Wt_left - 0.5 * eta * eta * t_left[:, None] ** H2)
    dWp = jnp.sqrt(dt) * Zp
    dlogS = ((r - q) * dt - 0.5 * v * dt
             + jnp.sqrt(v) * (rho * dW
                              + jnp.sqrt(1.0 - rho * rho) * dWp))
    logS = jnp.log(S0) + jnp.cumsum(dlogS, axis=0)
    S = jnp.exp(logS)
    return jnp.concatenate(
        [jnp.full((1, S.shape[1]), S0, dtype), S], axis=0), v


def rbergomi_paths(S0, r, q, T, n_steps, n_paths, *,
                   xi0: Union[float, Callable], eta: float, H: float,
                   rho: float, antithetic: bool = True,
                   seed: Optional[int] = None, dtype=None,
                   return_variance: bool = False):
    """rBergomi path matrix ``(n_steps+1, n_paths)`` (optionally also the
    spot-variance grid ``(n_steps, n_paths)`` at the left endpoints).

    ``xi0``: flat forward variance (float, e.g. 0.04) or a callable
    ``t -> ξ0(t)`` evaluated on the host grid. ``H`` ∈ (0, 1/2] is the
    Hurst index (H = 1/2 recovers a classic lognormal-vol model — the
    cross-check in tests), ``eta`` the vol-of-vol, ``rho`` the spot-vol
    correlation. The Volterra process is simulated EXACTLY at the grid
    times via the joint Cholesky factor (see module docstring); the spot
    is log-Euler.

    Composes with the path-matrix exotics API: e.g.
    ``barrier_price(rbergomi_paths(...), K, r, T, ...)``.
    """
    if not (0.0 < H <= 0.5):
        raise ValueError(f"H must be in (0, 1/2], got {H}")
    if not (-1.0 <= rho <= 1.0):
        raise ValueError(f"rho must be in [-1, 1], got {rho}")
    if eta < 0.0:
        raise ValueError(f"eta must be non-negative, got {eta}")
    if n_steps < 1 or n_paths < 2:
        raise ValueError("need n_steps >= 1 and n_paths >= 2")
    dt_ = canonical(dtype)
    dt = float(T) / int(n_steps)
    L = _joint_chol(int(n_steps), dt, float(H))
    t_np = dt * np.arange(1, int(n_steps) + 1)
    xi_np = (np.full(n_steps, float(xi0)) if not callable(xi0)
             else np.asarray([float(xi0(t)) for t in dt * np.arange(n_steps)]))
    if np.any(xi_np <= 0.0):
        raise ValueError("xi0 must be positive on the grid")
    key = jax.random.key(resolve_seed(seed))
    S, v = _rbergomi_core(
        key, jnp.asarray(L, dt_), jnp.asarray(xi_np, dt_),
        jnp.asarray(t_np, dt_), jnp.asarray(S0, dt_),
        jnp.asarray(r, dt_), jnp.asarray(q, dt_),
        jnp.asarray(eta, dt_), jnp.asarray(2.0 * H, dt_),
        jnp.asarray(rho, dt_), jnp.asarray(dt, dt_),
        n_steps=int(n_steps), n_paths=int(n_paths),
        antithetic=bool(antithetic))
    return (S, v) if return_variance else S


def rbergomi_price(S0, K, T, r, q=0.0, *, xi0, eta, H, rho,
                   kind: str = "call", n_steps: int = 128,
                   n_paths: int = 131_072, antithetic: bool = True,
                   seed: Optional[int] = None,
                   dtype=None) -> tuple[float, float]:
    """European price under rBergomi, ``(price, stderr)``.

    Vanilla wrapper over :func:`rbergomi_paths`; exotic payoffs go
    through the path-matrix API (``exotics.py``) on the same paths.
    """
    if kind not in ("call", "put"):
        raise ValueError("kind must be 'call' or 'put'")
    S = rbergomi_paths(S0, r, q, T, n_steps, n_paths, xi0=xi0, eta=eta,
                       H=H, rho=rho, antithetic=antithetic, seed=seed,
                       dtype=dtype)
    sign = 1.0 if kind == "call" else -1.0
    pay = np.maximum(
        sign * (np.asarray(jax.device_get(S[-1]), np.float64) - K), 0.0)
    disc = np.exp(-r * T)
    n = pay.size
    return (float(disc * pay.mean()),
            float(disc * pay.std(ddof=1) / np.sqrt(n)))
