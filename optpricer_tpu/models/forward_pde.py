"""Dupire forward PDE: the whole call surface C(K, T) from ONE march.

Every backward solver in this package (and the reference's, ``pde.py:97-240``)
prices ONE contract per march: fix (K, T), solve back from expiry, read out
at S0.  The Dupire FORWARD equation transposes the problem — fix S0 and march
*maturity* forward over a STRIKE grid:

    ∂C/∂T = ½ σ_loc²(K, T) K² ∂²C/∂K² − (r − q) K ∂C/∂K − q C,
    C(K, 0) = max(S0 − K, 0),

so a single θ-scheme march yields European call prices for EVERY strike and
EVERY intermediate maturity simultaneously — an entire option chain (or the
vanilla-repricing check of a local-vol calibration) in one solve.  This is
the natural TPU formulation: the strike grid lives on the vector lanes, each
time step is one log-depth tridiagonal solve (``ops/tridiag.py``), and the
maturity axis is a ``lax.scan`` whose stacked outputs ARE the product.

In log-strike y = ln K the equation has constant-form coefficients

    ∂C/∂T = ½σ²(∂²C/∂y² − ∂C/∂y) − (r − q) ∂C/∂y − q C,

discretised with the same second-order central stencil as the backward
solver (``_operator_tridiag``).  σ may be a constant (then the march must
reproduce Black-Scholes for all (K, T) — the oracle test) or any traceable
``sigma_loc(K_array, t)`` callable such as
:func:`~optpricer_tpu.models.calibration.dupire_local_vol_func`, closing the
calibration loop: SVI fit → Dupire local vol → forward march → the model
surface back out.  The first ``rannacher`` steps run fully implicit to damp
the kink in the initial condition (Rannacher smoothing), after which the
march is Crank-Nicolson.

Read-outs interpolate on the host in f64 (bilinear in (ln K, T)) for the
same reason as the backward solver's ``_readout``: the TPU's f32 log is
~74 ulps off at strike-scale arguments.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.tridiag import tridiag_solve

__all__ = ["ForwardSurface", "dupire_forward_surface",
           "dupire_forward_price", "forward_surface_iv",
           "reprice_surface_forward"]


class ForwardSurface(NamedTuple):
    """One forward march: calls on the full (maturity × strike) grid.

    ``K`` (n_y+1,) and ``T`` (n_t+1,) are host f64; ``C[i, j]`` is the
    European call C(K[j], T[i]) seen from S0 (row 0 is the payoff).
    """
    K: np.ndarray
    T: np.ndarray
    C: np.ndarray
    S0: float
    r: float
    q: float

    def price(self, K, T, kind: str = "call"):
        """Bilinear read-out at (K, T); puts via parity. Host f64."""
        K_q = np.atleast_1d(np.asarray(K, np.float64))
        T_q = np.atleast_1d(np.asarray(T, np.float64))
        K_q, T_q = np.broadcast_arrays(K_q, T_q)
        y = np.log(self.K)
        yq = np.log(K_q)
        j = np.clip(np.searchsorted(y, yq) - 1, 0, len(y) - 2)
        wy = np.clip((yq - y[j]) / (y[j + 1] - y[j]), 0.0, 1.0)
        i = np.clip(np.searchsorted(self.T, T_q) - 1, 0, len(self.T) - 2)
        wt = np.clip((T_q - self.T[i]) / (self.T[i + 1] - self.T[i]),
                     0.0, 1.0)
        C = np.asarray(self.C, np.float64)
        c = ((1 - wt) * ((1 - wy) * C[i, j] + wy * C[i, j + 1])
             + wt * ((1 - wy) * C[i + 1, j] + wy * C[i + 1, j + 1]))
        if kind == "put":
            c = c - self.S0 * np.exp(-self.q * T_q) \
                + K_q * np.exp(-self.r * T_q)
        elif kind != "call":
            raise ValueError(f"kind must be 'call' or 'put', got {kind!r}")
        return c if np.ndim(K) or np.ndim(T) else float(c[0])


def _forward_operator(sig, dy, r, q):
    """Interior tridiagonals of L in log-strike: L C_j = α(C_{j−1} − 2C_j +
    C_{j+1}) + β(C_{j+1} − C_{j−1}) − qC_j with α = σ²/2dy², β = −(σ²/2 +
    r − q)/2dy — the ∂y-transform of the Dupire K-space operator."""
    alpha = 0.5 * sig**2 / dy**2
    beta = -(0.5 * sig**2 + (r - q)) / (2.0 * dy)
    return alpha - beta, -2.0 * alpha - q, alpha + beta


@partial(jax.jit, static_argnames=("n_t", "sigma_func", "rannacher"))
def _forward_march(y_grid, C0, dt, S0, r, q, sigma, theta,
                   *, n_t: int, sigma_func: Callable | None,
                   rannacher: int):
    """θ-scheme forward march; returns C on the full (n_t+1, n_y+1) grid."""
    n_y = y_grid.shape[0] - 1
    M = n_y - 1
    dy = y_grid[1] - y_grid[0]
    K_grid = jnp.exp(y_grid)
    K_int = K_grid[1:n_y]
    dtype = y_grid.dtype

    solve = tridiag_solve

    const_coeff = sigma_func is None
    if const_coeff:
        sig0 = jnp.full((M,), sigma, dtype=dtype)

    def bc(t):
        # K→0: the call is the forward, C = S0·e^{−qt} − K_min·e^{−rt};
        # K→∞: worthless.  Evaluated at the exact node strikes.
        left = S0 * jnp.exp(-q * t) - K_grid[0] * jnp.exp(-r * t)
        return jnp.maximum(left, 0.0), jnp.zeros((), dtype)

    def step(C, n):
        t_now = n * dt
        t_next = t_now + dt
        # Rannacher start: fully implicit for the first steps so the CN
        # weights don't ring off the payoff kink at K = S0.
        th = jnp.where(n < rannacher, 1.0, theta)
        e = (1.0 - th) * dt
        if const_coeff:
            sig = sig0
        else:
            # one operator per step, evaluated at the midpoint time — the
            # standard second-order choice for CN with time-dependent
            # coefficients (one build serves both sides of the step)
            sig = sigma_func(K_int, t_now + 0.5 * dt)
            sig = jnp.broadcast_to(jnp.asarray(sig, dtype), (M,))
        a_L, b_L, c_L = _forward_operator(sig, dy, r, q)

        bl_nxt, br_nxt = bc(t_next)
        C_int = C[1:n_y]
        # explicit side (I + e·L) C^n — the carried layer already holds
        # bc(t_now) at nodes 0 and n_y, so the stencil reads them directly
        rhs = (C_int
               + e * (b_L * C_int
                      + a_L * C[0:n_y - 1]
                      + c_L * C[2:n_y + 1]))
        # the carried layer already holds bc(t_now) at nodes 0 and n_y;
        # the implicit side moves its boundary couplings to the rhs
        rhs = rhs.at[0].add(th * dt * a_L[0] * bl_nxt)
        rhs = rhs.at[-1].add(th * dt * c_L[-1] * br_nxt)

        C_new_int = solve(-th * dt * a_L, 1.0 - th * dt * b_L,
                          -th * dt * c_L, rhs)
        C_new = jnp.concatenate(
            [bl_nxt[None], C_new_int, br_nxt[None]])
        return C_new, C_new

    _, C_all = jax.lax.scan(step, C0, jnp.arange(n_t, dtype=dtype))
    return jnp.concatenate([C0[None, :], C_all], axis=0)


def dupire_forward_surface(S0: float, r: float, q: float = 0.0, *,
                           T: float, sigma: float | None = None,
                           sigma_loc: Callable | None = None,
                           n_y: int = 512, n_t: int = 256,
                           y_mult: float = 6.0, theta: float = 0.5,
                           rannacher: int = 2,
                           dtype=None) -> ForwardSurface:
    """March the Dupire forward equation once; return the whole surface.

    Exactly one of ``sigma`` (constant vol — the Black-Scholes oracle
    limit) or ``sigma_loc`` (traceable ``(K_array, t) -> σ`` callable, e.g.
    :func:`~optpricer_tpu.models.calibration.dupire_local_vol_func`) must
    be given.  The strike grid spans ln(S0) ± ``y_mult``·σ_ref·√T where
    σ_ref is ``sigma`` or the callable evaluated at (S0, T/2).

    Returns a :class:`ForwardSurface` holding every (K_j, T_i) call price —
    ~``n_y·n_t`` European prices for the cost of ONE backward solve.
    """
    if (sigma is None) == (sigma_loc is None):
        raise ValueError("give exactly one of sigma= or sigma_loc=")
    if T <= 0.0:
        raise ValueError(f"T must be positive, got {T}")
    if n_y < 8 or n_t < 1:
        raise ValueError("need n_y >= 8 and n_t >= 1")
    dt_ = jnp.result_type(float) if dtype is None else dtype

    if sigma is not None:
        sigma_ref = float(sigma)
    else:
        sigma_ref = float(np.mean(np.asarray(
            sigma_loc(jnp.asarray([S0], dt_), 0.5 * T))))
    width = y_mult * sigma_ref * np.sqrt(T)
    y_np = np.linspace(np.log(S0) - width, np.log(S0) + width, n_y + 1)

    # Initial condition with the kink node replaced by its CELL AVERAGE
    # (Kreiss smoothing): the payoff max(S0 − e^y, 0) is kinked at
    # y₀ = ln S0, and a node landing near (not on) the kink injects an
    # O(dy) misalignment that Rannacher damping alone cannot remove.
    # Averaging over [y_j − dy/2, y_j + dy/2] restores clean second-order
    # convergence at ATM — analytic in y: ∫(S0 − e^y)⁺ dy has closed form.
    C0_np = np.maximum(S0 - np.exp(y_np), 0.0)
    dy = y_np[1] - y_np[0]
    x0 = np.log(S0)
    jk = int(np.clip(np.round((x0 - y_np[0]) / dy), 1, n_y - 1))
    a_c, b_c = y_np[jk] - 0.5 * dy, y_np[jk] + 0.5 * dy
    if a_c < x0 <= b_c:
        C0_np[jk] = (S0 * (x0 - a_c) - (S0 - np.exp(a_c))) / dy
    elif b_c <= x0:  # cell fully ITM: average of S0 − e^y over the cell
        C0_np[jk] = S0 - (np.exp(b_c) - np.exp(a_c)) / dy

    C = _forward_march(
        jnp.asarray(y_np, dt_), jnp.asarray(C0_np, dt_),
        jnp.asarray(T / n_t, dt_),
        jnp.asarray(S0, dt_), jnp.asarray(r, dt_), jnp.asarray(q, dt_),
        jnp.asarray(0.0 if sigma is None else sigma, dt_),
        jnp.asarray(theta, dt_),
        n_t=n_t, sigma_func=sigma_loc, rannacher=int(rannacher))

    T_np = np.linspace(0.0, T, n_t + 1)
    return ForwardSurface(K=np.exp(y_np), T=T_np,
                          C=np.asarray(jax.device_get(C), np.float64),
                          S0=float(S0), r=float(r), q=float(q))


def dupire_forward_price(S0: float, K, T, r: float, q: float = 0.0, *,
                         kind: str = "call", sigma: float | None = None,
                         sigma_loc: Callable | None = None,
                         n_y: int = 512, n_t: int = 256,
                         y_mult: float = 6.0, **kwargs):
    """European price(s) at (K, T) via one forward march to max(T).

    ``K``/``T`` may be scalars or arrays (broadcast together) — every
    requested maturity rides the same march, so a full option chain costs
    one solve.  Puts via parity.
    """
    T_max = float(np.max(np.asarray(T)))
    fs = dupire_forward_surface(S0, r, q, T=T_max, sigma=sigma,
                                sigma_loc=sigma_loc, n_y=n_y, n_t=n_t,
                                y_mult=y_mult, **kwargs)
    return fs.price(K, T, kind=kind)


def forward_surface_iv(fs: ForwardSurface, K, T):
    """Implied vols of the marched surface at (K, T) (broadcast).

    Inverts the read-out call prices with the vectorised Newton solver;
    entries whose price sits below intrinsic + ε (deep wings at short
    maturity where the PDE price underflows vega) come back NaN, matching
    ``bs_implied_vol_vec``'s convention.
    """
    K_b, T_b = np.broadcast_arrays(np.atleast_1d(K), np.atleast_1d(T))
    c = fs.price(K_b, T_b)
    from ..ops.black_scholes import bs_implied_vol_vec
    iv = bs_implied_vol_vec(fs.S0, K_b.ravel(), T_b.ravel(), fs.r, fs.q,
                            np.ravel(c), "call")
    iv = np.asarray(jax.device_get(iv)).reshape(K_b.shape)
    return iv if (np.ndim(K) or np.ndim(T)) else float(iv.flat[0])


def reprice_surface_forward(surface, S0: float, r: float, q: float = 0.0,
                            *, n_y: int = 512, n_t: int = 256,
                            y_mult: float = 5.0,
                            k_lo: float = -1.0, k_hi: float = 1.0,
                            n_k: int = 41) -> dict:
    """Round-trip a calibration: SVI surface → Dupire σ_loc → forward
    march → model IVs at every surface expiry.

    Returns ``{expiry: (K, iv_model, iv_market)}`` on a log-moneyness grid
    ``k ∈ [k_lo, k_hi]`` — the standard verification that a local-vol
    calibration actually reprices its vanillas (the reference has no such
    check; its Dupire surface is never validated against prices).
    """
    from .calibration import dupire_local_vol_func

    sig_fn = dupire_local_vol_func(surface, r, q)
    T_max = float(np.max(surface.expiries))
    fs = dupire_forward_surface(S0, r, q, T=T_max, sigma_loc=sig_fn,
                                n_y=n_y, n_t=n_t, y_mult=y_mult)
    out = {}
    for T_i in np.asarray(surface.expiries, np.float64):
        F = S0 * np.exp((r - q) * T_i)
        K = F * np.exp(np.linspace(k_lo, k_hi, n_k))
        iv_model = forward_surface_iv(fs, K, np.full_like(K, T_i))
        iv_market = np.asarray(jax.device_get(
            surface.iv(jnp.asarray(K), float(T_i))), np.float64)
        out[float(T_i)] = (K, iv_model, iv_market)
    return out
