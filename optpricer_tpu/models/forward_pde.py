"""Dupire forward PDE: the whole call surface C(K, T) from ONE march.

Every backward solver in this package (and the reference's, ``pde.py:97-240``)
prices ONE contract per march: fix (K, T), solve back from expiry, read out
at S0.  The Dupire FORWARD equation transposes the problem — fix S0 and march
*maturity* forward over a STRIKE grid:

    ∂C/∂T = ½ σ_loc²(K, T) K² ∂²C/∂K² − (r − q) K ∂C/∂K − q C,
    C(K, 0) = max(S0 − K, 0),

so a single θ-scheme march yields European prices for EVERY strike and
EVERY intermediate maturity simultaneously — an entire option chain (or the
vanilla-repricing check of a local-vol calibration) in one solve.  This is
the natural TPU formulation: the strike grid lives on the vector lanes, each
time step is one tridiagonal solve (or, for constant vol, one dense
propagator matvec on the MXU at ``Precision.HIGHEST`` — same design as the
backward solver's ``use_prop`` branch), and the maturity axis is a
``lax.scan`` whose stacked outputs ARE the product.

In log-strike y = ln K the equation has constant-form coefficients

    ∂C/∂T = ½σ²(∂²C/∂y² − ∂C/∂y) − (r − q) ∂C/∂y − q C,

discretised with the same second-order central stencil as the backward
solver (``_operator_tridiag``).  σ may be a constant (then the march must
reproduce Black-Scholes for all (K, T) — the oracle test) or any traceable
``sigma_loc(K_array, t)`` callable such as
:func:`~optpricer_tpu.models.calibration.dupire_local_vol_func`, closing the
calibration loop: SVI fit → Dupire local vol → forward march → the model
surface back out.  The first ``rannacher`` steps run fully implicit to damp
the kink in the initial condition (Rannacher smoothing) and the kink node
itself is replaced by its cell average (Kreiss smoothing) — together these
keep clean second-order convergence through the non-smooth payoff.

f32 design (the TPU default): CALL and PUT columns march TOGETHER through
the same operator (the put is just a second column of the propagator
matvec), and every read-out takes the OUT-of-the-money column, rebuilding
the in-the-money side via put-call parity in host f64.  A deep-ITM call
carries value ~S0, so f32 round-off across hundreds of steps costs ~1e-2
there; the OTM column's value is tiny and the parity shift is exact host
arithmetic — measured max |err| drops ~20× at 1024×512 in f32.

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

from ..ops.tridiag import tridiag_solve, tridiag_solve_thomas

__all__ = ["ForwardSurface", "dupire_forward_surface",
           "dupire_forward_price", "forward_surface_iv",
           "reprice_surface_forward"]


class ForwardSurface(NamedTuple):
    """One forward march: calls AND puts on the full (maturity × strike)
    grid, parity-stitched from the OTM columns (see module docstring).

    ``K`` (n_y+1,) and ``T`` (n_t+1,) are host f64; ``C[i, j]`` /
    ``P[i, j]`` are the European call / put at (K[j], T[i]) seen from S0
    (row 0 holds the payoffs).
    """
    K: np.ndarray
    T: np.ndarray
    C: np.ndarray
    S0: float
    r: float
    q: float
    P: np.ndarray

    def price(self, K, T, kind: str = "call"):
        """Bilinear read-out at (K, T) from the parity-stitched grid."""
        if kind == "call":
            V = self.C
        elif kind == "put":
            V = self.P
        else:
            raise ValueError(f"kind must be 'call' or 'put', got {kind!r}")
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
        v = ((1 - wt) * ((1 - wy) * V[i, j] + wy * V[i, j + 1])
             + wt * ((1 - wy) * V[i + 1, j] + wy * V[i + 1, j + 1]))
        return v if np.ndim(K) or np.ndim(T) else float(v[0])


def _forward_operator(sig, dy, r, q):
    """Interior tridiagonals of L in log-strike: L V_j = α(V_{j−1} − 2V_j +
    V_{j+1}) + β(V_{j+1} − V_{j−1}) − qV_j with α = σ²/2dy², β = −(σ²/2 +
    r − q)/2dy — the ∂y-transform of the Dupire K-space operator."""
    alpha = 0.5 * sig**2 / dy**2
    beta = -(0.5 * sig**2 + (r - q)) / (2.0 * dy)
    return alpha - beta, -2.0 * alpha - q, alpha + beta


def _bc(t, S0, r, q, K_lo, K_hi, dtype):
    """Dirichlet rows for (call, put) at the strike-grid edges:
    K→0: C = fwd − disc·K (deep ITM), P = 0; K→∞ mirrored."""
    fwd = S0 * jnp.exp(-q * t)
    lo = jnp.stack([jnp.maximum(fwd - K_lo * jnp.exp(-r * t), 0.0),
                    jnp.zeros((), dtype)])
    hi = jnp.stack([jnp.zeros((), dtype),
                    jnp.maximum(K_hi * jnp.exp(-r * t) - fwd, 0.0)])
    return lo, hi


def _prop_host(y_np: np.ndarray, dt: float, r: float, q: float,
               sigma: float, th: float):
    """(P, w_lo, w_hi, a0, cM) for one θ, built on the HOST in f64 and
    rounded to the compute dtype ONCE: P = A⁻¹B dense propagator,
    w = A⁻¹e_{0,M−1} the boundary-response columns, via LAPACK banded
    solves (A is tridiagonal — the dense np.linalg.solve this replaces
    was ~1.4 GFLOP of LU and dominated the march call on a 1-core
    host).  An f32 DEVICE build (à la the Heston ADI's
    ``ops.tridiag.tridiag_inv``) was tried and rejected, measured: the
    boundary-response columns decay exponentially and the readout needs
    their ENTRYWISE-relative accuracy; a normwise-refined f32 solve
    leaves O(ε·‖w‖) noise in the tail entries, which the large deep-ITM
    Dirichlet values amplify to a 12× worse ATM error (1.1e-4 →
    1.3e-3) over 512 steps.  f64-then-cast keeps tiny entries
    relatively exact."""
    M = y_np.size - 2
    dy = y_np[1] - y_np[0]
    alpha = 0.5 * sigma**2 / dy**2
    beta = -(0.5 * sigma**2 + (r - q)) / (2.0 * dy)
    a_L = np.full(M, alpha - beta)
    b_L = np.full(M, -2.0 * alpha - q)
    c_L = np.full(M, alpha + beta)
    e = (1.0 - th) * dt
    B = (np.diag(1.0 + e * b_L)
         + np.diag(e * a_L[1:], -1) + np.diag(e * c_L[:-1], 1))
    # A is tridiagonal: LAPACK's banded solver is O(M·nrhs) — the dense
    # np.linalg.solve here was ~1.4 GFLOP and dominated the march call
    from scipy.linalg import solve_banded

    ab = np.zeros((3, M))
    ab[0, 1:] = -th * dt * c_L[:-1]
    ab[1] = 1.0 - th * dt * b_L
    ab[2, :-1] = -th * dt * a_L[1:]
    rhs = np.zeros((M, 2))
    rhs[0, 0] = 1.0
    rhs[M - 1, 1] = 1.0
    P = solve_banded((1, 1), ab, B)
    w = solve_banded((1, 1), ab, rhs)
    return P, w[:, 0], w[:, 1], float(a_L[0]), float(c_L[-1])


@partial(jax.jit, static_argnames=("n_steps",))
def _prop_scan(V, P, w_lo, w_hi, a0, cM, n0, dt, th, S0, r, q,
               K_lo, K_hi, *, n_steps: int):
    """``n_steps`` propagator steps from time index ``n0``: V_int ←
    P·V_int + boundary responses, one (M × M)·(M × 2) MXU matmul per step
    at ``Precision.HIGHEST`` (bf16 accumulation over hundreds of steps is
    fatal — same design as ``pde.py:186-210``)."""
    n_y = V.shape[0] - 1
    dtype = V.dtype
    e = (1.0 - th) * dt

    def step(V, n):
        t_now = n * dt
        lo_now, hi_now = _bc(t_now, S0, r, q, K_lo, K_hi, dtype)
        lo_nxt, hi_nxt = _bc(t_now + dt, S0, r, q, K_lo, K_hi, dtype)
        s_lo = e * a0 * lo_now + th * dt * a0 * lo_nxt
        s_hi = e * cM * hi_now + th * dt * cM * hi_nxt
        V_new_int = (jnp.matmul(P, V[1:n_y],
                                precision=jax.lax.Precision.HIGHEST)
                     + jnp.outer(w_lo, s_lo) + jnp.outer(w_hi, s_hi))
        V_new = jnp.concatenate(
            [lo_nxt[None, :], V_new_int, hi_nxt[None, :]])
        return V_new, V_new

    return jax.lax.scan(step, V, n0 + jnp.arange(n_steps, dtype=dtype))


def _forward_march_prop(y_np, V0, dt, S0, r, q, sigma, theta, dt_,
                        *, n_t: int, rannacher: int):
    """Constant-vol forward march: host-f64 propagators (implicit for the
    Rannacher start, Crank-Nicolson after), device scan of MXU matvecs."""
    n_r = min(rannacher, n_t)
    K_lo, K_hi = float(np.exp(y_np[0])), float(np.exp(y_np[-1]))
    scal = tuple(jnp.asarray(v, dt_)
                 for v in (dt, S0, r, q, K_lo, K_hi))
    dt_j, S0_j, r_j, q_j, Klo_j, Khi_j = scal
    V = V0
    outs = []
    for th, lo, hin in (((1.0), 0, n_r), (theta, n_r, n_t)):
        n_blk = hin - lo
        if n_blk <= 0:
            continue
        P, w_lo, w_hi, a0, cM = _prop_host(y_np, dt, r, q, sigma, th)
        V, V_blk = _prop_scan(
            V, jnp.asarray(P, dt_), jnp.asarray(w_lo, dt_),
            jnp.asarray(w_hi, dt_), jnp.asarray(a0, dt_),
            jnp.asarray(cM, dt_), jnp.asarray(float(lo), dt_), dt_j,
            jnp.asarray(th, dt_), S0_j, r_j, q_j, Klo_j, Khi_j,
            n_steps=n_blk)
        outs.append(V_blk)
    return jnp.concatenate([V0[None]] + outs, axis=0)


@partial(jax.jit, static_argnames=("n_t", "sigma_func", "rannacher"))
def _forward_march(y_grid, V0, dt, S0, r, q, sigma, theta,
                   *, n_t: int, sigma_func: Callable | None,
                   rannacher: int):
    """θ-scheme forward march with per-step coefficients (local vol);
    the (call, put) pair rides the tridiagonal solve as a batch axis.
    Returns V on the full (n_t+1, n_y+1, 2) grid."""
    n_y = y_grid.shape[0] - 1
    M = n_y - 1
    dy = y_grid[1] - y_grid[0]
    K_grid = jnp.exp(y_grid)
    K_int = K_grid[1:n_y]
    K_lo, K_hi = K_grid[0], K_grid[-1]
    dtype = y_grid.dtype

    const_coeff = sigma_func is None
    if const_coeff:
        sig0 = jnp.full((M,), sigma, dtype=dtype)

    def step(V, n):
        t_now = n * dt
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

        lo_nxt, hi_nxt = _bc(t_now + dt, S0, r, q, K_lo, K_hi, dtype)
        V_int = V[1:n_y]
        # explicit side (I + e·L) V^n — the carried layer already holds
        # bc(t_now) at nodes 0 and n_y, so the stencil reads them directly
        rhs = (V_int
               + e * (b_L[:, None] * V_int
                      + a_L[:, None] * V[0:n_y - 1]
                      + c_L[:, None] * V[2:n_y + 1]))
        # the implicit side moves its boundary couplings to the rhs
        rhs = rhs.at[0].add(th * dt * a_L[0] * lo_nxt)
        rhs = rhs.at[-1].add(th * dt * c_L[-1] * hi_nxt)

        V_new_int = tridiag_solve(
            jnp.broadcast_to(-th * dt * a_L, (2, M)),
            jnp.broadcast_to(1.0 - th * dt * b_L, (2, M)),
            jnp.broadcast_to(-th * dt * c_L, (2, M)), rhs.T).T
        V_new = jnp.concatenate(
            [lo_nxt[None, :], V_new_int, hi_nxt[None, :]])
        return V_new, V_new

    _, V_all = jax.lax.scan(step, V0, jnp.arange(n_t, dtype=dtype))
    return jnp.concatenate([V0[None], V_all], axis=0)


def _smoothed_payoffs(y_np: np.ndarray, S0: float) -> np.ndarray:
    """(n_y+1, 2) host-f64 (call, put) payoffs with the kink node replaced
    by its CELL AVERAGE (Kreiss smoothing): a node landing near (not on)
    the kink at y₀ = ln S0 injects an O(dy) misalignment that Rannacher
    damping alone cannot remove; the averages are analytic in y."""
    n_y = y_np.size - 1
    K_np = np.exp(y_np)
    V0 = np.stack([np.maximum(S0 - K_np, 0.0),
                   np.maximum(K_np - S0, 0.0)], axis=-1)
    dy = y_np[1] - y_np[0]
    x0 = np.log(S0)
    jk = int(np.clip(np.round((x0 - y_np[0]) / dy), 1, n_y - 1))
    a_c, b_c = y_np[jk] - 0.5 * dy, y_np[jk] + 0.5 * dy
    if a_c < x0 <= b_c:
        V0[jk, 0] = (S0 * (x0 - a_c) - (S0 - np.exp(a_c))) / dy
        V0[jk, 1] = (np.exp(b_c) - S0 - S0 * (b_c - x0)) / dy
    elif b_c <= x0:   # cell fully ITM for the call
        V0[jk, 0] = S0 - (np.exp(b_c) - np.exp(a_c)) / dy
    else:             # cell fully ITM for the put
        V0[jk, 1] = (np.exp(b_c) - np.exp(a_c)) / dy - S0
    return V0


def dupire_forward_surface(S0: float, r: float, q: float = 0.0, *,
                           T: float, sigma: float | None = None,
                           sigma_loc: Callable | None = None,
                           n_y: int = 512, n_t: int = 256,
                           y_mult: float = 6.0, theta: float = 0.5,
                           rannacher: int = 2,
                           dtype=None) -> ForwardSurface:
    """March the Dupire forward equation once; return the whole surface.

    Exactly one of ``sigma`` (constant vol — the Black-Scholes oracle
    limit; dense-propagator MXU path) or ``sigma_loc`` (traceable
    ``(K_array, t) -> σ`` callable, e.g.
    :func:`~optpricer_tpu.models.calibration.dupire_local_vol_func`;
    per-step tridiagonal path) must be given.  The strike grid spans
    ln(S0) ± ``y_mult``·σ_ref·√T where σ_ref is ``sigma`` or the callable
    evaluated at (S0, T/2).

    Returns a :class:`ForwardSurface` holding every (K_j, T_i) call AND
    put price — ~``2·n_y·n_t`` European prices for the cost of ONE
    backward solve.
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
    V0_np = _smoothed_payoffs(y_np, S0)

    if sigma is not None:
        V = _forward_march_prop(
            y_np, jnp.asarray(V0_np, dt_), float(T) / n_t, float(S0),
            float(r), float(q), float(sigma), float(theta), dt_,
            n_t=n_t, rannacher=int(rannacher))
    else:
        args = (jnp.asarray(y_np, dt_), jnp.asarray(V0_np, dt_),
                jnp.asarray(T / n_t, dt_),
                jnp.asarray(S0, dt_), jnp.asarray(r, dt_),
                jnp.asarray(q, dt_), jnp.asarray(0.0, dt_),
                jnp.asarray(theta, dt_))
        V = _forward_march(*args, n_t=n_t, sigma_func=sigma_loc,
                           rannacher=int(rannacher))

    V_np = np.asarray(jax.device_get(V), np.float64)
    T_np = np.linspace(0.0, T, n_t + 1)
    K_np = np.exp(y_np)
    # parity-stitch in host f64: read the OTM column everywhere, rebuild
    # the ITM side from C − P = S0·e^{−qT} − K·e^{−rT} (exact identity,
    # satisfied by the PDE itself) — f32 round-off lives in the big
    # ITM values, the OTM columns are clean
    G = (S0 * np.exp(-q * T_np)[:, None]
         - K_np[None, :] * np.exp(-r * T_np)[:, None])
    otm_call = K_np[None, :] >= S0 * np.exp((r - q) * T_np)[:, None]
    C_grid = np.where(otm_call, V_np[..., 0], V_np[..., 1] + G)
    P_grid = np.where(otm_call, V_np[..., 0] - G, V_np[..., 1])
    return ForwardSurface(K=K_np, T=T_np, C=C_grid,
                          S0=float(S0), r=float(r), q=float(q),
                          P=P_grid)


def dupire_forward_price(S0: float, K, T, r: float, q: float = 0.0, *,
                         kind: str = "call", sigma: float | None = None,
                         sigma_loc: Callable | None = None,
                         n_y: int = 512, n_t: int = 256,
                         y_mult: float = 6.0, **kwargs):
    """European price(s) at (K, T) via one forward march to max(T).

    ``K``/``T`` may be scalars or arrays (broadcast together) — every
    requested maturity rides the same march, so a full option chain costs
    one solve.
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
