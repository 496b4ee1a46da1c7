"""Finite-difference θ-scheme solver for the Black-Scholes PDE, TPU-native.

Same mathematical scheme as reference ``pde.py``: uniform log-spot grid
x = ln S where the constant-vol BS PDE has constant coefficients
(reference ``pde.py:1-22``), θ time stepping (0 = explicit, ½ = CN,
1 = implicit), Dirichlet boundaries with discounted-strike asymptotics
(``pde.py:151-159``), post-solve American projection (``pde.py:205-207``),
barrier-node Dirichlet override (``pde.py:209-211``), and knock-in via
in/out parity (``pde.py:308-313``).

TPU re-architecture:

* The time march is one ``lax.scan``. With constant vol (the common case),
  the θ-scheme step is algebraically a fixed linear map: V⁺ = P·V + ℓ·w₀ +
  ρ·w_M with P = (I−θdtL)⁻¹(I+(1−θ)dtL) and w₀/w_M the solved boundary
  responses. P is built **once** and each step becomes a single dense
  matvec on the MXU — the "propagator" solver, ~50× faster on TPU than
  per-step tridiagonal elimination and exact (same linear algebra).
* The local-vol variant (time-dependent coefficients) rebuilds tridiagonals
  inside the scan from a traceable ``sigma_func`` and solves with the
  log-depth associative-scan solver from :mod:`optpricer_tpu.ops.tridiag`
  (replacing the sequential Python Thomas loop, reference ``pde.py:62-88``).
* Everything is batched-ready: both solvers broadcast over leading axes, so
  a strike ladder prices as one kernel (see :func:`fd_price_batch`) —
  P @ (M × batch) saturates the MXU.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Literal

import jax
import jax.numpy as jnp
import numpy as np

from ..core import CALL, PUT, OptionSpec
from ..dtypes import canonical
from ..ops.black_scholes import is_call_mask
from ..ops.tridiag import tridiag_solve, tridiag_solve_thomas

__all__ = ["fd_price", "fd_price_barrier", "fd_price_double_barrier",
           "fd_greeks", "fd_price_local_vol",
           "fd_price_batch", "fd_price_local_vol_batch"]


def _build_grid(S0, T, sigma, N_S, N_t, S_max_mult):
    """Uniform log-spot grid x ∈ ln(S0) ± S_max_mult·σ√T
    (reference ``pde.py:44-59``)."""
    x_range = S_max_mult * sigma * np.sqrt(T)
    x_min = np.log(S0) - x_range
    x_max = np.log(S0) + x_range
    x_grid = np.linspace(x_min, x_max, N_S + 1)
    dx = x_grid[1] - x_grid[0]
    dt = T / N_t
    return x_grid, dx, dt


def _payoff(S, K, is_call):
    return jnp.where(is_call, jnp.maximum(S - K, 0.0), jnp.maximum(K - S, 0.0))


def _readout(x_np, V, S0):
    """Interpolate the solved ladder at ln(S0), on host in f64.

    The read-out must NOT be jnp.interp(jnp.log(S0), ...) on device: the
    TPU VPU's f32 log is ~74 ulps off at spot-scale arguments (3.5e-5 at
    S0=100), which shifts the query point by enough to move the price by
    Δ·S0·3.5e-5 ≈ 2.5e-3 on an ATM grid — an order of magnitude above the
    solver's own error. Host-side f64 interpolation on the exact f64 grid
    is bias-free and costs nothing (V is already being materialised).
    """
    V_np = np.asarray(V)
    x0 = np.log(S0)
    j = int(np.clip(np.searchsorted(x_np, x0) - 1, 0, len(x_np) - 2))
    w = (x0 - x_np[j]) / (x_np[j + 1] - x_np[j])
    return (1.0 - w) * V_np[..., j] + w * V_np[..., j + 1]


def _operator_tridiag(sig_int, dx, r, q):
    """Interior-operator tridiagonals (a_L, b_L, c_L):
    L V_j = α(V_{j−1} − 2V_j + V_{j+1}) + β(V_{j+1} − V_{j−1}) − rV_j
    with α = σ²/2dx², β = μ/2dx, μ = r − q − σ²/2 (reference
    ``pde.py:145-167``)."""
    alpha = 0.5 * sig_int**2 / dx**2
    mu = r - q - 0.5 * sig_int**2
    beta = mu / (2.0 * dx)
    return alpha - beta, -2.0 * alpha - r, alpha + beta


def _bc_values(tau, K, r, S_min, S_max, is_call):
    """Dirichlet boundary values with discounted-strike asymptotics."""
    disc_K = K * jnp.exp(-r * tau)
    bc_left = jnp.where(is_call, 0.0, jnp.maximum(disc_K - S_min, 0.0))
    bc_right = jnp.where(is_call, jnp.maximum(S_max - disc_K, 0.0), 0.0)
    return bc_left, bc_right


_SOLVERS = ("auto", "propagator", "parallel", "thomas", "pallas")
_SOLVERS_BATCH_LV = _SOLVERS + ("fused", "fused_pcr", "fused_thomas")


def _check_solver(solver: str, valid=_SOLVERS) -> str:
    if solver not in valid:
        raise ValueError(f"unknown solver {solver!r}; expected one of "
                         f"{', '.join(valid)}")
    return solver


@partial(jax.jit, static_argnames=("N_t", "american", "two_layers",
                                   "sigma_func", "solver", "american_method",
                                   "psor_sweeps", "barrier_operator",
                                   "has_divs"))
def _fd_solve(x_grid, dt, K, r, q, sigma, is_call, theta,
              barrier_mask, barrier_value, div_amts=None,
              *, N_t: int, american: bool, two_layers: bool,
              sigma_func: Callable | None = None, solver: str = "auto",
              american_method: str = "projection", psor_sweeps: int = 30,
              barrier_operator: bool = False, has_divs: bool = False):
    """Backward θ-scheme march. Returns V (and the n=1 layer when
    ``two_layers`` for theta extraction, reference ``pde.py:214-220``).

    ``barrier_mask`` is a node mask (all-False for vanilla); masked nodes are
    forced to ``barrier_value`` after each step. ``barrier_operator`` ALSO
    zeroes the masked rows of the spatial operator, making the barrier a
    true Dirichlet boundary of the implicit solve — the after-step-only
    override (the reference scheme, ``pde.py:209-211``) behaves like
    DISCRETE monitoring and converges O(√Δt) high on continuously-
    monitored contracts (see ``fd_price_barrier``).

    ``K``/``is_call`` may be scalars or (B,)-batched: the whole ladder shares
    one grid, one propagator, and one scan (V carries shape (B, N_S+1) and
    the per-step matvec becomes an MXU matmul).
    """
    N_S = x_grid.shape[0] - 1
    M = N_S - 1
    dx = x_grid[1] - x_grid[0]
    S_grid = jnp.exp(x_grid)
    S_min, S_max = S_grid[0], S_grid[-1]
    batched = K.ndim == 1
    if batched:
        K_b = K[:, None]
        call_b = is_call[:, None]
    else:
        K_b, call_b = K, is_call

    solve = tridiag_solve if solver != "thomas" else tridiag_solve_thomas
    intrinsic = _payoff(S_grid, K_b, call_b)
    V0 = jnp.where(barrier_mask, barrier_value, intrinsic) \
        if barrier_mask is not None else intrinsic

    const_coeff = sigma_func is None
    use_psor = american and american_method == "psor"
    # PSOR needs the explicit rhs each step, so it rides the tridiag branch.
    use_prop = const_coeff and solver in ("auto", "propagator") \
        and not use_psor
    # Time-dependent coefficients (local vol) re-solve a tridiagonal system
    # every step; on TPU the lane-batched Pallas Thomas kernel (2 passes)
    # replaces the log-depth associative scan (log2(M) full passes).
    # solver="pallas" forces it anywhere (Mosaic interpreter off-TPU).
    use_pallas_td = (not use_prop) and not use_psor and (
        solver == "pallas"
        or (solver == "auto" and not const_coeff
            and jax.default_backend() == "tpu"))
    if use_pallas_td:
        from ..ops.pallas_tridiag import tridiag_solve_pallas_lastdim

        interp = jax.default_backend() != "tpu"
        solve = partial(tridiag_solve_pallas_lastdim, interpret=interp)
    e = (1.0 - theta) * dt
    if const_coeff:
        sig_int = jnp.full((M,), sigma, dtype=x_grid.dtype)
        a_L, b_L, c_L = _operator_tridiag(sig_int, dx, r, q)
        if barrier_operator and barrier_mask is not None:
            # knocked-out interior nodes become identity rows of the
            # θ-scheme system (true in-operator Dirichlet)
            m_int = barrier_mask[1:N_S]
            a_L = jnp.where(m_int, 0.0, a_L)
            b_L = jnp.where(m_int, 0.0, b_L)
            c_L = jnp.where(m_int, 0.0, c_L)
        a_lhs = -theta * dt * a_L
        b_lhs = 1.0 - theta * dt * b_L
        c_lhs = -theta * dt * c_L
    if use_prop:
        # Dense θ-scheme propagator: solve A_lhs·P = A_rhs column-by-column
        # with the batched tridiagonal solver (cheap, LU-free), then every
        # step is a single MXU matvec + two boundary-response axpys.
        # NOTE: TPU matmuls default to bf16 — 512 repeated applications of P
        # in bf16 destroy the solution, hence Precision.HIGHEST throughout.
        def dense(sub, main, sup):
            A = jnp.diag(main)
            A = A + jnp.diag(sub[1:], -1) + jnp.diag(sup[:-1], 1)
            return A

        # One-time setup: the sequential Thomas solver compiles far lighter
        # than the log-depth scan and its O(M) step chain runs once.
        A_rhs = dense(e * a_L, 1.0 + e * b_L, e * c_L)
        bcast = lambda v: jnp.broadcast_to(v, (M, M))
        # rows of A_rhs.T are columns of A_rhs; each solve gives a P column
        P = tridiag_solve_thomas(bcast(a_lhs), bcast(b_lhs), bcast(c_lhs),
                                 A_rhs.T).T
        unit = jnp.zeros((2, M), x_grid.dtype).at[0, 0].set(1.0) \
            .at[1, M - 1].set(1.0)
        w = tridiag_solve_thomas(jnp.broadcast_to(a_lhs, (2, M)),
                                 jnp.broadcast_to(b_lhs, (2, M)),
                                 jnp.broadcast_to(c_lhs, (2, M)), unit)
        w_lo, w_hi = w[0], w[1]

    if has_divs:
        # PV of the dividends still to come as seen from each time node:
        # pv[n] = Σ_{k>n} D_k·e^{−r(k−n)dt} — the far-field boundary
        # asymptotes must carry the forward stock NET of future drops,
        # otherwise the call's upper Dirichlet value overstates the
        # boundary layer by ~PV(divs) and the error diffuses inward
        ks = jnp.arange(N_t + 1, dtype=x_grid.dtype)
        wts = div_amts * jnp.exp(-r * dt * ks)
        pv_divs = (jnp.cumsum(wts[::-1])[::-1] - wts) \
            * jnp.exp(r * dt * ks)

    def div_remap(V, D):
        """Jump condition at an ex-dividend date: V(S, t⁻) = V(S − D, t⁺)
        (cash drop; piecewise-GBM dividend model). Linear interpolation
        of the carried layer at ln(max(S − D, S_min)); D == 0 selects
        the layer unchanged (log/exp round-trips are NOT identity in
        f32, so the no-dividend step must bypass the remap exactly)."""
        x_new = jnp.log(jnp.maximum(S_grid - D, S_min))
        u = (x_new - x_grid[0]) / dx
        j = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, N_S - 1)
        wgt = jnp.clip(u - j.astype(V.dtype), 0.0, 1.0)
        remapped = V[..., j] * (1.0 - wgt) + V[..., j + 1] * wgt
        return jnp.where(D > 0.0, remapped, V)

    def step(carry, n):
        V, V_dt = carry
        tau = (N_t - n) * dt
        t_now = n * dt

        if has_divs:
            # the carry is the t_{n+1}⁺ layer; a dividend AT t_{n+1}
            # remaps it to the t_{n+1}⁻ layer before stepping back
            V = div_remap(V, div_amts[n.astype(jnp.int32) + 1])
            if american:
                # exercising at t⁻ — cum-dividend, the most valuable
                # instant for a call — must be offered explicitly: the
                # previous step's projection only saw the t⁺ layer
                V = jnp.maximum(V, intrinsic)

        bc_left, bc_right = _bc_values(tau, K, r, S_min, S_max, is_call)
        if has_divs:
            pv = pv_divs[n.astype(jnp.int32)]
            disc_K = K * jnp.exp(-r * tau)
            bc_left = jnp.where(
                is_call, 0.0,
                jnp.maximum(disc_K - jnp.maximum(S_min - pv, 0.0), 0.0))
            bc_right = jnp.where(
                is_call, jnp.maximum(S_max - pv - disc_K, 0.0), 0.0)
        V_int = V[..., 1:N_S]

        if use_prop:
            lc = e * a_L[0] * V[..., 0] + theta * dt * a_L[0] * bc_left
            rc = e * c_L[-1] * V[..., N_S] + theta * dt * c_L[-1] * bc_right
            V_new_int = jnp.matmul(V_int, P.T,
                                   precision=jax.lax.Precision.HIGHEST) \
                + lc[..., None] * w_lo + rc[..., None] * w_hi
        else:
            if const_coeff:
                aL, bL, cL = a_L, b_L, c_L
                al, bl, cl = a_lhs, b_lhs, c_lhs
            else:
                sig = jnp.asarray(sigma_func(S_grid, t_now), x_grid.dtype)
                sig_i = sig[1:N_S]
                aL, bL, cL = _operator_tridiag(sig_i, dx, r, q)
                al = -theta * dt * aL
                bl = 1.0 - theta * dt * bL
                cl = -theta * dt * cL

            # RHS = (I + (1−θ)dt·L) V_old on the interior + boundary transfer
            rhs = (1.0 + e * bL) * V_int
            rhs = rhs.at[..., 1:].add(e * aL[1:] * V[..., 1:N_S - 1])
            rhs = rhs.at[..., 0].add(e * aL[0] * V[..., 0])
            rhs = rhs.at[..., :-1].add(e * cL[:-1] * V[..., 2:N_S])
            rhs = rhs.at[..., -1].add(e * cL[-1] * V[..., N_S])
            rhs = rhs.at[..., 0].add(theta * dt * aL[0] * bc_left)
            rhs = rhs.at[..., -1].add(theta * dt * cL[-1] * bc_right)
            V_new_int = solve(jnp.broadcast_to(al, rhs.shape),
                              jnp.broadcast_to(bl, rhs.shape),
                              jnp.broadcast_to(cl, rhs.shape), rhs)

            if use_psor:
                # Solve the LCP min(A V − rhs, V − ψ) = 0 with projected
                # red-black SOR, warm-started from the European solve.
                # Red-black: tridiagonal neighbours have opposite parity,
                # so each half-sweep is one fully vectorised update —
                # sequential PSOR re-architected for the VPU. This is the
                # accuracy upgrade over the reference's project-after-solve
                # (``pde.py:205-207``), which only satisfies the constraint,
                # not complementarity.
                psi = intrinsic[..., 1:N_S]
                omega = 1.6
                parity = (jnp.arange(rhs.shape[-1]) % 2).astype(bool)
                start = jnp.maximum(V_new_int, psi)

                def half_sweep(V, mask):
                    # Boundary contributions already live in rhs, so the
                    # out-of-range neighbours are zero, not bc values.
                    zero = jnp.zeros_like(V[..., :1])
                    Vm1 = jnp.concatenate([zero, V[..., :-1]], axis=-1)
                    Vp1 = jnp.concatenate([V[..., 1:], zero], axis=-1)
                    gs = (rhs - al * Vm1 - cl * Vp1) / bl
                    cand = jnp.maximum(psi, (1.0 - omega) * V + omega * gs)
                    return jnp.where(mask, cand, V)

                def sweep(i, V):
                    V = half_sweep(V, ~parity)
                    return half_sweep(V, parity)

                V_new_int = jax.lax.fori_loop(0, psor_sweeps, sweep, start)

        bc_l = jnp.broadcast_to(bc_left, V_new_int.shape[:-1])[..., None]
        bc_r = jnp.broadcast_to(bc_right, V_new_int.shape[:-1])[..., None]
        V_new = jnp.concatenate([bc_l, V_new_int, bc_r], axis=-1)

        if american:
            V_new = jnp.maximum(V_new, intrinsic)
        if barrier_mask is not None:
            V_new = jnp.where(barrier_mask, barrier_value, V_new)

        if two_layers:
            V_dt = jnp.where(n == 1, V_new, V_dt)
        return (V_new, V_dt), None

    ns = jnp.arange(N_t - 1, -1, -1, dtype=x_grid.dtype)
    (V, V_dt), _ = jax.lax.scan(step, (V0, V0), ns)
    return (V, V_dt) if two_layers else (V, V)


def _prep_solve(S0, K, T, r, q, sigma, kind, N_S, N_t, theta, S_max_mult,
                dtype, grid_sigma=None):
    dt_ = canonical(dtype)
    x_grid_np, dx, dt = _build_grid(S0, T, grid_sigma or sigma, N_S, N_t,
                                    S_max_mult)
    x_grid = jnp.asarray(x_grid_np, dt_)
    args = dict(
        x_grid=x_grid,
        dt=jnp.asarray(dt, dt_),
        K=jnp.asarray(K, dt_),
        r=jnp.asarray(r, dt_),
        q=jnp.asarray(q, dt_),
        sigma=jnp.asarray(sigma, dt_),
        is_call=jnp.asarray(is_call_mask(kind)),
        theta=jnp.asarray(theta, dt_),
    )
    return x_grid_np, x_grid, args


def _div_schedule_np(dividends, T, N_t) -> np.ndarray:
    """(N_t+1,) per-time-index cash dividend amounts from a
    [(t, amount), ...] list; each date snaps to its nearest time node
    (index 1..N_t), coincident dates accumulate. Host float64."""
    amts = np.zeros(N_t + 1)
    for t_d, D in dividends:
        if not 0.0 < t_d <= T:
            raise ValueError(f"dividend date {t_d} outside (0, T={T}]")
        if D < 0.0:
            raise ValueError(f"negative dividend {D}")
        amts[max(1, int(round(t_d / T * N_t)))] += D
    return amts


def _div_schedule(dividends, T, N_t, dtype):
    return jnp.asarray(_div_schedule_np(dividends, T, N_t), dtype)


def fd_price(opt: OptionSpec, kind: Literal["call", "put"] = CALL, *,
             N_S: int = 200, N_t: int = 200, theta: float = 0.5,
             S_max_mult: float = 4.0, american: bool = False,
             dtype=None, solver: str = "auto",
             american_method: str = "projection",
             psor_sweeps: int = 30, dividends=None) -> float:
    """European/American vanilla price via the θ-scheme
    (API parity: reference ``pde.py:228-268``).

    ``american_method``: "projection" reproduces the reference's
    project-after-solve (``pde.py:205-207``); "psor" solves the LCP with
    projected red-black SOR per step (more accurate near the free
    boundary).

    ``dividends=[(t, amount), ...]`` prices under the piecewise-GBM
    DISCRETE-cash-dividend model (the reference has only a continuous
    yield, ``pde.py:145``): the spot drops by ``amount`` at each ex-date
    and follows GBM(σ) in between. Each date snaps to its nearest time
    node and enters as the jump condition V(S, t⁻) = V(S − amount, t⁺)
    on the marching layer. Combined with ``american=True`` this captures
    the classic early-exercise-before-dividend premium of American
    calls."""
    _check_solver(solver)
    x_np, x_grid, args = _prep_solve(opt.S0, opt.K, opt.T, opt.r, opt.q,
                                     opt.sigma, kind, N_S, N_t, theta,
                                     S_max_mult, dtype)
    div_kw = {}
    if dividends:
        div_kw = dict(has_divs=True,
                      div_amts=_div_schedule(dividends, opt.T, int(N_t),
                                             x_grid.dtype))
    V, _ = _fd_solve(**args, barrier_mask=None, barrier_value=0.0,
                     N_t=int(N_t), american=bool(american), two_layers=False,
                     solver=solver, american_method=american_method,
                     psor_sweeps=int(psor_sweeps), **div_kw)
    return float(_readout(x_np, V, opt.S0))


def fd_price_barrier(opt: OptionSpec, kind: Literal["call", "put"] = CALL,
                     barrier: float = 0.0,
                     barrier_type: str = "up-and-out", *,
                     rebate: float = 0.0, N_S: int = 200, N_t: int = 200,
                     theta: float = 0.5, S_max_mult: float = 4.0,
                     dtype=None, solver: str = "auto",
                     barrier_mode: str = "node",
                     rebate_mode: str = "expiry") -> float:
    """European barrier price: knock-out via Dirichlet nodes at/beyond the
    barrier; knock-in via parity V_in = V_vanilla − V_out
    (reference ``pde.py:271-329``).

    ``barrier_mode="node"`` (default) overrides the knocked-out nodes
    AFTER each solve — the reference's scheme (``pde.py:209-211``),
    kept for number-for-number parity (and the golden suite). It
    behaves like discrete monitoring at Δt and converges O(√Δt) HIGH
    on the continuously-monitored contract (+0.08 at 1600² against the
    analytic reflection price on a 1y 130-call). ``"operator"`` builds
    the knocked-out rows into the θ-scheme system itself (identity
    rows — true continuous monitoring, the scheme the Heston ADI uses):
    −2e-3 at 400² on the same contract.

    ``rebate_mode="expiry"`` (default) pays the rebate AT EXPIRY — the
    convention of the analytic (:func:`barrier_price_bs`) and MC
    engines, so every engine prices the same contract.  A constant
    Dirichlet value cannot represent that, so the discounted survival
    probability e^{−rT}·p_surv is extracted EXACTLY as a
    strike-difference of two zero-rebate solves on the same grid
    (their payoffs differ by a constant on surviving paths) and the
    rebate legs assembled analytically: KO(reb) = KO(0) +
    reb·e^{−rT}(1 − p_surv), KI(reb) = vanilla − KO(0) +
    reb·e^{−rT}·p_surv.  ``rebate_mode="node"`` reproduces the
    reference's scheme instead — rebate as the Dirichlet value,
    i.e. paid at hit, undiscounted (reference ``pde.py:209-211``).
    """
    _check_solver(solver)
    if barrier_mode not in ("node", "operator"):
        raise ValueError("barrier_mode must be 'node' or 'operator'")
    if rebate_mode not in ("expiry", "node"):
        raise ValueError("rebate_mode must be 'expiry' or 'node'")
    grid_kw = dict(N_S=N_S, N_t=N_t, theta=theta, S_max_mult=S_max_mult,
                   dtype=dtype, solver=solver, barrier_mode=barrier_mode,
                   rebate_mode=rebate_mode)
    if barrier_type.endswith("in"):
        out_type = barrier_type.replace("in", "out")
        vanilla = fd_price(opt, kind, **{k: v for k, v in grid_kw.items()
                                         if k not in ("barrier_mode",
                                                      "rebate_mode")})
        if rebate == 0.0 or rebate_mode == "node":
            # node mode keeps the reference's parity exactly:
            # V_in = vanilla − V_out(rebate-as-Dirichlet)
            knock_out = fd_price_barrier(opt, kind, barrier, out_type,
                                         rebate=rebate, **grid_kw)
            return vanilla - knock_out
        ko0, disc_psurv = _fd_barrier_ko_and_psurv(
            opt, kind, barrier, out_type, N_S, N_t, theta, S_max_mult,
            dtype, solver, barrier_mode)
        return vanilla - ko0 + rebate * disc_psurv

    if rebate != 0.0 and rebate_mode == "expiry":
        ko0, disc_psurv = _fd_barrier_ko_and_psurv(
            opt, kind, barrier, barrier_type, N_S, N_t, theta, S_max_mult,
            dtype, solver, barrier_mode)
        disc = float(np.exp(-opt.r * opt.T))
        return ko0 + rebate * (disc - disc_psurv)

    x_np, args, mask = _fd_barrier_setup(opt, kind, barrier, barrier_type,
                                         N_S, N_t, theta, S_max_mult,
                                         dtype, barrier_mode)
    V, _ = _fd_solve(**args, barrier_mask=mask,
                     barrier_value=jnp.asarray(rebate, args["x_grid"].dtype),
                     N_t=int(N_t), american=False, two_layers=False,
                     solver=solver,
                     barrier_operator=barrier_mode == "operator")
    return float(_readout(x_np, V, opt.S0))


def _fd_barrier_setup(opt, kind, barrier, barrier_type, N_S, N_t, theta,
                      S_max_mult, dtype, barrier_mode):
    """Shared grid + knocked-node mask for a single-barrier solve."""
    x_np, x_grid, args = _prep_solve(opt.S0, opt.K, opt.T, opt.r, opt.q,
                                     opt.sigma, kind, N_S, N_t, theta,
                                     S_max_mult, dtype)
    x_barrier = np.log(barrier)
    if barrier_mode == "operator" and x_np[0] < x_barrier < x_np[-1]:
        # snap ln(barrier) onto a node: the boundary location otherwise
        # carries an O(dx) placement error that dominates once the
        # in-operator Dirichlet removes the monitoring error (node mode
        # keeps the reference grid untouched for number parity). A
        # barrier OUTSIDE the grid stays unsnapped — translating by the
        # full overshoot would push S0 off the grid; the empty/total
        # mask then gives the vanilla/rebate far-barrier degeneration.
        x_np = x_np + (x_barrier
                       - x_np[int(np.argmin(np.abs(x_np - x_barrier)))])
        args["x_grid"] = jnp.asarray(x_np, x_grid.dtype)
    if barrier_type.startswith("up"):
        mask = jnp.asarray(x_np >= x_barrier - 1e-12)
    else:
        mask = jnp.asarray(x_np <= x_barrier + 1e-12)
    return x_np, args, mask


def _fd_barrier_ko_and_psurv(opt, kind, barrier, out_type, N_S, N_t, theta,
                             S_max_mult, dtype, solver, barrier_mode):
    """(KO(0), e^{−rT}·p_surv) for a single knock-OUT barrier.

    The discounted survival probability is extracted exactly as a
    strike-difference of two zero-rebate knock-out solves on the SAME
    grid/mask: surviving paths of an up-barrier B end below B, so two
    puts struck B and 2B differ by the constant B there; a down-barrier's
    survivors end above B, so calls struck B/2 and B differ by B/2.
    Grid/monitoring errors cancel between the paired solves because the
    grid is strike-independent (``_build_grid`` uses S0/σ/T only).
    """
    x_np, args, mask = _fd_barrier_setup(opt, kind, barrier, out_type,
                                         N_S, N_t, theta, S_max_mult,
                                         dtype, barrier_mode)
    dt_ = args["x_grid"].dtype

    def solve(K, is_call):
        a = dict(args, K=jnp.asarray(K, dt_),
                 is_call=jnp.asarray(bool(is_call)))
        V, _ = _fd_solve(**a, barrier_mask=mask,
                         barrier_value=jnp.asarray(0.0, dt_),
                         N_t=int(N_t), american=False, two_layers=False,
                         solver=solver,
                         barrier_operator=barrier_mode == "operator")
        return float(_readout(x_np, V, opt.S0))

    ko0 = solve(opt.K, is_call_mask(kind))
    if out_type.startswith("up"):
        disc_psurv = (solve(2.0 * barrier, False)
                      - solve(barrier, False)) / barrier
    else:
        disc_psurv = (solve(0.5 * barrier, True)
                      - solve(barrier, True)) / (0.5 * barrier)
    disc = float(np.exp(-opt.r * opt.T))
    return ko0, float(np.clip(disc_psurv, 0.0, disc))


def fd_price_double_barrier(opt: OptionSpec,
                            kind: Literal["call", "put"] = CALL, *,
                            lower: float, upper: float,
                            knock: str = "out", rebate: float = 0.0,
                            N_S: int = 200, N_t: int = 200,
                            theta: float = 0.5, dtype=None,
                            solver: str = "auto") -> float:
    """European double-barrier price on an absorbing corridor.

    The grid IS the corridor: uniform log-spot nodes with ln(lower) and
    ln(upper) EXACTLY on nodes (no placement error), two padding nodes
    beyond each barrier, and the in-operator Dirichlet scheme of
    ``fd_price_barrier(barrier_mode="operator")`` — masked rows become
    identity rows of the θ-system, so this is true continuous
    monitoring and converges to the Ikeda-Kunitomo series
    (:func:`~optpricer_tpu.models.analytic.double_barrier_price_bs`)
    at O(Δx² + Δt²).  Rebates pay AT EXPIRY (the MC and analytic convention), which a
    constant Dirichlet value cannot represent: the discounted survival
    probability e^{−rT}·p_surv is instead extracted EXACTLY as the
    difference of two corridor puts struck beyond the upper barrier
    (their payoffs differ by the constant 1 on surviving paths) and
    the rebate legs are assembled analytically —
    KO(reb) = KO(0) + reb·e^{−rT}(1 − p_surv),
    KI(reb) = vanilla − KO(0) + reb·e^{−rT}·p_surv.  The reference
    has no double-barrier machinery (single-sided only,
    ``pde.py:271-329``).
    """
    _check_solver(solver)
    if knock not in ("in", "out"):
        raise ValueError("knock must be 'in' or 'out'")
    if not 0.0 < lower < upper:
        raise ValueError("need 0 < lower < upper")
    disc = float(np.exp(-opt.r * opt.T))
    vanilla_bs = None
    if not lower < opt.S0 < upper:          # already knocked
        if knock == "out":
            return rebate * disc
        return fd_price(opt, kind, N_S=N_S, N_t=N_t, theta=theta,
                        dtype=dtype, solver=solver)

    def corridor(K, kind_, reb):
        dt_ = canonical(dtype)
        pad = 2
        dx = (np.log(upper) - np.log(lower)) / N_S
        x_np = np.log(lower) + dx * np.arange(-pad, N_S + pad + 1)
        x_grid = jnp.asarray(x_np, dt_)
        args = dict(
            x_grid=x_grid, dt=jnp.asarray(opt.T / N_t, dt_),
            K=jnp.asarray(K, dt_), r=jnp.asarray(opt.r, dt_),
            q=jnp.asarray(opt.q, dt_), sigma=jnp.asarray(opt.sigma, dt_),
            is_call=jnp.asarray(is_call_mask(kind_)),
            theta=jnp.asarray(theta, dt_))
        # absolute floor in the tolerance: a barrier level of exactly 1.0
        # has log 0, and the upper node is reconstructed as
        # log(lower) + N_S·dx so it can land one ulp inside log(upper)
        tol_lo = 1e-12 * max(1.0, abs(np.log(lower)))
        tol_hi = 1e-12 * max(1.0, abs(np.log(upper)))
        mask = jnp.asarray((x_np <= np.log(lower) + tol_lo)
                           | (x_np >= np.log(upper) - tol_hi))
        V, _ = _fd_solve(**args, barrier_mask=mask,
                         barrier_value=jnp.asarray(reb, dt_),
                         N_t=int(N_t), american=False, two_layers=False,
                         solver=solver, barrier_operator=True)
        return float(_readout(x_np, V, opt.S0))

    ko0 = corridor(opt.K, kind, 0.0)
    disc_psurv = 0.0
    if rebate != 0.0 or knock == "in":
        # e^{−rT}·p_surv, EXACT as a payoff difference: two corridor
        # puts struck beyond the upper barrier differ by the constant
        # (K2 − K1) on every surviving path
        disc_psurv = corridor(upper + 1.0, PUT, 0.0) - corridor(upper, PUT,
                                                                0.0)
    if knock == "out":
        return ko0 + rebate * (disc - disc_psurv)
    vanilla = fd_price(opt, kind, N_S=N_S, N_t=N_t, theta=theta,
                       dtype=dtype, solver=solver)
    return vanilla - ko0 + rebate * disc_psurv


def fd_greeks(opt: OptionSpec, kind: Literal["call", "put"] = CALL,
              **kwargs) -> dict:
    """Grid Greeks: delta = (1/S)∂V/∂x, gamma = (1/S²)(∂²V/∂x² − ∂V/∂x)
    (chain rule on the log grid), theta from the first two time layers
    (reference ``pde.py:332-382``)."""
    N_S = kwargs.pop("N_S", 200)
    N_t = kwargs.pop("N_t", 200)
    theta_scheme = kwargs.pop("theta", 0.5)
    S_max_mult = kwargs.pop("S_max_mult", 4.0)
    american = kwargs.pop("american", False)
    dtype = kwargs.pop("dtype", None)
    dividends = kwargs.pop("dividends", None)
    solver = _check_solver(kwargs.pop("solver", "auto"))

    x_np, x_grid, args = _prep_solve(opt.S0, opt.K, opt.T, opt.r, opt.q,
                                     opt.sigma, kind, N_S, N_t, theta_scheme,
                                     S_max_mult, dtype)
    div_kw = {}
    if dividends:
        div_kw = dict(has_divs=True,
                      div_amts=_div_schedule(dividends, opt.T, int(N_t),
                                             x_grid.dtype))
    V_0, V_dt = _fd_solve(**args, barrier_mask=None, barrier_value=0.0,
                          N_t=int(N_t), american=bool(american),
                          two_layers=True, solver=solver, **div_kw)
    dx = x_np[1] - x_np[0]
    dt = opt.T / N_t
    x0 = np.log(opt.S0)
    j = int(np.searchsorted(x_np, x0))
    j = max(1, min(j, len(x_np) - 2))
    V_0 = np.asarray(V_0)
    V_dt = np.asarray(V_dt)

    dVdx = (V_0[j + 1] - V_0[j - 1]) / (2.0 * dx)
    d2Vdx2 = (V_0[j + 1] - 2.0 * V_0[j] + V_0[j - 1]) / dx**2
    S0 = opt.S0
    delta = dVdx / S0
    gamma = (d2Vdx2 - dVdx) / S0**2
    V0_val = float(np.interp(x0, x_np, V_0))
    Vdt_val = float(np.interp(x0, x_np, V_dt))
    theta_val = -(V0_val - Vdt_val) / dt
    return {"delta": float(delta), "gamma": float(gamma),
            "theta": float(theta_val)}


def fd_price_local_vol(S0: float, K: float, T: float, r: float, q: float,
                       sigma_func: Callable, kind: Literal["call", "put"] = CALL,
                       *, N_S: int = 200, N_t: int = 200, theta: float = 0.5,
                       S_max_mult: float = 4.0, ref_vol: float = 0.3,
                       dtype=None, solver: str = "auto") -> float:
    """Local-vol FD price: node-wise σ(S, t) from a traceable ``sigma_func``
    evaluated inside the scan (reference ``pde.py:385-426``); ``ref_vol``
    only shapes the grid."""
    _check_solver(solver)
    x_np, x_grid, args = _prep_solve(S0, K, T, r, q, 0.0, kind, N_S, N_t,
                                     theta, S_max_mult, dtype,
                                     grid_sigma=ref_vol)
    V, _ = _fd_solve(**args, barrier_mask=None, barrier_value=0.0,
                     N_t=int(N_t), american=False, two_layers=False,
                     sigma_func=sigma_func, solver=solver)
    return float(_readout(x_np, V, S0))


# ---------------------------------------------------------------------------
# Batched pricing (TPU extension — no reference equivalent)
# ---------------------------------------------------------------------------
def fd_price_batch(S0, K, T, r, q, sigma, kind, *, N_S: int = 200,
                   N_t: int = 200, theta: float = 0.5, S_max_mult: float = 4.0,
                   american: bool = False, dtype=None) -> jax.Array:
    """Price a strike/kind ladder on a shared grid in one fused solve.

    The tridiagonal solver broadcasts over the batch axis, so the whole
    ladder costs one time march. K/kind may be arrays; grid parameters are
    shared (built from S0, T, sigma).
    """
    dt_ = canonical(dtype)
    K_arr = np.atleast_1d(np.asarray(K, dtype=float))
    mask = np.broadcast_to(np.atleast_1d(is_call_mask(kind)), K_arr.shape)

    x_np, dx, dt = _build_grid(S0, T, sigma, N_S, N_t, S_max_mult)
    x_grid = jnp.asarray(x_np, dt_)

    # One grid, one propagator, one scan: K/is_call batched inside _fd_solve.
    V, _ = _fd_solve(
        x_grid=x_grid, dt=jnp.asarray(dt, dt_), K=jnp.asarray(K_arr, dt_),
        r=jnp.asarray(r, dt_), q=jnp.asarray(q, dt_),
        sigma=jnp.asarray(sigma, dt_), is_call=jnp.asarray(mask),
        theta=jnp.asarray(theta, dt_), barrier_mask=None,
        barrier_value=0.0, N_t=int(N_t), american=bool(american),
        two_layers=False)
    return jnp.asarray(_readout(x_np, V, S0).reshape(np.shape(K_arr)), dt_)


def fd_price_local_vol_batch(S0, K, T, r, q, sigma_func, kind, *,
                             N_S: int = 200, N_t: int = 200,
                             theta: float = 0.5, S_max_mult: float = 4.0,
                             ref_vol: float = 0.3, dtype=None,
                             solver: str = "auto") -> jax.Array:
    """Local-vol strike/kind ladder on a shared grid in one fused solve.

    The whole ladder shares one grid and one time march; the per-step
    tridiagonal system (time-dependent σ(S,t) coefficients, shared across
    the ladder) is solved for all strikes at once. On TPU the solve runs in
    the lane-batched Pallas Thomas kernel — strikes across the 128 vector
    lanes, two sweeps over the grid dimension in VMEM — which is what makes
    a local-vol ladder (reference ``pde.py:385-426`` prices one option per
    Python call) a single-kernel workload. ``ref_vol`` shapes the grid.

    ``solver="fused"`` routes the ENTIRE march into one VMEM-resident
    Pallas kernel (``ops.pallas_fd_lv``) with a log-depth parallel-cyclic-
    reduction solve per step; ``solver="fused_thomas"`` selects the same
    kernel with the sequential Thomas walk (latency-bound — kept for
    cross-validation; see that module's docstring).
    """
    _check_solver(solver, _SOLVERS_BATCH_LV)
    if solver in ("fused", "fused_pcr", "fused_thomas"):
        from ..ops.pallas_fd_lv import fd_lv_ladder_pallas

        return fd_lv_ladder_pallas(
            S0, K, T, r, q, sigma_func, kind, N_S=N_S, N_t=N_t,
            theta=theta, S_max_mult=S_max_mult, ref_vol=ref_vol,
            method="thomas" if solver == "fused_thomas" else "pcr")
    dt_ = canonical(dtype)
    K_arr = np.atleast_1d(np.asarray(K, dtype=float))
    mask = np.broadcast_to(np.atleast_1d(is_call_mask(kind)), K_arr.shape)

    x_np, dx, dt = _build_grid(S0, T, ref_vol, N_S, N_t, S_max_mult)
    x_grid = jnp.asarray(x_np, dt_)
    V, _ = _fd_solve(
        x_grid=x_grid, dt=jnp.asarray(dt, dt_), K=jnp.asarray(K_arr, dt_),
        r=jnp.asarray(r, dt_), q=jnp.asarray(q, dt_),
        sigma=jnp.asarray(0.0, dt_), is_call=jnp.asarray(mask),
        theta=jnp.asarray(theta, dt_), barrier_mask=None, barrier_value=0.0,
        N_t=int(N_t), american=False, two_layers=False,
        sigma_func=sigma_func, solver=solver)
    return jnp.asarray(_readout(x_np, V, S0).reshape(np.shape(K_arr)), dt_)
