"""1-D Galerkin finite-element solver for the Black-Scholes PDE, TPU-native.

Same discretisation as reference ``fem.py``: piecewise-linear hat basis on a
uniform log-spot grid, consistent mass matrix (2h/3, h/6), stiffness =
diffusion (σ²/h, −σ²/2h) + skew-symmetric convection (∓μ/2) + reaction
(2rh/3, rh/6) (reference ``fem.py:78-135``), θ time stepping. European only,
like the reference.

TPU re-architecture: mass/stiffness and the θ-combined LHS/RHS tridiagonals
are assembled once; the time march is a ``lax.scan`` whose body is one
tridiagonal mat-vec plus one log-depth tridiagonal solve
(:mod:`optpricer_tpu.ops.tridiag`), replacing the per-step Python Thomas loop
(reference ``fem.py:57-75,200-233``).
"""
from __future__ import annotations

from functools import partial
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from ..core import CALL, OptionSpec
from ..dtypes import canonical
from ..ops.black_scholes import is_call_mask
from ..ops.tridiag import tridiag_solve, tridiag_solve_thomas
from .pde import _bc_values, _build_grid, _payoff

__all__ = ["fem_price"]


def _assemble(h, r, q, sigma, M_int, dtype):
    """Mass + stiffness tridiagonals on the interior (reference
    ``fem.py:78-135``); returns (M_sub, M_main, M_sup, K_sub, K_main, K_sup)."""
    s2 = sigma**2
    mu = r - q - 0.5 * s2
    full = lambda v: jnp.full((M_int,), v, dtype=dtype)
    M_main = full(2.0 * h / 3.0)
    M_off = full(h / 6.0)
    Kd_main = full(s2 / h)
    Kd_off = full(-s2 / (2.0 * h))
    Kr_main = full(2.0 * r * h / 3.0)
    Kr_off = full(r * h / 6.0)
    K_sub = Kd_off + full(mu / 2.0) + Kr_off
    K_main = Kd_main + Kr_main
    K_sup = Kd_off + full(-mu / 2.0) + Kr_off
    return M_off, M_main, M_off, K_sub, K_main, K_sup


@partial(jax.jit, static_argnames=("N_t", "solver"))
def _fem_solve(x_grid, dt, K_strike, r, q, sigma, is_call, theta,
               *, N_t: int, solver: str = "auto"):
    N_S = x_grid.shape[0] - 1
    M_int = N_S - 1
    h = x_grid[1] - x_grid[0]
    S_grid = jnp.exp(x_grid)
    S_min, S_max = S_grid[0], S_grid[-1]
    solve = tridiag_solve if solver != "thomas" else tridiag_solve_thomas
    use_prop = solver in ("auto", "propagator")

    (M_sub, M_main, M_sup, K_sub, K_main, K_sup) = _assemble(
        h, r, q, sigma, M_int, x_grid.dtype)

    # LHS = M + θ·dt·K ; RHS-matrix = M − (1−θ)·dt·K (assembled once)
    L_sub = M_sub + theta * dt * K_sub
    L_main = M_main + theta * dt * K_main
    L_sup = M_sup + theta * dt * K_sup
    e = (1.0 - theta) * dt
    R_sub = M_sub - e * K_sub
    R_main = M_main - e * K_main
    R_sup = M_sup - e * K_sup

    if use_prop:
        # Dense propagator P = L⁻¹R built once via the batched tridiagonal
        # solver; each step is an MXU matvec at HIGHEST precision (TPU's
        # default bf16 matmul diverges over hundreds of steps) — same
        # redesign as the FDM solver, see models/pde.py.
        def dense(sub, main, sup):
            return (jnp.diag(main) + jnp.diag(sub[1:], -1)
                    + jnp.diag(sup[:-1], 1))

        R_dense = dense(R_sub, R_main, R_sup)
        bcast = lambda v: jnp.broadcast_to(v, (M_int, M_int))
        P = tridiag_solve_thomas(bcast(L_sub), bcast(L_main), bcast(L_sup),
                                 R_dense.T).T
        unit = jnp.zeros((2, M_int), x_grid.dtype).at[0, 0].set(1.0) \
            .at[1, M_int - 1].set(1.0)
        w = tridiag_solve_thomas(jnp.broadcast_to(L_sub, (2, M_int)),
                                 jnp.broadcast_to(L_main, (2, M_int)),
                                 jnp.broadcast_to(L_sup, (2, M_int)), unit)
        w_lo, w_hi = w[0], w[1]

    V0 = _payoff(S_grid, K_strike, is_call)

    def step(V, n):
        tau = (N_t - n) * dt
        bc_left, bc_right = _bc_values(tau, K_strike, r, S_min, S_max, is_call)
        V_int = V[1:N_S]

        if use_prop:
            lc = R_sub[0] * V[0] - L_sub[0] * bc_left
            rc = R_sup[-1] * V[N_S] - L_sup[-1] * bc_right
            V_new_int = jnp.matmul(P, V_int,
                                   precision=jax.lax.Precision.HIGHEST) \
                + lc * w_lo + rc * w_hi
        else:
            rhs = R_main * V_int
            rhs = rhs.at[1:].add(R_sub[1:] * V_int[:-1])
            rhs = rhs.at[:-1].add(R_sup[:-1] * V_int[1:])
            # Explicit-part boundary contributions (old boundary values)
            rhs = rhs.at[0].add(R_sub[0] * V[0])
            rhs = rhs.at[-1].add(R_sup[-1] * V[N_S])
            # Implicit-part boundary contributions moved from LHS to RHS
            rhs = rhs.at[0].add(-L_sub[0] * bc_left)
            rhs = rhs.at[-1].add(-L_sup[-1] * bc_right)
            V_new_int = solve(L_sub, L_main, L_sup, rhs)

        V_new = jnp.concatenate([bc_left[None], V_new_int, bc_right[None]])
        return V_new, None

    ns = jnp.arange(N_t - 1, -1, -1, dtype=x_grid.dtype)
    V, _ = jax.lax.scan(step, V0, ns)
    return V


def fem_price(opt: OptionSpec, kind: Literal["call", "put"] = CALL, *,
              N_S: int = 200, N_t: int = 200, theta: float = 0.5,
              S_max_mult: float = 4.0, dtype=None,
              solver: str = "auto") -> float:
    """European vanilla price via 1-D Galerkin FEM (reference
    ``fem.py:142-235``)."""
    dt_ = canonical(dtype)
    x_np, dx, dt = _build_grid(opt.S0, opt.T, opt.sigma, N_S, N_t, S_max_mult)
    x_grid = jnp.asarray(x_np, dt_)
    V = _fem_solve(
        x_grid, jnp.asarray(dt, dt_), jnp.asarray(opt.K, dt_),
        jnp.asarray(opt.r, dt_), jnp.asarray(opt.q, dt_),
        jnp.asarray(opt.sigma, dt_), jnp.asarray(is_call_mask(kind)),
        jnp.asarray(theta, dt_), N_t=int(N_t), solver=solver,
    )
    # Host-side f64 read-out — the TPU VPU's biased f32 log makes a
    # device-side jnp.log(S0) query point ~3.5e-5 off (see pde._readout).
    from .pde import _readout
    return float(_readout(x_np, V, opt.S0))
