"""2-D ADI finite-difference solver for the Heston PDE, TPU-native.

    V_τ = ½v V_xx + (r−q−½v) V_x + κ(θ−v) V_v + ½ξ²v V_vv + ρξv V_xv − rV

on a uniform (x = ln S, v) grid, marched backward from the terminal payoff
by the Douglas ADI splitting (the standard scheme for this PDE — Hout &
Foulon's A₀/A₁/A₂ decomposition): the mixed derivative is explicit, the
x- and v-direction operators are implicit in alternating half-solves.

TPU re-architecture (this module exists only here — the reference's PDE
solver is strictly 1-D constant/local vol, ``/root/reference/src/optpricer/
pde.py:134-217``; its only Heston pricing is Monte-Carlo,
``processes.py:117-162``):

* **Implicit solves as precomputed dense propagators.** The Heston
  coefficients are time-independent, so (I − θΔt·A_x(v_j))⁻¹ for every
  variance level j and (I − θΔt·A_v)⁻¹ are built ONCE — assembled and
  inverted ON DEVICE from O(n) host-f64 stencil vectors (batched LU +
  one Newton-Schulz refinement to the working-dtype floor; the host
  builder ``_build_operators`` survives as the f64 oracle) — and each
  ADI half-step becomes a batched matvec on the MXU:
  ``einsum('jik,jk->ji')`` over the (n_v, n_x) state. Keeping the
  2×25 MB propagators off the host↔device link and the n_v dense f64
  inverses off the host CPU cut the production-resolution American
  solve from ~1.4 s to the march's own wall-clock (see bench
  ``[heston-adi]``).
  This is the 2-D generalisation of the 1-D "propagator" solver in
  :mod:`optpricer_tpu.models.pde` — no per-step elimination, no
  sequential dependence except time itself.
* **One ``lax.scan`` over time**; the whole march is a single compiled
  program with a (n_v, n_x) carry. American exercise is the same
  post-solve projection the 1-D solver uses.
* **Mixed derivative as a padded stencil** (pure VPU work): central in
  both directions, zero at all boundaries.

Boundaries: Dirichlet in x with the discounted-forward asymptotics
(V → S e^{−qτ} − K e^{−rτ} for deep-ITM calls); in v the operator rows at
v=0 and v=v_max are upwinded convection-only (the diffusion ½ξ²v vanishes
at v=0; at v_max the solution is v-flat for large v_max — the standard
treatment).

Oracle: the in-house COS transform (`models/analytic.heston_price_cos`)
for Europeans; CRR in the ξ→0 degenerate limit for Americans
(tests/test_heston_pde.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..dtypes import canonical

__all__ = ["heston_fd_price", "heston_fd_grid", "heston_fd_greeks",
           "heston_fd_price_batch", "heston_fd_price_barrier"]


def _diff_ops(nodes: np.ndarray):
    """(D1, D2) dense difference operators on an arbitrary (possibly
    non-uniform) node array, second-order 3-point stencils, ZERO boundary
    rows (boundary handling is the caller's job)."""
    n = len(nodes)
    hm = nodes[1:-1] - nodes[:-2]            # h⁻_i
    hp = nodes[2:] - nodes[1:-1]             # h⁺_i
    D1 = np.zeros((n, n))
    D2 = np.zeros((n, n))
    i = np.arange(1, n - 1)
    D1[i, i - 1] = -hp / (hm * (hm + hp))
    D1[i, i] = (hp - hm) / (hm * hp)
    D1[i, i + 1] = hm / (hp * (hm + hp))
    D2[i, i - 1] = 2.0 / (hm * (hm + hp))
    D2[i, i] = -2.0 / (hm * hp)
    D2[i, i + 1] = 2.0 / (hp * (hm + hp))
    return D1, D2


def _stencil_vectors(nodes: np.ndarray):
    """Host f64 3-point stencil coefficient vectors (length n−2 each) for
    the interior rows of ``_diff_ops`` — the only part of the operator
    build that is rounding-sensitive (differences of nearby nodes)."""
    hm = nodes[1:-1] - nodes[:-2]
    hp = nodes[2:] - nodes[1:-1]
    d1 = (-hp / (hm * (hm + hp)), (hp - hm) / (hm * hp),
          hm / (hp * (hm + hp)))
    d2 = (2.0 / (hm * (hm + hp)), -2.0 / (hm * hp),
          2.0 / (hp * (hm + hp)))
    return d1, d2


from ..ops.tridiag import tridiag_dense as _dense_from_bands  # noqa: E402
from ..ops.tridiag import tridiag_inv as _banded_inv  # noqa: E402


@partial(jax.jit, static_argnames=("dtype",))
def _build_operators_jit(d1x, d2x, d1v, d2v, v, r, q, kappa, theta, xi,
                         dt, theta_s, ko_mask, bc_v, *, dtype):
    """Device-side twin of :func:`_build_operators`.

    Assembles the x/v operators as BANDS from O(n) host-f64 stencil
    vectors, inverts the implicit-step matrices with
    :func:`_banded_inv`, and densifies for the march's MXU matvecs —
    the dense matrices never cross the host↔device link (2×25 MB per
    call at production resolution, which dominated the solve wall-clock
    through a tunnelled chip), and the n_v dense f64 inverses leave the
    host CPU. Same contract as the host builder.
    """
    n_x = d1x[0].shape[0] + 2
    n_v = v.shape[0]
    v = v.astype(dtype)
    zx = jnp.zeros((n_v, 1), dtype)
    pad = lambda w: jnp.concatenate([zx, w.astype(dtype), zx], axis=-1)
    cv = 0.5 * v[:, None]                       # ½v  (D2 weight)
    bv = (r - q) - cv                           # r−q−½v  (D1 weight)
    live = (~ko_mask).astype(dtype)[None, :]
    ax_lo = pad(cv * d2x[0][None] + bv * d1x[0][None]) * live
    ax_mid = pad(cv * d2x[1][None] + bv * d1x[1][None]
                 - 0.5 * r) * live
    ax_hi = pad(cv * d2x[2][None] + bv * d1x[2][None]) * live
    sd = jnp.asarray(theta_s * dt).astype(dtype)
    Ax = _dense_from_bands(ax_lo, ax_mid, ax_hi)
    one = jnp.ones((), dtype)
    Px = _banded_inv(-sd * ax_lo, one - sd * ax_mid, -sd * ax_hi)

    zv = jnp.zeros((1,), dtype)
    padv = lambda w: jnp.concatenate([zv, w.astype(dtype), zv])
    cvv = ((0.5 * xi ** 2) * v)[1:-1]           # interior ½ξ²v_i
    bvv = (kappa * (theta - v))[1:-1]           # interior κ(θ−v_i)
    av_lo = padv(cvv * d2v[0] + bvv * d1v[0])
    av_mid = padv(cvv * d2v[1] + bvv * d1v[1]) \
        - 0.5 * r * jnp.ones((n_v,), dtype)
    av_hi = padv(cvv * d2v[2] + bvv * d1v[2])
    # upwinded boundary rows (coefficients precomputed host-side in f64);
    # note av_mid's −½r term applies on ALL rows in the host builder's
    # boundary overwrite too (bc_v already carries it)
    av_mid = av_mid.at[0].set(bc_v[0]).at[-1].set(bc_v[2])
    av_hi = av_hi.at[0].set(bc_v[1])
    av_lo = av_lo.at[-1].set(bc_v[3])
    Av = _dense_from_bands(av_lo, av_mid, av_hi)
    Pv = _banded_inv(-sd * av_lo, one - sd * av_mid, -sd * av_hi)
    return Ax, Px, Av, Pv


def _build_operators_dev(x, v, r, q, kappa, theta, xi, dt, theta_s,
                         ko_mask=None, dtype=jnp.float32):
    """Build (Ax, Px, Av, Pv) as DEVICE arrays in the march dtype.

    Host does only the O(n) f64 stencil/boundary arithmetic; assembly
    and inversion run jitted on device (see :func:`_build_operators_jit`).
    Drop-in replacement for the host builder at the two call sites.
    """
    d1x, d2x = _stencil_vectors(np.asarray(x, np.float64))
    d1v, d2v = _stencil_vectors(np.asarray(v, np.float64))
    dv0 = v[1] - v[0]
    dv_top = v[-1] - v[-2]
    drift_top = kappa * (theta - v[-1])
    bc_v = np.array([-kappa * theta / dv0 - 0.5 * r,
                     kappa * theta / dv0,
                     drift_top / dv_top - 0.5 * r,
                     -drift_top / dv_top], np.float64)
    if ko_mask is None:
        ko_mask = np.zeros(len(x), bool)
    dt_ = jnp.dtype(dtype).type
    as_ = lambda t: tuple(jnp.asarray(a, dtype) for a in t)
    return _build_operators_jit(
        as_(d1x), as_(d2x), as_(d1v), as_(d2v), jnp.asarray(v, dtype),
        dt_(r), dt_(q), dt_(kappa), dt_(theta), dt_(xi),
        float(dt), float(theta_s), jnp.asarray(ko_mask),
        jnp.asarray(bc_v, dtype), dtype=dt_)


def _build_operators(x, v, r, q, kappa, theta, xi, dt, theta_s,
                     ko_mask=None):
    """Host-side f64 operator/propagator construction.

    Returns (Ax, Px, Av, Pv): Ax (n_v, n_x, n_x) acts along x per
    variance level, Av (n_v, n_v) acts along v (coefficients depend on v
    only), Px/Pv the corresponding implicit-step inverses. ``ko_mask``
    zeroes the Ax rows of knocked-out spot nodes, making the barrier a
    TRUE Dirichlet boundary of the implicit solve — pinning only after
    each step (the reference's project-after-solve) lets value diffuse
    into the dead zone during the step and converges like DISCRETE
    monitoring, O(√Δt) high (measured +0.6 of the analytic
    continuously-monitored price at 128×64×256).
    """
    n_x, n_v = len(x), len(v)

    D1x, D2x = _diff_ops(x)
    Ix = np.eye(n_x)
    Ix_int = Ix.copy()
    Ix_int[0, 0] = Ix_int[-1, -1] = 0.0      # no reaction on Dirichlet rows
    # A_x(v_j) = ½v D2 + (r−q−½v) D1 − ½r I   (half the rV term here)
    Ax = (0.5 * v[:, None, None] * D2x[None]
          + (r - q - 0.5 * v)[:, None, None] * D1x[None]
          - 0.5 * r * Ix_int[None])
    if ko_mask is not None and ko_mask.any():
        Ax[:, ko_mask, :] = 0.0
    Px = np.linalg.inv(np.eye(n_x)[None] - theta_s * dt * Ax)

    # A_v: interior central on the (sinh-stretched) v grid; v=0 row
    # upwind-forward convection (κθ > 0 drives v up, diffusion vanishes
    # at v=0); v_max row upwind-backward.
    D1v, D2v = _diff_ops(v)
    Av = (0.5 * xi**2 * v[:, None] * D2v
          + kappa * (theta - v)[:, None] * D1v
          - 0.5 * r * np.eye(n_v))
    dv0 = v[1] - v[0]
    Av[0, :] = 0.0
    Av[0, 0] = -kappa * theta / dv0 - 0.5 * r
    Av[0, 1] = kappa * theta / dv0
    dv_top = v[-1] - v[-2]
    Av[-1, :] = 0.0
    drift_top = kappa * (theta - v[-1])      # ≤ 0 for v_max > θ
    Av[-1, -1] = drift_top / dv_top - 0.5 * r
    Av[-1, -2] = -drift_top / dv_top
    Pv = np.linalg.inv(np.eye(n_v) - theta_s * dt * Av)
    return Ax, Px, Av, Pv


@partial(jax.jit, static_argnames=("n_t", "american", "is_call", "dtype",
                                   "inv_theta", "has_barrier", "has_divs",
                                   "has_bermudan"))
def _adi_march(U0, Ax, Px, Av, Pv, mix_c, bc_left, bc_right, intrinsic,
               ko_mask=None, rebate=0.0, div_per_iter=None, x_grid=None,
               ex_per_iter=None, *, n_t, american, is_call, dtype,
               inv_theta, has_barrier=False, has_divs=False,
               has_bermudan=False):
    """Douglas ADI time march: one scan, (n_v, n_x) carry.

    ``Ax``/``Av`` arrive pre-scaled by θ_sΔt (so the implicit RHS terms
    are direct) and ``inv_theta`` = 1/θ_s recovers the explicit ΔtA
    application; ``mix_c`` is the mixed-term coefficient ρξv_jΔt/(4ΔxΔv);
    ``bc_left/bc_right`` are (n_t,) precomputed Dirichlet x-boundary
    values at τ_{n+1}. ``ko_mask`` ((n_x,) bool) marks knocked-out spot
    nodes pinned to ``rebate`` after every step — continuous-monitoring
    knock-out, same scheme as ``pde._fd_solve``'s barrier override.

    ``has_divs``: ``div_per_iter`` ((n_t,)) carries the cash dividend
    paid AT the carried layer's time at each scan iteration; the jump
    condition V(S, t⁻) = V(S − D, t⁺) remaps every variance row along x
    (the drop is v-independent) before the implicit step — the 2-D twin
    of ``pde._fd_solve``'s ``div_remap``, with the same cum-dividend
    American projection straight after.

    ``has_bermudan``: ``ex_per_iter`` ((n_t,) bool) marks the scan
    iterations whose PRODUCED time layer is a contractual exercise
    date — the intrinsic projection applies only there (Bermudan
    backward induction; maturity exercise is the terminal payoff).
    """
    theta_dt_Ax = Ax
    theta_dt_Av = Av
    # Iterated propagator applications at default TPU matmul precision
    # (bf16 inputs on the MXU) accumulate per-step rounding into outright
    # divergence over hundreds of steps — same failure mode documented in
    # pde.py's 1-D propagator; HIGHEST keeps the march in true f32.
    hi = jax.lax.Precision.HIGHEST

    def mixed(U):
        # ρξv ∂²/∂x∂v, central/central, zero on every boundary
        Up = jnp.pad(U, 1)
        cross = (Up[2:, 2:] - Up[2:, :-2] - Up[:-2, 2:] + Up[:-2, :-2])
        cross = cross.at[0, :].set(0.0).at[-1, :].set(0.0)
        cross = cross.at[:, 0].set(0.0).at[:, -1].set(0.0)
        return mix_c[:, None] * cross

    if has_divs:
        n_x = U0.shape[1]
        dx = x_grid[1] - x_grid[0]
        S_row = jnp.exp(x_grid)

        def div_remap(U, D):
            x_new = jnp.log(jnp.maximum(S_row - D, S_row[0]))
            u = (x_new - x_grid[0]) / dx
            j = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, n_x - 2)
            w = jnp.clip(u - j.astype(U.dtype), 0.0, 1.0)
            remapped = U[:, j] * (1.0 - w) + U[:, j + 1] * w
            # D == 0 bypasses exactly (f32 log/exp is not an identity)
            return jnp.where(D > 0.0, remapped, U)

    def step(U, xs):
        if has_divs:
            bl, br, dv = xs[:3]
        else:
            bl, br = xs[:2]
        exm = xs[-1] if has_bermudan else None
        if has_divs:
            U = div_remap(U, dv)
            if american:
                # the cum-dividend exercise right at t⁻ (see pde.py)
                U = jnp.maximum(U, intrinsic)
            elif has_bermudan:
                U = jnp.where(exm, jnp.maximum(U, intrinsic), U)
        AxU = jnp.einsum("jik,jk->ji", theta_dt_Ax, U, precision=hi)
        AvU = jnp.matmul(theta_dt_Av, U, precision=hi)
        Y0 = U + inv_theta * (AxU + AvU) + mixed(U)
        Y1 = jnp.einsum("jik,jk->ji", Px, Y0 - AxU, precision=hi)
        Y2 = jnp.matmul(Pv, Y1 - AvU, precision=hi)
        Y2 = Y2.at[:, 0].set(bl).at[:, -1].set(br)
        if american:
            Y2 = jnp.maximum(Y2, intrinsic)
        elif has_bermudan:
            Y2 = jnp.where(exm, jnp.maximum(Y2, intrinsic), Y2)
        if has_barrier:
            Y2 = jnp.where(ko_mask[None, :], rebate, Y2)
        return Y2, None

    xs = (bc_left, bc_right) + ((div_per_iter,) if has_divs else ()) \
        + ((ex_per_iter,) if has_bermudan else ())
    U, _ = jax.lax.scan(step, U0, xs)
    return U


def heston_fd_grid(S0, K, T, r, q=0.0, *, v0, kappa, theta, xi, rho,
                   kind: str = "call", american: bool = False,
                   n_x: int = 256, n_v: int = 96, n_t: int = 512,
                   x_mult: float = 6.0, v_mult: float = 10.0,
                   theta_scheme: float = 0.5, dtype=None,
                   barrier: float = 0.0, barrier_up: bool = True,
                   rebate: float = 0.0, dividends=None,
                   exercise_dates=None):
    """Solve the Heston PDE; returns ``(x_grid, v_grid, V)`` with V the
    full (n_v, n_x) t=0 surface — delta/gamma/vega come from the same
    solve (:func:`heston_fd_greeks`).

    Douglas ADI (θ-scheme parameter ``theta_scheme``; ½ = the standard
    choice) on a uniform grid x ∈ ln S0 ± x_mult·√(v̄T),
    v ∈ [0, v_mult·v̄] with v̄ = max(v0, θ). The implicit x/v half-steps
    are precomputed dense inverses applied as batched MXU matvecs; the
    mixed ρξv V_xv term is explicit. American exercise by projection.

    ``exercise_dates=[t_1, …]`` prices a BERMUDAN: the intrinsic
    projection applies only at the listed dates (snapped to the nearest
    time level; maturity is automatic via the terminal payoff) — the
    deterministic oracle the Heston LSMC dual bracket is tested
    against. Mutually exclusive with ``american=True``.
    """
    if kind not in ("call", "put"):
        raise ValueError("kind must be 'call' or 'put'")
    if not (0.0 < theta_scheme <= 1.0):
        raise ValueError("theta_scheme must be in (0, 1]")
    if exercise_dates is not None and american:
        raise ValueError("exercise_dates (Bermudan) and american=True "
                         "are mutually exclusive")
    dt_ = canonical(dtype)
    is_call = kind == "call"
    S0, K, T, r, q = (float(a) for a in (S0, K, T, r, q))
    v0, kappa, theta, xi, rho = (
        float(a) for a in (v0, kappa, theta, xi, rho))

    vbar = max(v0, theta, 1e-4)
    x_half = x_mult * np.sqrt(vbar * T)
    x = np.linspace(np.log(S0) - x_half, np.log(S0) + x_half, n_x)
    if barrier > 0.0 and x[0] < np.log(barrier) < x[-1]:
        # shift the whole grid so ln(barrier) sits EXACTLY on a node —
        # the knock-out override is first-order in the barrier-to-node
        # offset otherwise (measured +0.24 of spot at n_x=128 with the
        # barrier mid-cell); the ≤Δx/2 shift leaves S0 interior and the
        # read-out interpolates. A barrier OUTSIDE the grid is left
        # unsnapped (shifting by the full overshoot would push S0 off
        # the grid): the mask is then empty or total, i.e. the far-
        # barrier contract degenerates to vanilla/rebate as in the 1-D
        # solver's far-barrier semantics.
        xb = np.log(barrier)
        x = x + (xb - x[int(np.argmin(np.abs(x - xb)))])
    v_max = v_mult * vbar
    # sinh-stretched v grid concentrated near v = 0, where the variance
    # density piles up whenever Feller (2κθ ≥ ξ²) is violated — a uniform
    # grid there costs ~10× the nodes for the same wing accuracy
    # (mild Hout-Foulon-style stretching; c controls the concentration)
    c_str = 3.0
    u = np.linspace(0.0, 1.0, n_v)
    v = v_max * np.sinh(c_str * u) / np.sinh(c_str)
    dt = T / n_t
    dx = x[1] - x[0]

    S_grid = np.exp(x)
    sign = 1.0 if is_call else -1.0
    payoff = np.maximum(sign * (S_grid - K), 0.0)
    has_barrier = barrier > 0.0
    ko_mask = np.zeros(n_x, bool)
    if has_barrier:
        ko_mask = (S_grid >= barrier * (1.0 - 1e-12)) if barrier_up \
            else (S_grid <= barrier * (1.0 + 1e-12))
        payoff = np.where(ko_mask, rebate, payoff)
    Ax, Px, Av, Pv = _build_operators_dev(
        x, v, r, q, kappa, theta, xi, dt, theta_scheme,
        ko_mask=ko_mask if has_barrier else None, dtype=dt_)
    U0 = np.broadcast_to(payoff, (n_v, n_x)).copy()

    # Dirichlet x boundaries at τ_{n+1}: discounted-forward asymptotics
    tau = (np.arange(n_t) + 1.0) * dt
    pv_divs = np.zeros(n_t)
    div_per_iter = None
    if dividends:
        from .pde import _div_schedule_np

        amts = _div_schedule_np(dividends, T, n_t)
        # scan iteration k carries the t_{n_t−k}⁺ layer: remap with the
        # dividend paid at that node (m = n_t … 1 over the march)
        div_per_iter = amts[::-1][:n_t].copy()
        # PV of dividends still ahead of the layer PRODUCED at iteration
        # k (time index n_t−k−1): the far-field boundary asymptotes must
        # carry the forward NET of future drops (see pde._fd_solve)
        ks = np.arange(n_t + 1)
        w = amts * np.exp(-r * dt * ks)
        suffix = np.cumsum(w[::-1])[::-1] - w
        pv_divs = (suffix * np.exp(r * dt * ks))[n_t - 1::-1]
    if is_call:
        bc_left = np.zeros(n_t)
        bc_right = np.maximum(
            S_grid[-1] * np.exp(-q * tau) - pv_divs - K * np.exp(-r * tau),
            0.0)
        if american:
            bc_right = np.maximum(bc_right, S_grid[-1] - K)
    else:
        bc_left = K * np.exp(-r * tau) \
            - np.maximum(S_grid[0] * np.exp(-q * tau) - pv_divs, 0.0)
        if american:
            bc_left = np.maximum(bc_left, K - S_grid[0])
        bc_right = np.zeros(n_t)

    has_bermudan = exercise_dates is not None
    ex_kw = {}
    if has_bermudan:
        # iteration i produces the layer at time index n_t−1−i; mark the
        # iterations whose produced layer is an exercise date (snapped
        # to the nearest level; index 0 = t=0 and ≥ n_t = maturity are
        # no-ops — t=0 exercise is dominated, maturity is the payoff)
        ex_idx = {int(round(float(t) / dt)) for t in exercise_dates}
        ex_idx = {m for m in ex_idx if 1 <= m <= n_t - 1}
        ex_per_iter = np.array([(n_t - 1 - i) in ex_idx
                                for i in range(n_t)], bool)
        # far-field Dirichlet values may exercise only at those dates
        if is_call:
            bc_right = np.where(ex_per_iter,
                                np.maximum(bc_right, S_grid[-1] - K),
                                bc_right)
        else:
            bc_left = np.where(ex_per_iter,
                               np.maximum(bc_left, K - S_grid[0]),
                               bc_left)
        ex_kw = dict(ex_per_iter=jnp.asarray(ex_per_iter),
                     has_bermudan=True)

    # mixed-term coefficient: central/central with the per-level span
    # (v_{j+1} − v_{j−1}) as the v denominator; zero on v boundaries
    mix_c = np.zeros(n_v)
    mix_c[1:-1] = rho * xi * v[1:-1] / (2.0 * dx * (v[2:] - v[:-2]))
    th = theta_scheme
    div_kw = {}
    if dividends:
        div_kw = dict(div_per_iter=jnp.asarray(div_per_iter, dt_),
                      x_grid=jnp.asarray(x, dt_), has_divs=True)
    U = _adi_march(
        jnp.asarray(U0, dt_),
        jnp.asarray(th * dt * Ax, dt_), jnp.asarray(Px, dt_),
        jnp.asarray(th * dt * Av, dt_), jnp.asarray(Pv, dt_),
        jnp.asarray(dt * mix_c, dt_),
        jnp.asarray(bc_left, dt_), jnp.asarray(bc_right, dt_),
        jnp.asarray(np.broadcast_to(payoff, (n_v, n_x)), dt_),
        jnp.asarray(ko_mask), jnp.asarray(rebate, dt_),
        n_t=int(n_t), american=bool(american), is_call=is_call, dtype=dt_,
        inv_theta=1.0 / th, has_barrier=bool(has_barrier), **div_kw,
        **ex_kw)
    return x, v, np.asarray(jax.device_get(U), np.float64)


def heston_fd_price_barrier(S0, K, T, r, q=0.0, *, v0, kappa, theta, xi,
                            rho, barrier: float,
                            barrier_type: str = "up-and-out",
                            rebate: float = 0.0, kind: str = "call",
                            american: bool = False, **grid_kw) -> float:
    """Continuously-monitored barrier option under Heston by the ADI
    march: knock-out via per-step Dirichlet overrides on the spot nodes
    at/beyond the barrier (the 2-D twin of ``pde.fd_price_barrier``,
    same scheme as reference ``pde.py:271-329``); knock-in via the
    European parity V_in = V_vanilla − V_out (zero rebate, European
    only — the parity does not hold for American exercise).

    NOTE the MC engines monitor DISCRETELY at the step grid, so they
    converge to this price only as n_steps → ∞ (Broadie-Glasserman
    √Δt barrier shift); the ξ→0 degenerate limit is pinned to the 1-D
    solver in tests/test_heston_pde.py.
    """
    hp = dict(v0=v0, kappa=kappa, theta=theta, xi=xi, rho=rho)
    if barrier_type not in ("up-and-out", "down-and-out",
                            "up-and-in", "down-and-in"):
        raise ValueError(f"unknown barrier_type {barrier_type!r}")
    if barrier_type.endswith("in"):
        if american:
            raise ValueError("knock-in parity requires European exercise")
        if rebate != 0.0:
            raise ValueError("knock-in parity requires zero rebate")
        vanilla = heston_fd_price(S0, K, T, r, q, **hp, kind=kind,
                                  **grid_kw)
        out = heston_fd_price_barrier(
            S0, K, T, r, q, **hp, barrier=barrier,
            barrier_type=barrier_type.replace("in", "out"), kind=kind,
            **grid_kw)
        return vanilla - out
    x, v, V = heston_fd_grid(
        S0, K, T, r, q, **hp, kind=kind, american=american,
        barrier=float(barrier),
        barrier_up=barrier_type.startswith("up"), rebate=float(rebate),
        **grid_kw)
    return _bilinear_readout(x, v, V, S0, v0)


def heston_fd_price_batch(S0, K, T, r, q=0.0, *, v0, kappa, theta, xi,
                          rho, kind="call", american: bool = False,
                          n_x: int = 256, n_v: int = 96, n_t: int = 512,
                          x_mult: float = 6.0, v_mult: float = 10.0,
                          theta_scheme: float = 0.5, dtype=None):
    """Heston ADI strike/kind ladder: ONE set of propagators, the whole
    ladder marched by ``vmap`` — the implicit-step inverses and the
    mixed-term stencil are strike-independent, so a B-strike book costs
    one operator build plus a (B, n_v, n_x) batched march whose einsums
    keep the MXU saturated. ``K``/``kind`` broadcast; returns (B,) f64.

    The 1-D analogue is ``pde.fd_price_batch``; the reference has no
    batched PDE at all (scalar solves only,
    /root/reference/src/optpricer/pde.py:228-268)."""
    if not (0.0 < theta_scheme <= 1.0):
        raise ValueError("theta_scheme must be in (0, 1]")
    dt_ = canonical(dtype)
    K_arr = np.atleast_1d(np.asarray(K, np.float64))
    kinds = np.broadcast_to(np.atleast_1d(kind), K_arr.shape)
    if not all(k in ("call", "put") for k in kinds):
        raise ValueError("kind must be 'call' or 'put'")
    sign = np.where(kinds == "call", 1.0, -1.0)
    S0, T, r, q = (float(a) for a in (S0, T, r, q))
    v0, kappa, theta, xi, rho = (
        float(a) for a in (v0, kappa, theta, xi, rho))

    vbar = max(v0, theta, 1e-4)
    x = np.linspace(np.log(S0) - x_mult * np.sqrt(vbar * T),
                    np.log(S0) + x_mult * np.sqrt(vbar * T), n_x)
    c_str = 3.0
    u = np.linspace(0.0, 1.0, n_v)
    v = v_mult * vbar * np.sinh(c_str * u) / np.sinh(c_str)
    dt = T / n_t
    dx = x[1] - x[0]
    Ax, Px, Av, Pv = _build_operators_dev(x, v, r, q, kappa, theta, xi, dt,
                                          theta_scheme, dtype=dt_)
    S_grid = np.exp(x)
    payoff = np.maximum(sign[:, None] * (S_grid[None, :] - K_arr[:, None]),
                        0.0)                                   # (B, n_x)
    U0 = np.broadcast_to(payoff[:, None, :],
                         (K_arr.size, n_v, n_x)).copy()
    tau = (np.arange(n_t) + 1.0) * dt
    disc_K = K_arr[:, None] * np.exp(-r * tau)[None, :]        # (B, n_t)
    fwd_lo = S_grid[0] * np.exp(-q * tau)[None, :]
    fwd_hi = S_grid[-1] * np.exp(-q * tau)[None, :]
    is_call_b = sign > 0
    bc_left = np.where(is_call_b[:, None], 0.0,
                       np.maximum(disc_K - fwd_lo, 0.0))
    bc_right = np.where(is_call_b[:, None],
                        np.maximum(fwd_hi - disc_K, 0.0), 0.0)
    if american:
        bc_left = np.maximum(bc_left, np.where(
            is_call_b[:, None], 0.0, K_arr[:, None] - S_grid[0]))
        bc_right = np.maximum(bc_right, np.where(
            is_call_b[:, None], S_grid[-1] - K_arr[:, None], 0.0))
    mix_c = np.zeros(n_v)
    mix_c[1:-1] = rho * xi * v[1:-1] / (2.0 * dx * (v[2:] - v[:-2]))
    th = theta_scheme

    march = jax.vmap(
        partial(_adi_march, n_t=int(n_t), american=bool(american),
                is_call=True, dtype=dt_, inv_theta=1.0 / th),
        in_axes=(0, None, None, None, None, None, 0, 0, 0))
    U = march(jnp.asarray(U0, dt_),
              jnp.asarray(th * dt * Ax, dt_), jnp.asarray(Px, dt_),
              jnp.asarray(th * dt * Av, dt_), jnp.asarray(Pv, dt_),
              jnp.asarray(dt * mix_c, dt_),
              jnp.asarray(bc_left, dt_), jnp.asarray(bc_right, dt_),
              jnp.asarray(np.broadcast_to(payoff[:, None, :],
                                          (K_arr.size, n_v, n_x)), dt_))
    V = np.asarray(jax.device_get(U), np.float64)
    out = np.array([_bilinear_readout(x, v, V[b], S0, v0)
                    for b in range(K_arr.size)])
    return out.reshape(np.shape(K))


def _bilinear_readout(x, v, V, S0, v0):
    """Host f64 bilinear interpolation of the (n_v, n_x) surface at
    (ln S0, v0) — same bias rationale as ``pde._readout``."""
    x0 = np.log(float(S0))
    i = int(np.clip(np.searchsorted(x, x0) - 1, 0, len(x) - 2))
    j = int(np.clip(np.searchsorted(v, float(v0)) - 1, 0, len(v) - 2))
    wx = (x0 - x[i]) / (x[i + 1] - x[i])
    wv = (float(v0) - v[j]) / (v[j + 1] - v[j])
    return float((1 - wv) * ((1 - wx) * V[j, i] + wx * V[j, i + 1])
                 + wv * ((1 - wx) * V[j + 1, i] + wx * V[j + 1, i + 1]))


def heston_fd_price(S0, K, T, r, q=0.0, *, v0, kappa, theta, xi, rho,
                    kind: str = "call", american: bool = False,
                    n_x: int = 256, n_v: int = 96, n_t: int = 512,
                    x_mult: float = 6.0, v_mult: float = 10.0,
                    theta_scheme: float = 0.5, dtype=None,
                    dividends=None, exercise_dates=None) -> float:
    """Heston price by the Douglas ADI march (European or American).

    The European case is cross-checked against the COS oracle
    (`heston_price_cos`) in tests; the American case extends the
    framework past both the reference (MC-only Heston) and the 1-D FD
    solver (GBM/local vol only). ``dividends=[(t, amount), ...]``
    prices under discrete cash dividends — the same jump-condition
    model as ``pde.fd_price`` (ξ→0 degenerate-limit cross-check in
    tests), applied as an x-remap of every variance row.
    """
    x, v, V = heston_fd_grid(
        S0, K, T, r, q, v0=v0, kappa=kappa, theta=theta, xi=xi, rho=rho,
        kind=kind, american=american, n_x=n_x, n_v=n_v, n_t=n_t,
        x_mult=x_mult, v_mult=v_mult, theta_scheme=theta_scheme,
        dtype=dtype, dividends=dividends, exercise_dates=exercise_dates)
    return _bilinear_readout(x, v, V, S0, v0)


def heston_fd_greeks(S0, K, T, r, q=0.0, *, v0, kappa, theta, xi, rho,
                     kind: str = "call", american: bool = False,
                     **grid_kw) -> dict:
    """Grid Greeks from ONE ADI solve: delta, gamma (x chain rule, as in
    ``pde.fd_greeks``) and vega_v0 = ∂V/∂v0 (the v-direction is already
    on the grid — no re-solve, unlike bump-and-reprice)."""
    x, v, V = heston_fd_grid(
        S0, K, T, r, q, v0=v0, kappa=kappa, theta=theta, xi=xi, rho=rho,
        kind=kind, american=american, **grid_kw)
    price = _bilinear_readout(x, v, V, S0, v0)
    dx = x[1] - x[0]
    x0 = np.log(float(S0))
    j = int(np.clip(np.searchsorted(v, v0), 1, len(v) - 2))

    # centered x-derivative ARRAYS at the v-level, then interpolate the
    # derivative itself at ln S0 (reading at the nearest node instead
    # leaves a half-cell offset error ≈ Γ·S0·dx/2 in delta)
    row = V[j, :]
    dVdx_n = np.empty_like(row)
    d2Vdx2_n = np.empty_like(row)
    dVdx_n[1:-1] = (row[2:] - row[:-2]) / (2 * dx)
    d2Vdx2_n[1:-1] = (row[2:] - 2 * row[1:-1] + row[:-2]) / dx**2
    dVdx_n[0] = dVdx_n[1]
    dVdx_n[-1] = dVdx_n[-2]
    d2Vdx2_n[0] = d2Vdx2_n[1]
    d2Vdx2_n[-1] = d2Vdx2_n[-2]
    dVdx = float(np.interp(x0, x, dVdx_n))
    d2Vdx2 = float(np.interp(x0, x, d2Vdx2_n))
    delta = dVdx / S0
    gamma = (d2Vdx2 - dVdx) / S0**2
    # vega: non-uniform-v 3-point first derivative per node, interp in x
    hm, hp_ = v[j] - v[j - 1], v[j + 1] - v[j]
    vega_n = (-hp_ / (hm * (hm + hp_)) * V[j - 1, :]
              + (hp_ - hm) / (hm * hp_) * V[j, :]
              + hm / (hp_ * (hm + hp_)) * V[j + 1, :])
    vega_v0 = float(np.interp(x0, x, vega_n))
    return {"price": price, "delta": float(delta), "gamma": float(gamma),
            "vega_v0": float(vega_v0)}
