"""Local-stochastic volatility (LSV): Heston dynamics under a Dupire
leverage function, calibrated by the particle method.

    dS/S = (r - q) dt + L(S, t) * sqrt(v) dW1
    dv   = kappa (theta - v) dt + xi sqrt(v) dW2,  d<W1,W2> = rho dt

Markovian-projection (Gyongy) consistency with a Dupire local-vol surface
requires  L^2(S, t) = sigma_Dup^2(S, t) / E[v_t | S_t = S].  The particle
method (Guyon & Henry-Labordere) estimates the conditional expectation
from the simulated ensemble itself while stepping it forward, so the
leverage surface is calibrated in the SAME pass that evolves the paths.

TPU-native design: the conditional expectation is a binned Nadaraya-
Watson regression in log-moneyness on a FIXED grid — per-step
``segment_sum`` of (count, v) statistics smoothed by a small binomial
kernel, all static shapes, so the whole calibration is ONE compiled
``lax.scan`` (no host round-trips, no dynamic shapes, no particle
resampling). The Dupire surface is pre-evaluated on the (t_k, bin)
grid outside the scan, so no SVI math runs per step.

The reference has no LSV model (its most advanced dynamics are Heston /
local vol separately: ``monte_carlo.py:141-258``); this module is the
capstone combining the two, with the vanilla-surface repricing test as
its correctness contract.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..dtypes import canonical
from .exotics import _price_from_payoff
from .mc_fused import _exp_for, _log_for, _sqrt0, _terminal_payoff
from .monte_carlo import resolve_seed

__all__ = ["LSVModel", "lsv_calibrate", "lsv_greeks_mc",
           "lsv_path_matrix", "lsv_price_mc"]


@dataclass(frozen=True)
class LSVModel:
    """Calibrated LSV model: Heston parameters + leverage table.

    ``leverage`` is an ``(n_steps, n_bins)`` table of L values on the
    ``x_bins`` log-moneyness grid (x = ln(S / F_t), F_t the analytic
    forward S0*e^{(r-q)t}); row k applies on the step from t_k to
    t_{k+1}. Registered as a pytree so it flows through jit.
    """

    S0: float
    r: float
    q: float
    T: float
    v0: float
    kappa: float
    theta: float
    xi: float
    rho: float
    x_bins: jnp.ndarray      # (n_bins,) bin centers in log-moneyness
    leverage: jnp.ndarray    # (n_steps, n_bins)
    scheme: str = "euler"    # variance discretisation the table was
    # calibrated under ("euler" | "qe"); pricing follows it so the
    # Gyöngy repricing consistency is preserved

    @property
    def n_steps(self) -> int:
        return int(self.leverage.shape[0])

    @property
    def heston(self) -> dict:
        return dict(v0=self.v0, kappa=self.kappa, theta=self.theta,
                    xi=self.xi, rho=self.rho)


jax.tree_util.register_pytree_node(
    LSVModel,
    lambda m: ((m.x_bins, m.leverage),
               (m.S0, m.r, m.q, m.T, m.v0, m.kappa, m.theta, m.xi, m.rho,
                m.scheme)),
    lambda aux, c: LSVModel(*aux[:9], x_bins=c[0], leverage=c[1],
                            scheme=aux[9]),
)


def _smooth_kernel(dtype, taps: int = 5):
    """Binomial smoothing kernel (the kernel-regression bandwidth of the
    binned conditional expectation). ``taps`` odd; 1 disables smoothing.
    Bandwidth trades variance (few particles per bin) against O(h²)
    curvature bias in E[v|x] — which scales with ξ², see test_lsv.py."""
    row = np.array([1.0])
    for _ in range(taps - 1):
        row = np.convolve(row, [0.5, 0.5])
    return jnp.asarray(row, dtype)


def _qe_v_step(v, z2, kappa, theta_v, xi, dt, dt_):
    """Andersen QE variance transition driven by one normal ``z2``: the
    quadratic branch uses z2 directly, the exponential branch inverts
    its CDF on u = Φ(z2) — so the antithetic −z2 mirrors the uniform
    exactly. Same scheme as ``processes._heston_qe_core`` (which
    documents the full-truncation Euler O(Δt) bias this replaces).
    Degenerate ξ→0 / κ→0 limits collapse to the deterministic mean."""
    from jax.scipy.stats import norm

    eps = jnp.asarray(1e-12, dt_)
    kap = jnp.maximum(kappa, eps)
    emkt = jnp.exp(-kap * dt)
    c1 = xi * xi * emkt * (1.0 - emkt) / kap
    c2 = theta_v * xi * xi * (1.0 - emkt) ** 2 / (2.0 * kap)
    m = theta_v + (v - theta_v) * emkt
    s2 = v * c1 + c2
    psi = s2 / jnp.maximum(m * m, eps)
    two_over = 2.0 / jnp.maximum(jnp.minimum(psi, 1.5), eps)
    b2 = (two_over - 1.0 + jnp.sqrt(two_over)
          * jnp.sqrt(jnp.maximum(two_over - 1.0, 0.0)))
    a = m / (1.0 + b2)
    bz = jnp.sqrt(jnp.maximum(b2, 0.0)) + z2
    u = norm.cdf(z2)
    psi_e = jnp.maximum(psi, 1.5)
    p = (psi_e - 1.0) / (psi_e + 1.0)
    beta_e = (1.0 - p) / jnp.maximum(m, eps)
    v_exp = jnp.where(
        u <= p, 0.0,
        jnp.log((1.0 - p) / jnp.maximum(1.0 - u, eps)) / beta_e)
    return jnp.where(psi <= 1.5, a * bz * bz, v_exp)


def _qe_asset_coupling(v_eff, v_new, kappa, theta_v, xi, rho, dt, dt_):
    """(v̄, ρ-coupling drift term) of the QE asset step: Andersen's
    substitution ∫√v dW₂ = (v⁺ − v − κθΔ + κ∫v)/ξ with the central
    ∫v ≈ v̄Δ. Returns the coupling scaled for a UNIT-leverage asset —
    the caller multiplies by its local leverage. ξ→0 sends the
    coupling to zero (v is then deterministic, nothing to couple)."""
    vbar = 0.5 * (v_eff + v_new)
    inc = v_new - v_eff - kappa * (theta_v - vbar) * dt
    coup = jnp.where(xi > 1e-8, rho * inc / jnp.maximum(xi, 1e-8), 0.0)
    return vbar, coup


def _advance_particles(S, v, L, z2, zp, *, mu, kappa, theta_v, xi,
                       rho, rho_perp, dt, sqrt_dt, exp_, dt_, scheme):
    """ONE particle advance shared by the calibrator and the pricer —
    the Gyöngy repricing contract requires the two scans to use the
    SAME discretisation, so the step lives in exactly one place.
    ``scheme="qe"``: Andersen QE variance + leverage-scaled central
    asset step (ρ-coupling on the v-increment); ``"euler"``:
    full-truncation Euler + log-Euler asset with correlated shocks."""
    v_eff = jnp.maximum(v, 0.0)
    if scheme == "qe":
        v_new = _qe_v_step(v_eff, z2, kappa, theta_v, xi, dt, dt_)
        vbar, coup = _qe_asset_coupling(v_eff, v_new, kappa, theta_v,
                                        xi, rho, dt, dt_)
        S_new = S * exp_(mu * dt - 0.5 * L * L * vbar * dt
                         + L * coup
                         + L * _sqrt0(rho_perp * rho_perp * vbar * dt)
                         * zp)
    else:
        z1 = rho * z2 + rho_perp * zp
        sig_eff = L * _sqrt0(v_eff)
        S_new = S * exp_((mu - 0.5 * sig_eff * sig_eff) * dt
                         + sig_eff * sqrt_dt * z1)
        v_new = jnp.maximum(
            v + kappa * (theta_v - v_eff) * dt
            + xi * _sqrt0(v_eff) * sqrt_dt * z2, 0.0)
    return S_new, v_new


def _interp_row(row, u, n_bins):
    """Linear interpolation of a per-step table row at fractional bin
    coordinate u (piecewise-linear leverage; clamped at the grid ends)."""
    i = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, n_bins - 2)
    frac = jnp.clip(u - i.astype(u.dtype), 0.0, 1.0)
    return row[i] * (1.0 - frac) + row[i + 1] * frac


@partial(jax.jit, static_argnames=("n_steps", "n_paths", "n_bins",
                                   "antithetic", "dtype", "regression",
                                   "smooth", "scheme"))
def _calibrate_scan(key, sig_grid, fixed, *, n_steps, n_paths, n_bins,
                    antithetic, dtype, regression="local_linear", smooth=5,
                    scheme="euler"):
    """One-program particle calibration: returns the (n_steps, n_bins)
    leverage table and the terminal (S, v) ensemble.

    ``sig_grid[k, j]`` = Dupire sigma at (t_k, F_{t_k} e^{x_j}),
    pre-evaluated outside the scan. Step k estimates E[v|bin] from the
    ensemble AT t_k, forms L_k = sigma_Dup / sqrt(E[v|bin]), then
    advances every particle with its own interpolated L.
    """
    dt_ = dtype
    dt = fixed["T"] / n_steps
    sqrt_dt = jnp.sqrt(dt)
    n_cols = 2 * n_paths if antithetic else n_paths
    exp_, log_ = _exp_for(dt_), _log_for(dt_)
    x0, dx = fixed["x0"], fixed["dx"]
    kern = _smooth_kernel(dt_, smooth)

    rho = fixed["rho"]
    rho_perp = jnp.sqrt(jnp.maximum(0.0, 1.0 - rho * rho))
    mu = fixed["r"] - fixed["q"]

    S_init = jnp.full((n_cols,), fixed["S0"], dt_)
    v_init = jnp.full((n_cols,), jnp.maximum(fixed["v0"], 0.0), dt_)

    x_centers = x0 + dx * jnp.arange(n_bins, dtype=dt_)

    # Shifted smoothing kernels: with jnp.convolve(row, kern, "same"),
    # out[n] = Σ_j row[n+j]·kern[p−j] (p the kernel midpoint), so source
    # bin n+j sits at offset δ = j·dx from target center n. kern1/kern2
    # carry the δ and δ² weights so OWN-CENTER per-bin moments can be
    # translated to the target center inside the convolution — keeping
    # every x-like quantity O(dx) end-to-end. The former global-x form
    # (m2 − 2x_c·m1 + x_c²·m0) cancels catastrophically in f32 and made
    # E[v|x] noisy; L = σ/√E[v|x] then inherits an upward Jensen bias
    # measured at +0.7 of spot on 1y vanillas (the TPU default dtype).
    p_mid = (kern.shape[0] - 1) // 2
    j_of = (p_mid - jnp.arange(kern.shape[0], dtype=dt_)) * dx
    kern1 = kern * j_of
    kern2 = kern * j_of * j_of

    def leverage_row(S, v, k_idx, sig_row):
        # E[v | x-bin] by LOCAL-LINEAR kernel regression: per-bin
        # segment sums of (1, xc, xc², v, xc·v) with xc relative to the
        # particle's OWN bin center, kernel-smoothed with recentering,
        # then the weighted-least-squares intercept at each bin center.
        # The local-linear form kills the O(h·∂E[v|x]/∂x) boundary and
        # gradient bias that plain Nadaraya-Watson smoothing has —
        # material in the wings under strong spot-vol correlation.
        x = log_(S) - (log_(fixed["S0"]) + mu * (k_idx.astype(dt_) * dt))
        u = (x - x0) / dx
        idx = jnp.clip(jnp.round(u).astype(jnp.int32), 0, n_bins - 1)
        xc = x - x_centers[idx]
        v_eff = jnp.maximum(v, 0.0)
        ones = jnp.ones_like(S)
        raw = jnp.stack([ones, xc, xc * xc, v_eff, xc * v_eff])   # (5, n)
        s0, s1, s2, t0, t1 = jax.vmap(
            lambda row: jax.ops.segment_sum(row, idx, n_bins))(raw)
        conv = lambda row, k: jnp.convolve(row, k, mode="same")
        m0 = conv(s0, kern)
        m1c = conv(s1, kern) + conv(s0, kern1)
        m2c = conv(s2, kern) + 2.0 * conv(s1, kern1) + conv(s0, kern2)
        q0 = conv(t0, kern)
        q1c = conv(t1, kern) + conv(t0, kern1)
        det = m0 * m2c - m1c * m1c
        vbar = jnp.mean(v_eff)
        Ev_nw = jnp.where(m0 > 0.5, q0 / jnp.maximum(m0, 1e-6), vbar)
        Ev_ll = (m2c * q0 - m1c * q1c) / jnp.where(det > 0, det, 1.0)
        # local-linear needs spread in x within the kernel window;
        # degenerate windows (few particles, or step 0's point mass)
        # fall back to the NW estimate
        if regression == "local_linear":
            Ev = jnp.where(det > 1e-10 * jnp.maximum(m0 * m2c, 1e-30),
                           Ev_ll, Ev_nw)
        else:
            Ev = Ev_nw
        Ev = jnp.clip(Ev, 0.05 * vbar, 20.0 * vbar)
        L = sig_row / jnp.sqrt(jnp.maximum(Ev, 1e-8))
        return jnp.clip(L, 0.05, 20.0), u

    def step(carry, xs):
        S, v = carry
        k_idx, sig_row = xs
        L_row, u = leverage_row(S, v, k_idx, sig_row)
        L = _interp_row(L_row, u, n_bins)
        zk = jax.random.fold_in(key, k_idx)
        k2, kp = jax.random.split(zk)
        z2 = jax.random.normal(k2, (n_paths,), dt_)
        zp = jax.random.normal(kp, (n_paths,), dt_)
        if antithetic:
            z2 = jnp.concatenate([z2, -z2])
            zp = jnp.concatenate([zp, -zp])
        S_new, v_new = _advance_particles(
            S, v, L, z2, zp, mu=mu, kappa=fixed["kappa"],
            theta_v=fixed["theta"], xi=fixed["xi"], rho=rho,
            rho_perp=rho_perp, dt=dt, sqrt_dt=sqrt_dt, exp_=exp_,
            dt_=dt_, scheme=scheme)
        return (S_new, v_new), L_row

    (S_T, v_T), L_table = jax.lax.scan(
        step, (S_init, v_init),
        (jnp.arange(n_steps), sig_grid))
    return L_table, S_T, v_T


def lsv_calibrate(surface, heston: dict, S0: float, r: float,
                  q: float = 0.0, *, T: float, n_steps: int = 96,
                  n_paths: int = 131_072, n_bins: int = 128,
                  x_width: Optional[float] = None, antithetic: bool = True,
                  seed: Optional[int] = None, dtype=None,
                  regression: str = "local_linear",
                  smooth: int = 3, scheme: str = "euler") -> LSVModel:
    """Calibrate the LSV leverage function to a Dupire surface.

    ``surface`` is a calibrated
    :class:`~optpricer_tpu.models.calibration.VolSurface`; ``heston``
    holds ``{'v0','kappa','theta','xi','rho'}``. The leverage table is
    computed on an ``n_bins`` log-moneyness grid spanning ``±x_width``
    (default: 4 ATM-vol standard deviations at T) and ``n_steps`` time
    points, by the one-scan particle method above. With exact
    calibration the model reprices the vanilla surface by construction
    (Gyongy); the residual is MC + binning error — see
    ``tests/test_lsv.py`` for the repricing gate.

    The dominant calibration error is the kernel bandwidth in x: the
    O(h²·∂²E[v|x]) smoothing bias scales with ξ² and is INDEPENDENT of
    ``n_paths`` and ``n_steps`` (measured on hardware: 96 bins/5-tap
    ≈ −7bp of spot on OTM calls at ξ=0.5; 128 bins/3-tap ≈ −1.5bp,
    at the pure-local-vol floor). Narrow ``smooth``/raise ``n_bins``
    before raising path counts when chasing repricing accuracy;
    ``regression="nw"`` selects plain Nadaraya-Watson over the
    default local-linear estimator for A/B.

    ``scheme="qe"`` advances the particles with Andersen's QE variance
    transition and the leverage-scaled central asset step instead of
    full-truncation Euler — tighter absolute coarse-step accuracy (the
    Euler path bias largely CANCELS in the Gyöngy repricing because
    pricing shares the discretisation, but exotics and few-step tables
    benefit). The scheme is recorded on the model and pricing follows
    it on both the XLA scan and the Pallas path kernel.
    """
    from .calibration import dupire_local_vol

    if scheme not in ("euler", "qe"):
        raise ValueError("scheme must be 'euler' or 'qe'")

    dt_ = canonical(dtype)
    if x_width is None:
        atm = float(np.asarray(surface.iv_from_logm(0.0, T)))
        x_width = 4.0 * atm * float(np.sqrt(T)) + 0.1
    x_bins = jnp.linspace(-x_width, x_width, n_bins, dtype=dt_)
    dx = float(x_bins[1] - x_bins[0])

    # Dupire sigma on the (t_k, bin) grid, evaluated once outside the scan
    t_grid = jnp.arange(n_steps, dtype=dt_) * (T / n_steps)
    t_safe = jnp.maximum(t_grid, 1e-6)

    def sig_at(t):
        F_t = S0 * jnp.exp((r - q) * t)
        S_row = F_t * jnp.exp(x_bins)
        return dupire_local_vol(surface, S_row, t, r, q).astype(dt_)

    sig_grid = jax.vmap(sig_at)(t_safe)                # (n_steps, n_bins)

    fixed = dict(
        S0=jnp.asarray(S0, dt_), r=jnp.asarray(r, dt_),
        q=jnp.asarray(q, dt_), T=jnp.asarray(T, dt_),
        v0=jnp.asarray(heston["v0"], dt_),
        kappa=jnp.asarray(heston["kappa"], dt_),
        theta=jnp.asarray(heston["theta"], dt_),
        xi=jnp.asarray(heston["xi"], dt_),
        rho=jnp.asarray(heston["rho"], dt_),
        x0=jnp.asarray(x_bins[0], dt_), dx=jnp.asarray(dx, dt_))
    key = jax.random.key(resolve_seed(seed))
    L_table, _, _ = _calibrate_scan(
        key, sig_grid, fixed, n_steps=int(n_steps), n_paths=int(n_paths),
        n_bins=int(n_bins), antithetic=bool(antithetic), dtype=dt_,
        regression=regression, smooth=int(smooth), scheme=scheme)
    return LSVModel(S0=float(S0), r=float(r), q=float(q), T=float(T),
                    v0=float(heston["v0"]), kappa=float(heston["kappa"]),
                    theta=float(heston["theta"]), xi=float(heston["xi"]),
                    rho=float(heston["rho"]), x_bins=x_bins,
                    leverage=L_table, scheme=scheme)


@partial(jax.jit, static_argnames=(
    "payoff", "kind", "n_steps", "n_paths", "antithetic", "barrier_type",
    "average_type", "strike_type", "dtype"))
def _lsv_paths(key, model, fixed, *, payoff, kind, n_steps, n_paths,
               antithetic, barrier_type, average_type, strike_type, dtype):
    """Fused LSV path scan: same O(1)-state carry design as
    ``mc_fused._fused_paths`` with the frozen leverage table riding the
    scan xs (one (n_bins,) row per step, interpolated per particle)."""
    dt_ = dtype
    dt = fixed["T"] / n_steps
    sqrt_dt = jnp.sqrt(dt)
    n_cols = 2 * n_paths if antithetic else n_paths
    exp_, log_ = _exp_for(dt_), _log_for(dt_)
    n_bins = model.leverage.shape[1]
    x0 = model.x_bins[0]
    dx = model.x_bins[1] - model.x_bins[0]
    mu = fixed["r"] - fixed["q"]
    # Heston parameters come from ``fixed`` when present (traced overrides
    # for the AD Greek path, lsv_greeks_mc) and from the model otherwise.
    rho = jnp.asarray(fixed.get("h_rho", model.rho), dt_)
    rho_perp = jnp.sqrt(jnp.maximum(0.0, 1.0 - rho * rho))
    kappa = jnp.asarray(fixed.get("h_kappa", model.kappa), dt_)
    theta_v = jnp.asarray(fixed.get("h_theta", model.theta), dt_)
    xi = jnp.asarray(fixed.get("h_xi", model.xi), dt_)

    # Derive the initial carry from the key so its varying-axes type matches
    # the per-step draws inside shard_map (scan requires carry agreement).
    vary = jnp.zeros((), dt_) * jax.random.uniform(
        jax.random.fold_in(key, 2**30), (), dt_)
    S_init = jnp.full((n_cols,), fixed["S0"], dt_) + vary
    zeros = S_init * 0.0
    v_init = zeros + jnp.maximum(
        jnp.asarray(fixed.get("h_v0", model.v0), dt_), 0.0)
    up = barrier_type.startswith("up")
    crossed0 = (S_init >= fixed["barrier"]) if up else \
        (S_init <= fixed["barrier"])
    carry0 = (S_init, zeros, zeros, S_init, S_init,
              crossed0 if payoff == "barrier" else zeros > 1.0, v_init)

    def step(carry, xs):
        S, rsum, rlog, rmax, rmin, crossed, v = carry
        k_idx, L_row = xs
        x = log_(S) - (log_(fixed["S0"]) + mu * (k_idx.astype(dt_) * dt))
        L = _interp_row(L_row, (x - x0) / dx, n_bins)
        zk = jax.random.fold_in(key, k_idx)
        k2, kp = jax.random.split(zk)
        z2 = jax.random.normal(k2, (n_paths,), dt_)
        zp = jax.random.normal(kp, (n_paths,), dt_)
        if antithetic:
            z2 = jnp.concatenate([z2, -z2])
            zp = jnp.concatenate([zp, -zp])
        S_new, v_new = _advance_particles(
            S, v, L, z2, zp, mu=mu, kappa=kappa, theta_v=theta_v, xi=xi,
            rho=rho, rho_perp=rho_perp, dt=dt, sqrt_dt=sqrt_dt,
            exp_=exp_, dt_=dt_, scheme=model.scheme)
        if payoff == "asian":
            rsum = rsum + S_new
            if average_type == "geometric":
                rlog = rlog + log_(S_new)
        if payoff == "lookback":
            rmax = jnp.maximum(rmax, S_new)
            rmin = jnp.minimum(rmin, S_new)
        if payoff == "barrier":
            hit = (S_new >= fixed["barrier"]) if up else \
                (S_new <= fixed["barrier"])
            crossed = jnp.logical_or(crossed, hit)
        return (S_new, rsum, rlog, rmax, rmin, crossed, v_new), None

    carry, _ = jax.lax.scan(step, carry0,
                            (jnp.arange(n_steps), model.leverage))
    pay = _terminal_payoff(
        payoff, carry[:6], K=fixed["K"], kind=kind, n_steps=n_steps,
        barrier_type=barrier_type, rebate=fixed["rebate"],
        average_type=average_type, strike_type=strike_type,
        payout=fixed["payout"])
    return pay, carry[0]


def lsv_path_matrix(model: LSVModel, *, n_paths: int = 100_000,
                    T: Optional[float] = None, antithetic: bool = True,
                    seed: Optional[int] = None, dtype=None):
    """(S, v) path matrices under the calibrated LSV dynamics.

    Returns ``(S_paths, v_paths)``, each with the reference paths
    contract (``/root/reference/src/optpricer/processes.py:3-5``): shape
    ``(n_use + 1, n_paths_eff)`` including the t=0 row, antithetic
    doubling the columns. The time grid is the leverage table's own
    (``dt = model.T / model.n_steps``); ``T`` (default ``model.T``) may
    be any earlier point ON that grid — the first ``n_use = T/dt``
    leverage rows drive the steps, so a table calibrated to the longest
    expiry prices shorter-dated contracts too.

    The stepping is :func:`_advance_particles` — exactly the scheme the
    table was calibrated under — so Gyöngy repricing consistency carries
    over. Unlike the fused pricer (:func:`_lsv_paths`, O(1) carry) this
    necessarily materialises the whole matrix: its consumer is the
    American LSMC (``american_mc.lsmc_price(lsv=...)``), whose per-date
    regressions need the full (S, v) state at every exercise date.
    """
    dt_ = canonical(dtype)
    key = jax.random.key(resolve_seed(seed))
    n_steps = model.n_steps
    dt = model.T / n_steps
    T = model.T if T is None else float(T)
    n_use = int(round(T / dt))
    if not (0 < n_use <= n_steps) or abs(n_use * dt - T) > 1e-9 * model.T:
        raise ValueError(
            f"T={T} must be a positive multiple of the leverage grid "
            f"step {dt} (model.T={model.T}, n_steps={n_steps})")
    dt = jnp.asarray(dt, dt_)
    sqrt_dt = jnp.sqrt(dt)
    exp_, log_ = _exp_for(dt_), _log_for(dt_)
    n_bins = model.leverage.shape[1]
    x0 = jnp.asarray(model.x_bins[0], dt_)
    dx = jnp.asarray(model.x_bins[1] - model.x_bins[0], dt_)
    mu = jnp.asarray(model.r - model.q, dt_)
    rho = jnp.asarray(model.rho, dt_)
    rho_perp = jnp.sqrt(jnp.maximum(0.0, 1.0 - rho * rho))
    kappa = jnp.asarray(model.kappa, dt_)
    theta_v = jnp.asarray(model.theta, dt_)
    xi = jnp.asarray(model.xi, dt_)
    S0 = jnp.asarray(model.S0, dt_)
    n_cols = 2 * n_paths if antithetic else n_paths

    S_init = jnp.full((n_cols,), S0, dt_)
    v_init = jnp.full((n_cols,), jnp.maximum(model.v0, 0.0), dt_)

    def step(carry, xs):
        S, v = carry
        k_idx, L_row = xs
        x = log_(S) - (log_(S0) + mu * (k_idx.astype(dt_) * dt))
        L = _interp_row(jnp.asarray(L_row, dt_), (x - x0) / dx, n_bins)
        zk = jax.random.fold_in(key, k_idx)
        k2, kp = jax.random.split(zk)
        z2 = jax.random.normal(k2, (n_paths,), dt_)
        zp = jax.random.normal(kp, (n_paths,), dt_)
        if antithetic:
            z2 = jnp.concatenate([z2, -z2])
            zp = jnp.concatenate([zp, -zp])
        S_new, v_new = _advance_particles(
            S, v, L, z2, zp, mu=mu, kappa=kappa, theta_v=theta_v, xi=xi,
            rho=rho, rho_perp=rho_perp, dt=dt, sqrt_dt=sqrt_dt,
            exp_=exp_, dt_=dt_, scheme=model.scheme)
        return (S_new, v_new), (S_new, v_new)

    _, (S_rows, v_rows) = jax.lax.scan(
        step, (S_init, v_init),
        (jnp.arange(n_use), model.leverage[:n_use]))
    S_paths = jnp.concatenate([S_init[None, :], S_rows], axis=0)
    v_paths = jnp.concatenate([v_init[None, :], v_rows], axis=0)
    return S_paths, v_paths


def _leverage_poly(model: LSVModel, deg: int = 12):
    """Per-step monomial coefficients (DESCENDING, for Horner) of the
    leverage rows on u = x/x_width ∈ [−1, 1].

    Chebyshev least squares on the bin grid, converted to monomial form —
    the Pallas kernel evaluates L as ``deg`` fused multiply-adds on lanes
    instead of gathering from the table. Degree 12 reproduces smooth
    particle-calibrated rows to ~1e-3 relative; the kernel-vs-XLA price
    parity gate in tests/test_lsv.py is the end-to-end check.
    """
    x_bins = np.asarray(model.x_bins, np.float64)
    x_width = float(max(abs(x_bins[0]), abs(x_bins[-1])))
    u = x_bins / x_width
    lev = np.asarray(model.leverage, np.float64)
    deg = int(min(deg, len(u) - 1))
    C = np.polynomial.chebyshev.chebfit(u, lev.T, deg)  # (deg+1, n_steps)
    coeffs = np.stack([np.polynomial.chebyshev.cheb2poly(C[:, k])[::-1]
                       for k in range(lev.shape[0])])
    return coeffs.astype(np.float32), x_width


def lsv_price_mc(payoff: str, model: LSVModel, K: float, *,
                 kind: str = "call", n_paths: int = 100_000,
                 barrier: float = 0.0, barrier_type: str = "up-and-out",
                 rebate: float = 0.0, average_type: str = "arithmetic",
                 strike_type: str = "fixed", payout: float = 1.0,
                 antithetic: bool = True, seed: Optional[int] = None,
                 dtype=None, mesh=None, backend: str = "auto"):
    """Price a (path-dependent) option under the calibrated LSV model.

    ``payoff`` in {"vanilla", "barrier", "asian", "digital", "lookback"}
    with the same conventions as
    :func:`~optpricer_tpu.models.mc_fused.exotic_price_mc`. The pricing
    run uses fresh seeds against the FROZEN leverage table (the standard
    two-stage particle workflow: calibrate once, reuse for every strike/
    payoff). Time discretisation is fixed by the table
    (``model.n_steps``). With ``mesh`` paths shard across devices and
    the stats ride one psum.

    ``backend``: "auto" runs the in-register Pallas path kernel on TPU
    for f32 even-step models (leverage rows polynomial-compressed, see
    :func:`_leverage_poly`; single terminal-spot CV) and the fused XLA
    scan otherwise; "pallas"/"xla" force the choice.

    Returns ``(price, stderr)``.
    """
    if payoff not in ("vanilla", "barrier", "asian", "digital", "lookback"):
        raise ValueError(f"unknown payoff {payoff!r}")
    if kind not in ("call", "put"):
        raise ValueError("kind must be 'call' or 'put'")
    if backend not in ("auto", "pallas", "xla"):
        raise ValueError(f"unknown backend {backend!r}")
    dt_ = canonical(dtype)
    key = jax.random.key(resolve_seed(seed))
    n_steps = model.n_steps

    kernel_ok = n_steps % 2 == 0 and dt_ == jnp.float32
    if backend == "pallas" and not kernel_ok:
        raise ValueError("backend='pallas' requires even n_steps and f32")
    if kernel_ok and (backend == "pallas" or
                      (backend == "auto"
                       and jax.default_backend() == "tpu")):
        from ..ops.pallas_path_mc import (path_mc_sumstats_pallas,
                                          path_mc_sumstats_pallas_sharded)

        from .mc_fused import _estimate_from_stats

        coeffs, x_width = _leverage_poly(model)
        lsv_kw = dict(model.heston, coeffs=coeffs, x_width=x_width,
                      scheme=model.scheme)
        pk = dict(payoff=payoff, antithetic=bool(antithetic),
                  barrier=barrier, barrier_type=barrier_type,
                  rebate=rebate, average_type=average_type,
                  strike_type=strike_type, payout=payout, lsv=lsv_kw)
        seed_val = resolve_seed(seed)
        call_args = (seed_val, int(n_paths), int(n_steps), model.S0, K,
                     model.T, model.r, model.q, 0.0, kind == "call")
        if mesh is not None:
            stats = path_mc_sumstats_pallas_sharded(mesh, *call_args, **pk)
        else:
            stats = path_mc_sumstats_pallas(
                *call_args, interpret=jax.default_backend() != "tpu", **pk)
        return _estimate_from_stats(stats, model.S0, K, model.T, model.r,
                                    model.q, 0.0, kind == "call", "lsv",
                                    True)
    fixed = dict(
        S0=jnp.asarray(model.S0, dt_), K=jnp.asarray(K, dt_),
        T=jnp.asarray(model.T, dt_), r=jnp.asarray(model.r, dt_),
        q=jnp.asarray(model.q, dt_), barrier=jnp.asarray(barrier, dt_),
        rebate=jnp.asarray(rebate, dt_), payout=jnp.asarray(payout, dt_))
    static = dict(payoff=payoff, kind=kind, n_steps=n_steps,
                  antithetic=bool(antithetic), barrier_type=barrier_type,
                  average_type=average_type, strike_type=strike_type,
                  dtype=dt_)
    if mesh is None:
        pay, _ = _lsv_paths(key, model, fixed, n_paths=int(n_paths),
                            **static)
        return _price_from_payoff(pay, model.r, model.T)

    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import mesh_axes

    axis = mesh_axes(mesh)
    n_dev = int(mesh.devices.size)
    n_local = -(-int(n_paths) // n_dev)

    @partial(jax.shard_map, mesh=mesh, in_specs=P(axis), out_specs=P())
    def shard_fn(dev_ids):
        local_key = jax.random.fold_in(key, dev_ids[0])
        pay, _ = _lsv_paths(local_key, model, fixed, n_paths=n_local,
                            **static)
        X = _exp_for(dt_)(-fixed["r"] * fixed["T"]) * pay
        stats = jnp.stack([jnp.asarray(X.size, X.dtype),
                           jnp.sum(X), jnp.sum(X * X)])
        return jax.lax.psum(stats, axis)

    s = np.asarray(jax.device_get(shard_fn(jnp.arange(n_dev))), np.float64)
    m = s[1] / s[0]
    var = max(0.0, s[2] / s[0] - m * m)
    return float(m), float(np.sqrt(var / s[0]))


def lsv_greeks_mc(payoff: str, model: LSVModel, K: float, *,
                  kind: str = "call", n_paths: int = 100_000,
                  average_type: str = "arithmetic",
                  strike_type: str = "fixed", antithetic: bool = True,
                  seed: Optional[int] = None, dtype=None,
                  mesh=None) -> dict:
    """Pathwise-AD Greeks under the calibrated LSV model.

    One ``jax.jacfwd`` through the fused LSV scan (the same design as
    :func:`~optpricer_tpu.models.mc_fused.exotic_greeks_mc`'s non-GBM
    branch) gives per-path derivatives of the discounted payoff w.r.t.
    (S0, r, T) and the Heston parameters (v0, kappa, theta, xi, rho) —
    keys ``delta``/``rho``/``theta``/``d_v0``/``d_kappa``/``d_theta``/
    ``d_xi``/``d_rho``, each with a ``*_stderr``. These are
    **sticky-leverage** Greeks: the particle-calibrated leverage table is
    FROZEN while the parameters move — the desk convention for a model
    recalibrated daily (the leverage function absorbs the smile; bumping
    it too would double-count the vol surface's own dynamics).

    Continuous payoffs only (vanilla/asian/lookback): pathwise
    differentiation is invalid across the barrier/digital discontinuity —
    use CRN bump-and-reprice there. ``mesh=`` shards paths with one psum
    of the [n, Σcols, Σcols²] moment block.
    """
    if payoff not in ("vanilla", "asian", "lookback"):
        raise ValueError(
            "pathwise AD Greeks need a continuous payoff (one of "
            "('vanilla', 'asian', 'lookback')); barrier/digital under LSV "
            "require bump-and-reprice with common random numbers")
    if kind not in ("call", "put"):
        raise ValueError("kind must be 'call' or 'put'")
    if model.scheme != "euler":
        raise ValueError(
            "lsv_greeks_mc requires a scheme='euler' model: the QE "
            "variance transition has a point mass at zero, so pathwise "
            "AD is invalid across it — use CRN bump-and-reprice on the "
            "QE model instead")
    dt_ = canonical(dtype)
    key = jax.random.key(resolve_seed(seed))
    n_steps = model.n_steps
    exp_ = _exp_for(dt_)

    base = dict(
        K=jnp.asarray(K, dt_), q=jnp.asarray(model.q, dt_),
        barrier=jnp.asarray(0.0, dt_), rebate=jnp.asarray(0.0, dt_),
        payout=jnp.asarray(1.0, dt_))
    names = (("delta", "S0"), ("rho", "r"), ("theta", "T"),
             ("d_v0", "h_v0"), ("d_kappa", "h_kappa"),
             ("d_theta", "h_theta"), ("d_xi", "h_xi"),
             ("d_rho", "h_rho"))
    vals = dict(S0=model.S0, r=model.r, T=model.T, h_v0=model.v0,
                h_kappa=model.kappa, h_theta=model.theta, h_xi=model.xi,
                h_rho=model.rho)
    keys_ = [k for _, k in names]
    theta0 = jnp.stack([jnp.asarray(vals[k], dt_) for k in keys_])
    static = dict(payoff=payoff, kind=kind, n_steps=n_steps,
                  antithetic=bool(antithetic), barrier_type="up-and-out",
                  average_type=average_type, strike_type=strike_type,
                  dtype=dt_)

    def _path_X(th, local_key, n_local):
        f2 = dict(base)
        for i, k in enumerate(keys_):
            f2[k] = th[i]
        pay, _ = _lsv_paths(local_key, model, f2, n_paths=n_local, **static)
        return exp_(-f2["r"] * f2["T"]) * pay

    def _local_sums(local_key, n_local):
        X = _path_X(theta0, local_key, n_local)
        J = jax.jacfwd(lambda th: _path_X(th, local_key, n_local))(theta0)
        cols = jnp.concatenate([X[:, None], J], axis=1)
        return jnp.concatenate([
            jnp.asarray(X.shape[0], dt_)[None],
            jnp.sum(cols, axis=0), jnp.sum(cols * cols, axis=0)])

    if mesh is None:
        sums = _local_sums(key, int(n_paths))
    else:
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import mesh_axes

        axis = mesh_axes(mesh)
        n_dev = int(mesh.devices.size)
        n_local = -(-int(n_paths) // n_dev)

        @partial(jax.shard_map, mesh=mesh, in_specs=P(axis), out_specs=P())
        def shard_fn(dev_ids):
            local_key = jax.random.fold_in(key, dev_ids[0])
            return jax.lax.psum(_local_sums(local_key, n_local), axis)

        sums = shard_fn(jnp.arange(n_dev))

    s = np.asarray(jax.device_get(sums), np.float64)
    k = len(names)
    n, mean, sq = s[0], s[1:2 + k] / s[0], s[2 + k:] / s[0]
    se = np.sqrt(np.maximum(0.0, sq - mean * mean) / n)
    out = {"price": float(mean[0]), "stderr": float(se[0])}
    for i, (nm, _) in enumerate(names):
        sgn = -1.0 if nm == "theta" else 1.0     # theta = -dV/dT
        out[nm] = float(sgn * mean[1 + i])
        out[f"{nm}_stderr"] = float(se[1 + i])
    return out
