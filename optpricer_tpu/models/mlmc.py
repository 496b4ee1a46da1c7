"""Multilevel Monte Carlo (Giles 2008) for path-dependent options.

The fused engines (``mc_fused``) price at a FIXED time grid — their
estimates carry the grid's discretisation/monitoring bias (Asian averages
over n_steps dates, barriers checked at n_steps dates, Euler transition
bias under Heston). MLMC estimates the CONTINUOUS-monitoring / exact-
transition limit at a target RMSE ``eps`` for a cost of O(eps^-2 log²)
instead of the O(eps^-3) a single fine grid needs: the telescoping sum

    E[P_L] = E[P_0] + sum_l E[P_l − P_{l−1}]

prices each correction level on COUPLED fine/coarse paths driven by the
same Brownian increments (the coarse step consumes the sum of its M fine
sub-increments), so Var[P_l − P_{l−1}] decays with level and nearly all
samples run on the cheap coarse grids.

The reference has no MLMC (its MC is single-grid,
``/root/reference/src/optpricer/monte_carlo.py:11-64``, and its exotics
price at the paths' own grid, ``exotics.py:33-96``); this module extends
the framework toward continuously-monitored contracts from the MC side,
complementing the PDE side's in-operator barriers
(``pde.fd_price_barrier(barrier_mode="operator")``).

TPU-native design:
- one jitted scan per level over the COARSE steps with the M fine
  substeps unrolled inside (M static, small); both tracks ride one
  carry, so the coupled pair costs one pass over the fine grid;
- the adaptive Giles loop runs on the host but only ever launches
  fixed-shape chunks (compile count = number of levels, not number of
  iterations), accumulating per-level sufficient statistics exactly —
  the same associative-reduction contract as every other engine here;
- per-(level, chunk) RNG streams from ``fold_in``, placement-invariant.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..dtypes import canonical
from .mc_fused import _exp_for, _sqrt0, _terminal_payoff
from .monte_carlo import resolve_seed

__all__ = ["mlmc_price"]


def _level_y(key, fixed, *, payoff, kind, model_kind, n_coarse,
             M, n_paths, antithetic, barrier_type, average_type,
             strike_type, dtype, level0, sigma_loc=None,
             scheme="euler"):
    """Per-path level estimator Y of one MLMC level from one chunk.

    Level l>0 (``level0=False``): coupled estimator Y = df·(P_f − P_c),
    fine grid n_coarse·M steps / coarse grid n_coarse steps, coarse
    normals = scaled sums of the fine ones. Level 0: Y = df·P_f on the
    n_coarse(=n0) grid, no coarse track. Traceable in every ``fixed``
    entry — pathwise MLMC Greeks forward-differentiate through it.

    ``model_kind="localvol"``: traceable ``sigma_loc(S, t)`` dynamics
    under log-Euler or (``scheme="milstein"``) explicit Milstein — the
    scalar-SDE case needs no Lévy areas, so the coarse track runs the
    SAME scheme on the aggregated increments and Giles' O(h²)
    strong-coupling variance applies (Giles 2008 §4).
    """
    dt_ = dtype
    n_f = n_coarse * (M if not level0 else 1)
    dt_f = fixed["T"] / n_f
    dt_c = fixed["T"] / n_coarse
    sqrt_f = jnp.sqrt(dt_f)
    sqrt_c = jnp.sqrt(dt_c)
    n_cols = 2 * n_paths if antithetic else n_paths
    exp_ = _exp_for(dt_)
    sub = 1 if level0 else M

    up = barrier_type.startswith("up")

    def hit(S):
        return (S >= fixed["barrier"]) if up else (S <= fixed["barrier"])

    # Derive the initial carry from the key so its varying-axes type
    # matches the per-step draws inside shard_map (scan requires carry
    # agreement; same device-varyance trick as lsv._lsv_paths).
    vary = jnp.zeros((), dt_) * jax.random.uniform(
        jax.random.fold_in(key, 2**30), (), dt_)
    S_init = jnp.full((n_cols,), fixed["S0"], dt_) + vary
    zeros = S_init * 0.0
    # barrier slot carries the Brownian-bridge SURVIVAL probability (the
    # standard MLMC treatment, Giles 2008 §5: the binary grid-crossing
    # flag couples O(√h) with a large constant; conditioning each step
    # on its bridge crossing probability restores O(h) weak error and
    # keeps the payoff smooth in the path, so corrections stay small)
    surv0 = jnp.where(hit(S_init), 0.0, 1.0) if payoff == "barrier" \
        else zeros > 1.0
    v_init = zeros + jnp.maximum(fixed["h_v0"], 0.0)

    def track0():
        # (S, run_sum, run_logsum, run_max, run_min, surv, v)
        return (S_init, zeros, zeros, S_init, S_init, surv0, v_init)

    def asset_step(S, v, z1, z2, dt, sqrt_dt, t_now):
        """One transition; returns (S_new, v_new, step diffusion vol)."""
        if model_kind == "heston":
            v_eff = jnp.maximum(v, 0.0)  # full truncation
            rho = fixed["h_rho"]
            rho_p = jnp.sqrt(jnp.maximum(0.0, 1.0 - rho * rho))
            zs = rho * z2 + rho_p * z1
            S_n = S * exp_((fixed["r"] - fixed["q"] - 0.5 * v_eff) * dt
                           + _sqrt0(v_eff) * sqrt_dt * zs)
            v_n = jnp.maximum(
                v + fixed["h_kappa"] * (fixed["h_theta"] - v_eff) * dt
                + fixed["h_xi"] * _sqrt0(v_eff) * sqrt_dt * z2, 0.0)
            return S_n, v_n, jnp.maximum(_sqrt0(v_eff), 1e-8)
        if model_kind == "localvol":
            mu_dt = (fixed["r"] - fixed["q"]) * dt
            if scheme == "milstein":
                # explicit Milstein, σ′ from the same central dS-bump as
                # mc_fused._fused_paths' lv_milstein_step
                sig = jnp.clip(jnp.asarray(sigma_loc(S, t_now), dt_),
                               1e-8, 10.0)
                eps = fixed["bump"] * S
                S_up = S + eps
                S_dn = jnp.maximum(S - eps, 1e-10)
                sig_up = jnp.asarray(sigma_loc(S_up, t_now), dt_)
                sig_dn = jnp.asarray(sigma_loc(S_dn, t_now), dt_)
                da_dS = (sig_up * S_up - sig_dn * S_dn) / (S_up - S_dn)
                a_t = sig * S
                S_n = (S + mu_dt * S + a_t * sqrt_dt * z1
                       + 0.5 * a_t * da_dS * (z1 * z1 - 1.0) * dt)
                return jnp.maximum(S_n, 1e-10), v, sig
            sig = jnp.clip(jnp.asarray(sigma_loc(S, t_now), dt_),
                           0.0, jnp.inf)
            return (S * exp_(mu_dt - 0.5 * sig * sig * dt
                             + sig * sqrt_dt * z1), v,
                    jnp.maximum(sig, 1e-8))
        mu = (fixed["r"] - fixed["q"] - 0.5 * fixed["sigma"] ** 2) * dt
        return (S * exp_(mu + fixed["sigma"] * sqrt_dt * z1), v,
                fixed["sigma"])

    from .mc_fused import _log_for
    log_ = _log_for(dt_)

    def _log_safe(S):
        return log_(jnp.maximum(S, 1e-30))

    def bridge_survive(S_prev, S_new, sig, dt):
        """P(log-linear bridge from S_prev to S_new stays inside)."""
        b = _log_safe(fixed["barrier"])
        xp, xn = _log_safe(S_prev), _log_safe(S_new)
        dp = (b - xp) if up else (xp - b)
        dn = (b - xn) if up else (xn - b)
        inside = (dp > 0.0) & (dn > 0.0)
        # clamp: exp32 is only valid for |x| ≲ 85, and exp(−80) ≈ 0
        # already means certain survival for this step
        expo = jnp.maximum(-2.0 * jnp.maximum(dp, 0.0)
                           * jnp.maximum(dn, 0.0) / (sig * sig * dt),
                           -80.0)
        p = 1.0 - exp_(expo)
        return jnp.where(inside, jnp.maximum(p, 0.0), 0.0)

    def accumulate(track, S_n, v_n, sig, dt):
        S_prev, rsum, rlog, rmax, rmin, surv, _ = track
        if payoff == "asian":
            rsum = rsum + S_n
            if average_type == "geometric":
                rlog = rlog + _log_safe(S_n)
        if payoff == "lookback":
            rmax = jnp.maximum(rmax, S_n)
            rmin = jnp.minimum(rmin, S_n)
        if payoff == "barrier":
            surv = surv * bridge_survive(S_prev, S_n, sig, dt)
        return (S_n, rsum, rlog, rmax, rmin, surv, v_n)

    def draw(k_idx):
        zk = jax.random.fold_in(key, k_idx)
        k1, k2 = jax.random.split(zk)
        z1 = jax.random.normal(k1, (n_paths,), dt_)
        z2 = jax.random.normal(k2, (n_paths,), dt_)
        if antithetic:
            z1 = jnp.concatenate([z1, -z1])
            z2 = jnp.concatenate([z2, -z2])
        return z1, z2

    def step(carry, t_idx):
        fine, coarse = carry
        z1_sum = zeros
        z2_sum = zeros
        for j in range(sub):
            z1, z2 = draw(t_idx * sub + j)
            t_j = (t_idx * sub + j).astype(dt_) * dt_f
            S_n, v_n, sig = asset_step(fine[0], fine[6], z1, z2,
                                       dt_f, sqrt_f, t_j)
            fine = accumulate(fine, S_n, v_n, sig, dt_f)
            z1_sum = z1_sum + z1
            z2_sum = z2_sum + z2
        if not level0:
            inv = 1.0 / np.sqrt(M)
            S_n, v_n, sig = asset_step(coarse[0], coarse[6],
                                       z1_sum * inv, z2_sum * inv,
                                       dt_c, sqrt_c,
                                       t_idx.astype(dt_) * dt_c)
            coarse = accumulate(coarse, S_n, v_n, sig, dt_c)
        return (fine, coarse), None

    (fine, coarse), _ = jax.lax.scan(
        step, (track0(), track0()), jnp.arange(n_coarse))

    pay_kw = dict(K=fixed["K"], kind=kind, barrier_type=barrier_type,
                  rebate=fixed["rebate"], average_type=average_type,
                  strike_type=strike_type, payout=fixed["payout"])

    def payoff_of(track, n_steps_t):
        if payoff == "barrier":
            surv = track[5]
            van = _terminal_payoff("vanilla", track[:6],
                                   n_steps=n_steps_t, **pay_kw)
            if barrier_type.endswith("out"):
                return surv * van + (1.0 - surv) * fixed["rebate"]
            return (1.0 - surv) * van + surv * fixed["rebate"]
        return _terminal_payoff(payoff, track[:6], n_steps=n_steps_t,
                                **pay_kw)

    df = exp_(-fixed["r"] * fixed["T"])
    p_f = df * payoff_of(fine, n_f)
    return p_f if level0 else p_f - df * payoff_of(coarse, n_coarse)


@partial(jax.jit, static_argnames=(
    "payoff", "kind", "model_kind", "n_coarse", "M", "n_paths",
    "antithetic", "barrier_type", "average_type", "strike_type",
    "dtype", "level0", "sigma_loc", "scheme", "greek_params"))
def _mlmc_level_stats(key, fixed, *, greek_params=(), **static):
    """Sufficient statistics of one MLMC level from one path chunk.

    Returns ``[n, ΣY, ΣY²]``, extended to
    ``[n, ΣY, ΣY², Σ∂Y/∂θ₁, Σ(∂Y/∂θ₁)², ...]`` when ``greek_params``
    names entries of ``fixed`` to differentiate against: ONE primal
    pass through :func:`_level_y` via :func:`jax.linearize`, then one
    cheap replay of the linearised scan per parameter (forward mode —
    the per-level Greek corrections telescope exactly like the price,
    Burgos & Giles 2012). The bridge-survival barrier weighting keeps
    even barrier payoffs pathwise-smooth; only digital's indicator
    payoff is excluded (guarded at :func:`mlmc_price`).
    """
    dt_ = static["dtype"]
    if not greek_params:
        y = _level_y(key, fixed, **static)
        n = jnp.asarray(y.size, dt_)
        return jnp.stack([n, jnp.sum(y), jnp.sum(y * y)])

    def y_of(theta):
        f = dict(fixed)
        f.update(dict(zip(greek_params, theta)))
        return _level_y(key, f, **static)

    theta0 = [fixed[p] for p in greek_params]
    y, lin = jax.linearize(y_of, theta0)
    parts = [jnp.asarray(y.size, dt_), jnp.sum(y), jnp.sum(y * y)]
    one = jnp.ones((), dt_)
    zero = jnp.zeros((), dt_)
    for i in range(len(greek_params)):
        dy = lin([one if j == i else zero
                  for j in range(len(greek_params))])
        parts += [jnp.sum(dy), jnp.sum(dy * dy)]
    return jnp.stack(parts)


def _mlmc_level_stats_sharded(mesh, key, fixed, *, n_paths, **static):
    """One level chunk sharded over a mesh: each device runs its own
    ``n_paths // n_dev``-path slice of the chunk on a ``fold_in``-derived
    stream and the 5-stat vector rides one psum over all mesh axes —
    the same exact-aggregation contract as every other mesh engine."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import mesh_axes

    axis = mesh_axes(mesh)
    n_dev = int(mesh.devices.size)
    n_local = -(-int(n_paths) // n_dev)

    @partial(jax.shard_map, mesh=mesh, in_specs=P(axis), out_specs=P())
    def shard_fn(dev_ids):
        local_key = jax.random.fold_in(key, dev_ids[0])
        s = _mlmc_level_stats(local_key, fixed, n_paths=n_local, **static)
        return jax.lax.psum(s, axis)

    return shard_fn(jnp.arange(n_dev))


def mlmc_price(payoff: str, S0: float, K: float, T: float, r: float,
               q: float = 0.0, *, sigma: Optional[float] = None,
               heston: Optional[dict] = None, sigma_loc=None,
               scheme: str = "euler", dS_bump: float = 0.01,
               kind: str = "call",
               eps: float = 0.01, n0_steps: int = 8, M: int = 2,
               L_min: int = 2, L_max: int = 7, n_init: int = 4_096,
               chunk: int = 16_384, max_paths_per_level: int = 1 << 22,
               barrier: float = 0.0, barrier_type: str = "up-and-out",
               rebate: float = 0.0, average_type: str = "arithmetic",
               strike_type: str = "fixed", payout: float = 1.0,
               antithetic: bool = True, seed: Optional[int] = None,
               dtype=None, return_info: bool = False, mesh=None,
               greeks: bool = False):
    """Adaptive MLMC price of a (path-dependent) option.

    ``payoff`` ∈ {"vanilla", "barrier", "asian", "digital", "lookback"}
    with :func:`~optpricer_tpu.models.mc_fused.exotic_price_mc`'s payoff
    conventions, except that the time grid is not an input: levels
    refine it (level l monitors at ``n0_steps·M^l`` dates) and the
    estimator targets the l→∞ limit — continuous monitoring / the exact
    Heston transition — at root-mean-square error ``eps``.

    Dynamics: constant ``sigma`` (exact GBM transition at every level —
    only the monitoring bias telescopes),
    ``heston={'v0','kappa','theta','xi','rho'}`` (full-truncation Euler,
    whose O(Δt) transition bias telescopes too; same discretisation as
    :func:`~optpricer_tpu.models.processes.heston_paths`), or a
    traceable ``sigma_loc(S, t)`` local-vol callable (e.g. from
    :func:`~optpricer_tpu.models.calibration.dupire_local_vol_func`).
    Local vol accepts ``scheme="euler"`` (log-Euler, as
    :func:`~optpricer_tpu.models.processes.local_vol_paths`) or
    ``"milstein"`` (explicit Milstein with a central ``dS_bump``·S σ′
    stencil, as :func:`~optpricer_tpu.models.processes.milstein_local_vol_paths`)
    — Milstein's O(h) strong order makes the level-correction variance
    decay O(h²) (Giles 2008), so nearly all work stays on coarse grids.

    The standard Giles loop: sample ``n_init`` pairs on levels
    0..``L_min``, allocate N_l ∝ √(V_l/C_l) for the ``eps²/2`` variance
    budget, extend L while the remaining weak error (estimated from the
    last correction mean) exceeds ``eps/√2``, capping at ``L_max``
    levels and ``max_paths_per_level`` paths. Chunked fixed-shape
    launches keep the compile count at one per level.

    Returns ``(price, stderr)`` — stderr is the statistical error only;
    the weak (bias) remainder is driven below ``eps/√2`` separately and
    reported in ``info`` with ``return_info=True`` alongside the
    per-level table (n_l, mean_l, V_l, cost_l).

    With ``mesh`` (any-rank ``jax.sharding.Mesh``) every chunk launch
    splits its paths across the devices (per-device streams from
    ``fold_in``) and the 5-stat vector rides one psum — the adaptive
    loop is unchanged, it just consumes device-parallel chunks.

    ``greeks=True`` returns ``(price, stderr, greeks)`` (or
    ``(price, stderr, greeks, info)`` with ``return_info``): pathwise
    sensitivities of the SAME telescoped estimator — each level's
    correction is forward-differentiated alongside its price (Burgos &
    Giles 2012), so the Greeks inherit MLMC's continuous-monitoring
    limit and the per-level chunks are shared (one primal pass plus one
    linearised replay per parameter). Parameters by dynamics: GBM →
    delta/vega/rho, Heston → delta/rho/d_v0, local vol → delta/rho
    (each with a ``*_stderr``). The digital payoff's indicator has no
    pathwise derivative and raises; barriers are smooth here because
    the estimator carries bridge-survival PROBABILITIES, not crossing
    indicators.
    """
    if payoff not in ("vanilla", "barrier", "asian", "digital",
                      "lookback"):
        raise ValueError(f"unknown payoff {payoff!r}")
    if kind not in ("call", "put"):
        raise ValueError("kind must be 'call' or 'put'")
    if barrier_type not in ("up-and-out", "up-and-in", "down-and-out",
                            "down-and-in"):
        raise ValueError(f"unknown barrier_type {barrier_type!r}")
    if average_type not in ("arithmetic", "geometric"):
        raise ValueError(f"unknown average_type {average_type!r}")
    if strike_type not in ("fixed", "floating"):
        raise ValueError(f"unknown strike_type {strike_type!r}")
    if sum(x is not None for x in (sigma, heston, sigma_loc)) != 1:
        raise ValueError(
            "provide exactly one of sigma / heston / sigma_loc")
    if heston is not None:
        missing = {"v0", "kappa", "theta", "xi", "rho"} - set(heston)
        if missing:
            raise ValueError(f"heston= missing keys {sorted(missing)}")
    if scheme not in ("euler", "milstein"):
        raise ValueError(f"unknown scheme {scheme!r}")
    if scheme == "milstein" and sigma_loc is None:
        raise ValueError("scheme='milstein' requires sigma_loc=")
    if M < 2:
        raise ValueError("M must be >= 2")
    if not 0 <= L_min <= L_max:
        raise ValueError("need 0 <= L_min <= L_max")
    dt_ = canonical(dtype)
    key = jax.random.key(resolve_seed(seed))
    model_kind = ("heston" if heston is not None else
                  "localvol" if sigma_loc is not None else "gbm")
    hp = heston or {}
    fixed = {k: jnp.asarray(v, dt_) for k, v in (
        ("S0", S0), ("K", K), ("T", T), ("r", r), ("q", q),
        ("sigma", sigma if sigma is not None else 0.0),
        ("barrier", barrier), ("rebate", rebate), ("payout", payout),
        ("bump", dS_bump),
        ("h_v0", hp.get("v0", 0.0)), ("h_kappa", hp.get("kappa", 0.0)),
        ("h_theta", hp.get("theta", 0.0)), ("h_xi", hp.get("xi", 0.0)),
        ("h_rho", hp.get("rho", 0.0)))}
    greek_names: tuple = ()
    greek_params: tuple = ()
    if greeks:
        if payoff == "digital":
            raise ValueError(
                "greeks=True needs a pathwise-differentiable payoff; "
                "the digital indicator has none (use CRN bump-and-"
                "reprice around mlmc_price)")
        greek_names, greek_params = {
            "gbm": (("delta", "vega", "rho"), ("S0", "sigma", "r")),
            "heston": (("delta", "rho", "d_v0"), ("S0", "r", "h_v0")),
            "localvol": (("delta", "rho"), ("S0", "r")),
        }[model_kind]
    static = dict(payoff=payoff, kind=kind, model_kind=model_kind,
                  M=int(M), antithetic=bool(antithetic),
                  barrier_type=barrier_type, average_type=average_type,
                  strike_type=strike_type, dtype=dt_,
                  sigma_loc=sigma_loc, scheme=scheme,
                  greek_params=greek_params)
    chunk = int(chunk)
    pair_mult = 2 if antithetic else 1
    n_stats = 3 + 2 * len(greek_params)

    # per-level accumulators (host float64):
    # [n, Σy, Σy², (Σ∂y, Σ(∂y)²) per greek param]
    acc: list[np.ndarray] = []
    chunks_run: list[int] = []

    def ensure(level: int, n_target: int):
        while len(acc) <= level:
            acc.append(np.zeros(n_stats))
            chunks_run.append(0)
        n_target = min(int(n_target), int(max_paths_per_level))
        while acc[level][0] < n_target:
            # two folds, not (level << k) | chunk: a bit-packed id would
            # alias into the next level's stream past 2^k chunks
            k = jax.random.fold_in(jax.random.fold_in(key, level),
                                   chunks_run[level])
            kw = dict(n_coarse=n0_steps * M ** max(level - 1, 0),
                      n_paths=chunk, level0=(level == 0), **static)
            s = _mlmc_level_stats(k, fixed, **kw) if mesh is None else \
                _mlmc_level_stats_sharded(mesh, k, fixed, **kw)
            acc[level] += np.asarray(jax.device_get(s), np.float64)
            chunks_run[level] += 1

    def tables():
        n = np.array([a[0] for a in acc])
        m = np.array([a[1] / a[0] for a in acc])
        v = np.maximum(np.array([a[2] / a[0] for a in acc]) - m * m, 0.0)
        return n, m, v

    L = int(L_min)
    for lev in range(L + 1):
        ensure(lev, n_init)
    while True:
        n, m, v = tables()
        # cost per pair on level l: fine + coarse step counts
        cost = np.array([n0_steps * M ** max(l - 1, 0)
                         * (1 if l == 0 else M + 1)
                         for l in range(L + 1)], np.float64)
        budget = np.sum(np.sqrt(v * cost))
        n_opt = np.ceil(2.0 * eps ** -2 * np.sqrt(v / cost) * budget)
        n_opt = np.minimum(np.maximum(n_opt, chunk * pair_mult),
                           max_paths_per_level)
        if np.any(n < n_opt):
            for lev in range(L + 1):
                ensure(lev, n_opt[lev])
            continue
        # weak-error remainder from the last correction means,
        # assuming O(M^-αl) decay with α ≥ 1 (Giles' standard test)
        if L >= 1:
            tail = max(abs(m[L]), abs(m[L - 1]) / M) / (M - 1.0)
        else:
            tail = np.inf
        if tail < eps / np.sqrt(2.0) or L >= L_max:
            break
        L += 1
        ensure(L, n_init)

    n, m, v = tables()
    price = float(np.sum(m))
    se = float(np.sqrt(np.sum(v / n)))
    out = (price, se)
    if greeks:
        gdict = {}
        for i, name in enumerate(greek_names):
            mg = np.array([a[3 + 2 * i] / a[0] for a in acc])
            vg = np.maximum(
                np.array([a[4 + 2 * i] / a[0] for a in acc]) - mg * mg,
                0.0)
            gdict[name] = float(np.sum(mg))
            gdict[name + "_stderr"] = float(np.sqrt(np.sum(vg / n)))
        out = out + (gdict,)
    if not return_info:
        return out
    info = dict(levels=L + 1, eps=eps,
                n=[int(x) for x in n], mean=list(map(float, m)),
                var=list(map(float, v)),
                cost=[n0_steps * M ** max(l - 1, 0)
                      * (1 if l == 0 else M + 1) for l in range(L + 1)],
                fine_steps=[n0_steps * M ** l for l in range(L + 1)],
                weak_remainder=float(tail if L >= 1 else np.nan))
    return out + (info,)
