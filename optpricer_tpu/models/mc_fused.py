"""Fused path-dependent Monte-Carlo pricing (production path).

The reference prices exotics by materialising a full ``(n_steps+1, n_paths)``
path matrix and handing it to a payoff evaluator (``exotics.py:4-9``). That
protocol is kept in :mod:`optpricer_tpu.models.exotics` for compatibility,
but on TPU it wastes HBM bandwidth: a 200k×500 f32 matrix is 400 MB of
traffic for what is an O(1)-state-per-path computation.

This module fuses path generation and payoff accumulation inside one
``lax.scan``: the carry holds only the per-path running state the payoff
needs (spot, running sum/log-sum, running max/min, barrier-crossed flag), so
memory is O(n_paths) regardless of n_steps, and the whole pricer is a single
compiled program. Dynamics: GBM (exact log-Euler), local vol with a traced
``sigma_loc(S, t)`` (log-Euler/Milstein), Heston (full-truncation Euler),
Merton jumps, and Dupire-from-SVI (:func:`exotic_price_mc_dupire`). On TPU
the GBM and Dupire cases drop into Pallas kernels where the whole time loop
runs in registers (``ops/pallas_path_mc.py``); a ``mesh`` argument shards
paths across devices with a psum of payoff moments.

Returns ``(price, stderr)`` with the same estimator conventions as
``exotics._price_from_payoff``.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..dtypes import canonical
from .exotics import _price_from_payoff
from .monte_carlo import resolve_seed


def _exp_for(dtype):
    """exp for the engine dtype: the TPU VPU's own f32 exp/log carry up to
    ~5e-6 relative error and ~1e-6 mean bias (log is ~3.5e-5 off at
    spot-scale arguments like 100) — fatal at the 1e-4 accuracy gates, so
    the f32 paths use the bias-free fastmath kernels everywhere."""
    if dtype == jnp.float32:
        from ..ops.fastmath import exp32

        return exp32
    return jnp.exp


def _log_for(dtype):
    if dtype == jnp.float32:
        from ..ops.fastmath import log32

        return log32
    return jnp.log

__all__ = ["exotic_price_mc", "exotic_price_mc_dupire", "exotic_greeks_mc"]


# payoffs whose pathwise delta the homogeneity argument covers (see
# exotic_greeks_mc); barrier/digital payoffs are discontinuous in S_T and
# use the likelihood-ratio estimators instead
_PATHWISE_OK = ("vanilla", "asian", "lookback")
_LR_OK = ("barrier", "digital")


@jax.custom_jvp
def _sqrt0(x):
    """sqrt with subgradient 0 at x == 0.

    Full-truncation Heston parks variance exactly at 0 with positive
    probability, and Merton draws zero jump counts; there the chain rule
    meets sqrt'(0) = ∞ against a zero tangent and pathwise AD returns
    NaN. The one-sided derivative from the truncated region is 0 — the
    standard subgradient choice (bias is second-order in dt)."""
    return jnp.sqrt(x)


@_sqrt0.defjvp
def _sqrt0_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    y = jnp.sqrt(x)
    return y, jnp.where(x > 0, 0.5 / jnp.where(y > 0, y, 1.0), 0.0) * t


_AD_PARAMS = {
    # model_kind → ((output name, fixed-dict key), ...); the first three
    # are common to every dynamics. Output names: "delta"=d/dS0,
    # "rho"=d/dr (through drift AND discount), "theta"=−d/dT; model
    # parameters keep their own names ("vega" where the parameter IS a
    # diffusion vol: GBM σ for Merton, α₀ for SABR).
    "heston": (("d_v0", "h_v0"), ("d_kappa", "h_kappa"),
               ("d_theta", "h_theta"), ("d_xi", "h_xi"),
               ("d_rho", "h_rho")),
    "sabr_ln": (("vega", "s_alpha0"), ("d_nu", "s_nu"), ("d_rho", "s_rho")),
    "sabr_cev": (("vega", "s_alpha0"), ("d_nu", "s_nu"),
                 ("d_rho", "s_rho")),
    "merton": (("vega", "sigma"), ("d_mJ", "m_mJ"), ("d_sJ", "m_sJ")),
    # VG: the gamma clock is differentiable in ν through JAX's implicit
    # reparameterisation of random.gamma, so all three parameters admit
    # pathwise AD. (NIG does NOT: the IG sampler's accept branch has a
    # parameter-dependent selection probability that pathwise AD cannot
    # see — use CRN bump-and-reprice there.)
    "vg": (("vega", "v_sigma"), ("d_theta", "v_theta"),
           ("d_nu", "v_nu")),
    "lv_euler": (), "lv_milstein": (),
    "gbm": (("vega", "sigma"),),
}


def _ad_exotic_greeks(payoff, S0, K, T, r, q, *, kind, strike_type,
                      heston=None, sabr=None, merton=None, sigma_loc=None,
                      vg=None,
                      sigma=None, scheme="milstein", n_paths=100_000,
                      n_steps=252, antithetic=True, seed=None,
                      average_type="arithmetic", barrier_type="up-and-out",
                      mesh=None, dtype=None, **_ignored) -> dict:
    """Pathwise-AD Greeks for CONTINUOUS payoffs under non-GBM dynamics.

    One forward-mode Jacobian (``jax.jacfwd``) through the fused scan
    engine gives per-path derivatives of the discounted payoff w.r.t.
    (S0, r, T) plus every differentiable model parameter — Heston
    (v0, κ, θ, ξ, ρ), SABR (α₀, ν, ρ), Merton (σ, m_J, s_J; NOT λ — the
    Poisson counts' law depends on it, so pathwise differentiation is
    invalid there) and Dupire local vol (spot/rate/maturity only). The
    per-path derivative columns yield honest stderrs, and with ``mesh=``
    the [n, ΣX, ΣX², ΣJ, ΣJ²] sums ride one psum so sharded Greek runs
    equal the single-device estimator design.

    Pathwise differentiation needs a.e.-differentiable payoffs: barrier
    and digital raise here (their GBM LR estimators live in
    :func:`exotic_greeks_mc`; elsewhere use CRN bump-and-reprice).
    """
    if payoff not in _PATHWISE_OK:
        raise ValueError(
            f"pathwise AD Greeks need a continuous payoff (one of "
            f"{_PATHWISE_OK}); {payoff!r} under non-GBM dynamics requires "
            "bump-and-reprice with common random numbers")
    import numpy as np

    dt_ = canonical(dtype)
    seed_val = resolve_seed(seed)
    key = jax.random.key(seed_val)

    if heston is not None:
        model_kind = "heston"
    elif sabr is not None:
        model_kind = "sabr_ln" if float(sabr["beta"]) == 1.0 else "sabr_cev"
    elif merton is not None:
        model_kind = "merton"
        if sigma is None:
            sigma = merton["sigma"]
    elif vg is not None:
        model_kind = "vg"
    elif sigma_loc is not None:
        model_kind = "lv_milstein" if scheme == "milstein" else "lv_euler"
    else:
        model_kind = "gbm"   # mesh'd XLA Greek runs route here too

    fixed = dict(
        S0=jnp.asarray(S0, dt_), K=jnp.asarray(K, dt_),
        T=jnp.asarray(T, dt_), r=jnp.asarray(r, dt_),
        q=jnp.asarray(q, dt_),
        sigma=jnp.asarray(0.0 if sigma is None else sigma, dt_),
        barrier=jnp.asarray(0.0, dt_), rebate=jnp.asarray(0.0, dt_),
        payout=jnp.asarray(1.0, dt_), bump=jnp.asarray(0.01, dt_),
        h_v0=jnp.asarray(heston["v0"] if heston else 0.0, dt_),
        h_kappa=jnp.asarray(heston["kappa"] if heston else 0.0, dt_),
        h_theta=jnp.asarray(heston["theta"] if heston else 0.0, dt_),
        h_xi=jnp.asarray(heston["xi"] if heston else 0.0, dt_),
        h_rho=jnp.asarray(heston["rho"] if heston else 0.0, dt_),
        m_lam=jnp.asarray(merton["lam"] if merton else 0.0, dt_),
        m_mJ=jnp.asarray(merton["mJ"] if merton else 0.0, dt_),
        m_sJ=jnp.asarray(merton["sJ"] if merton else 0.0, dt_),
        s_alpha0=jnp.asarray(sabr["alpha0"] if sabr else 0.0, dt_),
        s_beta=jnp.asarray(sabr["beta"] if sabr else 1.0, dt_),
        s_nu=jnp.asarray(sabr["nu"] if sabr else 0.0, dt_),
        s_rho=jnp.asarray(sabr["rho"] if sabr else 0.0, dt_),
        v_sigma=jnp.asarray(vg["sigma"] if vg else 0.0, dt_),
        v_theta=jnp.asarray(vg["theta"] if vg else 0.0, dt_),
        v_nu=jnp.asarray(vg["nu"] if vg else 1.0, dt_),
        n_alpha=jnp.asarray(1.0, dt_),
        n_beta=jnp.asarray(0.0, dt_),
        n_delta=jnp.asarray(0.0, dt_),
    )
    names = (("delta", "S0"), ("rho", "r"), ("theta", "T")) \
        + _AD_PARAMS[model_kind]
    keys_ = [k for _, k in names]
    theta0 = jnp.stack([fixed[k] for k in keys_])
    static = dict(payoff=payoff, kind=kind, n_steps=int(n_steps),
                  antithetic=bool(antithetic), barrier_type=barrier_type,
                  average_type=average_type, strike_type=strike_type,
                  model_kind=model_kind, sigma_loc=sigma_loc, dtype=dt_)
    exp_ = _exp_for(dt_)

    def _path_X(th, local_key, n_local):
        f2 = dict(fixed)
        for i, k in enumerate(keys_):
            f2[k] = th[i]
        pay, _ = _fused_paths(local_key, f2, n_paths=n_local, **static)
        return exp_(-f2["r"] * f2["T"]) * pay

    def _local_sums(local_key, n_local):
        X = _path_X(theta0, local_key, n_local)
        J = jax.jacfwd(lambda th: _path_X(th, local_key, n_local))(theta0)
        cols = jnp.concatenate([X[:, None], J], axis=1)   # (n, 1+k)
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
        sgn = -1.0 if nm == "theta" else 1.0     # theta = −dV/dT
        out[nm] = float(sgn * mean[1 + i])
        out[f"{nm}_stderr"] = float(se[1 + i])
    return out


def exotic_greeks_mc(payoff: str, S0, K, T, r, q=0.0, *, kind: str = "call",
                     strike_type: str = "fixed", **kwargs) -> dict:
    """Price + pathwise delta, vega, rho AND theta from ONE run.

    Under GBM every running path statistic (terminal spot, running average,
    running max/min) is degree-1 homogeneous in S0, so for any continuous
    payoff ``max(sign·(A({S_t}) − K_eff), 0)`` the pathwise delta is

        delta = (E[X] + sign · K_eff · E[Y3]) / S0

    with X the discounted payoff, Y3 = e^{−rT}·1{payoff ITM} the payoff's
    own exercise indicator (the 11th kernel moment), and K_eff = K for
    fixed strikes / 0 for floating. Supported: vanilla, asian
    (fixed/floating, arithmetic/geometric), lookback (fixed/floating).
    Barrier and digital payoffs are discontinuous — pathwise
    differentiation is biased there, so they switch to LIKELIHOOD-RATIO
    estimators instead: all four LR Greeks derive from three per-path
    scores (z₁ the first shock, W the Brownian path, Q = Σz²):
    score_S0 = z₁/(S0σ√dt), score_σ = (Q−m)/σ − W, score_r = W/σ,
    score_T = (Q−m)/(2T) + cW/(σT). LR estimators are unbiased for ANY
    path functional but their variance grows as 1/dt for delta — prefer
    more paths or fewer monitoring dates.

    Vega, rho and theta ride the same run via the pathwise chain rules
    dS_t/dσ = S_t·(W_t − σt), dS_t/dr = S_t·t, dS_t/dT = S_t·(ct + σW_t/2)/T
    (c = r−q−σ²/2), chained through each payoff's smooth inner argument —
    see ``_pathwise_dinner``. The Pallas kernel carries the Brownian path
    and up to four payoff-specific accumulators in registers and emits six
    extra moments (ΣY/ΣY² for Y = e^{−rT}·dpay/dσ, dX/dr, dX/dT); the XLA
    engine produces the same observables per path. Theta follows the
    reference sign convention (−dV/dT, negative for long vanillas); gamma
    is NOT pathwise-estimable (the delta is discontinuous) — use
    ``euro_greeks_mc``'s LR estimator or bump-and-reprice.

    Accepts ``exotic_price_mc``'s kwargs (GBM only: ``sigma=``). Returns
    Gamma comes from one more moment in the same run: pure-LR
    X·((z₁²−1)/(S0σ√dt)² − z₁/(S0²σ√dt)) for the discontinuous payoffs,
    and for the continuous ones a lower-variance mixed pathwise-LR form —
    LR applied to the homogeneity delta observable D = (X+sign·K_eff·
    df·1{ITM})/S0, giving Γ = E[D·z₁/(S0σ√dt) − D/S0].

    Returns ``{"price", "stderr", "delta", "gamma", "gamma_stderr",
    "vega", "vega_stderr", "rho", "rho_stderr", "theta", "theta_stderr",
    "exercise_prob"}`` (plus ``delta_stderr`` on the LR payoffs).
    """
    if payoff not in _PATHWISE_OK + _LR_OK:
        raise ValueError(f"unknown payoff {payoff!r}; expected one of "
                         f"{_PATHWISE_OK + _LR_OK}")
    if kwargs.get("dividends"):
        # the pathwise/LR chains assume dividend-free dynamics (degree-1
        # homogeneity in S0 breaks at each cash drop) — silent wrong
        # Greeks otherwise; bump-and-reprice exotic_price_mc instead
        raise ValueError(
            "exotic_greeks_mc does not support dividends=; use CRN "
            "bump-and-reprice around exotic_price_mc(dividends=...)")
    if kwargs.get("nig") is not None:
        raise ValueError(
            "NIG admits no pathwise-AD Greeks: the inverse-Gaussian "
            "sampler's accept branch has a parameter-dependent selection "
            "probability pathwise differentiation cannot see — use CRN "
            "bump-and-reprice around exotic_price_mc(nig=...)")
    if any(kwargs.get(m) is not None
           for m in ("heston", "sabr", "merton", "sigma_loc", "vg")):
        # Non-GBM dynamics: pathwise-AD Jacobian through the fused scan
        # (delta/rho/theta + every differentiable model parameter).
        return _ad_exotic_greeks(payoff, S0, K, T, r, q, kind=kind,
                                 strike_type=strike_type, **kwargs)
    if kwargs.get("sigma") is None:
        raise ValueError(
            "exotic_greeks_mc needs dynamics: sigma= (GBM) or one of "
            "heston=/sabr=/merton=/sigma_loc=")
    from ..ops.pallas_path_mc import (path_mc_sumstats_pallas,
                                      path_mc_sumstats_pallas_sharded)

    import numpy as np

    sigma = kwargs["sigma"]
    seed_val = resolve_seed(kwargs.get("seed"))
    n_steps = int(kwargs.get("n_steps", 252))
    backend = kwargs.get("backend", "auto")
    use_pallas = n_steps % 2 == 0 and (
        backend == "pallas"
        or (backend == "auto" and jax.default_backend() == "tpu"))
    control_variate = bool(kwargs.get("control_variate", False))
    use_lr = payoff in _LR_OK
    barrier = float(kwargs.get("barrier", 0.0))
    barrier_type = kwargs.get("barrier_type", "up-and-out")
    rebate = float(kwargs.get("rebate", 0.0))
    payout = float(kwargs.get("payout", 1.0))
    pk = dict(payoff=payoff,
              antithetic=bool(kwargs.get("antithetic", True)),
              average_type=kwargs.get("average_type", "arithmetic"),
              strike_type=strike_type,
              barrier=barrier, barrier_type=barrier_type, rebate=rebate,
              payout=payout,
              interpret=jax.default_backend() != "tpu")
    def _mom(s, i, n):
        m = s[i] / n
        return float(m), float(np.sqrt(max(0.0, s[i + 1] / n - m * m) / n))

    mesh = kwargs.get("mesh")
    if use_pallas:
        if mesh is not None:
            pk_sh = {k: v for k, v in pk.items() if k != "interpret"}
            raw = path_mc_sumstats_pallas_sharded(
                mesh, seed_val, int(kwargs.get("n_paths", 100_000)),
                n_steps, S0, K, T, r, q, sigma, kind == "call",
                greek_stats=True, **pk_sh)
        else:
            raw = path_mc_sumstats_pallas(
                seed_val, int(kwargs.get("n_paths", 100_000)), n_steps,
                S0, K, T, r, q, sigma, kind == "call", greek_stats=True,
                **pk)
        s = np.asarray(jax.device_get(raw), np.float64)
        n, mX, mY3 = s[0], s[1] / s[0], s[10] / s[0]
        price, se = _estimate_from_stats(s, S0, K, T, r, q, sigma,
                                         kind == "call", "gbm",
                                         control_variate)
        vega, vega_se = _mom(s, 11, n)
        rho, rho_se = _mom(s, 13, n)
        theta, theta_se = _mom(s, 15, n)
        lr_delta, lr_delta_se = _mom(s, 17, n)
        gamma, gamma_se = _mom(s, 19, n)
    elif mesh is not None:
        # Mesh without the Pallas kernel (e.g. the CPU harness): the AD
        # Jacobian path shards with a psum of its moment sums. LR payoffs
        # have no pathwise derivative, so they need the kernel backend.
        if use_lr:
            raise ValueError(
                "mesh Greek runs for discontinuous payoffs need the "
                "Pallas backend (TPU); continuous payoffs shard anywhere")
        return _ad_exotic_greeks(payoff, S0, K, T, r, q, kind=kind,
                                 strike_type=strike_type, **kwargs)
    else:
        # XLA engine: the same moments from the fused payoff vector
        key = jax.random.key(seed_val)
        dt_ = canonical(kwargs.get("dtype"))
        fixed = dict(
            S0=jnp.asarray(S0, dt_), K=jnp.asarray(K, dt_),
            T=jnp.asarray(T, dt_), r=jnp.asarray(r, dt_),
            q=jnp.asarray(q, dt_), sigma=jnp.asarray(sigma, dt_),
            barrier=jnp.asarray(barrier, dt_),
            rebate=jnp.asarray(rebate, dt_),
            payout=jnp.asarray(payout, dt_), bump=jnp.asarray(0.01, dt_),
            **{k: jnp.asarray(0.0, dt_) for k in (
                "h_v0", "h_kappa", "h_theta", "h_xi", "h_rho",
                "m_lam", "m_mJ", "m_sJ", "s_alpha0", "s_nu", "s_rho")},
            s_beta=jnp.asarray(1.0, dt_))
        pay, _, dinner = _fused_paths(
            key, fixed, n_paths=int(kwargs.get("n_paths", 100_000)),
            payoff=payoff, kind=kind, n_steps=n_steps,
            antithetic=bool(kwargs.get("antithetic", True)),
            barrier_type=barrier_type,
            average_type=kwargs.get("average_type", "arithmetic"),
            strike_type=strike_type, model_kind="gbm", sigma_loc=None,
            dtype=dt_, with_greeks=True)
        pay = np.asarray(jax.device_get(pay), np.float64)
        obs = tuple(np.asarray(jax.device_get(d), np.float64)
                    for d in dinner)
        df = np.exp(-r * T)
        X = df * pay
        n, mX = X.size, X.mean()
        mY3 = df * float((pay > 0.0).mean())
        price, se = float(mX), float(X.std(ddof=1) / np.sqrt(n))

        def _obs(Y):
            return float(Y.mean()), float(Y.std(ddof=1) / np.sqrt(n))

        if use_lr:
            z1, W, Q = obs
            m = float(n_steps)
            dt_step = T / m
            sdt = sigma * np.sqrt(dt_step)
            c = r - q - 0.5 * sigma * sigma
            lr_delta, lr_delta_se = _obs(X * z1 / (S0 * sdt))
            vega, vega_se = _obs(X * ((Q - m) / sigma - W))
            rho, rho_se = _obs(X * (W / sigma) - T * X)
            theta, theta_se = _obs(
                r * X - X * ((Q - m) / (2.0 * T) + c * W / (sigma * T)))
            gamma, gamma_se = _obs(
                X * ((z1 * z1 - 1.0) / (S0 * S0 * sdt * sdt)
                     - z1 / (S0 * S0 * sdt)))
        else:
            d_sig, d_r, d_T, z1 = obs
            vega, vega_se = _obs(df * d_sig)
            rho, rho_se = _obs(-T * X + df * d_r)      # dX/dr
            theta, theta_se = _obs(r * X - df * d_T)   # −dX/dT
            # mixed pathwise-LR gamma: LR-differentiate the per-path
            # homogeneity delta D = (X + sign·K_eff·1{ITM}·df)/S0
            sdt = sigma * np.sqrt(T / float(n_steps))
            sgn = 1.0 if kind == "call" else -1.0
            Ke = 0.0 if strike_type == "floating" else K
            D = (X + sgn * Ke * df * (pay > 0.0)) / S0
            gamma, gamma_se = _obs(D * z1 / (S0 * sdt) - D / S0)

    out = {"price": float(price), "stderr": float(se),
           "gamma": gamma, "gamma_stderr": gamma_se,
           "vega": vega, "vega_stderr": vega_se,
           "rho": rho, "rho_stderr": rho_se,
           "theta": theta, "theta_stderr": theta_se,
           "exercise_prob": float(mY3 * np.exp(r * T))}
    if use_lr:
        out["delta"] = lr_delta
        out["delta_stderr"] = lr_delta_se
    else:
        sign = 1.0 if kind == "call" else -1.0
        K_eff = 0.0 if strike_type == "floating" else K
        # use the CV-corrected price in the E[X] slot when available
        out["delta"] = float((price + sign * K_eff * mY3) / S0)
    return out


def exotic_price_mc_dupire(payoff: str, surface, S0, K, T, r, q=0.0, *,
                           scheme: str = "milstein", backend: str = "auto",
                           control_variate: bool = False, **kwargs):
    """Path-dependent pricing under Dupire local vol from a calibrated
    :class:`~optpricer_tpu.models.calibration.VolSurface`.

    On TPU the SVI slices ship into the Pallas path kernel and σ(S,t) is
    evaluated from Gatheral's formula *in registers* (the forward curve is
    the analytic S0·e^{(r−q)t}); elsewhere this delegates to
    :func:`exotic_price_mc` with a traced ``dupire_local_vol_func`` closure.
    Accepts the same payoff kwargs as :func:`exotic_price_mc`.
    """
    import numpy as np

    from ..models.calibration import dupire_local_vol_func

    n_steps = int(kwargs.get("n_steps", 252))
    use_pallas = backend == "pallas" or (
        backend == "auto" and jax.default_backend() == "tpu"
        and n_steps % 2 == 0)
    if use_pallas and n_steps % 2 == 0:
        from ..ops.pallas_path_mc import (path_mc_sumstats_pallas,
                                          path_mc_sumstats_pallas_sharded)

        svi = np.zeros((6, surface._T_arr.shape[0]), np.float32)
        svi[:5, :] = np.asarray(surface._P_arr).T
        svi[5, :] = np.asarray(surface._T_arr)
        kind = kwargs.get("kind", "call")
        mesh = kwargs.get("mesh")
        pk = dict(
            payoff=payoff, antithetic=bool(kwargs.get("antithetic", True)),
            barrier=kwargs.get("barrier", 0.0),
            barrier_type=kwargs.get("barrier_type", "up-and-out"),
            rebate=kwargs.get("rebate", 0.0),
            average_type=kwargs.get("average_type", "arithmetic"),
            strike_type=kwargs.get("strike_type", "fixed"),
            payout=kwargs.get("payout", 1.0),
            svi_slices=svi, scheme=scheme,
            dS_bump=kwargs.get("dS_bump", 0.01))
        call_args = (resolve_seed(kwargs.get("seed")),
                     int(kwargs.get("n_paths", 100_000)),
                     n_steps, S0, K, T, r, q, None, kind == "call")
        s = (path_mc_sumstats_pallas_sharded(mesh, *call_args, **pk)
             if mesh is not None else
             path_mc_sumstats_pallas(*call_args, **pk))
        # Local vol: the digital CV mean is not known in closed form; the
        # spot CV E[e^{−rT}S_T] = S0·e^{−qT} holds under any Q dynamics.
        return _estimate_from_stats(s, S0, K, T, r, q, 0.0, kind == "call",
                                    "local_vol", control_variate)

    sigma_loc = dupire_local_vol_func(surface, r, q)
    return exotic_price_mc(payoff, S0, K, T, r, q, sigma_loc=sigma_loc,
                           scheme=scheme, backend="xla",
                           **kwargs)

_PAYOFFS = ("vanilla", "barrier", "asian", "digital", "lookback")


@jax.jit
def _qmc_normals_f32(u):
    from ..ops.fastmath import norminv32

    return norminv32(u)


@jax.jit
def _qmc_bridge(z, T):
    from ..ops.sobol import bridge_paths

    return bridge_paths(z, T)


def _qmc_replicate(key, fixed, *, payoff, kind, n_steps, n_points,
                   barrier_type, average_type, strike_type, dtype):
    """One randomised-QMC estimate: Sobol points → Φ⁻¹ → Brownian bridge
    → exact GBM path matrix → payoff mean. Different keys are
    independent digital shifts of the same point set.

    The stages run as SEPARATE compiled programs on purpose: fusing the
    whole pipeline into one jit sends XLA:TPU into a ~400 s pathological
    compile (uint32 Sobol + scatter bridge + transcendental payoff in one
    fusion graph), while the staged form compiles in seconds and the
    (n, d) intermediates are only ~16 MB of HBM.
    """
    dt_ = dtype
    from ..ops.sobol import sobol_uniforms

    # The block_until_ready fences matter: dispatching the next stage
    # while the previous one is still compiling drives the axon compile
    # service into minutes-long stalls (observed 50-500 s for this 4-
    # program pipeline); fenced, the whole pipeline compiles in ~10 s.
    u = sobol_uniforms(n_points, n_steps, key, dtype=dt_)
    u.block_until_ready()
    if dt_ == jnp.float64:
        z = jax.jit(jax.scipy.special.ndtri)(u)
    else:
        z = _qmc_normals_f32(u)
    z.block_until_ready()
    W = _qmc_bridge(z, fixed["T"])                       # (n, d)
    W.block_until_ready()
    return _qmc_payoff(W, fixed, payoff=payoff, kind=kind, n_steps=n_steps,
                       n_points=n_points, barrier_type=barrier_type,
                       average_type=average_type, strike_type=strike_type,
                       dtype=dtype)


@partial(jax.jit, static_argnames=(
    "payoff", "kind", "n_steps", "n_points", "barrier_type", "average_type",
    "strike_type", "dtype"))
def _qmc_payoff(W, fixed, *, payoff, kind, n_steps, n_points,
                barrier_type, average_type, strike_type, dtype):
    dt_ = dtype
    dt_step = fixed["T"] / n_steps
    t = (jnp.arange(1, n_steps + 1, dtype=dt_)) * dt_step
    c = fixed["r"] - fixed["q"] - 0.5 * fixed["sigma"] ** 2
    exp_, log_ = _exp_for(dt_), _log_for(dt_)
    logS = log_(fixed["S0"]) + c * t[None, :] + fixed["sigma"] * W
    S = exp_(logS)                                       # (n, d), excl. t=0
    S0v = jnp.full((n_points,), fixed["S0"], dt_)
    up = barrier_type.startswith("up")
    hit = (S >= fixed["barrier"]) if up else (S <= fixed["barrier"])
    hit0 = (S0v >= fixed["barrier"]) if up else (S0v <= fixed["barrier"])
    carry = (S[:, -1],
             jnp.sum(S, axis=1),
             jnp.sum(logS, axis=1),
             jnp.maximum(jnp.max(S, axis=1), S0v),
             jnp.minimum(jnp.min(S, axis=1), S0v),
             jnp.logical_or(jnp.any(hit, axis=1), hit0))
    pay = _terminal_payoff(
        payoff, carry, K=fixed["K"], kind=kind, n_steps=n_steps,
        barrier_type=barrier_type, rebate=fixed["rebate"],
        average_type=average_type, strike_type=strike_type,
        payout=fixed["payout"])
    return exp_(-fixed["r"] * fixed["T"]) * jnp.mean(pay)


def _estimate_from_stats(stats_vec, S0, K, T, r, q, sigma, is_call: bool,
                         dynamics: str, control_variate: bool,
                         geo_ey=None):
    """(price, stderr) from the 10-stat vector, dynamics-aware.

    Under GBM both control-variate means are known in closed form (dual CV,
    same estimator as the single-chip Pallas path). Under Heston/local vol
    only the spot mean E[e^{−rT}S_T] = S0·e^{−qT} is model-free, so a single
    CV is used. Without CV, the plain mean/stderr. One code path serves the
    single-chip Pallas, sharded Pallas, and sharded XLA engines, so scaling
    out never changes the estimator.

    ``geo_ey`` (arithmetic asian only): the Y1 slot holds the geometric-
    average payoff whose closed-form mean this is — single CV on it.
    """
    import numpy as np

    from ..ops import stats as stats_ops

    s = np.asarray(jax.device_get(stats_vec), np.float64)
    n = s[0]
    if n == 0:
        return float("nan"), float("nan")
    if not control_variate:
        mX = s[1] / n
        vX = max(0.0, s[2] / n - mX * mX)
        return float(mX), float(np.sqrt(vX / n))
    if geo_ey is not None:
        mean, se = stats_ops.cv_mean_se_np(s[:6], geo_ey)
        # f32 moment-roundoff floor (see pallas_mc_batch.euro_price_mc_batch)
        return mean, max(se, 2e-6 * (1.0 + abs(mean)))
    if dynamics == "gbm":
        from ..ops.pallas_mc import pallas_estimate

        return pallas_estimate(stats_vec, S0, K, T, r, q, sigma, is_call,
                               True)
    mean, se = stats_ops.cv_mean_se_np(s[:6], S0 * np.exp(-q * T))
    return mean, se


def _terminal_payoff(payoff, carry, *, K, kind, n_steps, barrier_type,
                     rebate, average_type, strike_type, payout):
    S, run_sum, run_logsum, run_max, run_min, crossed = carry
    is_call = kind == "call"

    def vanilla(ST):
        return jnp.maximum(ST - K, 0.0) if is_call else jnp.maximum(K - ST, 0.0)

    if payoff == "vanilla":
        return vanilla(S)
    if payoff == "digital":
        itm = (S > K) if is_call else (S < K)
        return jnp.where(itm, payout, 0.0).astype(S.dtype)
    if payoff == "barrier":
        if barrier_type.endswith("out"):
            return jnp.where(crossed, rebate, vanilla(S))
        return jnp.where(crossed, vanilla(S), rebate)
    if payoff == "asian":
        if average_type == "arithmetic":
            avg = run_sum / n_steps
        else:
            avg = _exp_for(S.dtype)(run_logsum / n_steps)
        if strike_type == "fixed":
            return vanilla(avg)
        return (jnp.maximum(S - avg, 0.0) if is_call
                else jnp.maximum(avg - S, 0.0))
    if payoff == "lookback":
        if strike_type == "floating":
            return (S - run_min) if is_call else (run_max - S)
        return (jnp.maximum(run_max - K, 0.0) if is_call
                else jnp.maximum(K - run_min, 0.0))
    raise ValueError(f"unknown payoff {payoff!r}")


def _pathwise_dinner(payoff, pay, S_T, rlog, rmax, rmin, W, g1, g2, g3, g4,
                     *, K, sigma, r, q, T, kind, n_steps, average_type,
                     strike_type):
    """Per-path d(inner)/d(σ, r, T) for continuous payoffs under GBM,
    already multiplied by the exercise indicator.

    Inputs are the scan carries of ``_fused_paths(with_greeks=True)``:
    W = Brownian path at T; accumulators by payoff —
    asian arithmetic: g1 = Σ S_k·W_k, g2 = Σ S_k·t_k;
    asian geometric:  g1 = Σ W_k (Σ t_k is deterministic);
    lookback: (g1, g3) = (W, t) at the running max, (g2, g4) at the min.

    The chain rules all come from ln S_t = ln S0 + c·t + σW_t with
    c = r − q − σ²/2 and, for total-maturity sensitivity, W_t = √T·B_{t/T}
    so dW_t/dT = W_t/(2T):
      dS_t/dσ = S_t·(W_t − σt);  dS_t/dr = S_t·t;
      dS_t/dT = S_t·(c·t + σW_t/2)/T.
    ``inner`` is the smooth argument of the max (lookback-floating: pay
    itself). Returns ``(dσ, dr, dT)`` arrays.
    """
    sign = 1.0 if kind == "call" else -1.0
    c = r - q - 0.5 * sigma * sigma
    itm = (pay > 0.0).astype(pay.dtype)

    def dS_terminal():
        return (S_T * (W - sigma * T), S_T * T,
                S_T * (c * T + 0.5 * sigma * W) / T)

    if payoff == "vanilla":
        ds, dr, dT = dS_terminal()
        dinner = (sign * ds, sign * dr, sign * dT)
    elif payoff == "asian":
        m = n_steps
        if average_type == "geometric":
            avg = jnp.exp(rlog / m)
            tsum = (T / m) * (m * (m + 1.0) / 2.0)
            davg = (avg * (g1 - sigma * tsum) / m,
                    avg * tsum / m,
                    avg * (c * tsum + 0.5 * sigma * g1) / (m * T))
        else:
            davg = ((g1 - sigma * g2) / m,
                    g2 / m,
                    (c * g2 + 0.5 * sigma * g1) / (m * T))
        if strike_type == "floating":
            ds = dS_terminal()
            dinner = tuple(sign * (a - b) for a, b in zip(ds, davg))
        else:
            dinner = tuple(sign * d for d in davg)
    elif payoff == "lookback":
        dmax = (rmax * (g1 - sigma * g3), rmax * g3,
                rmax * (c * g3 + 0.5 * sigma * g1) / T)
        dmin = (rmin * (g2 - sigma * g4), rmin * g4,
                rmin * (c * g4 + 0.5 * sigma * g2) / T)
        if strike_type == "floating":
            ds = dS_terminal()
            if kind == "call":
                dinner = tuple(a - b for a, b in zip(ds, dmin))
            else:
                dinner = tuple(a - b for a, b in zip(dmax, ds))
        else:
            dinner = dmax if kind == "call" else tuple(-d for d in dmin)
    else:
        raise ValueError(f"no pathwise derivative for payoff {payoff!r}")
    return tuple(itm * d for d in dinner)


@partial(jax.jit, static_argnames=("payoff", "n_steps", "n_paths",
                                   "barrier_up", "knock_in", "dtype",
                                   "has_vol"))
def _cev_exact_sumstats(key, fixed, *, payoff, n_steps, n_paths,
                        barrier_up, knock_in, dtype, has_vol=False):
    """EXACT absorbed-CEV path transitions with dual-BESQ importance
    weights — (6,) CV sufficient statistics for a CALL-side payoff.

    The absorbed BESQ^δ (δ < 2) transition sub-density equals the
    plain BESQ^{4−δ} density times (y/x)^{δ/2−1} (matched Bessel index
    I_{1−δ/2}, Göing-Jaeschke & Yor), so sampling the DUAL — a Poisson
    (x/2Δ̂) mixture of Gamma((4−δ)/2+N) draws, never absorbing — and
    multiplying the payoff by the running weight Πw reproduces
    E[f·1{survived}] exactly at ANY step count: E[w·S_T] = F_T to
    machine precision by construction, where the Euler backbone needs
    hundreds of steps (`processes.sabr_paths` clamp). Drift rides the
    per-step deterministic time change τ̂(Δ) = (e^{2μ(1−β)Δ}−1)/(2μ(1−β)).
    With ν > 0 the step is Islah's conditional representation: given
    the exact lognormal α endpoints, the asset is a SHIFTED absorbed
    CEV — the ρ-coupling becomes the deterministic shift
    (ρ/ν)(α′ − α) of S^ω/ω and the BESQ dimension gains the ρ²
    correction; the trapezoid ∫α² is the scheme's one O(Δ²) bias.

    Valid for payoffs that VANISH on absorbed paths — call-side
    vanilla/digital/barrier with zero rebate (put entry points use
    parity upstream). Statistics layout matches ``stats.cv_mean_se_np``
    with Y = e^{−rT}·w·S_T (E[Y] model-free = S0·e^{−qT}).
    """
    dt_ = dtype
    dt = fixed["T"] / n_steps
    om = 1.0 - fixed["s_beta"]
    rho = fixed["s_rho"]
    if has_vol:
        # Islah's conditional representation: given (α_t, α_{t+Δ}), the
        # asset is a SHIFTED CEV — the ρ-coupling becomes the
        # deterministic shift (ρ/ν)(α' − α) of S^ω/ω and the dimension
        # picks up the ρ² correction; ∫α²dt is trapezoid-approximated
        # (the one O(Δ²) bias of the ν>0 scheme — ν=0 stays exact)
        delta = (1.0 - 2.0 * fixed["s_beta"] - rho * rho * om) \
            / (om * (1.0 - rho * rho))
    else:
        delta = (1.0 - 2.0 * fixed["s_beta"]) / om
    w_exp = 0.5 * delta - 1.0
    mu = fixed["r"] - fixed["q"]
    drift2 = 2.0 * mu * om
    small = jnp.abs(drift2) < 1e-12
    tau_hat = jnp.where(
        small, dt,
        (jnp.exp(jnp.where(small, 0.0, drift2) * dt) - 1.0)
        / jnp.where(small, 1.0, drift2))
    e_mu_dt = jnp.exp(mu * dt)
    nu_sabr = fixed["s_nu"]

    S_init = jnp.full((n_paths,), fixed["S0"], dt_)
    a_init = jnp.full((n_paths,), fixed["s_alpha0"], dt_)
    crossed0 = (S_init >= fixed["barrier"]) if barrier_up \
        else (S_init <= fixed["barrier"])

    def step(carry, k_idx):
        S, alpha, logw, crossed = carry
        zk = jax.random.fold_in(key, k_idx)
        kp, kg, ka = jax.random.split(zk, 3)
        sig2 = alpha * alpha
        # the DRIFTLESS process is the step-end forward S·e^{μΔ} in the
        # changed time τ̂ (Schroder's transform applied per step) — the
        # carry scales by e^{μΔ} BEFORE the transition; CEV is not
        # scale-invariant, so scaling after would bias coarse steps
        S_eff = S * e_mu_dt
        if has_vol:
            za = jax.random.normal(ka, (n_paths,), dt_)
            alpha_new = alpha * jnp.exp(nu_sabr * jnp.sqrt(dt) * za
                                        - 0.5 * nu_sabr * nu_sabr * dt)
            # carry-weighted ∫α²: e^{2μωΔ} on the step-start leg keeps
            # the ν→0 limit consistent with the exact τ̂ to O((μωΔ)²)
            Vh = 0.5 * dt * (alpha * alpha * e_mu_dt ** (2.0 * om)
                             + alpha_new * alpha_new)
            A = jnp.maximum(
                S_eff ** om / om
                + (rho / nu_sabr) * (alpha_new - alpha), 1e-12)
            scale = (1.0 - rho * rho) * Vh
            x = A * A / scale
        else:
            alpha_new = alpha
            scale = sig2 * tau_hat
            x = S_eff ** (2.0 * om) / (om * om * scale)
        N = jax.random.poisson(kp, 0.5 * x).astype(dt_)
        G = jax.random.gamma(kg, 0.5 * (4.0 - delta) + N, dtype=dt_)
        y = 2.0 * G
        logw = logw + w_exp * (jnp.log(jnp.maximum(y, 1e-300))
                               - jnp.log(x))
        S_new = (om * om * scale * y) ** (1.0 / (2.0 * om))
        hit = (S_new >= fixed["barrier"]) if barrier_up \
            else (S_new <= fixed["barrier"])
        return (S_new, alpha_new, logw, crossed | hit), None

    carry0 = (S_init, a_init, jnp.zeros((n_paths,), dt_), crossed0)
    (S_T, _, logw, crossed), _ = jax.lax.scan(
        step, carry0, jnp.arange(n_steps))
    w = jnp.exp(logw)
    vanilla = jnp.maximum(S_T - fixed["K"], 0.0)
    if payoff == "digital":
        pay = jnp.where(S_T > fixed["K"], fixed["payout"], 0.0)
    elif payoff == "barrier":
        live = jnp.where(crossed, 0.0, vanilla) if not knock_in \
            else jnp.where(crossed, vanilla, 0.0)
        pay = live
    else:
        pay = vanilla
    df = jnp.exp(-fixed["r"] * fixed["T"])
    X = df * w * pay
    Y = df * w * S_T
    n = jnp.asarray(n_paths, dt_)
    return jnp.stack([n, jnp.sum(X), jnp.sum(X * X),
                      jnp.sum(Y), jnp.sum(Y * Y), jnp.sum(X * Y)])


def exotic_price_mc(
    payoff: str,
    S0: float, K: float, T: float, r: float, q: float = 0.0, *,
    sigma: Optional[float] = None,
    sigma_loc: Optional[Callable] = None,
    heston: Optional[dict] = None,
    merton: Optional[dict] = None,
    sabr: Optional[dict] = None,
    vg: Optional[dict] = None,
    nig: Optional[dict] = None,
    kind: str = "call",
    n_steps: int = 252,
    n_paths: int = 100_000,
    barrier: float = 0.0,
    barrier_type: str = "up-and-out",
    rebate: float = 0.0,
    average_type: str = "arithmetic",
    strike_type: str = "fixed",
    payout: float = 1.0,
    scheme: str = "log_euler",
    antithetic: bool = True,
    seed: Optional[int] = None,
    dS_bump: float = 0.01,
    dtype=None,
    backend: str = "auto",
    control_variate: bool = False,
    dividends=None,
    mesh=None,
):
    """Price a path-dependent option without materialising paths.

    ``payoff`` ∈ {"vanilla", "barrier", "asian", "digital", "lookback"};
    payoff conventions match :mod:`optpricer_tpu.models.exotics` (discrete
    monitoring at the n_steps grid, t=0 excluded from Asian averages, both
    endpoints monitored for barrier/lookback). Dynamics: constant ``sigma``
    (exact GBM step), traceable ``sigma_loc(S, t)`` with log-Euler or
    Milstein (``scheme``), ``heston={'v0','kappa','theta','xi','rho'}``
    (full-truncation Euler variance + log-Euler asset by default — same
    discretisation as :func:`~optpricer_tpu.models.processes.heston_paths`
    — or Andersen's quadratic-exponential scheme with ``scheme="qe"``:
    near-exact marginals at coarse steps where Euler carries an O(Δt)
    bias measured at +0.20 of spot on Feller-violating books; QE runs in
    both the XLA scan engine and the Pallas path kernel), or
    ``sabr={'alpha0','beta','nu','rho'}`` (exact lognormal σ evolution,
    log-Euler asset for β=1 / clamped Euler CEV for β<1 — same
    discretisation as :func:`~optpricer_tpu.models.processes.sabr_paths`;
    or ``scheme="exact"`` for β<1: dual-BESQ EXACT absorbed-CEV
    transitions with importance weights — unbiased at ANY step count,
    pinned to the noncentral-chi-square closed forms at 2 steps; ν>0
    uses Islah's conditional shifted-CEV step — any |ρ|<1, low-bias
    O(Δ²) from the trapezoid ∫α²; call-side vanilla/digital/
    zero-rebate barrier payoffs, vanilla puts by parity).

    Pure-jump Lévy dynamics: ``vg={'sigma','theta','nu'}`` /
    ``nig={'alpha','beta','delta'}`` run the EXACT subordinated
    transitions inside the scan (gamma / inverse-Gaussian clock per step
    + conditional Gaussian, pairs sharing the clock under antithetic —
    the same scheme as :func:`~optpricer_tpu.models.levy.vg_paths` with
    O(1) memory instead of a path matrix); the COS pricers of
    :mod:`~optpricer_tpu.models.levy` are the vanilla oracles.  XLA scan
    engine (+ ``mesh=``); the Pallas kernel has no gamma sampler.

    With ``mesh`` (a 1-D ``jax.sharding.Mesh``), paths are split across
    devices (per-device streams from ``fold_in(key, device_idx)``) and the
    payoff statistics ride one ``psum``; ``n_paths`` is rounded up to a
    device multiple.

    ``dividends=[(t, amount), ...]`` (GBM only) prices under the
    piecewise-GBM discrete-cash-dividend model: the spot drops by
    ``amount`` at each ex-date (snapped to the step grid — the same
    schedule convention as :func:`~optpricer_tpu.models.pde.fd_price`,
    which is the cross-engine oracle for the vanilla leg). Runs on the
    XLA scan engine; incompatible with ``control_variate`` (no
    closed-form CV mean under dividends).
    """
    if payoff not in _PAYOFFS:
        raise ValueError(f"payoff must be one of {_PAYOFFS}, got {payoff!r}")
    n_models = sum(x is not None
                   for x in (sigma, sigma_loc, heston, merton, sabr, vg,
                             nig))
    if n_models != 1:
        raise ValueError(
            "provide exactly one of sigma / sigma_loc / heston / merton"
            " / sabr / vg / nig")
    if (vg is not None or nig is not None) and scheme != "log_euler":
        raise ValueError("vg=/nig= use the exact subordinated transition "
                         "(no scheme choice)")
    if nig is not None and not (float(nig["alpha"]) > abs(float(nig["beta"]))
                                and float(nig["alpha"])
                                > abs(float(nig["beta"]) + 1.0)):
        raise ValueError("NIG needs alpha > |beta| (real gamma) and "
                         "alpha > |beta + 1| (martingale moment)")
    if vg is not None and not (float(vg["theta"]) * float(vg["nu"])
                               + 0.5 * float(vg["sigma"]) ** 2
                               * float(vg["nu"]) < 1.0):
        raise ValueError("VG martingale moment condition violated: need "
                         "theta*nu + sigma^2*nu/2 < 1")
    if merton is not None and sigma is None:
        sigma = merton["sigma"]
    if kind not in ("call", "put"):
        raise ValueError("kind must be 'call' or 'put'")
    if scheme == "qe" and heston is None:
        raise ValueError("scheme='qe' is the Andersen QE Heston scheme — "
                         "it requires heston=")
    if scheme == "exact":
        if sabr is None or not (0.0 < float(sabr["beta"]) < 1.0):
            raise ValueError(
                "scheme='exact' is the dual-BESQ absorbed-CEV sampler — "
                "it requires sabr= with 0 < beta < 1")
        if abs(float(sabr["rho"])) >= 1.0:
            raise ValueError("scheme='exact' requires |rho| < 1")
        if payoff not in ("vanilla", "digital", "barrier"):
            raise ValueError(
                "scheme='exact' prices payoffs that vanish on absorbed "
                "paths: vanilla, digital, barrier (Asian/lookback "
                "averages see pre-absorption states — use the Euler "
                "backbone)")
        if payoff == "barrier" and (rebate != 0.0 or kind == "put"):
            raise ValueError("scheme='exact' barriers: calls, zero rebate")
        if payoff == "digital" and kind == "put":
            raise ValueError("scheme='exact' digitals: calls (puts via "
                             "payout·df − call parity)")
        if mesh is not None or backend == "pallas":
            raise ValueError("scheme='exact' runs on the single-device "
                             "XLA engine (Poisson/Gamma sampling)")
    if dividends:
        # piecewise-GBM cash dividends: XLA scan engine only (the Pallas
        # kernels have no dividend schedule slot, the QMC bridge assumes
        # a dividend-free terminal map, and the geometric-Asian CV mean
        # has no dividend closed form)
        if sigma is None or merton is not None:
            raise ValueError("dividends= requires GBM dynamics (sigma=)")
        if control_variate:
            raise ValueError("control_variate has no closed-form mean "
                             "under discrete dividends")
        if backend in ("pallas", "qmc"):
            raise ValueError("dividends price on the XLA scan engine "
                             "(backend='auto'/'xla')")

    dt_ = canonical(dtype)
    seed_val = resolve_seed(seed)
    key = jax.random.key(seed_val)

    if scheme == "exact":
        import numpy as np

        from ..ops import stats as stats_ops

        fixed_e = {k: jnp.asarray(v, dt_) for k, v in (
            ("S0", S0), ("K", K), ("T", T), ("r", r), ("q", q),
            ("barrier", barrier), ("payout", payout),
            ("s_beta", sabr["beta"]), ("s_alpha0", sabr["alpha0"]),
            ("s_nu", sabr["nu"]), ("s_rho", sabr["rho"]))}
        stats = _cev_exact_sumstats(
            key, fixed_e, payoff=payoff, n_steps=int(n_steps),
            n_paths=int(n_paths), barrier_up=barrier_type.startswith("up"),
            knock_in=barrier_type.endswith("in"), dtype=dt_,
            has_vol=float(sabr["nu"]) > 0.0)
        s = np.asarray(jax.device_get(stats), np.float64)
        if control_variate:
            ey = float(S0) * np.exp(-float(q) * float(T))
            mean, se = stats_ops.cv_mean_se_np(s, ey)
        else:
            m1 = s[1] / s[0]
            var = max(0.0, s[2] / s[0] - m1 * m1)
            mean, se = float(m1), float(np.sqrt(var / s[0]))
        if kind == "put":   # vanilla only (validated above): parity off
            # the plain forward — the absorbed CEV is a true martingale
            fwd = float(S0) * np.exp((float(r) - float(q)) * float(T))
            mean -= np.exp(-float(r) * float(T)) * (fwd - float(K))
        return float(mean), float(se)

    # Arithmetic-asian GBM pricing upgrades the control variate to the
    # geometric-average payoff: corr(X, Y_geo) ≈ 1 and E[Y_geo] is exact
    # (analytic.geometric_asian_price) — typically a 30-100× stderr
    # reduction over the terminal-spot CV from the same run.
    use_geo_cv = (bool(control_variate) and payoff == "asian"
                  and average_type == "arithmetic"
                  and strike_type == "fixed" and heston is None
                  and sabr is None and merton is None
                  and sigma_loc is None and vg is None and nig is None)
    geo_ey = None
    if use_geo_cv:
        from .analytic import geometric_asian_price_f64

        geo_ey = geometric_asian_price_f64(S0, K, T, r, q, sigma, kind=kind,
                                           n_steps=int(n_steps))

    if backend == "qmc":
        # Randomised QMC: Sobol + Brownian bridge + exact GBM path matrix.
        # n_paths = points per replicate; 8 independent digital shifts give
        # the error bar (same replicate design as the terminal QMC kernel).
        if sigma is None or merton is not None:
            raise ValueError("backend='qmc' supports GBM dynamics (sigma=)")
        import numpy as np

        R = 8
        if jax.default_backend() == "tpu" and dt_ == jnp.float32:
            # One Pallas kernel: Sobol XOR ladder + Φ⁻¹ + bridge-as-matmul
            # + payoff, nothing staged through HBM (ops/pallas_qmc_path).
            from ..ops.pallas_qmc_path import (path_qmc_sumstats_pallas,
                                               qmc_path_estimate)

            stats = path_qmc_sumstats_pallas(
                seed_val, int(n_paths), int(n_steps), S0, K, T, r, q,
                sigma, kind == "call", payoff=payoff, n_replicates=R,
                barrier=barrier, barrier_type=barrier_type, rebate=rebate,
                average_type=average_type, strike_type=strike_type,
                payout=payout)
            return qmc_path_estimate(stats, S0, q, T,
                                     control_variate=bool(control_variate))
        # CPU fallback: the staged XLA pipeline (4 fenced programs — the
        # fused XLA graph sends XLA:TPU into a pathological compile, and
        # the Mosaic interpreter is far slower than XLA:CPU here).
        fixed_q = {k: jnp.asarray(v, dt_) for k, v in (
            ("S0", S0), ("K", K), ("T", T), ("r", r), ("q", q),
            ("sigma", sigma), ("barrier", barrier), ("rebate", rebate),
            ("payout", payout))}
        key0 = jax.random.key(seed_val)
        est = [float(_qmc_replicate(
            jax.random.fold_in(key0, i), fixed_q, payoff=payoff, kind=kind,
            n_steps=int(n_steps), n_points=int(n_paths),
            barrier_type=barrier_type, average_type=average_type,
            strike_type=strike_type, dtype=dt_)) for i in range(R)]
        est = np.asarray(est, np.float64)
        return float(est.mean()), float(est.std(ddof=1) / np.sqrt(R))

    # TPU fast path: the whole time loop runs inside one Pallas kernel
    # (hardware PRNG, state in registers — see ops/pallas_path_mc.py).
    # GBM and Heston dynamics are supported in-kernel (Dupire via
    # exotic_price_mc_dupire); traced sigma_loc closures and Merton stay
    # on the XLA scan path.
    kernel_ok = (sigma_loc is None and merton is None and vg is None
                 and nig is None and not dividends)
    use_pallas = kernel_ok and n_steps % 2 == 0 and (
        backend == "pallas" or (
            backend == "auto" and jax.default_backend() == "tpu"
            and n_paths * n_steps >= 4_000_000))
    if use_pallas:
        from ..ops.pallas_path_mc import (path_mc_sumstats_pallas,
                                          path_mc_sumstats_pallas_sharded)

        pk = dict(payoff=payoff, antithetic=bool(antithetic),
                  barrier=barrier, barrier_type=barrier_type, rebate=rebate,
                  average_type=average_type, strike_type=strike_type,
                  payout=payout, heston=heston, sabr=sabr,
                  scheme=scheme, geo_cv=use_geo_cv)
        if mesh is not None:
            stats_vec = path_mc_sumstats_pallas_sharded(
                mesh, seed_val, int(n_paths), int(n_steps), S0, K, T, r, q,
                sigma, kind == "call", **pk)
        else:
            stats_vec = path_mc_sumstats_pallas(
                seed_val, int(n_paths), int(n_steps), S0, K, T, r, q,
                sigma, kind == "call",
                interpret=jax.default_backend() != "tpu", **pk)
        dynamics = "gbm" if (heston is None and sabr is None) else "sv"
        return _estimate_from_stats(stats_vec, S0, K, T, r, q, sigma,
                                    kind == "call", dynamics,
                                    control_variate, geo_ey=geo_ey)

    fixed = dict(
        S0=jnp.asarray(S0, dt_), K=jnp.asarray(K, dt_),
        T=jnp.asarray(T, dt_), r=jnp.asarray(r, dt_), q=jnp.asarray(q, dt_),
        sigma=jnp.asarray(0.0 if sigma is None else sigma, dt_),
        barrier=jnp.asarray(barrier, dt_), rebate=jnp.asarray(rebate, dt_),
        payout=jnp.asarray(payout, dt_), bump=jnp.asarray(dS_bump, dt_),
        h_v0=jnp.asarray(heston["v0"] if heston else 0.0, dt_),
        h_kappa=jnp.asarray(heston["kappa"] if heston else 0.0, dt_),
        h_theta=jnp.asarray(heston["theta"] if heston else 0.0, dt_),
        h_xi=jnp.asarray(heston["xi"] if heston else 0.0, dt_),
        h_rho=jnp.asarray(heston["rho"] if heston else 0.0, dt_),
        m_lam=jnp.asarray(merton["lam"] if merton else 0.0, dt_),
        m_mJ=jnp.asarray(merton["mJ"] if merton else 0.0, dt_),
        m_sJ=jnp.asarray(merton["sJ"] if merton else 0.0, dt_),
        s_alpha0=jnp.asarray(sabr["alpha0"] if sabr else 0.0, dt_),
        s_beta=jnp.asarray(sabr["beta"] if sabr else 1.0, dt_),
        s_nu=jnp.asarray(sabr["nu"] if sabr else 0.0, dt_),
        s_rho=jnp.asarray(sabr["rho"] if sabr else 0.0, dt_),
        v_sigma=jnp.asarray(vg["sigma"] if vg else 0.0, dt_),
        v_theta=jnp.asarray(vg["theta"] if vg else 0.0, dt_),
        v_nu=jnp.asarray(vg["nu"] if vg else 1.0, dt_),
        n_alpha=jnp.asarray(nig["alpha"] if nig else 1.0, dt_),
        n_beta=jnp.asarray(nig["beta"] if nig else 0.0, dt_),
        n_delta=jnp.asarray(nig["delta"] if nig else 0.0, dt_),
    )
    if dividends:
        from .pde import _div_schedule

        fixed["div_amts"] = _div_schedule(dividends, T, int(n_steps), dt_)
    if heston is not None:
        model_kind = "heston_qe" if scheme == "qe" else "heston"
    elif sabr is not None:
        # beta==1 admits the exact log-Euler asset step; CEV beta<1 takes
        # an Euler step with positivity clamp (processes._sabr_core parity)
        model_kind = "sabr_ln" if float(sabr["beta"]) == 1.0 else "sabr_cev"
    elif merton is not None:
        model_kind = "merton"
    elif vg is not None:
        model_kind = "vg"
    elif nig is not None:
        model_kind = "nig"
    elif sigma_loc is not None:
        model_kind = "lv_milstein" if scheme == "milstein" else "lv_euler"
    else:
        model_kind = "gbm"
    static = dict(payoff=payoff, kind=kind, n_steps=int(n_steps),
                  antithetic=bool(antithetic), barrier_type=barrier_type,
                  average_type=average_type, strike_type=strike_type,
                  model_kind=model_kind, sigma_loc=sigma_loc, dtype=dt_)

    if mesh is None:
        if use_geo_cv:
            import numpy as np

            from ..ops import stats as stats_ops

            pay, _, pay_geo = _fused_paths(key, fixed, n_paths=int(n_paths),
                                           with_geo=True, **static)
            df = np.exp(-r * T)
            X = df * np.asarray(jax.device_get(pay), np.float64)
            Y = df * np.asarray(jax.device_get(pay_geo), np.float64)
            s = np.array([X.size, X.sum(), (X * X).sum(), Y.sum(),
                          (Y * Y).sum(), (X * Y).sum()])
            return stats_ops.cv_mean_se_np(s, geo_ey)
        pay, _ = _fused_paths(key, fixed, n_paths=int(n_paths), **static)
        return _price_from_payoff(pay, r, T)

    # Mesh DP: per-device path shards; the FULL 10-stat layout (payoff +
    # spot + digital control variates) rides one ICI psum, so the sharded
    # estimator is the same dual/single-CV design as the single-chip
    # engines — scaling out improves, never degrades, the estimate.
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import mesh_axes

    axis = mesh_axes(mesh)
    n_dev = mesh.devices.size
    n_local = -(-int(n_paths) // n_dev)
    sign = 1.0 if kind == "call" else -1.0

    @partial(jax.shard_map, mesh=mesh, in_specs=P(axis), out_specs=P())
    def shard_fn(dev_ids):
        local_key = jax.random.fold_in(key, dev_ids[0])
        if use_geo_cv:
            pay, ST, pay_geo = _fused_paths(local_key, fixed,
                                            n_paths=n_local, with_geo=True,
                                            **static)
        else:
            pay, ST = _fused_paths(local_key, fixed, n_paths=n_local,
                                   **static)
        df = _exp_for(dt_)(-fixed["r"] * fixed["T"])
        X = df * pay
        # Y1 is the geometric-average payoff when the geo CV is on (its
        # mean is closed-form), else the discounted terminal spot
        Y1 = df * (pay_geo if use_geo_cv else ST)
        Y2 = df * (sign * (ST - fixed["K"]) > 0.0).astype(X.dtype)
        stats = jnp.stack([
            jnp.asarray(X.size, X.dtype),
            jnp.sum(X), jnp.sum(X * X),
            jnp.sum(Y1), jnp.sum(Y1 * Y1), jnp.sum(X * Y1),
            jnp.sum(Y2), jnp.sum(Y2 * Y2), jnp.sum(X * Y2),
            jnp.sum(Y1 * Y2)])
        return jax.lax.psum(stats, axis)

    return _estimate_from_stats(
        shard_fn(jnp.arange(n_dev)), S0, K, T, r, q,
        0.0 if sigma is None else sigma, kind == "call", model_kind,
        control_variate, geo_ey=geo_ey)


@partial(jax.jit, static_argnames=(
    "payoff", "kind", "n_steps", "n_paths", "antithetic", "barrier_type",
    "average_type", "strike_type", "model_kind", "sigma_loc", "dtype",
    "with_greeks", "with_geo"))
def _fused_paths(key, fixed, *, payoff, kind, n_steps, n_paths, antithetic,
                 barrier_type, average_type, strike_type, model_kind,
                 sigma_loc, dtype, with_greeks: bool = False,
                 with_geo: bool = False):
    """Module-level jitted core: repeat calls with the same static config
    (payoff/model/steps/paths) reuse the compilation even as market data
    changes — essential for bump risk and book loops.

    ``with_greeks`` (GBM only) additionally carries the Brownian path W_t
    and the payoff-specific pathwise accumulators, returning
    ``(pay, S_T, (dσ, dr, dT))`` — the exact pathwise first-order
    observables 1{ITM}·d(inner)/d(σ, r, T); see ``_pathwise_dinner``.

    ``with_geo`` (arithmetic asian) also accumulates the running log-sum
    and returns ``(pay, S_T, pay_geo)`` with the same-kind geometric-
    average payoff — the control variate whose mean
    ``analytic.geometric_asian_price`` knows in closed form.
    """
    dt_ = dtype
    dt = fixed["T"] / n_steps
    sqrt_dt = jnp.sqrt(dt)
    n_cols = 2 * n_paths if antithetic else n_paths
    # Derive the initial carry from the key so its varying-axes type matches
    # the per-step draws inside shard_map (scan requires carry agreement).
    vary = jnp.zeros((), dt_) * jax.random.uniform(
        jax.random.fold_in(key, 2**30), (), dt_)
    S_init = jnp.full((n_cols,), fixed["S0"], dtype=dt_) + vary
    zeros = S_init * 0.0

    up = barrier_type.startswith("up")
    crossed0 = (S_init >= fixed["barrier"]) if up else \
        (S_init <= fixed["barrier"])

    # v carries the stochastic-vol state: variance (Heston) or σ (SABR)
    state0 = fixed["s_alpha0"] if model_kind.startswith("sabr") \
        else jnp.maximum(fixed["h_v0"], 0.0)
    v_init = zeros + state0
    if with_greeks and model_kind != "gbm":
        raise ValueError("pathwise Greek accumulators require GBM dynamics")
    if with_greeks and payoff not in _PATHWISE_OK + _LR_OK:
        raise ValueError(f"no Greek estimator for payoff {payoff!r}")
    carry0 = (
        S_init,
        zeros,                                  # running sum (excl. t=0)
        zeros,                                  # running log-sum
        S_init,                                 # running max (incl. t=0)
        S_init,                                 # running min
        crossed0 if payoff == "barrier" else zeros > 1.0,
        v_init,                                 # Heston variance state
    )
    if with_greeks:
        # (W, g1..g4, z1c): Brownian path + payoff-specific Greek
        # accumulators + first shock z₁ (gamma/LR scores)
        carry0 = carry0 + (zeros,) * 6

    exp_ = _exp_for(dt_)

    def gbm_step(S, z, t_now):
        mu = (fixed["r"] - fixed["q"] - 0.5 * fixed["sigma"] ** 2) * dt
        return S * exp_(mu + fixed["sigma"] * sqrt_dt * z)

    def lv_log_euler_step(S, z, t_now):
        sig = jnp.clip(jnp.asarray(sigma_loc(S, t_now), dt_), 0.0, jnp.inf)
        return S * exp_((fixed["r"] - fixed["q"] - 0.5 * sig * sig) * dt
                        + sig * sqrt_dt * z)

    def lv_milstein_step(S, z, t_now):
        sig = jnp.clip(jnp.asarray(sigma_loc(S, t_now), dt_), 1e-8, 10.0)
        eps = fixed["bump"] * S
        S_up = S + eps
        S_dn = jnp.maximum(S - eps, 1e-10)
        sig_up = jnp.asarray(sigma_loc(S_up, t_now), dt_)
        sig_dn = jnp.asarray(sigma_loc(S_dn, t_now), dt_)
        da_dS = (sig_up * S_up - sig_dn * S_dn) / (S_up - S_dn)
        a_t = sig * S
        S_n = (S + (fixed["r"] - fixed["q"]) * S * dt + a_t * sqrt_dt * z
               + 0.5 * a_t * da_dS * (z * z - 1.0) * dt)
        return jnp.maximum(S_n, 1e-10)

    def heston_step(S, v, z1, z2):
        v_eff = jnp.maximum(v, 0.0)  # full truncation
        S_new = S * exp_((fixed["r"] - fixed["q"] - 0.5 * v_eff) * dt
                         + _sqrt0(v_eff) * sqrt_dt * z1)
        v_new = jnp.maximum(
            v + fixed["h_kappa"] * (fixed["h_theta"] - v_eff) * dt
            + fixed["h_xi"] * _sqrt0(v_eff) * sqrt_dt * z2, 0.0)
        return S_new, v_new

    def heston_qe_step(S, v, zv, zs):
        # Andersen (2008) QE: moment-matched variance transition +
        # central log-asset step, ρ carried by the v-increment — same
        # scheme as processes._heston_qe_core (which documents the
        # full-truncation Euler bias this replaces: +0.20 of spot at
        # 50 steps on a Feller-violating 1y book)
        from jax.scipy.stats import norm as _norm

        kap, th = fixed["h_kappa"], fixed["h_theta"]
        xi, rho = fixed["h_xi"], fixed["h_rho"]
        emkt = exp_(-kap * dt)
        c1 = xi * xi * emkt * (1.0 - emkt) / kap
        c2 = th * xi * xi * (1.0 - emkt) ** 2 / (2.0 * kap)
        tiny = jnp.asarray(1e-12, dt_)
        m = th + (v - th) * emkt
        s2 = v * c1 + c2
        psi = s2 / jnp.maximum(m * m, tiny)
        two_over = 2.0 / jnp.maximum(jnp.minimum(psi, 1.5), tiny)
        b2 = (two_over - 1.0 + jnp.sqrt(two_over)
              * jnp.sqrt(jnp.maximum(two_over - 1.0, 0.0)))
        a = m / (1.0 + b2)
        bz = jnp.sqrt(jnp.maximum(b2, 0.0)) + zv
        u = _norm.cdf(zv)
        psi_e = jnp.maximum(psi, 1.5)
        p = (psi_e - 1.0) / (psi_e + 1.0)
        beta_e = (1.0 - p) / jnp.maximum(m, tiny)
        v_exp = jnp.where(
            u <= p, 0.0,
            jnp.log((1.0 - p) / jnp.maximum(1.0 - u, tiny)) / beta_e)
        v_new = jnp.where(psi <= 1.5, a * bz * bz, v_exp)
        g = 0.5
        K0 = -rho * kap * th * dt / xi
        K1 = g * dt * (kap * rho / xi - 0.5) - rho / xi
        K2 = g * dt * (kap * rho / xi - 0.5) + rho / xi
        K34 = g * dt * (1.0 - rho * rho)
        S_new = S * exp_((fixed["r"] - fixed["q"]) * dt + K0 + K1 * v
                         + K2 * v_new
                         + _sqrt0(K34 * (v + v_new)) * zs)
        return S_new, v_new

    def sabr_step(S, sig, z1, z2):
        # asset step with the PRE-update σ, then the exact lognormal σ
        # update — same ordering as processes._sabr_core (the reference
        # advances σ first, which biases the forward by e^{ρανT}; see the
        # divergence note there)
        nu = fixed["s_nu"]
        if model_kind == "sabr_ln":  # beta == 1: exact log-Euler
            S_n = S * exp_((fixed["r"] - fixed["q"]
                            - 0.5 * sig * sig) * dt
                           + sig * sqrt_dt * z1)
        else:  # CEV beta < 1: Euler with positivity clamp
            S_n = S + (fixed["r"] - fixed["q"]) * S * dt \
                + sig * (S ** fixed["s_beta"]) * sqrt_dt * z1
            S_n = jnp.maximum(S_n, 1e-12)
        sig_n = sig * exp_(nu * sqrt_dt * z2 - 0.5 * nu * nu * dt)
        return S_n, sig_n

    def merton_step(S, z, kp_counts, zj):
        # GBM + compound Poisson in log space with λκ compensator
        # (same discretisation as processes.merton_jump_paths)
        kappa_j = jnp.exp(fixed["m_mJ"] + 0.5 * fixed["m_sJ"] ** 2) - 1.0
        drift = (fixed["r"] - fixed["q"] - 0.5 * fixed["sigma"] ** 2
                 - fixed["m_lam"] * kappa_j) * dt
        y_sum = fixed["m_mJ"] * kp_counts \
            + fixed["m_sJ"] * _sqrt0(kp_counts) * zj
        return S * exp_(drift + fixed["sigma"] * sqrt_dt * z + y_sum)

    def vg_step(S, clock, z):
        # exact VG transition: gamma clock + conditional Gaussian,
        # log1p-form martingale correction (levy._vg_omega)
        th, nu = fixed["v_theta"], fixed["v_nu"]
        sig = fixed["v_sigma"]
        om = jnp.log1p(-(th * nu + 0.5 * sig * sig * nu)) / nu
        return S * exp_((fixed["r"] - fixed["q"] + om) * dt + th * clock
                        + sig * _sqrt0(clock) * z)

    def nig_step(S, clock, z):
        # exact NIG transition: inverse-Gaussian clock + conditional
        # Gaussian (levy.nig_paths discretisation)
        al, be = fixed["n_alpha"], fixed["n_beta"]
        de = fixed["n_delta"]
        gam = jnp.sqrt(al * al - be * be)
        om = de * (jnp.sqrt(al * al - (be + 1.0) ** 2) - gam)
        return S * exp_((fixed["r"] - fixed["q"] + om) * dt + be * clock
                        + _sqrt0(clock) * z)

    sv_model = model_kind in ("heston", "heston_qe", "sabr_ln", "sabr_cev")
    rho_sv = fixed["s_rho"] if model_kind.startswith("sabr") \
        else fixed["h_rho"]
    rho_perp = jnp.sqrt(jnp.maximum(0.0, 1.0 - rho_sv * rho_sv))

    step_fn = dict(gbm=gbm_step, lv_euler=lv_log_euler_step,
                   lv_milstein=lv_milstein_step).get(model_kind)

    def step(carry, t_idx):
        if with_greeks:
            (S, rsum, rlog, rmax, rmin, crossed, v,
             W, g1, g2, g3, g4, z1c) = carry
        else:
            S, rsum, rlog, rmax, rmin, crossed, v = carry
        zk = jax.random.fold_in(key, t_idx)
        t_now = t_idx.astype(dt_) * dt
        if sv_model:
            k2, kp = jax.random.split(zk)
            z2 = jax.random.normal(k2, (n_paths,), dt_)
            zp = jax.random.normal(kp, (n_paths,), dt_)
            if antithetic:
                z2 = jnp.concatenate([z2, -z2])
                zp = jnp.concatenate([zp, -zp])
            if model_kind == "heston_qe":
                # QE carries ρ through the v-increment: zv drives the
                # variance, zp is the INDEPENDENT asset shock
                S_new, v = heston_qe_step(S, v, z2, zp)
            else:
                z1 = rho_sv * z2 + rho_perp * zp
                sv_step = heston_step if model_kind == "heston" \
                    else sabr_step
                S_new, v = sv_step(S, v, z1, z2)
        elif model_kind == "merton":
            kz, kn, kj = jax.random.split(zk, 3)
            z = jax.random.normal(kz, (n_paths,), dt_)
            counts = jax.random.poisson(
                kn, fixed["m_lam"] * dt, (n_paths,)).astype(dt_)
            zj = jax.random.normal(kj, (n_paths,), dt_)
            if antithetic:
                z = jnp.concatenate([z, -z])
                counts = jnp.concatenate([counts, counts])
                zj = jnp.concatenate([zj, -zj])
            S_new = merton_step(S, z, counts, zj)
        elif model_kind in ("vg", "nig"):
            kc, kz = jax.random.split(zk)
            z = jax.random.normal(kz, (n_paths,), dt_)
            if model_kind == "vg":
                clock = jax.random.gamma(
                    kc, dt / fixed["v_nu"], (n_paths,), dt_) * fixed["v_nu"]
            else:
                from .levy import _sample_ig

                gam = jnp.sqrt(fixed["n_alpha"] ** 2
                               - fixed["n_beta"] ** 2)
                clock = _sample_ig(kc, fixed["n_delta"] * dt / gam,
                                   (fixed["n_delta"] * dt) ** 2,
                                   (n_paths,), dt_)
            if antithetic:
                # pairs share the subordinator clock; the conditional
                # Gaussian is negated (levy.vg_paths scheme)
                clock = jnp.concatenate([clock, clock])
                z = jnp.concatenate([z, -z])
            step_levy = vg_step if model_kind == "vg" else nig_step
            S_new = step_levy(S, clock, z)
        else:
            z = jax.random.normal(zk, (n_paths,), dt_)
            if antithetic:
                z = jnp.concatenate([z, -z])
            S_new = step_fn(S, z, t_now)
            if "div_amts" in fixed:
                # discrete cash dividend at node t_{idx+1}: drop applies
                # before the node is observed (payoff accumulators and
                # the barrier monitor see the post-drop spot, matching
                # the PDE jump-condition convention)
                S_new = jnp.maximum(
                    S_new - fixed["div_amts"][t_idx + 1], 1e-12)
        if with_greeks:
            W = W + sqrt_dt * z
            t_new = (t_idx.astype(dt_) + 1.0) * dt
            z1c = jnp.where(t_idx == 0, z, z1c)  # first shock
            if payoff in _LR_OK:
                # likelihood-ratio score ingredient: Σz²
                g2 = g2 + z * z
            if payoff == "asian":
                if average_type == "geometric":
                    g1 = g1 + W
                else:
                    g1 = g1 + S_new * W
                    g2 = g2 + S_new * t_new
            if payoff == "lookback":
                # record (W, t) at the step that sets a new extremum
                newmax = S_new > rmax
                newmin = S_new < rmin
                g1 = jnp.where(newmax, W, g1)
                g3 = jnp.where(newmax, t_new, g3)
                g2 = jnp.where(newmin, W, g2)
                g4 = jnp.where(newmin, t_new, g4)
        if payoff == "asian":
            rsum = rsum + S_new
            if average_type == "geometric" or with_geo:
                rlog = rlog + _log_for(dt_)(S_new)
        if payoff in ("lookback",):
            rmax = jnp.maximum(rmax, S_new)
            rmin = jnp.minimum(rmin, S_new)
        if payoff == "barrier":
            hit = (S_new >= fixed["barrier"]) if up else \
                (S_new <= fixed["barrier"])
            crossed = jnp.logical_or(crossed, hit)
        out = (S_new, rsum, rlog, rmax, rmin, crossed, v)
        if with_greeks:
            out = out + (W, g1, g2, g3, g4, z1c)
        return out, None

    carry, _ = jax.lax.scan(step, carry0, jnp.arange(n_steps))
    pay = _terminal_payoff(
        payoff, carry[:6], K=fixed["K"], kind=kind, n_steps=n_steps,
        barrier_type=barrier_type, rebate=fixed["rebate"],
        average_type=average_type, strike_type=strike_type,
        payout=fixed["payout"])
    if not with_greeks:
        if with_geo:
            geo = _exp_for(dt_)(carry[2] / n_steps)
            sgn = 1.0 if kind == "call" else -1.0
            pay_geo = jnp.maximum(sgn * (geo - fixed["K"]), 0.0)
            return pay, carry[0], pay_geo
        return pay, carry[0]
    S_T, rlog, rmax, rmin = carry[0], carry[2], carry[3], carry[4]
    W, g1, g2, g3, g4, z1c = carry[7:13]
    if payoff in _LR_OK:
        # host assembles the LR observables from (z1, W, Σz²)
        return pay, S_T, (z1c, W, g2)
    dinner = _pathwise_dinner(
        payoff, pay, S_T, rlog, rmax, rmin, W, g1, g2, g3, g4,
        K=fixed["K"], sigma=fixed["sigma"], r=fixed["r"], q=fixed["q"],
        T=fixed["T"], kind=kind, n_steps=n_steps,
        average_type=average_type, strike_type=strike_type)
    return pay, S_T, dinner + (z1c,)
