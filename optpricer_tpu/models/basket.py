"""Multi-asset pricing: correlated GBM baskets, spreads, rainbows.

A model family with no reference counterpart (the reference is strictly
single-asset — full audit in SURVEY.md §2). TPU-first design:

* Correlation is applied as ONE matmul ``Z @ L.T`` (Cholesky factor on
  the host) — the MXU does the heavy lifting, so 100 assets cost barely
  more than 2.
* Terminal European payoffs use the exact GBM terminal map — no time
  stepping, so a million correlated scenarios are a single fused program.
* The arithmetic basket ships with a geometric-basket control variate
  whose mean is exact (:func:`geometric_basket_price` — the weighted
  geometric average of lognormals is lognormal), the same design as the
  single-asset Asian CV.
* :func:`margrabe_price` (exact exchange-option closed form) provides a
  true oracle for the spread payoff.
* The jitted core is pure, so ``jax.grad`` delivers basket Greeks, and a
  ``mesh`` argument shards scenarios across chips with one psum of the
  CV sufficient statistics.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..dtypes import canonical
from ..ops import stats as stats_ops
from .monte_carlo import resolve_seed

__all__ = ["basket_price_mc", "basket_greeks_mc", "basket_exotic_mc",
           "geometric_basket_price", "margrabe_price",
           "rainbow_price_stulz"]

_PAYOFFS = ("basket", "spread", "rainbow_max", "rainbow_min")
_PATH_PAYOFFS = ("asian_basket", "worstof_barrier", "basket_barrier")


def _norm_cdf(x):
    return jax.scipy.stats.norm.cdf(x)


def geometric_basket_price(S0s, weights, K, T, r, qs, sigmas, corr, *,
                           kind="call"):
    """Exact price of a European option on the geometric basket
    ``G = Π S_i^{w_i}`` (weights on the simplex).

    ln G is Gaussian with mean Σw_i(ln S0_i + (r−q_i−σ_i²/2)T) and
    variance T·wᵀΣw (Σ_ij = σ_iσ_jρ_ij), so the price is one
    Black-Scholes evaluation. Control-variate mean for
    :func:`basket_price_mc` and an exact oracle for its sampler.
    """
    f64 = jax.config.jax_enable_x64
    dt_ = jnp.float64 if f64 else jnp.float32
    w = jnp.asarray(weights, dt_)
    S0s, qs, sigmas = (jnp.asarray(v, dt_) for v in (S0s, qs, sigmas))
    K, T, r = (jnp.asarray(v, dt_) for v in (K, T, r))
    corr = jnp.asarray(corr, dt_)
    mu = jnp.sum(w * (jnp.log(S0s) + (r - qs - 0.5 * sigmas ** 2) * T))
    cov = (sigmas[:, None] * corr * sigmas[None, :])
    var = T * w @ cov @ w
    sig = jnp.sqrt(var)
    df = jnp.exp(-r * T)
    F = jnp.exp(mu + 0.5 * var)
    d2 = (mu - jnp.log(K)) / sig
    d1 = d2 + sig
    call = df * (F * _norm_cdf(d1) - K * _norm_cdf(d2))
    put = df * (K * _norm_cdf(-d2) - F * _norm_cdf(-d1))
    return call if kind == "call" else put


def margrabe_price(S1, S2, T, q1=0.0, q2=0.0, *, sigma1, sigma2, rho):
    """Margrabe (1978) exchange option E[e^{−rT}·max(S1_T − S2_T, 0)] —
    rate-free closed form; exact oracle for the 2-asset ``spread``
    payoff at K = 0."""
    f64 = jax.config.jax_enable_x64
    dt_ = jnp.float64 if f64 else jnp.float32
    S1, S2, T, q1, q2 = (jnp.asarray(v, dt_) for v in (S1, S2, T, q1, q2))
    sig = jnp.sqrt(sigma1 ** 2 + sigma2 ** 2 - 2.0 * rho * sigma1 * sigma2)
    st = sig * jnp.sqrt(T)
    d1 = (jnp.log(S1 / S2) + (q2 - q1) * T) / st + 0.5 * st
    d2 = d1 - st
    return S1 * jnp.exp(-q1 * T) * _norm_cdf(d1) \
        - S2 * jnp.exp(-q2 * T) * _norm_cdf(d2)


def rainbow_price_stulz(S1, S2, K, T, r, q1=0.0, q2=0.0, *, sigma1,
                        sigma2, rho, kind: str = "call",
                        mode: str = "min"):
    """Stulz (1982) closed form for two-asset rainbow options: calls and
    puts on min(S1_T, S2_T) or max(S1_T, S2_T), strike K.

    Built from bivariate-normal rectangles
    (:func:`~optpricer_tpu.ops.bvn.bvn_cdf`).  Identities used (each an
    oracle test against the other and against ``basket_price_mc``'s
    ``rainbow_min``/``rainbow_max`` samplers):

    * C_max = C₁ + C₂ − C_min (max + min = sum, elementwise in payoff)
    * P = K·e^{−rT} − C(K=0) + C(K)   (rainbow put-call parity, with
      C(K=0) = e^{−rT}·E[min/max] — K is clamped to 1e-12 so the K=0
      evaluation degrades gracefully through the same code path)
    * margrabe_price(S1, S2) = S1·e^{−q1T} − C_min(K=0) (exchange =
      hold S1, give up the minimum).
    """
    if kind not in ("call", "put"):
        raise ValueError("kind must be 'call' or 'put'")
    if mode not in ("min", "max"):
        raise ValueError("mode must be 'min' or 'max'")
    from ..ops.bvn import bvn_cdf

    f64 = jax.config.jax_enable_x64
    dt_ = jnp.float64 if f64 else jnp.float32
    S1, S2, K, T, r, q1, q2, s1, s2, rho_ = (
        jnp.asarray(v, dt_)
        for v in (S1, S2, K, T, r, q1, q2, sigma1, sigma2, rho))
    K = jnp.maximum(K, 1e-12)
    sqT = jnp.sqrt(T)
    sig = jnp.sqrt(jnp.maximum(
        s1 * s1 + s2 * s2 - 2.0 * rho_ * s1 * s2, 1e-30))
    b1 = r - q1
    b2 = r - q2
    d = (jnp.log(S1 / S2) + (b1 - b2 + 0.5 * sig * sig) * T) / (sig * sqT)
    y1 = (jnp.log(S1 / K) + (b1 + 0.5 * s1 * s1) * T) / (s1 * sqT)
    y2 = (jnp.log(S2 / K) + (b2 + 0.5 * s2 * s2) * T) / (s2 * sqT)
    rho1 = (s1 - rho_ * s2) / sig
    rho2 = (s2 - rho_ * s1) / sig
    df = jnp.exp(-r * T)
    f1 = S1 * jnp.exp(-q1 * T)
    f2 = S2 * jnp.exp(-q2 * T)

    def c_min(K_, y1_, y2_):
        return (f1 * bvn_cdf(y1_, -d, -rho1)
                + f2 * bvn_cdf(y2_, d - sig * sqT, -rho2)
                - K_ * df * bvn_cdf(y1_ - s1 * sqT, y2_ - s2 * sqT, rho_))

    cmin = c_min(K, y1, y2)
    if mode == "min" and kind == "call":
        out = cmin
    else:
        # single-asset legs (for C_max) share the same primitives
        c1 = price_core_bs(S1, K, T, r, q1, s1)
        c2 = price_core_bs(S2, K, T, r, q2, s2)
        cmax = c1 + c2 - cmin
        if kind == "call":
            out = cmax
        else:
            big = jnp.asarray(1e-12, dt_)
            yb1 = (jnp.log(S1 / big) + (b1 + 0.5 * s1 * s1) * T) \
                / (s1 * sqT)
            yb2 = (jnp.log(S2 / big) + (b2 + 0.5 * s2 * s2) * T) \
                / (s2 * sqT)
            cmin0 = c_min(big, yb1, yb2)
            if mode == "min":
                out = K * df - cmin0 + cmin
            else:
                cmax0 = f1 + f2 - cmin0
                out = K * df - cmax0 + cmax
    return float(out) if out.ndim == 0 else out


def price_core_bs(S, K, T, r, q, sigma):
    """Vanilla BS call — local helper sharing this module's dtype
    conventions (the ops-level ``price_core`` is is_call-masked)."""
    st = sigma * jnp.sqrt(T)
    d1 = (jnp.log(S / K) + (r - q + 0.5 * sigma * sigma) * T) / st
    return S * jnp.exp(-q * T) * _norm_cdf(d1) \
        - K * jnp.exp(-r * T) * _norm_cdf(d1 - st)


@partial(jax.jit, static_argnames=("payoff", "is_call", "n_paths",
                                   "antithetic", "n_assets", "dtype"))
def _basket_stats(key, S0s, w, K, T, r, qs, sigmas, chol, *, payoff,
                  is_call, n_paths, antithetic, n_assets, dtype):
    """(6,) CV sufficient statistics for one scenario batch.

    X = discounted payoff, Y = discounted geometric-basket payoff (the
    control; zero column when the payoff has no geometric twin).
    """
    dt_ = dtype
    z = jax.random.normal(key, (n_paths, n_assets), dt_)
    if antithetic:
        z = jnp.concatenate([z, -z], axis=0)
    x = jnp.matmul(z, chol.T,                         # MXU: correlate
                   precision=jax.lax.Precision.HIGHEST)
    drift = (r - qs - 0.5 * sigmas ** 2) * T
    logS = jnp.log(S0s)[None, :] + drift[None, :] \
        + (sigmas * jnp.sqrt(T))[None, :] * x
    S = jnp.exp(logS)                                 # (n_eff, a)
    sign = 1.0 if is_call else -1.0
    if payoff in ("basket", "spread"):
        A = S @ w
        pay = jnp.maximum(sign * (A - K), 0.0)
    elif payoff == "rainbow_max":
        pay = jnp.maximum(sign * (jnp.max(S, axis=1) - K), 0.0)
    else:                                             # rainbow_min
        pay = jnp.maximum(sign * (jnp.min(S, axis=1) - K), 0.0)
    df = jnp.exp(-r * T)
    X = df * pay
    if payoff == "basket":
        G = jnp.exp(logS @ w)                         # geometric basket
        Y = df * jnp.maximum(sign * (G - K), 0.0)
    else:
        Y = jnp.zeros_like(X)
    n = jnp.asarray(X.size, dt_)
    return jnp.stack([n, jnp.sum(X), jnp.sum(X * X),
                      jnp.sum(Y), jnp.sum(Y * Y), jnp.sum(X * Y)])


def basket_price_mc(S0s, weights, K, T, r, qs=None, *, sigmas, corr,
                    payoff: str = "basket", kind: str = "call",
                    n_paths: int = 262_144, antithetic: bool = True,
                    control_variate: bool = True, seed=None, dtype=None,
                    mesh=None):
    """European multi-asset option by correlated-GBM Monte Carlo.

    ``payoff``:
      * ``"basket"`` — max(sign·(Σw_i S_i(T) − K), 0), weights on the
        simplex; prices with the exact geometric-basket control variate
        unless ``control_variate=False``.
      * ``"spread"`` — same form with signed weights (e.g. (1, −1) and
        K=0 is Margrabe's exchange option).
      * ``"rainbow_max"`` / ``"rainbow_min"`` — best-of / worst-of.

    Returns ``(price, stderr)``. With ``mesh``, scenarios shard across
    devices and the 6-stat vector rides one psum — estimator semantics
    identical to single-chip.
    """
    if payoff not in _PAYOFFS:
        raise ValueError(f"payoff must be one of {_PAYOFFS}")
    dt_ = canonical(dtype)
    S0s = np.atleast_1d(np.asarray(S0s, np.float64))
    a = S0s.size
    w = np.atleast_1d(np.asarray(weights, np.float64))
    qs = np.zeros(a) if qs is None else np.atleast_1d(
        np.asarray(qs, np.float64))
    sig = np.atleast_1d(np.asarray(sigmas, np.float64))
    corr = np.asarray(corr, np.float64)
    if not (w.shape == qs.shape == sig.shape == (a,)) \
            or corr.shape != (a, a):
        raise ValueError("S0s, weights, qs, sigmas must be length-a "
                         "vectors and corr an (a, a) matrix")
    if payoff == "basket" and (np.any(w < 0.0)
                               or abs(w.sum() - 1.0) > 1e-9):
        raise ValueError("basket weights must be non-negative and sum to "
                         "1 (use payoff='spread' for signed weights)")
    chol = np.linalg.cholesky(corr)  # raises on non-PSD input
    use_cv = bool(control_variate) and payoff == "basket"
    geo_ey = None
    if use_cv:
        geo_ey = float(geometric_basket_price(
            S0s, w, K, T, r, qs, sig, corr, kind=kind))

    args = (jnp.asarray(S0s, dt_), jnp.asarray(w, dt_),
            jnp.asarray(K, dt_), jnp.asarray(T, dt_), jnp.asarray(r, dt_),
            jnp.asarray(qs, dt_), jnp.asarray(sig, dt_),
            jnp.asarray(chol, dt_))
    static = dict(payoff=payoff, is_call=kind == "call",
                  antithetic=bool(antithetic), n_assets=a, dtype=dt_)
    key = jax.random.key(resolve_seed(seed))

    if mesh is None:
        s = _basket_stats(key, *args, n_paths=int(n_paths), **static)
    else:
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import mesh_axes

        axis = mesh_axes(mesh)
        n_dev = int(mesh.devices.size)
        n_local = -(-int(n_paths) // n_dev)

        @partial(jax.shard_map, mesh=mesh, in_specs=P(axis), out_specs=P())
        def shard_fn(ids):
            local = _basket_stats(jax.random.fold_in(key, ids[0]), *args,
                                  n_paths=n_local, **static)
            return jax.lax.psum(local, axis)

        s = shard_fn(jnp.arange(n_dev))

    import numpy as _np

    s = _np.asarray(jax.device_get(s), _np.float64)
    if use_cv:
        mean, se = stats_ops.cv_mean_se_np(s, geo_ey)
        return mean, max(se, 2e-6 * (1.0 + abs(mean)))
    n, mX = s[0], s[1] / s[0]
    vX = max(0.0, s[2] / s[0] - mX * mX)
    return float(mX), float(_np.sqrt(vX / n))


@partial(jax.jit, static_argnames=("payoff", "is_call", "n_paths", "n_steps",
                                   "antithetic", "n_assets", "barrier_up",
                                   "knock_in", "dtype"))
def _basket_path_stats(key, S0s, w, K, T, r, qs, sigmas, chol, barrier,
                       rebate, *, payoff, is_call, n_paths, n_steps,
                       antithetic, n_assets, barrier_up, knock_in, dtype):
    """(6,) CV sufficient statistics for a PATH-DEPENDENT multi-asset
    payoff: one ``lax.scan`` over time, correlation applied per step as a
    ``z @ Lᵀ`` MXU matmul, O(n_paths · n_assets) carry (log-spots +
    payoff aggregates — no (steps, paths, assets) tensor ever exists).
    Y = discounted terminal basket value, the model-free control with
    E[Y] = Σw_i·S0_i·e^{−q_i T}."""
    dt_ = dtype
    dt = T / n_steps
    sqdt = jnp.sqrt(dt)
    n_eff = 2 * n_paths if antithetic else n_paths
    drift = (r - qs - 0.5 * sigmas ** 2) * dt
    voldt = sigmas * sqdt
    sign = 1.0 if is_call else -1.0

    logS0 = jnp.log(S0s)
    B0 = S0s @ w
    m0 = jnp.min(S0s)
    lvl0 = B0 if payoff == "basket_barrier" else m0
    crossed0 = (lvl0 >= barrier) if barrier_up else (lvl0 <= barrier)

    carry0 = (
        jnp.broadcast_to(logS0, (n_eff, n_assets)),
        jnp.zeros((n_eff,), dt_),                  # running basket sum
        jnp.full((n_eff,), crossed0),              # crossed flag
    )

    def step(carry, t):
        logS, run_sum, crossed = carry
        z = jax.random.normal(jax.random.fold_in(key, t),
                              (n_paths, n_assets), dt_)
        if antithetic:
            z = jnp.concatenate([z, -z], axis=0)
        x = jnp.matmul(z, chol.T,
                       precision=jax.lax.Precision.HIGHEST)
        logS = logS + drift[None, :] + voldt[None, :] * x
        S = jnp.exp(logS)
        B = S @ w
        run_sum = run_sum + B
        lvl = B if payoff == "basket_barrier" else jnp.min(S, axis=1)
        hit = (lvl >= barrier) if barrier_up else (lvl <= barrier)
        crossed = crossed | hit
        return (logS, run_sum, crossed), None

    (logS, run_sum, crossed), _ = jax.lax.scan(
        step, carry0, jnp.arange(n_steps))
    S_T = jnp.exp(logS)
    B_T = S_T @ w

    def vanilla(x):
        return jnp.maximum(sign * (x - K), 0.0)

    if payoff == "asian_basket":
        pay = vanilla(run_sum / n_steps)           # t=0 excluded, as in
    else:                                          # the single-asset asian
        live = vanilla(jnp.min(S_T, axis=1)
                       if payoff == "worstof_barrier" else B_T)
        pay = jnp.where(crossed, live if knock_in else rebate,
                        rebate if knock_in else live)
    df = jnp.exp(-r * T)
    X = df * pay
    Y = df * B_T
    return jnp.stack([jnp.asarray(X.size, dt_), jnp.sum(X), jnp.sum(X * X),
                      jnp.sum(Y), jnp.sum(Y * Y), jnp.sum(X * Y)])


def basket_exotic_mc(S0s, weights, K, T, r, qs=None, *, sigmas, corr,
                     payoff: str = "asian_basket", kind: str = "call",
                     barrier: float = 0.0,
                     barrier_type: str = "down-and-in",
                     rebate: float = 0.0, n_steps: int = 64,
                     n_paths: int = 131_072, antithetic: bool = True,
                     control_variate: bool = True, seed=None, dtype=None,
                     mesh=None, backend: str = "auto"):
    """PATH-DEPENDENT multi-asset pricing: correlated-GBM time stepping.

    ``payoff``:
      * ``"asian_basket"`` — max(sign·(mean_t Σw_i S_i(t) − K), 0), the
        arithmetic average over the ``n_steps`` monitoring dates
        (t=0 excluded, single-asset asian convention).
      * ``"worstof_barrier"`` — barrier monitored on the worst asset
        min_i S_i(t) (t=0 included); terminal vanilla on the worst
        terminal spot. ``barrier_type`` in up/down × in/out. The
        1-asset limit reduces EXACTLY to the single-asset barrier
        semantics of :func:`~optpricer_tpu.models.mc_fused.exotic_price_mc`.
      * ``"basket_barrier"`` — barrier monitored on the basket value
        Σw_i S_i(t); terminal vanilla on the basket.

    One ``lax.scan`` over time; per-step correlation is a ``z @ Lᵀ``
    matmul on the MXU, so 100 assets step almost as fast as 2. Carry is
    O(n_paths·n_assets) — no path tensor. ``mesh=`` shards paths with
    one 6-stat psum (identical estimator to single-chip). The terminal
    basket spot is the control variate (E[Y] model-free); disable with
    ``control_variate=False``. Returns ``(price, stderr)``.

    ``backend``: "auto" runs the in-register Pallas basket kernel
    (``ops/pallas_basket_mc.py`` — one path tile per asset, chol applied
    as a lower-triangular fma chain on lanes) on TPU for f32 books of
    ≤16 assets, and the XLA scan otherwise (wide books keep the MXU
    matmul); "pallas"/"xla" force the choice.
    """
    if payoff not in _PATH_PAYOFFS:
        raise ValueError(f"payoff must be one of {_PATH_PAYOFFS}")
    if backend not in ("auto", "pallas", "xla"):
        raise ValueError(f"unknown backend {backend!r}")
    dt_ = canonical(dtype)
    S0s = np.atleast_1d(np.asarray(S0s, np.float64))
    a = S0s.size
    w = np.atleast_1d(np.asarray(weights, np.float64))
    qs = np.zeros(a) if qs is None else np.atleast_1d(
        np.asarray(qs, np.float64))
    sig = np.atleast_1d(np.asarray(sigmas, np.float64))
    corr = np.asarray(corr, np.float64)
    if not (w.shape == qs.shape == sig.shape == (a,)) \
            or corr.shape != (a, a):
        raise ValueError("S0s, weights, qs, sigmas must be length-a "
                         "vectors and corr an (a, a) matrix")
    chol = np.linalg.cholesky(corr)
    args = (jnp.asarray(S0s, dt_), jnp.asarray(w, dt_),
            jnp.asarray(K, dt_), jnp.asarray(T, dt_), jnp.asarray(r, dt_),
            jnp.asarray(qs, dt_), jnp.asarray(sig, dt_),
            jnp.asarray(chol, dt_), jnp.asarray(barrier, dt_),
            jnp.asarray(rebate, dt_))
    static = dict(payoff=payoff, is_call=kind == "call",
                  n_steps=int(n_steps), antithetic=bool(antithetic),
                  n_assets=a, barrier_up=barrier_type.startswith("up"),
                  knock_in=barrier_type.endswith("in"), dtype=dt_)
    kernel_ok = a <= 16 and dt_ == jnp.float32
    if backend == "pallas" and not kernel_ok:
        raise ValueError("backend='pallas' requires f32 and <=16 assets")
    if kernel_ok and (backend == "pallas" or
                      (backend == "auto"
                       and jax.default_backend() == "tpu")):
        from ..ops.pallas_basket_mc import (
            basket_path_sumstats_pallas, basket_path_sumstats_pallas_sharded)

        call = (resolve_seed(seed), int(n_paths), int(n_steps),
                S0s, w, float(K), float(T), float(r), qs, sig, chol,
                kind == "call")
        pk = dict(payoff=payoff, antithetic=bool(antithetic),
                  barrier=float(barrier), barrier_type=barrier_type,
                  rebate=float(rebate))
        if mesh is not None:
            s = basket_path_sumstats_pallas_sharded(mesh, *call, **pk)
        else:
            s = basket_path_sumstats_pallas(
                *call, interpret=jax.default_backend() != "tpu", **pk)
        s = np.asarray(jax.device_get(s), np.float64)
        if control_variate:
            ey = float(np.sum(w * S0s * np.exp(-qs * float(T))))
            mean, se = stats_ops.cv_mean_se_np(s, ey)
            return mean, max(se, 2e-6 * (1.0 + abs(mean)))
        n, mX = s[0], s[1] / s[0]
        vX = max(0.0, s[2] / s[0] - mX * mX)
        return float(mX), float(np.sqrt(vX / n))

    key = jax.random.key(resolve_seed(seed))

    if mesh is None:
        s = _basket_path_stats(key, *args, n_paths=int(n_paths), **static)
    else:
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import mesh_axes

        axis = mesh_axes(mesh)
        n_dev = int(mesh.devices.size)
        n_local = -(-int(n_paths) // n_dev)

        @partial(jax.shard_map, mesh=mesh, in_specs=P(axis), out_specs=P(),
                 check_vma=False)
        def shard_fn(ids):
            local = _basket_path_stats(
                jax.random.fold_in(key, 0x8A5E + ids[0]), *args,
                n_paths=n_local, **static)
            return jax.lax.psum(local, axis)

        s = shard_fn(jnp.arange(n_dev))

    s = np.asarray(jax.device_get(s), np.float64)
    if control_variate:
        # Y = e^{−rT}·B_T and E[B_T] = Σw_i·S0_i·e^{(r−q_i)T}, so
        # E[Y] = Σw_i·S0_i·e^{−q_i T} — model-free under any Q drift.
        ey = float(np.sum(w * S0s * np.exp(-qs * float(T))))
        return stats_ops.cv_mean_se_np(s, ey)
    n, mX = s[0], s[1] / s[0]
    vX = max(0.0, s[2] / s[0] - mX * mX)
    return float(mX), float(np.sqrt(vX / n))


@partial(jax.jit, static_argnames=("payoff", "is_call", "n_paths",
                                   "antithetic", "n_assets", "dtype"))
def _basket_greek_moments(key, S0s, w, K, T, r, qs, sigmas, chol, *,
                          payoff, is_call, n_paths, antithetic, n_assets,
                          dtype):
    """Per-scenario pathwise observables: X plus per-asset delta/vega.

    For basket/spread, pay = max(sign·(Σw_j S_j − K), 0) so
    ∂pay/∂S0_i = sign·1{ITM}·w_i·S_i/S0_i (S_i is linear in its own spot)
    and ∂pay/∂σ_i = sign·1{ITM}·w_i·S_i·(√T x_i − σ_i T).  For rainbows
    the active asset is the arg-extremum; ties have measure zero.
    Returns stacked sums: (1 + 2 + 4a,) = [n, ΣX, ΣX²,
    ΣD_1..ΣD_a, ΣD²_1.., ΣV_1.., ΣV²_1..].
    """
    dt_ = dtype
    z = jax.random.normal(key, (n_paths, n_assets), dt_)
    if antithetic:
        z = jnp.concatenate([z, -z], axis=0)
    x = jnp.matmul(z, chol.T,
                   precision=jax.lax.Precision.HIGHEST)
    drift = (r - qs - 0.5 * sigmas ** 2) * T
    logS = jnp.log(S0s)[None, :] + drift[None, :] \
        + (sigmas * jnp.sqrt(T))[None, :] * x
    S = jnp.exp(logS)
    sign = 1.0 if is_call else -1.0
    if payoff in ("basket", "spread"):
        A = S @ w
        itm = (sign * (A - K) > 0.0).astype(dt_)
        pay = jnp.maximum(sign * (A - K), 0.0)
        dpay_dS = sign * itm[:, None] * w[None, :]        # ∂pay/∂S_i
    elif payoff == "rainbow_max":
        A = jnp.max(S, axis=1)
        itm = (sign * (A - K) > 0.0).astype(dt_)
        pay = jnp.maximum(sign * (A - K), 0.0)
        active = (S == A[:, None]).astype(dt_)
        dpay_dS = sign * itm[:, None] * active
    else:
        A = jnp.min(S, axis=1)
        itm = (sign * (A - K) > 0.0).astype(dt_)
        pay = jnp.maximum(sign * (A - K), 0.0)
        active = (S == A[:, None]).astype(dt_)
        dpay_dS = sign * itm[:, None] * active
    df = jnp.exp(-r * T)
    X = df * pay
    D = df * dpay_dS * S / S0s[None, :]                   # (n, a) deltas
    V = df * dpay_dS * S * (jnp.sqrt(T) * x
                            - (sigmas * T)[None, :])      # (n, a) vegas
    return jnp.concatenate([
        jnp.asarray([X.size, jnp.sum(X), jnp.sum(X * X)], dt_),
        jnp.sum(D, axis=0), jnp.sum(D * D, axis=0),
        jnp.sum(V, axis=0), jnp.sum(V * V, axis=0)])


def basket_greeks_mc(S0s, weights, K, T, r, qs=None, *, sigmas, corr,
                     payoff: str = "basket", kind: str = "call",
                     n_paths: int = 262_144, antithetic: bool = True,
                     seed=None, dtype=None):
    """Price plus per-asset pathwise delta and vega vectors from ONE run.

    Returns ``{"price", "stderr", "delta", "delta_stderr", "vega",
    "vega_stderr"}`` with the Greek entries length-a numpy arrays.  The
    estimators are pathwise (payoffs are a.e. differentiable in every
    spot/vol), validated against central differences and, in the
    1-asset limit, analytic BS.
    """
    if payoff not in _PAYOFFS:
        raise ValueError(f"payoff must be one of {_PAYOFFS}")
    dt_ = canonical(dtype)
    S0s = np.atleast_1d(np.asarray(S0s, np.float64))
    a = S0s.size
    w = np.atleast_1d(np.asarray(weights, np.float64))
    qs = np.zeros(a) if qs is None else np.atleast_1d(
        np.asarray(qs, np.float64))
    sig = np.atleast_1d(np.asarray(sigmas, np.float64))
    corr = np.asarray(corr, np.float64)
    chol = np.linalg.cholesky(corr)
    key = jax.random.key(resolve_seed(seed))
    s = np.asarray(jax.device_get(_basket_greek_moments(
        key, jnp.asarray(S0s, dt_), jnp.asarray(w, dt_),
        jnp.asarray(K, dt_), jnp.asarray(T, dt_), jnp.asarray(r, dt_),
        jnp.asarray(qs, dt_), jnp.asarray(sig, dt_),
        jnp.asarray(chol, dt_), payoff=payoff, is_call=kind == "call",
        n_paths=int(n_paths), antithetic=bool(antithetic), n_assets=a,
        dtype=dt_)), np.float64)
    n = s[0]
    mX = s[1] / n
    seX = np.sqrt(max(0.0, s[2] / n - mX * mX) / n)

    def _vec(lo):
        m = s[lo:lo + a] / n
        v = np.maximum(0.0, s[lo + a:lo + 2 * a] / n - m * m)
        return m, np.sqrt(v / n)

    delta, delta_se = _vec(3)
    vega, vega_se = _vec(3 + 2 * a)
    return {"price": float(mX), "stderr": float(seX),
            "delta": delta, "delta_stderr": delta_se,
            "vega": vega, "vega_stderr": vega_se}
