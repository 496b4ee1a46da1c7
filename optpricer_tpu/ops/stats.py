"""Sufficient-statistics reductions for Monte-Carlo estimators.

The reference's key distributed-correctness design (``monte_carlo.py:11-74``)
is that every worker returns only six sufficient statistics
``(n, ΣX, ΣX², ΣY, ΣY², ΣXY)`` so chunk aggregation is exact, associative and
layout-independent. The TPU build keeps exactly that contract: stats are a
dense ``(6,)`` vector so they can be ``psum``-ed over an ICI mesh axis, and
cross-chunk accumulation uses Kahan compensation so float32 on TPU holds the
|err| ≤ 1e-4 accuracy gate at billions of paths.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Layout of the stats vector
N, SX, SX2, SY, SY2, SXY = range(6)
STATS_DIM = 6


def sumstats(X: jax.Array, Y: jax.Array, weight: jax.Array | None = None) -> jax.Array:
    """Sufficient statistics (6,) of payoff X and control variate Y.

    ``weight`` is an optional 0/1 mask (tail-chunk masking) broadcast to X.
    """
    if weight is None:
        n = jnp.asarray(X.size, X.dtype)
        WX, WY = X, Y
    else:
        w = weight.astype(X.dtype)
        n = jnp.sum(w)
        WX, WY = X * w, Y * w
    return jnp.stack([
        n,
        jnp.sum(WX),
        jnp.sum(WX * X),
        jnp.sum(WY),
        jnp.sum(WY * Y),
        jnp.sum(WX * Y),
    ])


def kahan_add(acc, comp, x):
    """One compensated (Kahan) accumulation step; acc/comp/x broadcast."""
    y = x - comp
    t = acc + y
    comp = (t - acc) - y
    return t, comp


def combine_scan(stats_seq: jax.Array) -> jax.Array:
    """Deterministic compensated reduction of a (n_chunks, 6) stats array.

    Fixed sequential order (lax.scan) ⇒ results are independent of how the
    chunks were produced — the seed-reproducibility contract.
    """

    def step(carry, s):
        acc, comp = carry
        acc, comp = kahan_add(acc, comp, s)
        return (acc, comp), None

    zero = jnp.zeros((stats_seq.shape[-1],), stats_seq.dtype)
    (acc, _), _ = jax.lax.scan(step, (zero, zero), stats_seq)
    return acc


def mean_se(stats: jax.Array):
    """Plain estimator: (mean, stderr) from a stats vector."""
    n = stats[N]
    mean = stats[SX] / n
    var = jnp.maximum(0.0, stats[SX2] / n - mean * mean)
    return mean, jnp.sqrt(var / n)


# Extended layout for the dual-control-variate estimator (Pallas path):
# (n, ΣX, ΣX², ΣY1, ΣY1², ΣXY1, ΣY2, ΣY2², ΣXY2, ΣY1Y2)
STATS2_DIM = 10

# Greek-moment extension (terminal GBM engines): three z-weighted moments
# (ΣXz, ΣXz², ΣY2z) appended to the dual-CV layout. Together with the
# dual-CV moments they close the full pathwise/likelihood-ratio Greek set —
# delta, vega, rho, theta (pathwise) and gamma (LR) are all linear in these
# 13 expectations, so a *single* kernel run prices and risks an option
# (see ops.pallas_mc.pallas_greeks). Under antithetic sampling each
# z-moment is accumulated pair-averaged: 0.5·(X⁺·z + X⁻·(−z)) is one
# observation, keeping every estimator unbiased under pairing.
SXZ, SXZ2, SY2Z = 10, 11, 12
STATSG_DIM = 13


def cv2_mean_se(stats: "np.ndarray", EY1: float, EY2: float):
    """Two-variable control-variate estimator with known means.

    β = Cov(Y,Y)⁻¹ Cov(Y,X); mean = m_X − βᵀ(m_Y − EY);
    Var = Var(X) − Cov(Y,X)ᵀβ (optimal-β variance). Host-side float64.
    """
    import numpy as np

    s = np.asarray(stats, np.float64)
    n = s[0]
    mX = s[1] / n
    vX = max(0.0, s[2] / n - mX * mX)
    m1, m2 = s[3] / n, s[6] / n
    v11 = max(0.0, s[4] / n - m1 * m1)
    v22 = max(0.0, s[7] / n - m2 * m2)
    c1X = s[5] / n - m1 * mX
    c2X = s[8] / n - m2 * mX
    c12 = s[9] / n - m1 * m2
    C = np.array([[v11, c12], [c12, v22]])
    b = np.array([c1X, c2X])
    try:
        beta = np.linalg.solve(C + 1e-18 * np.eye(2), b)
    except np.linalg.LinAlgError:
        beta = np.zeros(2)
    mean = mX - beta[0] * (m1 - EY1) - beta[1] * (m2 - EY2)
    var = max(0.0, vX - float(b @ beta))
    return float(mean), float(np.sqrt(var / n))


def cv_mean_se_np(stats, EY: float):
    """Host float64 single-CV estimator (the traced version below downcasts
    to f32 when x64 is off, which wastes the Kahan-accumulated precision)."""
    import numpy as np

    s = np.asarray(stats, np.float64)
    n = s[N]
    meanX = s[SX] / n
    varX = max(0.0, s[SX2] / n - meanX * meanX)
    meanY = s[SY] / n
    varY = max(0.0, s[SY2] / n - meanY * meanY)
    covXY = s[SXY] / n - meanX * meanY
    c_hat = 0.0 if varY == 0.0 else covXY / varY
    mean = meanX - c_hat * (meanY - float(EY))
    var = max(0.0, varX - 2.0 * c_hat * covXY + c_hat * c_hat * varY)
    return float(mean), float(np.sqrt(var / n))


def cv_mean_se(stats: jax.Array, EY: jax.Array):
    """Control-variate estimator with known E[Y].

    ĉ = Cov(X,Y)/Var(Y); mean_cv = mean(X) − ĉ(mean(Y) − EY);
    Var_cv = Var(X) − 2ĉCov + ĉ²Var(Y) (reference ``monte_carlo.py:150-163``).
    """
    n = stats[N]
    meanX = stats[SX] / n
    varX = jnp.maximum(0.0, stats[SX2] / n - meanX * meanX)
    meanY = stats[SY] / n
    varY = jnp.maximum(0.0, stats[SY2] / n - meanY * meanY)
    covXY = stats[SXY] / n - meanX * meanY
    c_hat = jnp.where(varY == 0.0, 0.0, covXY / jnp.where(varY == 0.0, 1.0, varY))
    mean_cv = meanX - c_hat * (meanY - EY)
    var_cv = jnp.maximum(0.0, varX - 2.0 * c_hat * covXY + c_hat * c_hat * varY)
    return mean_cv, jnp.sqrt(var_cv / n)
