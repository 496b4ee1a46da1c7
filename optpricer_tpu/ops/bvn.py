"""Bivariate standard-normal CDF Φ₂(h, k, ρ) — Genz's algorithm in jnp.

The closed forms for compound options (Geske 1979), two-asset rainbow
options (Stulz 1982) and partial-window barriers all reduce to Φ₂.
Neither jax.scipy nor the reference implements one (the reference has no
products needing it — this module EXTENDS the surface rather than
mirroring ``/root/reference``).

Implementation: Genz (2004) "Numerical computation of rectangular
bivariate and trivariate normal and t probabilities", the standard
``bvnu`` construction, fully vectorised:

* |ρ| ≤ 0.925 — Gauss-Legendre quadrature of Drezner-Wesolowsky's
  single integral over θ = asin(ρ),
* |ρ| > 0.925 — Genz's expansion around |ρ| = 1 (the θ-integrand
  becomes a near-singular spike there): the analytic boundary terms
  plus a Gauss-Legendre-integrated remainder in s = √(1−ρ²).

Both branches are evaluated unconditionally (TPU-friendly: no
data-dependent control flow) with denominators clamped so the
unselected branch stays finite — ``jnp.where`` then picks per element.
20-point quadrature: max |err| ≈ 5e-16 vs scipy's f64 oracle on a
dense (h, k, ρ) grid including |ρ| = 0.999 (see tests/test_bvn.py).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax.scipy.stats import norm

__all__ = ["bvn_cdf"]

# 20-point Gauss-Legendre on [-1, 1], host-computed once
_GL_X, _GL_W = np.polynomial.legendre.leggauss(20)
_TINY = 1e-30


def _bvnu(h, k, r):
    """P(X > h, Y > k) for standard bivariate normal with correlation r.

    h, k, r broadcast elementwise; r is clamped to [-1+1e-12, 1-1e-12]
    (the |ρ| → 1 limits max(0, Φ(−max(h,k))) and max(0, Φ(−h)−Φ(k))
    are reproduced to full precision by the expansion branch).
    """
    h, k, r = jnp.broadcast_arrays(*(jnp.asarray(a) for a in (h, k, r)))
    dtype = jnp.result_type(h, k, r)
    if not jnp.issubdtype(dtype, jnp.floating):
        from ..dtypes import canonical

        dtype = canonical(None)
    h, k, r = (a.astype(dtype) for a in (h, k, r))
    r = jnp.clip(r, -1.0 + 1e-12, 1.0 - 1e-12)
    x = jnp.asarray(_GL_X, dtype)
    w = jnp.asarray(_GL_W, dtype)

    hk = h * k

    # ---- branch 1: |r| <= 0.925 -------------------------------------
    hs = 0.5 * (h * h + k * k)
    asr = jnp.arcsin(r)
    # θ_i = asr(1+x_i)/2 ∈ [0, asr]; ∫₀^asr … dθ = asr/2 · Σ wᵢ f(θᵢ)
    sn = jnp.sin(asr[..., None] * (1.0 + x) * 0.5)
    denom = jnp.maximum(1.0 - sn * sn, _TINY)
    f = jnp.exp((sn * hk[..., None] - hs[..., None]) / denom)
    integral = asr * 0.5 * jnp.sum(w * f, axis=-1)
    bvn_small = integral / (2.0 * jnp.pi) + norm.cdf(-h) * norm.cdf(-k)

    # ---- branch 2: |r| > 0.925 (expansion around |r| = 1) -----------
    # map r < 0 onto r > 0 via (h, k, r) → (h, −k, −r):
    # P(X>h, Y>k; r<0) = Φ(−h) − P(X>h, Y>−k; −r)
    neg = r < 0.0
    k2 = jnp.where(neg, -k, k)
    hk2 = jnp.where(neg, -hk, hk)
    ass = jnp.maximum((1.0 - r) * (1.0 + r), _TINY)   # 1 − r²
    a = jnp.sqrt(ass)
    bs = (h - k2) ** 2
    c = (4.0 - hk2) / 8.0
    d = (12.0 - hk2) / 16.0
    asr2 = -0.5 * (bs / ass + hk2)
    t0 = a * jnp.exp(asr2) * (1.0 - c * (bs - ass)
                              * (1.0 - d * bs / 5.0) / 3.0
                              + c * d * ass * ass / 5.0)
    b = jnp.sqrt(bs)
    sp = jnp.sqrt(2.0 * jnp.pi) * norm.cdf(-b / jnp.maximum(a, _TINY))
    t1 = jnp.exp(jnp.minimum(-0.5 * hk2, 80.0)) * sp * b \
        * (1.0 - c * bs * (1.0 - d * bs / 5.0) / 3.0)
    acc = t0 - t1
    # remainder: ∫₀^a g(s) ds, s_i = a(1+x_i)/2
    s_i = (a * 0.5)[..., None] * (1.0 + x)
    xs = s_i * s_i
    rs = jnp.sqrt(jnp.maximum(1.0 - xs, _TINY))
    asr1 = -0.5 * (bs[..., None] / jnp.maximum(xs, _TINY) + hk2[..., None])
    sp1 = 1.0 + c[..., None] * xs * (1.0 + d[..., None] * xs)
    ep = jnp.exp(-hk2[..., None] * (1.0 - rs) / (2.0 * (1.0 + rs))) / rs
    g = jnp.exp(asr1) * (ep - sp1)
    acc = acc + (a * 0.5) * jnp.sum(w * g, axis=-1)
    bvn_big = -acc / (2.0 * jnp.pi)
    bvn_big_pos = bvn_big + norm.cdf(-jnp.maximum(h, k2))
    bvn_big_neg = -bvn_big + jnp.maximum(0.0, norm.cdf(k2) - norm.cdf(h))
    bvn_big = jnp.where(neg, bvn_big_neg, bvn_big_pos)

    out = jnp.where(jnp.abs(r) <= 0.925, bvn_small, bvn_big)
    return jnp.clip(out, 0.0, 1.0)


def bvn_cdf(h, k, rho):
    """Φ₂(h, k, ρ) = P(X ≤ h, Y ≤ k), X, Y standard normal, corr ρ.

    Elementwise over broadcastable ``h, k, rho``; f64 gives ~1e-15
    absolute accuracy, f32 is quadrature-exact to ~1e-7.  Jittable and
    differentiable (all branch denominators are clamped, so the
    unselected ``where`` branch never produces NaN to poison AD).
    """
    return _bvnu(-jnp.asarray(h), -jnp.asarray(k), rho)
