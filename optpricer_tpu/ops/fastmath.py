"""Bias-free f32 exp/log for TPU kernels.

The TPU VPU's f32 ``exp`` approximation carries a systematic mean relative
bias of ≈ −8.6e-7 (measured on v5e; max |rel err| ≈ 5e-6), and ``log`` is
similarly approximate. For Monte-Carlo pricing this is fatal at the 1e-4
accuracy target: E[S_T] inherits the exp bias (≈ −9e-5 on S0=100) and the
control-variate correction, which trusts the *analytic* E[Y], converts it
into a price bias several times the statistical error.

These implementations decompose through the IEEE-754 exponent bits (exact)
and use short polynomials on the reduced interval, giving ≤ ~1 ulp error
with no systematic bias. Plain jnp bit ops — they lower in Pallas/Mosaic
and XLA alike.
"""
from __future__ import annotations

import jax.lax
import jax.numpy as jnp

__all__ = ["exp32", "log32", "norminv32"]

LOG2E = 1.4426950408889634
# ln2 split: hi has trailing zero bits, so e·LN2_HI is exact for small e
LN2_HI = 0.693145751953125
LN2_LO = 1.428606765330187e-06

# 2^f on f ∈ [−0.5, 0.5]: Taylor coefficients of exp(f·ln2), degree 7;
# remainder ≤ (ln2/2)^8/8! ≈ 5e-9 — below f32 resolution.
_EXP2_C = (
    1.0,
    6.931471805599453e-01,
    2.402265069591007e-01,
    5.550410866482158e-02,
    9.618129107628477e-03,
    1.3333558146428443e-03,
    1.5403530393381610e-04,
    1.5252733804059840e-05,
)


def _f32(i32):
    return jax.lax.bitcast_convert_type(i32, jnp.float32)


def _i32(f32):
    return jax.lax.bitcast_convert_type(f32, jnp.int32)


def exp32(x):
    """exp(x), f32, exact exponent-bit scaling + degree-7 polynomial.

    exp(x) = 2^n · 2^f, n = round(x·log2e), f ∈ [−0.5, 0.5]; 2^n is built
    exactly from the exponent field. Valid for |x| ≲ 85 (normal range).
    """
    x = x.astype(jnp.float32)
    t = x * jnp.float32(LOG2E)
    n = jnp.floor(t + jnp.float32(0.5))
    f = t - n
    p = jnp.float32(_EXP2_C[-1])
    for c in reversed(_EXP2_C[:-1]):
        p = p * f + jnp.float32(c)
    scale = _f32((n.astype(jnp.int32) + 127) << 23)
    return p * scale


# Acklam's inverse-normal-CDF rational approximation (|rel err| < 1.15e-9
# in exact arithmetic; f32 evaluation noise ~1e-6 absolute, oscillating).
# Central region |u−0.5| ≤ 0.47575: degree-5/5 rational in r = (u−0.5)².
_NI_A = (-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00)
_NI_B = (-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01)
# Tail region u < 0.02425 (mirrored for the upper tail): rational in
# t = sqrt(−2 ln u).
_NI_C = (-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00)
_NI_D = (7.784695709041462e-03, 3.224671290700398e-01,
         2.445134137142996e+00, 3.754408661907416e+00)


def _poly32(coeffs, x, tail_one: bool = False):
    p = jnp.float32(coeffs[0])
    for c in coeffs[1:]:
        p = p * x + jnp.float32(c)
    if tail_one:
        p = p * x + jnp.float32(1.0)
    return p


def norminv32(u):
    """Φ⁻¹(u) for u ∈ (0, 1), f32, branchless (both regions evaluated).

    One normal per uniform — versus Box-Muller's two normals per two
    uniforms plus a sin/cos pair. Uses the bias-free :func:`log32` in the
    tail so the tail shape carries no systematic distortion. With 24-bit
    bin-midpoint uniforms the representable range is |z| ≲ 5.47.
    """
    u = u.astype(jnp.float32)
    # central region: antisymmetric rational in q = u − 1/2
    q = u - jnp.float32(0.5)
    r = q * q
    z_central = q * _poly32(_NI_A, r) / _poly32(_NI_B, r, tail_one=True)
    # Tail region, evaluated on the mirrored uniform min(u, 1−u). The
    # mirror is floored at half the 24-bit bin width: the top bin midpoint
    # 1−2⁻²⁵ is not representable in f32 (it rounds to 1.0, making the
    # mirror 0), and the floor restores that bin's |z| ≈ 5.47 instead of a
    # log-floor blow-up.
    um = jnp.maximum(jnp.minimum(u, jnp.float32(1.0) - u),
                     jnp.float32(2.9802322e-8))
    t = jnp.sqrt(-2.0 * log32(um))
    z_tail = _poly32(_NI_C, t) / _poly32(_NI_D, t, tail_one=True)
    z_tail = jnp.where(u > 0.5, -z_tail, z_tail)
    return jnp.where(um < jnp.float32(0.02425), z_tail, z_central)


def log32(u):
    """ln(u) for positive normal u, f32, ≤ ~1 ulp, no systematic bias.

    Exponent/mantissa split is exact; ln(m) on m ∈ [√2/2, √2] via the
    atanh series 2s·(1 + s²/3 + s⁴/5 + s⁶/7 + s⁸/9), s = (m−1)/(m+1),
    |s| ≤ 0.1716 ⇒ truncation < 4e-9.
    """
    u = u.astype(jnp.float32)
    bits = _i32(u)
    e = (bits >> 23) - 127
    m = _f32((bits & jnp.int32(0x7FFFFF)) | jnp.int32(127 << 23))
    big = m > jnp.float32(1.4142135623730951)
    m = jnp.where(big, m * jnp.float32(0.5), m)
    e = (e + big.astype(jnp.int32)).astype(jnp.float32)
    s = (m - jnp.float32(1.0)) / (m + jnp.float32(1.0))
    s2 = s * s
    poly = jnp.float32(1.0 / 9.0)
    for c in (1.0 / 7.0, 1.0 / 5.0, 1.0 / 3.0, 1.0):
        poly = poly * s2 + jnp.float32(c)
    ln_m = jnp.float32(2.0) * s * poly
    return e * jnp.float32(LN2_HI) + (ln_m + e * jnp.float32(LN2_LO))
