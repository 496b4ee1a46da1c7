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


# Giles' single-precision erfinv ("Approximating the erfinv function",
# GPU Computing Gems 2012): two degree-8 polynomials in w = −ln(1−x²)
# (central) / √w − 3 (tail). Unlike the classic Acklam rational — whose
# |coefficients| ≈ 276 lose ~coeff·eps32 ≈ 1.6e-5 of absolute accuracy
# when the Horner chain is evaluated in f32 — Giles' coefficients are O(1),
# so the f32 evaluation is accurate to a few ulps of z. (The Acklam form
# was the round-2 first cut; RQMC integration exposed its ~3e-5 systematic
# error floor, which this form removes.)
_GILES_CENTRAL = (2.81022636e-08, 3.43273939e-07, -3.5233877e-06,
                  -4.39150654e-06, 0.00021858087, -0.00125372503,
                  -0.00417768164, 0.246640727, 1.50140941)
_GILES_TAIL = (-0.000200214257, 0.000100950558, 0.00134934322,
               -0.00367342844, 0.00573950773, -0.0076224613,
               0.00943887047, 1.00167406, 2.83297682)


def _poly32(coeffs, x):
    p = jnp.float32(coeffs[0])
    for c in coeffs[1:]:
        p = p * x + jnp.float32(c)
    return p


_SQRT2 = 1.4142135623730951


def norminv32(u):
    """Φ⁻¹(u) for u ∈ (0, 1), f32, branchless (both regions evaluated).

    Φ⁻¹(u) = √2·erfinv(2u−1) with Giles' f32 polynomials; 1−x² is formed
    as (1−x)(1+x) so the tail keeps full precision, and the log is the
    bias-free :func:`log32`. One normal per uniform — versus Box-Muller's
    two normals per two uniforms plus a sin/cos pair. The argument of the
    log is floored at the half-width of the 24-bit uniform bin (the top
    bin midpoint 1−2⁻²⁵ rounds to 1.0 in f32), capping |z| ≲ 5.3 —
    consistent with the generators' 24-bit resolution.
    """
    u = u.astype(jnp.float32)
    x = jnp.float32(2.0) * u - jnp.float32(1.0)
    # 1−x² formed as 4u(1−u): x = fl(2u−1) itself loses the deep-tail
    # information (ulp(1) ≈ 1.2e-7 swamps a 1e-6 tail), while u and 1−u
    # are both exact-to-ulp on their respective tails.
    onem = jnp.float32(4.0) * u * (jnp.float32(1.0) - u)
    # floor = 2·2⁻²⁴: maps the unrepresentable top bin (u=1.0 in f32) to
    # the bin midpoint's z ≈ 5.42 instead of blowing up the log
    w = -log32(jnp.maximum(onem, jnp.float32(1.1920929e-7)))
    p_central = _poly32(_GILES_CENTRAL, w - jnp.float32(2.5))
    p_tail = _poly32(_GILES_TAIL, jnp.sqrt(w) - jnp.float32(3.0))
    p = jnp.where(w < jnp.float32(5.0), p_central, p_tail)
    return jnp.float32(_SQRT2) * p * x


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
