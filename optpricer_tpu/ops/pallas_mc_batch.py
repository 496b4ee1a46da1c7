"""Fused Pallas TPU kernel: terminal-GBM MC for a whole strike/kind book.

The strike axis is laid out on the 128 vector lanes: every (row, lane)
element is an independent draw priced against that lane's strike, so a
128-option ladder costs the same per draw as a single option — the payoff
compare and the 10-statistic reduction are lane-local. Books larger than
128 extend the grid's second dimension with one lane-tile per block.

Estimator per lane: pair-averaged antithetic + dual control variates
(terminal spot, digital), solved in closed form per strike on the host
(2×2 normal equations, vectorised over the book).
"""
from __future__ import annotations

from functools import partial
from math import erf, exp, log, sqrt

import jax
import jax.numpy as jnp
import numpy as np

from . import stats as stats_ops
from .fastmath import exp32, log32
from .swprng import threefry2x32

BLOCK_R = 256
LANES = 128
NSTAT = stats_ops.STATS2_DIM
STAT_ROWS = 16  # NSTAT padded to sublane multiple


def _mc_batch_kernel(seed_ref, par_ref, kp_ref, out_ref, *, reps: int,
                     antithetic: bool, sw_prng: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pid = pl.program_id(0)
    ktile = pl.program_id(1)
    n_prog = pl.num_programs(0)
    if not sw_prng:
        pltpu.prng_seed(seed_ref[0] * jnp.int32(1103515245)
                        + ktile * n_prog + pid)

    n_paths = par_ref[0]

    # Fully heterogeneous book: every contract/market field is per lane.
    K = kp_ref[0, 0, :]      # strike
    sign = kp_ref[0, 1, :]   # +1 call / −1 put
    S0 = kp_ref[0, 2, :]     # spot
    mu = kp_ref[0, 3, :]     # (r−q−σ²/2)·T
    sig = kp_ref[0, 4, :]    # σ√T
    df = kp_ref[0, 5, :]     # e^{−rT}

    two_pi = 6.283185307179586
    tiny = 5.9604645e-8

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_R, LANES), 0) \
        .astype(jnp.float32)

    def rep_body(j, carry):
        acc, comp = carry
        if sw_prng:
            # counter-based software PRNG (interpret mode — ops/swprng.py);
            # i32 casts guard against i64 fori_loop vars on the x64 harness
            rws = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_R, LANES), 0)
            cls = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_R, LANES), 1)
            elem = (rws * LANES + cls).astype(jnp.int32)
            d = jnp.broadcast_to(jnp.asarray(j).astype(jnp.int32),
                                 (BLOCK_R, LANES))
            bits_a, bits_b = threefry2x32(
                seed_ref[0], ktile * n_prog + pid,
                pltpu.bitcast(elem, jnp.uint32), pltpu.bitcast(d, jnp.uint32))
        else:
            bits_a = pltpu.bitcast(pltpu.prng_random_bits((BLOCK_R, LANES)),
                                   jnp.uint32)
            bits_b = pltpu.bitcast(pltpu.prng_random_bits((BLOCK_R, LANES)),
                                   jnp.uint32)
        u1 = (pltpu.bitcast(bits_a >> 8, jnp.int32).astype(jnp.float32)
              + 0.5) * tiny
        u2 = pltpu.bitcast(bits_b >> 8, jnp.int32).astype(jnp.float32) * tiny
        rad = jnp.sqrt(-2.0 * log32(u1))
        theta = two_pi * u2
        z1 = rad * jnp.cos(theta)
        z2 = rad * jnp.sin(theta)

        # Per-lane draw budget: rows of this tile count toward each lane's
        # own n_paths (draws are lane-independent).
        prog_offset = (pid.astype(jnp.float32) * reps
                       + j.astype(jnp.float32)) * (2.0 * BLOCK_R)
        rem1 = n_paths - prog_offset
        rem2 = rem1 - BLOCK_R
        w1 = (row_ids < rem1).astype(jnp.float32)
        w2 = (row_ids < rem2).astype(jnp.float32)

        def xy(z):
            ST = S0 * exp32(mu + sig * z)
            X = df * jnp.maximum(sign * (ST - K), 0.0)
            Y1 = df * ST
            Y2 = df * (sign * (ST - K) > 0.0).astype(jnp.float32)
            return X, Y1, Y2

        def moments(X, Y1, Y2, w):
            WX = X * w
            WY1 = Y1 * w
            WY2 = Y2 * w
            red = lambda v: jnp.sum(v, axis=0)  # per-lane sums → (128,)
            return jnp.stack([
                red(w),
                red(WX), red(WX * X),
                red(WY1), red(WY1 * Y1), red(WX * Y1),
                red(WY2), red(WY2 * Y2), red(WX * Y2),
                red(WY1 * Y2),
            ])

        if antithetic:
            def pair(z, w):
                Xa, Y1a, Y2a = xy(z)
                Xb, Y1b, Y2b = xy(-z)
                return moments(0.5 * (Xa + Xb), 0.5 * (Y1a + Y1b),
                               0.5 * (Y2a + Y2b), w)

            s = pair(z1, w1) + pair(z2, w2)
        else:
            Xa, Y1a, Y2a = xy(z1)
            Xb, Y1b, Y2b = xy(z2)
            s = moments(Xa, Y1a, Y2a, w1) + moments(Xb, Y1b, Y2b, w2)
        return stats_ops.kahan_add(acc, comp, s)

    zero = jnp.zeros((NSTAT, LANES), jnp.float32)
    acc, _ = jax.lax.fori_loop(0, reps, rep_body, (zero, zero))
    out = jnp.concatenate(
        [acc, jnp.zeros((STAT_ROWS - NSTAT, LANES), jnp.float32)], axis=0)
    out_ref[0, 0, :, :] = out


@partial(jax.jit, static_argnames=("n_programs", "n_ktiles", "reps",
                                   "antithetic", "interpret", "sw_prng"))
def _run_batch_kernel(seed, params, kparams, *, n_programs, n_ktiles, reps,
                      antithetic, interpret=False, sw_prng=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if sw_prng is None:
        # Mosaic interpreter stubs the hardware PRNG to zeros (ops/swprng.py)
        sw_prng = bool(interpret)
    kernel = partial(_mc_batch_kernel, reps=reps, antithetic=antithetic,
                     sw_prng=bool(sw_prng))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (n_programs, n_ktiles, STAT_ROWS, LANES), jnp.float32),
        grid=(n_programs, n_ktiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, LANES), lambda i, k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, STAT_ROWS, LANES),
                               lambda i, k: (i, k, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, params, kparams)
    # Deterministic compensated combine over programs → (n_ktiles, 10, 128)
    return jax.vmap(stats_ops.combine_scan, in_axes=1)(
        out[:, :, :NSTAT, :].reshape(n_programs, n_ktiles, -1)
    ).reshape(n_ktiles, NSTAT, LANES)


def euro_price_mc_batch(S0, K, T, r, q, sigma, kind, *,
                        n_paths: int = 1_000_000, seed: int = 0,
                        antithetic: bool = True,
                        control_variate: bool = True,
                        interpret: bool = False):
    """Price a fully heterogeneous European book by fused Pallas MC.

    Every argument broadcasts over the book (per-position S0/K/T/r/q/σ/kind
    all allowed — each lane carries its own contract and market). Each
    option receives ``n_paths`` base draws, independent across the book.
    Returns ``(prices, stderrs)`` shaped like the broadcast book.
    ``interpret`` runs the kernel in the Mosaic interpreter with the
    software PRNG (CPU harness — ops/swprng.py).
    """
    from .black_scholes import is_call_mask

    mask0 = np.atleast_1d(is_call_mask(kind))
    cols = [np.atleast_1d(np.asarray(v, dtype=float))
            for v in (S0, K, T, r, q, sigma)]
    B = int(np.broadcast_shapes(*(c.shape for c in cols),
                                mask0.shape)[0])
    S0a, Ka, Ta, ra, qa, siga = (np.broadcast_to(c, (B,)).astype(float)
                                 for c in cols)
    mask = np.broadcast_to(mask0, (B,)).astype(float)

    n_ktiles = -(-B // LANES)
    pad = n_ktiles * LANES - B

    def padded(v, fill=None):
        tail = np.full(pad, v[-1] if fill is None else fill)
        return np.concatenate([v, tail]).reshape(n_ktiles, LANES)

    mu = (ra - qa - 0.5 * siga**2) * Ta
    sg = siga * np.sqrt(Ta)
    df = np.exp(-ra * Ta)

    kparams = np.zeros((n_ktiles, 8, LANES), np.float32)
    kparams[:, 0, :] = padded(Ka)
    kparams[:, 1, :] = padded(2 * mask - 1.0)
    kparams[:, 2, :] = padded(S0a)
    kparams[:, 3, :] = padded(mu)
    kparams[:, 4, :] = padded(sg)
    kparams[:, 5, :] = padded(df)

    per_rep = 2 * BLOCK_R  # base draws per lane per rep
    target_programs = 16
    reps = max(1, -(-int(n_paths) // (per_rep * target_programs)))
    n_programs = -(-int(n_paths) // (per_rep * reps))

    params = jnp.asarray([float(n_paths)], jnp.float32)
    seed_arr = jnp.asarray([seed % (2**31 - 1)], jnp.int32)

    stats = np.asarray(jax.device_get(_run_batch_kernel(
        seed_arr, params, jnp.asarray(kparams), n_programs=int(n_programs),
        n_ktiles=int(n_ktiles), reps=int(reps),
        antithetic=bool(antithetic), interpret=bool(interpret))), np.float64)
    s = stats.transpose(1, 0, 2).reshape(NSTAT, -1)[:, :B]  # (10, B)

    n = s[0]
    mX = s[1] / n
    vX = np.maximum(0.0, s[2] / n - mX**2)
    out_shape = (B,)
    if not control_variate:
        return mX.reshape(out_shape), np.sqrt(vX / n).reshape(out_shape)

    m1, m2 = s[3] / n, s[6] / n
    v11 = np.maximum(0.0, s[4] / n - m1**2)
    v22 = np.maximum(0.0, s[7] / n - m2**2)
    c1X = s[5] / n - m1 * mX
    c2X = s[8] / n - m2 * mX
    c12 = s[9] / n - m1 * m2
    det = v11 * v22 - c12**2
    det = np.where(det > 1e-30, det, np.inf)
    b1 = (v22 * c1X - c12 * c2X) / det
    b2 = (v11 * c2X - c12 * c1X) / det

    EY1 = S0a * np.exp(-qa * Ta)
    srt = siga * np.sqrt(Ta)
    d2 = (np.log(S0a / Ka) + (ra - qa) * Ta - 0.5 * srt**2) / srt
    Phi = np.vectorize(lambda x: 0.5 * (1.0 + erf(x / sqrt(2.0))))
    sign_b = 2 * mask - 1.0
    EY2 = df * Phi(sign_b * d2)

    explained = b1 * c1X + b2 * c2X
    mean = mX - b1 * (m1 - EY1) - b2 * (m2 - EY2)
    var = np.maximum(0.0, vX - explained)
    se = np.sqrt(var / n)
    # f32 kernel arithmetic floor: when the CVs explain (numerically) all
    # of the variance — e.g. a permanently-ITM payoff is exactly linear in
    # S_T — the statistical se underestimates the true uncertainty, which
    # is then set by f32 moment roundoff (~1e-6 relative).
    se = np.maximum(se, 2e-6 * (1.0 + np.abs(mean)))
    return mean.reshape(out_shape), se.reshape(out_shape)
