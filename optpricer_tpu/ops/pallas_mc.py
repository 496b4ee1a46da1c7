"""Fused Pallas TPU kernel for terminal-GBM Monte-Carlo sufficient stats.

The reference's hot loop is host RNG + payoff over a materialised draw vector
(``monte_carlo.py:30-64``). This kernel is the speed-of-light version for
TPU: random bits come from the per-core hardware PRNG, become normals via
Box-Muller, go through the exact terminal GBM map and payoff, and are reduced
to sufficient statistics **in registers** — no draw array ever touches HBM.
The only HBM traffic is one stats row per grid program; the op is
compute-bound on transcendentals.

Statistics layout (``stats.STATS2_DIM`` = 10) supports a *dual* control
variate — Y1 = e^{−rT}·S_T (E = S0·e^{−qT−rT}·e^{rT}… i.e. S0·e^{−qT}) and
Y2 = e^{−rT}·1{S_T>K} (E = e^{−rT}·Φ(±d2)) — which captures both the linear
part and the kink of the payoff, cutting the estimator variance far below
the single-CV design of the reference (``monte_carlo.py:150-163``).

Numerics: per-program accumulation over reps is Kahan-compensated in
registers; cross-program reduction is a deterministic compensated scan.
"""
from __future__ import annotations

from functools import partial
from math import erf, exp, log, sqrt

import jax
import jax.numpy as jnp
import numpy as np

from . import stats as stats_ops
from .fastmath import exp32, log32, norminv32
from .swprng import threefry2x32

BLOCK_R = 256           # sublane rows per rep tile
LANES = 128
TILE = BLOCK_R * LANES  # draws per bit-tile; 2 tiles of normals per rep
NSTAT = stats_ops.STATSG_DIM


def _mc_kernel(seed_ref, par_ref, out_ref, *, reps: int, antithetic: bool,
               invcdf: bool = False, sw_prng: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Global program id: local grid position plus the per-device offset
    # (seed_ref[1]).  Under shard_map each device runs a contiguous slice of
    # the global program grid, so streams and tail masking are identical to
    # a single-device run over the full grid — device placement cannot
    # change the estimate.
    pid = pl.program_id(0) + seed_ref[1]
    # Distinct stream per (seed, program): mix with an odd constant so that
    # nearby seeds do not share per-program streams (seed+pid would overlap
    # 63/64 streams between consecutive seeds).
    if not sw_prng:
        pltpu.prng_seed(seed_ref[0] * jnp.int32(1103515245) + pid)

    S0 = par_ref[0]
    K = par_ref[1]
    mu = par_ref[2]        # (r - q - σ²/2)·T
    sig = par_ref[3]       # σ√T
    df = par_ref[4]        # e^{-rT}
    n_paths = par_ref[5]   # float; tile-remainder masking keeps this exact
    sign = par_ref[6]      # +1 call, −1 put

    two_pi = 6.283185307179586
    tiny = 5.9604645e-8  # 2^-24: keeps u1 in (0, 1]

    rows = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_R, LANES), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_R, LANES), 1)
    base_elem = (rows * LANES + cols).astype(jnp.float32)  # [0, TILE), exact

    def rep_body(j, carry):
        acc, comp = carry
        if sw_prng:
            # counter-based software PRNG (interpret mode and the
            # cross-platform oracle — ops/swprng.py); explicit i32 casts:
            # under the x64 CPU harness the fori_loop var is i64, and
            # bitcasting i64→u32 would split sublanes
            elem = (rows * LANES + cols).astype(jnp.int32)
            d = jnp.broadcast_to(jnp.asarray(j).astype(jnp.int32),
                                 (BLOCK_R, LANES))
            bits_a, bits_b = threefry2x32(
                seed_ref[0], pid, pltpu.bitcast(elem, jnp.uint32),
                pltpu.bitcast(d, jnp.uint32))
        else:
            # bitcast: random bits may surface as int32; shifts must be
            # unsigned
            bits_a = pltpu.bitcast(pltpu.prng_random_bits((BLOCK_R, LANES)),
                                   jnp.uint32)
            bits_b = pltpu.bitcast(pltpu.prng_random_bits((BLOCK_R, LANES)),
                                   jnp.uint32)
        # uint32 → uniform in (0,1): top 24 bits, bin midpoints (the +0.5
        # debias matters: bin-edge placement shifts E[-2ln u] by ~3e-7).
        # Mosaic lacks a u32→f32 cast; after >>8 the value fits in 24 bits,
        # so view as i32 first.
        u1 = (pltpu.bitcast(bits_a >> 8, jnp.int32).astype(jnp.float32)
              + 0.5) * tiny
        if invcdf:
            # Acklam inverse CDF: one normal per uniform, no sin/cos pair
            # (martingale bias ≤ 7e-7 at σ=0.4 on the 24-bit grid — see
            # fastmath.norminv32 and tests/test_fastmath.py).
            u2 = (pltpu.bitcast(bits_b >> 8, jnp.int32).astype(jnp.float32)
                  + 0.5) * tiny
            z1 = norminv32(u1)
            z2 = norminv32(u2)
        else:
            u2 = pltpu.bitcast(bits_b >> 8,
                               jnp.int32).astype(jnp.float32) * tiny
            # log32: the VPU's own f32 log/exp carry ~1e-6-level systematic
            # bias — fatal at the 1e-4 price-accuracy gate (ops/fastmath.py).
            rad = jnp.sqrt(-2.0 * log32(u1))
            theta = two_pi * u2
            z1 = rad * jnp.cos(theta)
            z2 = rad * jnp.sin(theta)

        # Tail masking via the per-tile remainder: rem = n_paths − tile_start.
        # Operands are multiples of the tile size (exact in f32 up to
        # 2^24·TILE) and close subtractions are exact (Sterbenz), so the
        # in-tile threshold compare is exact.
        prog_offset = (pid.astype(jnp.float32) * reps + j.astype(jnp.float32)) \
            * (2.0 * TILE)
        rem1 = n_paths - prog_offset
        rem2 = rem1 - TILE
        w1 = (base_elem < rem1).astype(jnp.float32)
        w2 = (base_elem < rem2).astype(jnp.float32)

        def xy(z):
            """Per-branch observables: payoff, CVs, and z-weighted Greek
            moments (Xz, Xz², Y2z — see stats.STATSG_DIM)."""
            ST = S0 * exp32(mu + sig * z)
            X = df * jnp.maximum(sign * (ST - K), 0.0)
            Y1 = df * ST
            Y2 = df * (sign * (ST - K) > 0.0).astype(jnp.float32)
            return X, Y1, Y2, X * z, X * z * z, Y2 * z

        def moments(X, Y1, Y2, Xz, Xz2, Y2z, w):
            WX = X * w
            WY1 = Y1 * w
            WY2 = Y2 * w
            return jnp.stack([
                jnp.sum(w),
                jnp.sum(WX), jnp.sum(WX * X),
                jnp.sum(WY1), jnp.sum(WY1 * Y1), jnp.sum(WX * Y1),
                jnp.sum(WY2), jnp.sum(WY2 * Y2), jnp.sum(WX * Y2),
                jnp.sum(WY1 * Y2),
                jnp.sum(Xz * w), jnp.sum(Xz2 * w), jnp.sum(Y2z * w),
            ])

        if antithetic:
            # Pair-averaged observations: (f(z)+f(−z))/2 is ONE sample. The
            # CV regression then runs at pair level, so both the estimator
            # variance and the reported stderr credit the pairing (the
            # reference pools ±z draws and understates neither/none —
            # monte_carlo.py:38-39 — its stderr ignores pairing entirely).
            # z-moments average the PRODUCTS (X⁺z with X⁻·(−z)) so each
            # Greek expectation stays unbiased at pair level.
            def pair_stats(z, w):
                obs_p = xy(z)
                obs_m = xy(-z)
                return moments(*(0.5 * (a + b)
                                 for a, b in zip(obs_p, obs_m)), w)

            s = pair_stats(z1, w1) + pair_stats(z2, w2)
        else:
            s = moments(*xy(z1), w1) + moments(*xy(z2), w2)
        acc, comp = stats_ops.kahan_add(acc, comp, s)
        return acc, comp

    zero = jnp.zeros((NSTAT,), jnp.float32)
    acc, _ = jax.lax.fori_loop(0, reps, rep_body, (zero, zero))
    row = jnp.concatenate([acc, jnp.zeros((LANES - NSTAT,), jnp.float32)])
    # Output tile is (8, 128) for TPU sublane alignment; row 0 carries stats.
    out_ref[0, :, :] = jnp.broadcast_to(row[None, :], (8, LANES))


@partial(jax.jit, static_argnames=("n_programs", "reps", "antithetic",
                                   "interpret", "invcdf", "sw_prng"))
def _run_kernel(seed, params, *, n_programs: int, reps: int, antithetic: bool,
                interpret: bool = False, invcdf: bool = False, sw_prng=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if sw_prng is None:
        # Mosaic interpreter stubs the hardware PRNG to zeros (ops/swprng.py)
        sw_prng = bool(interpret)
    kernel = partial(_mc_kernel, reps=reps, antithetic=antithetic,
                     invcdf=invcdf, sw_prng=bool(sw_prng))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_programs, 8, LANES), jnp.float32),
        grid=(n_programs,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, params)
    # Deterministic compensated combine of per-program stats
    return stats_ops.combine_scan(out[:, 0, :NSTAT])


def _bitrev32(v):
    """Bit-reversal of a uint32 tile (5-stage butterfly) — the base-2
    radical inverse underlying the van der Corput sequence."""
    u32 = lambda c: jnp.uint32(c)
    v = ((v >> 1) & u32(0x55555555)) | ((v & u32(0x55555555)) << 1)
    v = ((v >> 2) & u32(0x33333333)) | ((v & u32(0x33333333)) << 2)
    v = ((v >> 4) & u32(0x0F0F0F0F)) | ((v & u32(0x0F0F0F0F)) << 4)
    v = ((v >> 8) & u32(0x00FF00FF)) | ((v & u32(0x00FF00FF)) << 8)
    return (v >> 16) | (v << 16)


def _mc_qmc_kernel(seed_ref, par_ref, out_ref, *, reps: int,
                   progs_per_rep: int):
    """Randomised-QMC variant of ``_mc_kernel``.

    Points are the base-2 van der Corput sequence over the within-replicate
    path index, randomised by a per-replicate digital shift (XOR with a
    murmur-mixed word of (seed, replicate)) — deterministic given the seed
    and free of the hardware PRNG, so every backend evaluates the SAME
    sample set (values agree to f32 round-off; FMA contraction differs). Normals come
    from the inverse CDF (Box-Muller would pair points and destroy the 1-D
    stratification). Each program emits raw partial stats; the host groups
    programs into replicates and takes the spread of replicate means as the
    error bar — the only honest stderr for QMC points, which are not i.i.d.
    """
    from jax.experimental import pallas as pl

    pid = pl.program_id(0) + seed_ref[1]
    rep_id = pid // progs_per_rep
    tile_idx = pid % progs_per_rep

    # murmur3-style finalizer of (seed, replicate) → digital-shift word.
    # Scalar path stays in int32 (Mosaic bitcast is vector-only): the >>
    # shifts are arithmetic, so mask off the smeared sign bits; the *
    # wraps mod 2³², which is exactly murmur's semantics.
    h = seed_ref[0] ^ (rep_id * jnp.int32(-1640531527))  # golden ratio
    h = h ^ ((h >> 16) & jnp.int32(0xFFFF))
    h = h * jnp.int32(-2048144789)                       # 0x85EBCA6B
    h = h ^ ((h >> 13) & jnp.int32(0x7FFFF))
    h = h * jnp.int32(-1028477387)                       # 0xC2B2AE35
    h = h ^ ((h >> 16) & jnp.int32(0xFFFF))

    S0 = par_ref[0]
    K = par_ref[1]
    mu = par_ref[2]
    sig = par_ref[3]
    df = par_ref[4]
    n_rep = par_ref[5]     # points per replicate (float, tile-exact)
    sign = par_ref[6]

    tiny = 5.9604645e-8

    rows = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_R, LANES), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_R, LANES), 1)
    elem = rows * LANES + cols
    base_elem = elem.astype(jnp.float32)

    scr_tile = pltpu_bitcast_i32_to_u32(
        jnp.broadcast_to(h, (BLOCK_R, LANES)).astype(jnp.int32))

    def rep_body(j, carry):
        acc, comp = carry
        local0 = (tile_idx * reps + j) * TILE
        idx = pltpu_bitcast_i32_to_u32(local0 + elem)
        u_bits = _bitrev32(idx) ^ scr_tile
        u = (pltpu_bitcast_u32_to_i32(u_bits >> 8).astype(jnp.float32)
             + 0.5) * tiny
        z = norminv32(u)

        rem = n_rep - local0.astype(jnp.float32)
        w = (base_elem < rem).astype(jnp.float32)

        ST = S0 * exp32(mu + sig * z)
        X = df * jnp.maximum(sign * (ST - K), 0.0)
        Y1 = df * ST
        Y2 = df * (sign * (ST - K) > 0.0).astype(jnp.float32)
        WX = X * w
        WY1 = Y1 * w
        WY2 = Y2 * w
        s = jnp.stack([
            jnp.sum(w),
            jnp.sum(WX), jnp.sum(WX * X),
            jnp.sum(WY1), jnp.sum(WY1 * Y1), jnp.sum(WX * Y1),
            jnp.sum(WY2), jnp.sum(WY2 * Y2), jnp.sum(WX * Y2),
            jnp.sum(WY1 * Y2),
            jnp.sum(WX * z), jnp.sum(WX * z * z), jnp.sum(WY2 * z),
        ])
        return stats_ops.kahan_add(acc, comp, s)

    zero = jnp.zeros((NSTAT,), jnp.float32)
    acc, _ = jax.lax.fori_loop(0, reps, rep_body, (zero, zero))
    row = jnp.concatenate([acc, jnp.zeros((LANES - NSTAT,), jnp.float32)])
    out_ref[0, :, :] = jnp.broadcast_to(row[None, :], (8, LANES))


def pltpu_bitcast_i32_to_u32(x):
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.bitcast(x, jnp.uint32)


def pltpu_bitcast_u32_to_i32(x):
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.bitcast(x, jnp.int32)


@partial(jax.jit, static_argnames=("n_programs", "reps", "progs_per_rep",
                                   "interpret"))
def _run_qmc_kernel(seed, params, *, n_programs: int, reps: int,
                    progs_per_rep: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = partial(_mc_qmc_kernel, reps=reps, progs_per_rep=progs_per_rep)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_programs, 8, LANES), jnp.float32),
        grid=(n_programs,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, params)
    return out[:, 0, :NSTAT]  # per-program rows; host groups by replicate


def mc_sumstats_qmc(seed: int, n_paths: int, S0, K, T, r, q, sigma,
                    is_call: bool, *, n_replicates: int = 16,
                    interpret: bool = False):
    """Per-replicate (R, 13) sufficient statistics for RQMC terminal GBM.

    ``n_paths`` is rounded up so every replicate holds the same
    tile-aligned point count; the actual count is ``stats[:, 0].sum()``.
    """
    R = int(n_replicates)
    n_rep = -(-int(n_paths) // R)
    target_progs = max(1, 64 // R)
    reps = max(1, -(-n_rep // (TILE * target_progs)))
    progs_per_rep = -(-n_rep // (TILE * reps))
    n_programs = R * progs_per_rep

    params = _terminal_params(n_rep, S0, K, T, r, q, sigma, is_call)
    seed_arr = jnp.asarray([seed % (2**31 - 1), 0], jnp.int32)
    rows = _run_qmc_kernel(seed_arr, params, n_programs=n_programs,
                           reps=int(reps), progs_per_rep=int(progs_per_rep),
                           interpret=bool(interpret))
    # host-side f64 per-replicate reduction (few rows, precision cheap)
    rows = np.asarray(jax.device_get(rows), np.float64)
    return rows.reshape(R, progs_per_rep, NSTAT).sum(axis=1)


def qmc_estimate(rep_stats, S0, K, T, r, q, sigma, is_call: bool,
                 control_variate: bool = True):
    """(price, stderr) from per-replicate stats: mean of the R replicate
    (CV-corrected) means; stderr from their spread — the honest error bar
    for randomised QMC."""
    s = np.asarray(jax.device_get(rep_stats), np.float64)
    means = []
    for row in s:
        if control_variate:
            m, _ = pallas_estimate(row, S0, K, T, r, q, sigma, is_call, True)
        else:
            m = row[1] / row[0]
        means.append(m)
    means = np.asarray(means)
    R = means.size
    se = float(means.std(ddof=1) / np.sqrt(R)) if R > 1 else float("nan")
    mean = float(means.mean())
    # f32-pipeline accuracy floor: once the replicate spread drops below
    # the kernel's systematic error level (~5e-7 relative: norminv/exp32
    # ulps + f32 moment accumulation), the spread no longer reflects the
    # true error — report the floor instead (measured: |err| ≈ 4.5e-7 vs
    # f64 BS at 2^30 points where the raw spread said 8e-9).
    return mean, max(se, 2e-7 * (1.0 + abs(mean)))


def _plan_grid(n_paths: int, per_rep: int, n_dev: int = 1,
               target_per_dev: int = 64):
    """(reps, n_programs): grid sizing with n_programs a device multiple.

    Padded programs fall entirely beyond ``n_paths`` and contribute zero
    weight, so padding to a device multiple never changes the estimate.
    """
    target = target_per_dev * n_dev
    reps = max(1, -(-int(n_paths) // (per_rep * target)))
    n_programs = -(-int(n_paths) // (per_rep * reps))
    n_programs = -(-n_programs // n_dev) * n_dev
    return int(reps), int(n_programs)


def _terminal_params(n_paths, S0, K, T, r, q, sigma, is_call):
    mu = (r - q - 0.5 * sigma * sigma) * T
    sig = sigma * np.sqrt(T)
    df = np.exp(-r * T)
    sign = 1.0 if is_call else -1.0
    return jnp.asarray(
        [S0, K, mu, sig, df, float(n_paths), sign], jnp.float32)


def mc_sumstats_pallas(seed: int, n_paths: int, S0, K, T, r, q, sigma,
                       is_call: bool, *, antithetic: bool, dtype=None,
                       interpret: bool = False, invcdf: bool = False,
                       sw_prng=None):
    """(10,) sufficient statistics for n_paths terminal GBM draws (f32).

    Each grid program produces ``2·TILE·reps`` base draws (two Box-Muller
    normals per bit-pair); the grid is sized so the padded draw count just
    covers ``n_paths`` and the tail is masked by tile-local remainder.
    """
    reps, n_programs = _plan_grid(int(n_paths), 2 * TILE)
    params = _terminal_params(n_paths, S0, K, T, r, q, sigma, is_call)
    seed_arr = jnp.asarray([seed % (2**31 - 1), 0], jnp.int32)
    return _run_kernel(seed_arr, params, n_programs=n_programs,
                       reps=reps, antithetic=bool(antithetic),
                       interpret=bool(interpret), invcdf=bool(invcdf),
                       sw_prng=sw_prng)


def mc_sumstats_pallas_sharded(mesh, seed: int, n_paths: int, S0, K, T, r, q,
                               sigma, is_call: bool, *, antithetic: bool,
                               dtype=None, interpret=None, sw_prng=None):
    """Mesh data-parallel fused MC: one Pallas grid per device, psum over ICI.

    The global program grid is split into contiguous per-device slices; each
    device seeds its hardware PRNG from the *global* program ids (see
    ``_mc_kernel``), runs its slice of the grid, Kahan-combines its local
    stats and contributes them to a single ``psum`` of the 10-stat vector —
    the multi-chip path is the same fused kernel as single-chip, not the XLA
    scan fallback (reference fan-out: ``monte_carlo.py:128-139``).

    On non-TPU backends (tests, ``dryrun_multichip``) the kernel runs in the
    Mosaic interpreter with the counter-based software PRNG (the
    interpreter's own hardware-PRNG stub is degenerate — ops/swprng.py), so
    the full sharded program is compiled, executed AND statistically
    meaningful there.
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import mesh_axes

    axis = mesh_axes(mesh)
    n_dev = int(mesh.devices.size)
    reps, n_programs = _plan_grid(int(n_paths), 2 * TILE, n_dev)
    progs_per_dev = n_programs // n_dev

    params = _terminal_params(n_paths, S0, K, T, r, q, sigma, is_call)
    seed_val = jnp.int32(seed % (2**31 - 1))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    offsets = jnp.arange(n_dev, dtype=jnp.int32) * progs_per_dev

    @partial(jax.shard_map, mesh=mesh, in_specs=P(axis), out_specs=P(),
             check_vma=False)
    def shard_fn(offs):
        seed_arr = jnp.stack([seed_val, offs[0]])
        local = _run_kernel(seed_arr, params, n_programs=progs_per_dev,
                            reps=reps, antithetic=bool(antithetic),
                            interpret=bool(interpret), sw_prng=sw_prng)
        return jax.lax.psum(local, axis)

    return shard_fn(offsets)


def pallas_estimate(stats_vec, S0, K, T, r, q, sigma, is_call: bool,
                    control_variate: bool):
    """(price, stderr) from the 10-stat vector; dual CV when enabled."""
    s = np.asarray(jax.device_get(stats_vec), np.float64)
    if s[0] == 0:
        return float("nan"), float("nan")
    if not control_variate:
        n, sx, sx2 = s[0], s[1], s[2]
        m = sx / n
        v = max(0.0, sx2 / n - m * m)
        return float(m), float(sqrt(v / n))
    EY1 = S0 * exp(-q * T)  # E[e^{−rT}·S_T] under Q
    d2 = (log(S0 / K) + (r - q - 0.5 * sigma * sigma) * T) / (sigma * sqrt(T))
    Phi = lambda x: 0.5 * (1.0 + erf(x / sqrt(2.0)))
    p_itm = Phi(d2) if is_call else Phi(-d2)
    EY2 = exp(-r * T) * p_itm
    mean, se = stats_ops.cv2_mean_se(s, EY1, EY2)
    # f32 moment-roundoff floor (see pallas_mc_batch.euro_price_mc_batch)
    return mean, max(se, 2e-6 * (1.0 + abs(mean)))


def pallas_greeks(stats_vec, S0, K, T, r, q, sigma, is_call: bool) -> dict:
    """The full MC Greek set for free from the 13-stat vector.

    Under terminal GBM, S_T = S0·exp(μT + σ√T·z), every first-order
    sensitivity is linear in expectations the kernel already accumulates.
    With A ≡ e^{−rT}·sign·1{ITM}·S_T = X + sign·K·Y2 (the pathwise payoff
    derivative times S_T):

    * delta  (pathwise) = E[A]/S0                            (∂S_T/∂S0 = S_T/S0)
    * vega   (pathwise) = E[A·(√T·z − σT)]                    (∂S_T/∂σ)
    * rho    (pathwise) = sign·K·T·E[Y2]                      (∂S_T/∂r = T·S_T)
    * theta  = r·E[X] − (r−q−σ²/2)·E[A] − σ/(2√T)·E[A·z]     (−∂V/∂T)
    * gamma  (likelihood ratio) =
          (E[X·z²] − E[X])/(S0²σ²T) − E[X·z]/(S0²σ√T)
    * digital (cash-or-nothing) price = E[Y2]

    E[A] and E[A·z] come from (E[X], E[Y2], E[Xz], E[Y2z]); the dual-CV
    corrected price feeds delta's E[X] term. All resolved host-side in f64.
    """
    import numpy as np

    s = np.asarray(jax.device_get(stats_vec), np.float64)
    n = s[0]
    price, _ = pallas_estimate(stats_vec, S0, K, T, r, q, sigma, is_call,
                               control_variate=True)
    sign = 1.0 if is_call else -1.0
    mX = price                   # CV-corrected E[X]
    mY2 = s[6] / n               # E[e^{−rT}·1{ITM}]
    mXz = s[10] / n
    mXz2 = s[11] / n
    mY2z = s[12] / n
    sqT = sqrt(T)

    mA = mX + sign * K * mY2
    mAz = mXz + sign * K * mY2z

    delta = mA / S0
    vega = sqT * mAz - sigma * T * mA
    rho = sign * K * T * mY2
    theta = r * mX - (r - q - 0.5 * sigma * sigma) * mA \
        - sigma / (2.0 * sqT) * mAz
    gamma = (mXz2 - s[1] / n) / (S0 * S0 * sigma * sigma * T) \
        - mXz / (S0 * S0 * sigma * sqT)
    return {"price": price, "delta": float(delta), "gamma": float(gamma),
            "vega": float(vega), "theta": float(theta), "rho": float(rho),
            "digital": float(mY2)}
