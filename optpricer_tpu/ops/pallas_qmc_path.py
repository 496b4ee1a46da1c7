"""Fused path-QMC kernel: Sobol → Φ⁻¹ → Brownian bridge → payoff, one kernel.

Replaces the staged 4-program XLA pipeline (``models/mc_fused._qmc_replicate``
— kept as the CPU fallback): Sobol generation, the inverse normal CDF, the
bridge, the GBM path matrix and the payoff reduction all run in ONE Pallas
program per point tile, so HBM never sees an (n_points, n_steps)
intermediate and there is nothing for XLA:TPU's fusion pass to choke on
(the staged form existed to dodge a ~400 s pathological compile).

TPU-native structure:

* **Sobol in registers** — Gray-code construction as a statically unrolled
  XOR ladder: ``x_i = ⊕_{k: bit k of gray(i)} V[k]``, one (tile, d) XOR per
  index bit, pure uint32 VPU work (same arithmetic as the staged
  ``ops/sobol._sobol_bits``, so both paths evaluate the SAME point set).
  Direction numbers stream in as an (m_bits, d) VMEM table; ``m_bits`` is
  sized to the requested budget, up to 2^30 points per replicate (the full
  precision of the Joe-Kuo table read from torch's ``sobolstate``).
* **The Brownian bridge is a LINEAR map, so it is one MXU matmul.** The
  recursive midpoint fill W = bridge(z) is z @ A for a constant (d, d)
  matrix A (built on host in f64 from the same BFS schedule as
  ``ops/sobol.brownian_bridge_order``); folding in σ and the drift row
  gives ``logS = drift + z @ (σA)`` — the entire path construction is a
  single ``dot_general`` at ``Precision.HIGHEST``. No gathers, no
  scatters, no sequential time loop.
* **Payoff = masked lane reductions** over the step axis (steps on lanes):
  running sum / log-sum / max / min / barrier-crossing flags are
  ``jnp.sum``/``max``/``min`` with a static column mask; the terminal spot
  is an exact one-hot lane reduction.

Randomised-QMC error bars: R independent digital shifts (threefry words,
derived on host exactly as the staged path derives them, so replicate
streams match); the spread of replicate means is the only honest stderr
for QMC points. Per replicate the kernel also accumulates the spot control
variate Y = e^{−rT}S_T (E[Y] = S0·e^{−qT} model-free), giving the host a
6-stat CV estimator per replicate.

Reference anchor: the reference's MC hot loop is RNG-dominated
(``/root/reference/src/optpricer/monte_carlo.py:35``); this kernel is the
framework's QMC answer — ~40× the accuracy of plain MC at equal budget
with zero PRNG traffic.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import stats as stats_ops
from .fastmath import exp32, norminv32
from .sobol import brownian_bridge_order, direction_numbers

LANES = 128
P_TILE = 256          # points (sublane rows) per in-kernel rep tile
MAX_M_BITS = 31       # ≤ 2^31 points per replicate (int32 tile indexing;
#                       the direction-number table itself carries 32 bits)


def bridge_matrix(d: int, T: float) -> np.ndarray:
    """(d, d) f64 matrix A with ``bridge_paths(z, T) == z @ A`` exactly.

    Row k of A is the coefficient of z[:, k] in each W_t: the bridge is a
    linear recursion, so unrolling the BFS schedule over unit z-vectors
    yields the closed map. Column t-1 corresponds to time (t/d)·T.
    """
    ms, ls, rs, _ = brownian_bridge_order(d)
    dt = T / d
    C = np.zeros((d + 1, d))       # C[t] = coefficients of W_t over z
    C[d, 0] = np.sqrt(T)
    for j in range(len(ms)):
        m, l, r = int(ms[j]), int(ls[j]), int(rs[j])
        frac = (m - l) / (r - l)
        sd = np.sqrt((m - l) * (r - m) / (r - l) * dt)
        C[m] = C[l] + frac * (C[r] - C[l])
        C[m, 1 + j] += sd
    return C[1:].T                 # (d z-dims, d time steps)


@partial(jax.jit, static_argnames=("R", "d", "d_pad"))
def _replicate_shifts(seed, *, R: int, d: int, d_pad: int):
    """(R, d_pad) int32 digital-shift words in ONE compiled program.

    Identical values to the per-replicate eager loop
    (``bits(fold_in(key(seed), i))``), but a single dispatch: after the
    first Pallas launch the runtime charges ~24 ms per eager call, so R
    replicate draws as 2R round trips used to dominate this kernel's
    whole wall-clock."""
    key0 = jax.random.key(seed)

    def one(i):
        return jax.random.bits(jax.random.fold_in(key0, i), (d,),
                               jnp.uint32)

    sh = jax.vmap(one)(jnp.arange(R))
    out = jnp.zeros((R, d_pad), jnp.uint32).at[:, :d].set(sh)
    return jax.lax.bitcast_convert_type(out, jnp.int32)


def _u32(x):
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.bitcast(x, jnp.uint32)


def _i32(x):
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.bitcast(x, jnp.int32)


def _qmc_path_kernel(seed_ref, par_ref, V_ref, shift_ref, B_ref, drift_ref,
                     out_ref, *, n_steps: int, d_pad: int, m_bits: int,
                     reps: int, progs_per_rep: int, payoff_id: int,
                     barrier_up: bool, knock_in: bool, is_call: bool,
                     arithmetic: bool, fixed_strike: bool):
    from jax.experimental import pallas as pl

    pid = pl.program_id(0)
    rep_id = pid // progs_per_rep
    tile_idx = pid % progs_per_rep

    S0 = par_ref[0]
    K = par_ref[1]
    df = par_ref[2]
    barrier = par_ref[3]
    rebate = par_ref[4]
    payout = par_ref[5]
    n_last = seed_ref[1]     # LAST valid point index, n_points−1 (int32:
    #                          lets n_points reach exactly 2^31)

    sign = jnp.float32(1.0 if is_call else -1.0)

    rows = jax.lax.broadcasted_iota(jnp.int32, (P_TILE, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (P_TILE, d_pad), 1)
    colmask = (cols < n_steps).astype(jnp.float32)
    onehot_T = (cols == n_steps - 1).astype(jnp.float32)
    shift_row = _u32(shift_ref[pl.ds(rep_id, 1), :])        # (1, d_pad)

    def vanilla(x):
        return jnp.maximum(sign * (x - K), 0.0)

    def rep_body(j, carry):
        acc, comp = carry
        local0 = (tile_idx * reps + j) * P_TILE
        idx = local0 + rows                                  # (P_TILE, 1)
        gray = _u32(idx) ^ (_u32(idx) >> 1)

        # Gray-code Sobol: statically unrolled XOR ladder over index bits
        x = jnp.zeros((P_TILE, d_pad), jnp.uint32) ^ shift_row
        for k in range(m_bits):
            bit = (gray >> k) & jnp.uint32(1)                # (P_TILE, 1)
            x = x ^ (bit * _u32(V_ref[k:k + 1, :]))

        # top-24-bit uniforms, cell-centred (matches ops/sobol f32 path)
        u = (_i32(x >> jnp.uint32(8)).astype(jnp.float32) + 0.5) \
            * jnp.float32(2.0 ** -24)
        z = norminv32(u) * colmask                           # pad lanes → 0

        # whole path in one MXU op: logS = drift + z @ (σ·A)
        logS = drift_ref[0:1, :] + jax.lax.dot_general(
            z, B_ref[:, :], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        S = exp32(logS)

        ST = jnp.sum(S * onehot_T, axis=1, keepdims=True)    # exact select
        if payoff_id == 2:                                   # asian
            if arithmetic:
                avg = jnp.sum(S * colmask, axis=1, keepdims=True) \
                    / jnp.float32(n_steps)
            else:
                avg = exp32(jnp.sum(logS * colmask, axis=1, keepdims=True)
                            / jnp.float32(n_steps))
            pay = vanilla(avg) if fixed_strike \
                else jnp.maximum(sign * (ST - avg), 0.0)
        elif payoff_id == 4:                                 # lookback
            big = jnp.float32(3.0e38)
            rmax = jnp.maximum(jnp.max(
                jnp.where(colmask > 0, S, -big), axis=1, keepdims=True), S0)
            rmin = jnp.minimum(jnp.min(
                jnp.where(colmask > 0, S, big), axis=1, keepdims=True), S0)
            if fixed_strike:
                pay = jnp.maximum(rmax - K, 0.0) if is_call \
                    else jnp.maximum(K - rmin, 0.0)
            else:
                pay = (ST - rmin) if is_call else (rmax - ST)
        elif payoff_id == 1:                                 # barrier
            hit = (S >= barrier) if barrier_up else (S <= barrier)
            hit0 = (S0 >= barrier) if barrier_up else (S0 <= barrier)
            crossed = jnp.max(
                hit.astype(jnp.float32) * colmask, axis=1, keepdims=True)
            crossed = jnp.maximum(crossed, hit0.astype(jnp.float32))
            live = vanilla(ST)
            pay = jnp.where(crossed > 0, live if knock_in else rebate,
                            rebate if knock_in else live)
        elif payoff_id == 3:                                 # digital
            itm = (sign * (ST - K)) > 0.0
            pay = jnp.where(itm, payout, 0.0)
        else:                                                # vanilla
            pay = vanilla(ST)

        w = (idx <= n_last).astype(jnp.float32)
        X = df * pay * w
        Y = df * ST * w
        s = jnp.stack([jnp.sum(w), jnp.sum(X), jnp.sum(X * pay * df),
                       jnp.sum(Y), jnp.sum(Y * ST * df), jnp.sum(X * ST * df)])
        return stats_ops.kahan_add(acc, comp, s)

    zero = jnp.zeros((6,), jnp.float32)
    acc, _ = jax.lax.fori_loop(0, reps, rep_body, (zero, zero))
    row = jnp.concatenate([acc, jnp.zeros((LANES - 6,), jnp.float32)])
    out_ref[0, :, :] = jnp.broadcast_to(row[None, :], (8, LANES))


@partial(jax.jit, static_argnames=(
    "n_programs", "reps", "progs_per_rep", "n_steps", "d_pad", "m_bits",
    "payoff_id", "barrier_up", "knock_in", "is_call", "arithmetic",
    "fixed_strike", "interpret"))
def _run_qmc_path(seed, params, V, shifts, B, drift, *, n_programs, reps,
                  progs_per_rep, n_steps, d_pad, m_bits, payoff_id,
                  barrier_up, knock_in, is_call, arithmetic, fixed_strike,
                  interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = partial(
        _qmc_path_kernel, n_steps=n_steps, d_pad=d_pad, m_bits=m_bits,
        reps=reps, progs_per_rep=progs_per_rep, payoff_id=payoff_id,
        barrier_up=barrier_up, knock_in=knock_in, is_call=is_call,
        arithmetic=arithmetic, fixed_strike=fixed_strike)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(
        0 for _ in a.shape), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_programs, 8, LANES), jnp.float32),
        grid=(n_programs,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            full(V), full(shifts), full(B), full(drift),
        ],
        out_specs=pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=pltpu.InterpretParams() if interpret else False,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(seed, params, V, shifts, B, drift)
    return out[:, 0, :6]


_PAYOFF_IDS = {"vanilla": 0, "barrier": 1, "asian": 2, "digital": 3,
               "lookback": 4}


def path_qmc_sumstats_pallas(seed: int, n_points: int, n_steps: int,
                             S0, K, T, r, q, sigma, is_call: bool, *,
                             payoff: str = "vanilla", n_replicates: int = 8,
                             barrier: float = 0.0,
                             barrier_type: str = "up-and-out",
                             rebate: float = 0.0,
                             average_type: str = "arithmetic",
                             strike_type: str = "fixed", payout: float = 1.0,
                             interpret: bool | None = None) -> jax.Array:
    """(R, 6) per-replicate sufficient statistics
    [n, ΣX, ΣX², ΣY, ΣY², ΣXY] with X = e^{−rT}·payoff, Y = e^{−rT}·S_T.

    ``n_points`` is the budget per replicate (≤ 2^26); replicate shifts are
    ``jax.random.bits(fold_in(key(seed), i))`` — the exact derivation of the
    staged XLA path, so both engines randomise the same point set the same
    way.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if payoff not in _PAYOFF_IDS:
        raise ValueError(f"unknown payoff {payoff!r}")
    d = int(n_steps)
    n_points = int(n_points)
    m_bits = max(int(np.ceil(np.log2(max(n_points, 2)))), 11)
    if m_bits > MAX_M_BITS:
        raise ValueError(f"n_points={n_points} exceeds 2^{MAX_M_BITS} "
                         "points per replicate")
    d_pad = -(-d // LANES) * LANES
    R = int(n_replicates)

    V_np = direction_numbers(d, m_bits)                     # (m_bits, d) u32
    V = np.zeros((m_bits, d_pad), np.uint32)
    V[:, :d] = V_np
    V = jnp.asarray(V.view(np.int32))

    shifts = _replicate_shifts(int(seed), R=R, d=d, d_pad=d_pad)

    A = bridge_matrix(d, float(T))                          # f64 (d, d)
    c = float(r) - float(q) - 0.5 * float(sigma) ** 2
    t = (np.arange(1, d + 1, dtype=np.float64)) * (float(T) / d)
    B = np.zeros((d_pad, d_pad), np.float32)
    B[:d, :d] = (float(sigma) * A).astype(np.float32)
    drift = np.zeros((1, d_pad), np.float32)
    drift[0, :d] = (np.log(float(S0)) + c * t).astype(np.float32)

    tiles_per_rep = -(-n_points // P_TILE)
    progs_per_rep = int(min(8, tiles_per_rep))
    reps = -(-tiles_per_rep // progs_per_rep)
    n_programs = R * progs_per_rep

    params = jnp.asarray(
        [S0, K, np.exp(-float(r) * float(T)), barrier,
         rebate, payout], jnp.float32)
    rows = _run_qmc_path(
        jnp.asarray([seed, n_points - 1], jnp.int32), params, V,
        jnp.asarray(shifts),
        jnp.asarray(B), jnp.asarray(drift),
        n_programs=n_programs, reps=int(reps),
        progs_per_rep=progs_per_rep, n_steps=d, d_pad=int(d_pad),
        m_bits=int(m_bits), payoff_id=_PAYOFF_IDS[payoff],
        barrier_up=barrier_type.startswith("up"),
        knock_in=barrier_type.endswith("in"), is_call=bool(is_call),
        arithmetic=average_type == "arithmetic",
        fixed_strike=strike_type == "fixed", interpret=bool(interpret))
    return rows.reshape(R, progs_per_rep, 6).sum(axis=1)


def qmc_path_estimate(rep_stats, S0, q, T, *,
                      control_variate: bool = True):
    """(price, stderr) from (R, 6) replicate stats.

    Each replicate yields one estimate (CV-adjusted when asked: the spot
    CV mean E[e^{−rT}S_T] = S0·e^{−qT} is model-free); the mean of the R
    estimates is the price and their spread the error bar — the honest
    stderr for randomised QMC.
    """
    s = np.asarray(jax.device_get(rep_stats), np.float64)
    R = s.shape[0]
    if control_variate:
        EY = float(S0) * np.exp(-float(q) * float(T))
        est = np.array([stats_ops.cv_mean_se_np(s[i], EY)[0]
                        for i in range(R)])
    else:
        est = s[:, 1] / s[:, 0]
    return float(est.mean()), float(est.std(ddof=1) / np.sqrt(R))
