"""Fused Pallas TPU kernel for PATH-DEPENDENT multi-asset Monte-Carlo.

The XLA engine (``models/basket.py:_basket_path_stats``) steps correlated
GBM assets in a ``lax.scan`` with the per-step correlation as a
``z @ Lᵀ`` MXU matmul — already fast for wide baskets, but each step
round-trips the O(n_paths·n_assets) state through HBM. For the small
asset counts that dominate desk books (2-16 names) this kernel keeps the
WHOLE basket in registers: one (BLOCK_R, LANES) tile of paths per asset,
statically unrolled, with the Cholesky factor applied as a
lower-triangular chain of a(a+1)/2 fused multiply-adds on the VPU lanes —
no matmul, no HBM traffic, nothing path-shaped ever leaves the core.

Payoffs and conventions are EXACTLY ``basket_exotic_mc``'s
(``models/basket.py:287-306``): ``asian_basket`` (t=0 excluded from the
average), ``worstof_barrier`` / ``basket_barrier`` (t=0 INCLUDED in
monitoring — the initial crossing is resolved on the host and shipped as
a flag), up/down × in/out, rebates, exact per-asset log-Euler stepping.
Statistics are the same 6-stat CV layout (Y = e^{−rT}·B_T, model-free
E[Y] = Σw_i S0_i e^{−q_i T}), so the host estimator is shared.

Unlike the single-asset path kernel, each loop iteration advances ONE
time step and draws ⌈a/2⌉ Box-Muller pairs for the a asset shocks —
n_steps need not be even (an odd asset count discards one normal per
step). Randomness: per-core hardware PRNG seeded from the global program
id, or the counter-based threefry (``ops/swprng.py``) under
``sw_prng``/interpret — the draw counter is (chunk, step, pair) so the
stream layout is device-count-invariant.

Reference anchor: /root/reference/src/optpricer has no multi-asset
engine at all; the payoff semantics extend its single-asset barrier/asian
conventions (/root/reference/src/optpricer/exotics.py) to baskets.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import stats as stats_ops
from .fastmath import exp32, log32
from .swprng import threefry2x32

BLOCK_R = 32
LANES = 128
TILE = BLOCK_R * LANES   # path pairs per tile
NSTAT = 6                # (n, ΣX, ΣX², ΣY, ΣY², ΣXY) — cv_mean_se_np layout

PAYOFF_IDS = {"asian_basket": 0, "worstof_barrier": 1, "basket_barrier": 2}

# params layout: 7 scalars then 4 per-asset fields then the chol rows
_P_K, _P_DF, _P_NPATHS, _P_SIGN, _P_BARRIER, _P_REBATE, _P_CROSSED0 = \
    range(7)
_P_ASSETS = 7  # S0_i, drift_i (per step), voldt_i (per step), w_i


def _basket_kernel(seed_ref, par_ref, out_ref, *, n_assets: int,
                   n_steps: int, reps: int, antithetic: bool,
                   payoff_id: int, barrier_up: bool, knock_in: bool,
                   sw_prng: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    a = n_assets
    pid = pl.program_id(0) + seed_ref[1]
    if not sw_prng:
        pltpu.prng_seed(seed_ref[0] * jnp.int32(1103515245) + pid)

    K = par_ref[_P_K]
    df = par_ref[_P_DF]
    n_paths = par_ref[_P_NPATHS]
    sign = par_ref[_P_SIGN]
    barrier = par_ref[_P_BARRIER]
    rebate = par_ref[_P_REBATE]
    crossed0 = par_ref[_P_CROSSED0]
    S0 = [par_ref[_P_ASSETS + 4 * i + 0] for i in range(a)]
    drift = [par_ref[_P_ASSETS + 4 * i + 1] for i in range(a)]
    voldt = [par_ref[_P_ASSETS + 4 * i + 2] for i in range(a)]
    w = [par_ref[_P_ASSETS + 4 * i + 3] for i in range(a)]
    chol0 = _P_ASSETS + 4 * a
    L = [[par_ref[chol0 + i * a + j] for j in range(i + 1)]
         for i in range(a)]

    two_pi = 6.283185307179586
    tiny = 5.9604645e-8
    shape = (BLOCK_R, LANES)
    n_pairs = (a + 1) // 2  # Box-Muller pairs per time step

    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    base_elem = (rows * LANES + cols).astype(jnp.float32)

    def normals(draw):
        if sw_prng:
            elem = (rows * LANES + cols).astype(jnp.int32)
            d = jnp.broadcast_to(jnp.asarray(draw).astype(jnp.int32), shape)
            bits_a, bits_b = threefry2x32(
                seed_ref[0], pid, pltpu.bitcast(elem, jnp.uint32),
                pltpu.bitcast(d, jnp.uint32))
        else:
            bits_a = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            bits_b = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        u1 = (pltpu.bitcast(bits_a >> 8, jnp.int32).astype(jnp.float32)
              + 0.5) * tiny
        u2 = pltpu.bitcast(bits_b >> 8, jnp.int32).astype(jnp.float32) * tiny
        rad = jnp.sqrt(-2.0 * log32(u1))
        theta = two_pi * u2
        return rad * jnp.cos(theta), rad * jnp.sin(theta)

    def chunk_body(c, carry):
        acc, comp = carry

        def init_state():
            S = [jnp.full(shape, S0[i]) for i in range(a)]
            run_sum = jnp.zeros(shape, jnp.float32)
            crossed = jnp.full(shape, crossed0)
            return S, run_sum, crossed

        st_p = init_state()
        st_m = init_state()

        def advance(st, zs):
            S, run_sum, crossed = st
            # correlate: x_i = Σ_{j≤i} L[i][j]·z_j (chol lower triangular),
            # then exact log-Euler per asset — same discretisation as
            # models/basket._basket_path_stats
            S = list(S)
            for i in range(a):
                x = L[i][0] * zs[0]
                for j in range(1, i + 1):
                    x = x + L[i][j] * zs[j]
                S[i] = S[i] * exp32(drift[i] + voldt[i] * x)
            B = w[0] * S[0]
            for i in range(1, a):
                B = B + w[i] * S[i]
            if payoff_id == 0:                      # asian_basket
                run_sum = run_sum + B
            else:
                if payoff_id == 1:                  # worstof_barrier
                    lvl = S[0]
                    for i in range(1, a):
                        lvl = jnp.minimum(lvl, S[i])
                else:                               # basket_barrier
                    lvl = B
                hit = ((lvl >= barrier) if barrier_up
                       else (lvl <= barrier)).astype(jnp.float32)
                crossed = jnp.maximum(crossed, hit)
            return S, run_sum, crossed

        def step_body(t, states):
            st_p, st_m = states
            d0 = (c * n_steps + t) * n_pairs
            zs = []
            for k in range(n_pairs):
                z1, z2 = normals(d0 + k)
                zs += [z1, z2]
            zs = zs[:a]
            st_p = advance(st_p, zs)
            if antithetic:
                st_m = advance(st_m, [-z for z in zs])
            return (st_p, st_m)

        st_p, st_m = jax.lax.fori_loop(0, n_steps, step_body, (st_p, st_m))

        def payoff_of(st):
            S, run_sum, crossed = st
            B_T = w[0] * S[0]
            for i in range(1, a):
                B_T = B_T + w[i] * S[i]
            if payoff_id == 0:
                pay = jnp.maximum(sign * (run_sum / n_steps - K), 0.0)
            else:
                if payoff_id == 1:
                    term = S[0]
                    for i in range(1, a):
                        term = jnp.minimum(term, S[i])
                else:
                    term = B_T
                live = jnp.maximum(sign * (term - K), 0.0)
                hit = crossed > 0.5
                pay = jnp.where(hit, live if knock_in else rebate,
                                rebate if knock_in else live)
            return df * pay, df * B_T

        prog_offset = (pid.astype(jnp.float32) * reps
                       + c.astype(jnp.float32)) * TILE
        rem = n_paths - prog_offset
        wgt = (base_elem < rem).astype(jnp.float32)

        X, Y = payoff_of(st_p)
        if antithetic:
            Xm, Ym = payoff_of(st_m)
            X = 0.5 * (X + Xm)
            Y = 0.5 * (Y + Ym)
        WX = X * wgt
        WY = Y * wgt
        s = jnp.stack([
            jnp.sum(wgt),
            jnp.sum(WX), jnp.sum(WX * X),
            jnp.sum(WY), jnp.sum(WY * Y), jnp.sum(WX * Y),
        ])
        return stats_ops.kahan_add(acc, comp, s)

    zero = jnp.zeros((NSTAT,), jnp.float32)
    acc, _ = jax.lax.fori_loop(0, reps, chunk_body, (zero, zero))
    row = jnp.concatenate([acc, jnp.zeros((LANES - NSTAT,), jnp.float32)])
    out_ref[0, :, :] = jnp.broadcast_to(row[None, :], (8, LANES))


@partial(jax.jit, static_argnames=("n_programs", "reps", "n_assets",
                                   "n_steps", "antithetic", "payoff_id",
                                   "barrier_up", "knock_in",
                                   "interpret", "sw_prng"))
def _run_basket_kernel(seed, params, *, n_programs, reps, n_assets, n_steps,
                       antithetic, payoff_id, barrier_up, knock_in,
                       interpret=False, sw_prng=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if sw_prng is None:
        # Mosaic interpreter stubs the hardware PRNG to zeros (ops/swprng.py)
        sw_prng = bool(interpret)
    kernel = partial(
        _basket_kernel, n_assets=n_assets, n_steps=n_steps, reps=reps,
        antithetic=antithetic, payoff_id=payoff_id, barrier_up=barrier_up,
        knock_in=knock_in, sw_prng=bool(sw_prng))
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
    return stats_ops.combine_scan(out[:, 0, :NSTAT])


def _build_params(n_paths, n_steps, S0s, w, K, T, r, qs, sigmas, chol,
                  barrier, rebate, is_call, payoff, barrier_up):
    a = len(S0s)
    dt = T / n_steps
    sign = 1.0 if is_call else -1.0
    B0 = float(np.dot(S0s, w))
    lvl0 = B0 if payoff == "basket_barrier" else float(np.min(S0s))
    if payoff == "asian_basket":
        crossed0 = 0.0
    else:
        crossed0 = float((lvl0 >= barrier) if barrier_up
                         else (lvl0 <= barrier))
    vals = [K, np.exp(-r * T), float(n_paths), sign, barrier, rebate,
            crossed0]
    for i in range(a):
        vals += [S0s[i], (r - qs[i] - 0.5 * sigmas[i] ** 2) * dt,
                 sigmas[i] * np.sqrt(dt), w[i]]
    vals += list(np.asarray(chol, np.float64).reshape(-1))
    return jnp.asarray(vals, jnp.float32)


def basket_path_sumstats_pallas(
    seed: int, n_paths: int, n_steps: int, S0s, weights, K, T, r, qs,
    sigmas, chol, is_call: bool, *, payoff: str, antithetic: bool = True,
    barrier: float = 0.0, barrier_type: str = "down-and-in",
    rebate: float = 0.0, interpret: bool = False, sw_prng=None,
):
    """(6,) CV sufficient statistics for a path-dependent basket payoff.

    ``n_paths`` counts antithetic PAIRS when ``antithetic=True`` (each
    pair-averaged observation is one sample — same convention as the
    single-asset path kernel); the XLA engine pools ±z draws instead, so
    prices agree statistically while stderrs differ by design.
    """
    from .pallas_mc import _plan_grid

    if payoff not in PAYOFF_IDS:
        raise ValueError(f"payoff must be one of {tuple(PAYOFF_IDS)}")
    S0s = [float(v) for v in np.atleast_1d(S0s)]
    a = len(S0s)
    weights = [float(v) for v in np.atleast_1d(weights)]
    qs = [0.0] * a if qs is None else [float(v) for v in np.atleast_1d(qs)]
    sigmas = [float(v) for v in np.atleast_1d(sigmas)]
    if not (len(weights) == len(qs) == len(sigmas) == a):
        raise ValueError("S0s, weights, qs, sigmas must share length")
    barrier_up = barrier_type.startswith("up")
    params = _build_params(n_paths, n_steps, S0s, weights, K, T, r, qs,
                           sigmas, chol, barrier, rebate, is_call, payoff,
                           barrier_up)
    reps, n_programs = _plan_grid(int(n_paths), TILE)
    seed_arr = jnp.asarray([seed % (2**31 - 1), 0], jnp.int32)
    return _run_basket_kernel(
        seed_arr, params, n_programs=n_programs, reps=reps, n_assets=a,
        n_steps=int(n_steps), antithetic=bool(antithetic),
        payoff_id=PAYOFF_IDS[payoff], barrier_up=barrier_up,
        knock_in=barrier_type.endswith("in"),
        interpret=bool(interpret), sw_prng=sw_prng)


def basket_path_sumstats_pallas_sharded(
    mesh, seed: int, n_paths: int, n_steps: int, S0s, weights, K, T, r, qs,
    sigmas, chol, is_call: bool, *, payoff: str, antithetic: bool = True,
    barrier: float = 0.0, barrier_type: str = "down-and-in",
    rebate: float = 0.0, interpret=None, sw_prng=None,
):
    """Mesh data-parallel basket path kernel: per-device slices of one
    global program grid, 6-stat psum — same estimator as single-chip."""
    from functools import partial as _partial

    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import mesh_axes
    from .pallas_mc import _plan_grid

    if payoff not in PAYOFF_IDS:
        raise ValueError(f"payoff must be one of {tuple(PAYOFF_IDS)}")
    S0s = [float(v) for v in np.atleast_1d(S0s)]
    a = len(S0s)
    weights = [float(v) for v in np.atleast_1d(weights)]
    qs = [0.0] * a if qs is None else [float(v) for v in np.atleast_1d(qs)]
    sigmas = [float(v) for v in np.atleast_1d(sigmas)]
    if not (len(weights) == len(qs) == len(sigmas) == a):
        raise ValueError("S0s, weights, qs, sigmas must share length")
    barrier_up = barrier_type.startswith("up")
    params = _build_params(n_paths, n_steps, S0s, weights, K, T, r, qs,
                           sigmas, chol, barrier, rebate, is_call, payoff,
                           barrier_up)
    axis = mesh_axes(mesh)
    n_dev = int(mesh.devices.size)
    reps, n_programs = _plan_grid(int(n_paths), TILE, n_dev)
    progs_per_dev = n_programs // n_dev
    seed_val = jnp.int32(seed % (2**31 - 1))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    offsets = jnp.arange(n_dev, dtype=jnp.int32) * progs_per_dev

    @_partial(jax.shard_map, mesh=mesh, in_specs=P(axis), out_specs=P(),
              check_vma=False)
    def shard_fn(offs):
        seed_arr = jnp.stack([seed_val, offs[0]])
        local = _run_basket_kernel(
            seed_arr, params, n_programs=progs_per_dev, reps=reps,
            n_assets=a, n_steps=int(n_steps), antithetic=bool(antithetic),
            payoff_id=PAYOFF_IDS[payoff], barrier_up=barrier_up,
            knock_in=barrier_type.endswith("in"),
            interpret=bool(interpret), sw_prng=sw_prng)
        return jax.lax.psum(local, axis)

    return shard_fn(offsets)
