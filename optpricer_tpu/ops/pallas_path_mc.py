"""Fused Pallas TPU kernel for path-dependent GBM Monte-Carlo.

Extends the terminal-only kernel (``pallas_mc.py``) with a per-step time
loop held entirely in registers: each grid program carries a tile of paths
(spot, running sum, running max/min, barrier-crossed flag) through all
n_steps, then reduces the discounted payoff to sufficient statistics.
Nothing path-shaped ever touches HBM — the XLA scan version moves
O(n_steps·n_paths) normals through memory and is ~100-700× slower.

Design notes:
* Box-Muller yields two normal tiles per two bit tiles; the kernel
  advances **two time steps per loop iteration** so no randomness is wasted
  (n_steps is padded to even; the kernel handles odd counts by a half
  iteration flag... n_steps must be even — callers pad).
* Antithetic pairing carries mirrored state (S⁺ with +z, S⁻ with −z) in the
  same program; statistics are pair-averaged, so the estimator and its
  stderr credit the pairing (see pallas_mc.py).
* Dual control variates (terminal spot + digital) have known means under
  GBM regardless of payoff, so the same 10-stat layout and host estimator
  are reused.
* Uses the bias-free exp/log from ops/fastmath (the VPU's own exp carries
  a −8.6e-7 mean relative bias — see that module).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import stats as stats_ops
from .fastmath import exp32, log32, norminv32
from .swprng import threefry2x32

BLOCK_R = 32            # sublane rows per path tile
LANES = 128
TILE = BLOCK_R * LANES  # paths per tile (4096)
# dual-CV layout + three extra moments:
#   [10] ΣY3,  Y3 = e^{−rT}·1{payoff ITM} — the PAYOFF's own exercise
#        indicator (unlike Y2's terminal-spot one). Under GBM every running
#        statistic is degree-1 homogeneous in S0, so the pathwise delta of
#        each continuous payoff is (E[X] + sign·K_eff·E[Y3])/S0 with
#        K_eff = K for fixed strikes, 0 for floating.
#   [11..16] ΣY/ΣY² for the three first-order observables
#        Y4 = dX/dσ (vega), Y5 = dX/dr (rho, incl. the −T·X discount
#        term), Y6 = −dX/dT (theta, reference sign convention). For
#        continuous payoffs these are PATHWISE (Brownian path W_t + up to
#        four accumulators in registers; dS_t/dσ = S_t·(W_t − σt),
#        dS_t/dr = S_t·t, dS_t/dT = S_t·(ct + σW_t/2)/T); for barrier/
#        digital payoffs they are LIKELIHOOD-RATIO (scores from z₁, W,
#        Q = Σz²).
#   [17..18] ΣY7/ΣY7² with Y7 = X·z₁/(S0σ√dt) — the LR delta observable
#        (discontinuous payoffs only; continuous payoffs get delta free
#        from the homogeneity argument + [10]).
#   [19..20] ΣY8/ΣY8² with Y8 the gamma observable: pure LR
#        X·((z₁²−1)/(S0σ√dt)² − z₁/(S0²σ√dt)) for barrier/digital; mixed
#        pathwise-LR D·(z₁/(S0σ√dt) − 1/S0) with D = (X + sign·K_eff·Y3)/S0
#        (LR applied to the homogeneity delta observable) for the rest.
#   All zero unless the kernel runs with ``with_greeks`` (GBM only).
# See models.mc_fused.exotic_greeks_mc for the host-side estimators.
NSTAT = stats_ops.STATS2_DIM + 11

PAYOFF_IDS = {"vanilla": 0, "barrier": 1, "asian": 2, "digital": 3,
              "lookback": 4}


def _path_kernel(seed_ref, par_ref, svi_ref, out_ref, *, n_steps: int,
                 reps: int, antithetic: bool, payoff_id: int,
                 barrier_up: bool, knock_out: bool, average_geo: bool,
                 strike_floating: bool, is_call: bool,
                 dynamics: str = "gbm", n_slices: int = 0,
                 lsv_deg: int = 0, sw_prng: bool = False,
                 with_greeks: bool = False, geo_cv: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Global program id (local id + per-device offset, see pallas_mc.py):
    # streams and tail masking are laid out over the global grid, so a
    # shard_map run over any device count reproduces the single-device
    # estimate.
    pid = pl.program_id(0) + seed_ref[1]
    if not sw_prng:
        pltpu.prng_seed(seed_ref[0] * jnp.int32(1103515245) + pid)

    S0 = par_ref[0]
    K = par_ref[1]
    mu = par_ref[2]         # gbm: (r−q−σ²/2)·dt
    sig = par_ref[3]        # gbm: σ√dt
    df = par_ref[4]         # e^{−rT}
    n_paths = par_ref[5]
    sign = par_ref[6]       # +1 call, −1 put
    barrier = par_ref[7]
    rebate = par_ref[8]
    payout = par_ref[9]
    dt_step = par_ref[10]   # T / n_steps
    rq = par_ref[11]        # r − q
    sqrt_dt = par_ref[12]
    bump = par_ref[13]      # Milstein σ′ bump fraction
    h_v0 = par_ref[14]      # Heston parameters
    h_kappa = par_ref[15]
    h_theta = par_ref[16]
    h_xi = par_ref[17]
    h_rho = par_ref[18]
    s_alpha0 = par_ref[19]  # SABR parameters
    s_beta = par_ref[20]
    s_nu = par_ref[21]
    s_rho = par_ref[22]

    is_sabr = dynamics in ("sabr_ln", "sabr_cev")
    sv_model = is_sabr or dynamics in ("heston", "heston_qe",
                                       "lsv", "lsv_qe")
    qe_model = dynamics in ("heston_qe", "lsv_qe")
    rho_sv = s_rho if is_sabr else h_rho
    inv_xw = par_ref[23]    # lsv: 1 / x_width (leverage poly domain scale)

    # ---- Dupire local vol from SVI slices (closed form, in registers) ----
    # svi_ref layout: (6, n_slices) rows a, b, rho, m, sg, T.
    def slice_w(i, k):
        """Total variance of slice i at log-moneyness tile k."""
        km = k - svi_ref[3, i]
        sg_i = svi_ref[4, i]
        return svi_ref[0, i] + svi_ref[1, i] * (
            svi_ref[2, i] * km + jnp.sqrt(km * km + sg_i * sg_i))

    def t_blend(vals, t):
        """Linear interp in T between slice values with end-slope (t/T)
        extrapolation — the same weights as total_var_from_logm, applied
        to any per-slice quantity (interpolation is linear at fixed k, so
        w, ∂w/∂k and ∂²w/∂k² all blend identically —
        models/calibration.dupire_local_vol's _blend)."""
        Ts = [svi_ref[5, i] for i in range(n_slices)]
        out = vals[0] / Ts[0] * t
        for i in range(1, n_slices):
            alpha = (t - Ts[i - 1]) / (Ts[i] - Ts[i - 1])
            mid = (1.0 - alpha) * vals[i - 1] + alpha * vals[i]
            out = jnp.where(t > Ts[i - 1], mid, out)
        return jnp.where(t >= Ts[n_slices - 1],
                         vals[n_slices - 1] / Ts[n_slices - 1] * t, out)

    def w_interp(k, t):
        return t_blend([slice_w(i, k) for i in range(n_slices)], t)

    def sigma_loc(S, t):
        """σ_loc(S, t): Gatheral's Dupire formula with the same floors and
        clips as models/calibration.dupire_local_vol."""
        t = jnp.maximum(t, 1e-8)
        # scalar exp: Mosaic bitcast is vector-only, and the VPU exp's 1e-6
        # relative error on the forward only shifts log-moneyness by 1e-6.
        F = S0 * jnp.exp(rq * t)
        k = log32(S / F)
        # spatial quantities from the t-interpolated surface (per-slice
        # analytic derivatives blended with the same weights as w)
        w_l, dw_l, d2w_l = [], [], []
        for i in range(n_slices):
            b_i, rho_i = svi_ref[1, i], svi_ref[2, i]
            sg_i = svi_ref[4, i]
            km = k - svi_ref[3, i]
            root = jnp.sqrt(km * km + sg_i * sg_i)
            w_l.append(svi_ref[0, i] + b_i * (rho_i * km + root))
            dw_l.append(b_i * (rho_i + km / root))
            d2w_l.append(b_i * sg_i * sg_i / (root * root * root))
        w = jnp.maximum(t_blend(w_l, t), 1e-12)
        dw = t_blend(dw_l, t)
        d2w = t_blend(d2w_l, t)
        dT = 1e-4
        t_up = t + dT
        t_dn = jnp.maximum(t - dT, 1e-8)
        dwdT = (w_interp(k, t_up) - w_interp(k, t_dn)) / (t_up - t_dn)
        kw = k / w
        denom = (1.0 - kw * dw
                 + 0.25 * (-0.25 - 1.0 / w + kw * kw) * dw * dw
                 + 0.5 * d2w)
        denom = jnp.maximum(denom, 1e-8)
        s2 = jnp.maximum(dwdT, 1e-12) / denom
        return jnp.clip(jnp.sqrt(jnp.maximum(s2, 0.0)), 0.01, 5.0)

    two_pi = 6.283185307179586
    tiny = 5.9604645e-8

    rows = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_R, LANES), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_R, LANES), 1)
    base_elem = (rows * LANES + cols).astype(jnp.float32)

    shape = (BLOCK_R, LANES)
    n_half = n_steps // 2

    def normals(draw):
        # ``draw``: scalar draw index, unique per normals() call within the
        # program. Used only by the counter-based software PRNG (sw_prng —
        # interpret mode and the cross-platform reproducibility oracle, see
        # ops/swprng.py); the hardware PRNG is sequentially seeded instead.
        if sw_prng:
            # explicit i32: under the x64 CPU harness fori_loop induction
            # vars are i64, and bitcasting i64→u32 would split sublanes
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

    def uniforms(draw):
        """Two cell-centred (0,1) uniform tiles from one draw index —
        the QE variance transition consumes a RAW uniform (its
        exponential branch inverts the CDF directly; the quadratic
        branch's normal is norminv32 of the same uniform, so both
        branches ride one word exactly like the XLA engine's
        (z, Φ(z)) coupling)."""
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
        u2 = (pltpu.bitcast(bits_b >> 8, jnp.int32).astype(jnp.float32)
              + 0.5) * tiny
        return u1, u2

    def chunk_body(c, carry):
        acc, comp = carry

        def init_state():
            S = jnp.full(shape, S0)
            # crossed is carried as f32 0/1 — Mosaic cannot carry bool
            # vectors through scf.for loops.
            if payoff_id == 1:
                crossed = ((S >= barrier) if barrier_up
                           else (S <= barrier)).astype(jnp.float32)
            else:
                crossed = jnp.zeros(shape, jnp.float32)
            if dynamics in ("heston", "heston_qe", "lsv", "lsv_qe"):
                v = jnp.full(shape, h_v0)      # variance state
            elif is_sabr:
                v = jnp.full(shape, s_alpha0)  # σ state
            else:
                v = jnp.zeros(shape, jnp.float32)
            # (S, run_sum, run_logsum, run_max, run_min, crossed, v);
            # explicit f32 — under x64 (interpret-mode tests) jnp.zeros
            # would default to f64 and poison the whole state.
            zeros = jnp.zeros(shape, jnp.float32)
            st = (S, zeros, zeros, S, S, crossed, v)
            if with_greeks:
                # (W, g1..g4, z1c): Brownian path + pathwise Greek
                # accumulators + the first shock z₁ (gamma/LR scores).
                # asian arith: g1 = ΣS·W, g2 = ΣS·t; asian geo: g1 = ΣW;
                # lookback: (g1, g3) = (W, t) at max, (g2, g4) at min
                st = st + (zeros,) * 6
            return st

        st_p = init_state()
        st_m = init_state()

        def move(S, v, z, zv, t_now, k_idx):
            """One step of the asset (and variance) dynamics."""
            if dynamics == "gbm":
                return S * exp32(mu + sig * z), v
            if dynamics == "lsv":
                # Heston variance under a Dupire leverage function: the
                # frozen (n_steps, n_bins) table is polynomial-compressed
                # per step on the host (Chebyshev fit → monomial Horner,
                # coefficients DESCENDING in svi_ref[k]) so evaluation is
                # lsv_deg fused multiply-adds on lanes — no gathers. Same
                # discretisation as models.lsv._lsv_paths.
                v_eff = jnp.maximum(v, 0.0)
                z1 = h_rho * zv + jnp.sqrt(jnp.maximum(
                    0.0, 1.0 - h_rho * h_rho)) * z
                x = log32(S / S0) - rq * t_now
                u = jnp.clip(x * inv_xw, -1.0, 1.0)
                L = jnp.full(S.shape, svi_ref[k_idx, 0])
                for j in range(1, lsv_deg + 1):
                    L = L * u + svi_ref[k_idx, j]
                L = jnp.clip(L, 0.05, 20.0)  # calibration's own clip
                sig_e = L * jnp.sqrt(v_eff)
                S_new = S * exp32((rq - 0.5 * sig_e * sig_e) * dt_step
                                  + sig_e * sqrt_dt * z1)
                v_new = jnp.maximum(
                    v + h_kappa * (h_theta - v_eff) * dt_step
                    + h_xi * jnp.sqrt(v_eff) * sqrt_dt * zv, 0.0)
                return S_new, v_new
            if dynamics == "heston":
                # full-truncation Euler variance, log-Euler asset — same
                # discretisation as processes.heston_paths
                v_eff = jnp.maximum(v, 0.0)
                z1 = h_rho * zv + jnp.sqrt(jnp.maximum(
                    0.0, 1.0 - h_rho * h_rho)) * z
                S_new = S * exp32((rq - 0.5 * v_eff) * dt_step
                                  + jnp.sqrt(v_eff) * sqrt_dt * z1)
                v_new = jnp.maximum(
                    v + h_kappa * (h_theta - v_eff) * dt_step
                    + h_xi * jnp.sqrt(v_eff) * sqrt_dt * zv, 0.0)
                return S_new, v_new
            if qe_model:
                # Andersen QE in registers — same scheme as
                # processes._heston_qe_core (fixes the full-truncation
                # Euler's O(Δt) bias, +0.20 of spot at 50 steps on
                # Feller-violating books). ``zv`` carries the RAW
                # UNIFORM u (the call site mirrors antithetics as 1−u):
                # the quadratic branch's normal is Φ⁻¹(u), the
                # exponential branch inverts its CDF on u directly.
                u = zv
                zq = norminv32(u)
                emkt = jnp.exp(-h_kappa * dt_step)   # scalar exp is fine
                c1 = h_xi * h_xi * emkt * (1.0 - emkt) / h_kappa
                c2 = h_theta * h_xi * h_xi * (1.0 - emkt) ** 2 \
                    / (2.0 * h_kappa)
                eps = 1e-12
                m = h_theta + (v - h_theta) * emkt
                s2 = v * c1 + c2
                psi = s2 / jnp.maximum(m * m, eps)
                two_over = 2.0 / jnp.maximum(jnp.minimum(psi, 1.5), eps)
                b2 = (two_over - 1.0 + jnp.sqrt(two_over)
                      * jnp.sqrt(jnp.maximum(two_over - 1.0, 0.0)))
                a = m / (1.0 + b2)
                bz = jnp.sqrt(jnp.maximum(b2, 0.0)) + zq
                psi_e = jnp.maximum(psi, 1.5)
                p = (psi_e - 1.0) / (psi_e + 1.0)
                beta_e = (1.0 - p) / jnp.maximum(m, eps)
                v_exp = jnp.where(
                    u <= p, 0.0,
                    log32((1.0 - p) / jnp.maximum(1.0 - u, eps)) / beta_e)
                v_new = jnp.where(psi <= 1.5, a * bz * bz, v_exp)
                if dynamics == "lsv_qe":
                    # leverage-scaled central asset step (the ρ-coupling
                    # rides the v-increment, scaled by the local L) —
                    # same scheme as models.lsv._lsv_paths scheme="qe";
                    # leverage via the per-step Horner polynomial
                    x = log32(S / S0) - rq * t_now
                    uu = jnp.clip(x * inv_xw, -1.0, 1.0)
                    L = jnp.full(S.shape, svi_ref[k_idx, 0])
                    for j in range(1, lsv_deg + 1):
                        L = L * uu + svi_ref[k_idx, j]
                    L = jnp.clip(L, 0.05, 20.0)
                    vbar = 0.5 * (v + v_new)
                    inc = v_new - v - h_kappa * (h_theta - vbar) * dt_step
                    coup = jnp.where(h_xi > 1e-8,
                                     h_rho * inc / jnp.maximum(h_xi, 1e-8),
                                     0.0)
                    rp2 = 1.0 - h_rho * h_rho
                    S_new = S * exp32(
                        rq * dt_step - 0.5 * L * L * vbar * dt_step
                        + L * coup
                        + L * jnp.sqrt(jnp.maximum(
                            rp2 * vbar * dt_step, 0.0)) * z)
                    return S_new, v_new
                g = 0.5
                K0c = -h_rho * h_kappa * h_theta * dt_step / h_xi
                K1c = g * dt_step * (h_kappa * h_rho / h_xi - 0.5) \
                    - h_rho / h_xi
                K2c = g * dt_step * (h_kappa * h_rho / h_xi - 0.5) \
                    + h_rho / h_xi
                K34 = g * dt_step * (1.0 - h_rho * h_rho)
                S_new = S * exp32(
                    rq * dt_step + K0c + K1c * v + K2c * v_new
                    + jnp.sqrt(jnp.maximum(K34 * (v + v_new), 0.0)) * z)
                return S_new, v_new
            if is_sabr:
                # exact lognormal σ carried in registers; the asset step
                # uses the PRE-update σ — same ordering as
                # processes._sabr_core (reference's σ-first ordering
                # biases the forward by e^{ρανT}; see divergence note)
                z1 = rho_sv * zv + jnp.sqrt(jnp.maximum(
                    0.0, 1.0 - rho_sv * rho_sv)) * z
                if dynamics == "sabr_ln":  # beta == 1: exact log-Euler
                    S_new = S * exp32((rq - 0.5 * v * v) * dt_step
                                      + v * sqrt_dt * z1)
                else:  # CEV beta < 1: Euler with positivity clamp
                    Sb = exp32(s_beta * log32(jnp.maximum(S, 1e-12)))
                    S_new = jnp.maximum(
                        S + rq * S * dt_step + v * Sb * sqrt_dt * z1,
                        1e-12)
                sig_n = v * exp32(s_nu * sqrt_dt * zv
                                  - 0.5 * s_nu * s_nu * dt_step)
                return S_new, sig_n
            if dynamics == "lv_euler":
                s_loc = sigma_loc(S, t_now)
                return S * exp32((rq - 0.5 * s_loc * s_loc) * dt_step
                                 + s_loc * sqrt_dt * z), v
            # lv_milstein — same σ′ central FD as
            # processes.milstein_local_vol_paths
            s_loc = jnp.clip(sigma_loc(S, t_now), 1e-8, 10.0)
            eps = bump * S
            S_up = S + eps
            S_dn = jnp.maximum(S - eps, 1e-10)
            s_up = sigma_loc(S_up, t_now)
            s_dn = sigma_loc(S_dn, t_now)
            da = (s_up * S_up - s_dn * S_dn) / (S_up - S_dn)
            a_t = s_loc * S
            S_new = (S + rq * S * dt_step + a_t * sqrt_dt * z
                     + 0.5 * a_t * da * (z * z - 1.0) * dt_step)
            return jnp.maximum(S_new, 1e-10), v

        def advance(st, z, zv, t_now, k_idx):
            if with_greeks:
                (S, rsum, rlog, rmax, rmin, crossed, v,
                 W, g1, g2, g3, g4, z1c) = st
            else:
                S, rsum, rlog, rmax, rmin, crossed, v = st
            S_prev_max, S_prev_min = rmax, rmin
            S, v = move(S, v, z, zv, t_now, k_idx)
            if with_greeks:
                W = W + sqrt_dt * z
                t_new = t_now + dt_step
                z1c = jnp.where(t_now == 0.0, z, z1c)  # first shock
                if payoff_id in (1, 3):
                    # likelihood-ratio score ingredient: Σz²
                    g2 = g2 + z * z
                if payoff_id == 2:
                    if average_geo:
                        g1 = g1 + W
                    else:
                        g1 = g1 + S * W
                        g2 = g2 + S * t_new
                if payoff_id == 4:
                    newmax = S > S_prev_max
                    newmin = S < S_prev_min
                    g1 = jnp.where(newmax, W, g1)
                    g3 = jnp.where(newmax, t_new, g3)
                    g2 = jnp.where(newmin, W, g2)
                    g4 = jnp.where(newmin, t_new, g4)
            if payoff_id == 2:  # asian
                rsum = rsum + S
                if average_geo or geo_cv:
                    rlog = rlog + log32(S)
            if payoff_id == 4:  # lookback
                rmax = jnp.maximum(rmax, S)
                rmin = jnp.minimum(rmin, S)
            if payoff_id == 1:  # barrier
                hit = ((S >= barrier) if barrier_up
                       else (S <= barrier)).astype(jnp.float32)
                crossed = jnp.maximum(crossed, hit)
            out = (S, rsum, rlog, rmax, rmin, crossed, v)
            if with_greeks:
                out = out + (W, g1, g2, g3, g4, z1c)
            return out

        def step_body(t, states):
            st_p, st_m = states
            d0 = (c * n_half + t) * 2  # per-program draw-call index
            z1, z2 = normals(d0)
            if qe_model:
                zv1, zv2 = uniforms(d0 + 1)  # QE consumes raw uniforms
            elif sv_model:
                zv1, zv2 = normals(d0 + 1)  # independent vol/variance shocks
            else:
                zv1 = zv2 = z1
            t0 = (2.0 * t.astype(jnp.float32)) * dt_step
            t1 = t0 + dt_step
            k0 = 2 * t
            k1 = k0 + 1
            st_p = advance(st_p, z1, zv1, t0, k0)
            st_p = advance(st_p, z2, zv2, t1, k1)
            if antithetic:
                if qe_model:
                    mv1, mv2 = 1.0 - zv1, 1.0 - zv2  # mirror the uniform
                else:
                    mv1, mv2 = -zv1, -zv2
                st_m = advance(st_m, -z1, mv1, t0, k0)
                st_m = advance(st_m, -z2, mv2, t1, k1)
            return (st_p, st_m)

        st_p, st_m = jax.lax.fori_loop(0, n_half, step_body, (st_p, st_m))

        def payoff_of(st):
            if with_greeks:
                (S, rsum, rlog, rmax, rmin, crossed, v,
                 W, g1, g2, g3, g4, z1c) = st
            else:
                S, rsum, rlog, rmax, rmin, crossed, v = st
            vanilla = jnp.maximum(sign * (S - K), 0.0)
            if payoff_id == 0:
                pay = vanilla
            elif payoff_id == 1:
                hit = crossed > 0.5
                pay = jnp.where(hit, rebate, vanilla) if knock_out \
                    else jnp.where(hit, vanilla, rebate)
            elif payoff_id == 2:
                avg = exp32(rlog / n_steps) if average_geo \
                    else rsum / n_steps
                if strike_floating:
                    pay = jnp.maximum(sign * (S - avg), 0.0)
                else:
                    pay = jnp.maximum(sign * (avg - K), 0.0)
            elif payoff_id == 3:
                pay = jnp.where(sign * (S - K) > 0.0, payout, 0.0)
            else:  # lookback — kind branch must be static (trace time)
                if strike_floating:
                    pay = (S - rmin) if is_call else (rmax - S)
                else:
                    pay = jnp.maximum(rmax - K, 0.0) if is_call \
                        else jnp.maximum(K - rmin, 0.0)
            X = df * pay
            if geo_cv:
                # geometric-Asian payoff as Y1: E[Y1] is closed-form
                # (analytic.geometric_asian_price), and corr(X, Y1) ≈ 1
                # for the arithmetic average — far tighter than the
                # terminal-spot CV
                geo = exp32(rlog / n_steps)
                Y1 = df * jnp.maximum(sign * (geo - K), 0.0)
            else:
                Y1 = df * S
            Y2 = df * (sign * (S - K) > 0.0).astype(jnp.float32)
            Y3 = df * (pay > 0.0).astype(jnp.float32)
            zeros = jnp.zeros(shape, jnp.float32)
            if not with_greeks:
                return X, Y1, Y2, Y3, zeros, zeros, zeros, zeros, zeros
            T_total = jnp.float32(n_steps) * dt_step
            sig_ann = sig / sqrt_dt
            c_drift = rq - 0.5 * sig_ann * sig_ann
            r_rate = -jnp.log(df) / T_total

            if payoff_id in (1, 3):
                # likelihood-ratio observables from (z₁, W, Q) — same
                # scores as mc_fused.exotic_greeks_mc's LR branch
                m_f = jnp.float32(n_steps)
                Y4 = X * ((g2 - m_f) / sig_ann - W)
                Y5 = X * (W / sig_ann) - T_total * X
                Y6 = r_rate * X - X * ((g2 - m_f) / (2.0 * T_total)
                                       + c_drift * W / (sig_ann * T_total))
                Y7 = X * z1c / (S0 * sig)    # sig = σ√dt
                # pure-LR gamma: Γ = E[X·((z₁²−1)/(S0σ√dt)² − z₁/(S0²σ√dt))]
                Y8 = X * ((z1c * z1c - 1.0) / (S0 * S0 * sig * sig)
                          - z1c / (S0 * S0 * sig))
                return X, Y1, Y2, Y3, Y4, Y5, Y6, Y7, Y8

            # pathwise d(inner)/d(σ, r, T) — same chain rules as
            # mc_fused._pathwise_dinner (σ = sig/√dt, c = r−q−σ²/2)

            def d_terminal():
                return (S * (W - sig_ann * T_total), S * T_total,
                        S * (c_drift * T_total + 0.5 * sig_ann * W)
                        / T_total)

            if payoff_id == 0:  # vanilla
                ds, dr, dT = d_terminal()
                dinner = (sign * ds, sign * dr, sign * dT)
            elif payoff_id == 2:  # asian
                m = jnp.float32(n_steps)
                if average_geo:
                    avg_v = exp32(rlog / n_steps)
                    tsum = dt_step * (m * (m + 1.0) / 2.0)
                    davg = (avg_v * (g1 - sig_ann * tsum) / m,
                            avg_v * tsum / m,
                            avg_v * (c_drift * tsum + 0.5 * sig_ann * g1)
                            / (m * T_total))
                else:
                    davg = ((g1 - sig_ann * g2) / m,
                            g2 / m,
                            (c_drift * g2 + 0.5 * sig_ann * g1)
                            / (m * T_total))
                if strike_floating:
                    ds = d_terminal()
                    dinner = tuple(sign * (a - b)
                                   for a, b in zip(ds, davg))
                else:
                    dinner = tuple(sign * d for d in davg)
            else:  # lookback (payoff_id == 4)
                dmax = (rmax * (g1 - sig_ann * g3), rmax * g3,
                        rmax * (c_drift * g3 + 0.5 * sig_ann * g1)
                        / T_total)
                dmin = (rmin * (g2 - sig_ann * g4), rmin * g4,
                        rmin * (c_drift * g4 + 0.5 * sig_ann * g2)
                        / T_total)
                if strike_floating:
                    ds = d_terminal()
                    if is_call:
                        dinner = tuple(a - b for a, b in zip(ds, dmin))
                    else:
                        dinner = tuple(a - b for a, b in zip(dmax, ds))
                else:
                    dinner = dmax if is_call else tuple(-d for d in dmin)
            itm = (pay > 0.0).astype(jnp.float32)
            Y4 = df * itm * dinner[0]                       # dX/dσ
            Y5 = -T_total * X + df * itm * dinner[1]        # dX/dr
            Y6 = r_rate * X - df * itm * dinner[2]          # −dX/dT
            # mixed pathwise-LR gamma: LR-differentiate the per-path
            # homogeneity delta D = (X + sign·K_eff·Y3)/S0 →
            # Γ = E[D·z₁/(S0σ√dt) − D/S0]
            K_eff = 0.0 if strike_floating else K
            D = (X + sign * K_eff * Y3) / S0
            Y8 = D * z1c / (S0 * sig) - D / S0
            return X, Y1, Y2, Y3, Y4, Y5, Y6, zeros, Y8

        prog_offset = (pid.astype(jnp.float32) * reps
                       + c.astype(jnp.float32)) * TILE
        rem = n_paths - prog_offset
        w = (base_elem < rem).astype(jnp.float32)

        obs = payoff_of(st_p)
        if antithetic:
            obs_m = payoff_of(st_m)
            obs = tuple(0.5 * (a + b) for a, b in zip(obs, obs_m))
        X, Y1, Y2, Y3, Y4, Y5, Y6, Y7, Y8 = obs

        WX = X * w
        WY1 = Y1 * w
        WY2 = Y2 * w
        WY4 = Y4 * w
        WY5 = Y5 * w
        WY6 = Y6 * w
        WY7 = Y7 * w
        WY8 = Y8 * w
        s = jnp.stack([
            jnp.sum(w),
            jnp.sum(WX), jnp.sum(WX * X),
            jnp.sum(WY1), jnp.sum(WY1 * Y1), jnp.sum(WX * Y1),
            jnp.sum(WY2), jnp.sum(WY2 * Y2), jnp.sum(WX * Y2),
            jnp.sum(WY1 * Y2),
            jnp.sum(Y3 * w),
            jnp.sum(WY4), jnp.sum(WY4 * Y4),
            jnp.sum(WY5), jnp.sum(WY5 * Y5),
            jnp.sum(WY6), jnp.sum(WY6 * Y6),
            jnp.sum(WY7), jnp.sum(WY7 * Y7),
            jnp.sum(WY8), jnp.sum(WY8 * Y8),
        ])
        return stats_ops.kahan_add(acc, comp, s)

    zero = jnp.zeros((NSTAT,), jnp.float32)
    acc, _ = jax.lax.fori_loop(0, reps, chunk_body, (zero, zero))
    row = jnp.concatenate([acc, jnp.zeros((LANES - NSTAT,), jnp.float32)])
    out_ref[0, :, :] = jnp.broadcast_to(row[None, :], (8, LANES))


@partial(jax.jit, static_argnames=("n_programs", "reps", "n_steps",
                                   "antithetic", "payoff_id", "barrier_up",
                                   "knock_out", "average_geo",
                                   "strike_floating", "is_call", "dynamics",
                                   "n_slices", "lsv_deg", "interpret",
                                   "sw_prng", "with_greeks", "geo_cv"))
def _run_path_kernel(seed, params, svi, *, n_programs, reps, n_steps,
                     antithetic, payoff_id, barrier_up, knock_out,
                     average_geo, strike_floating, is_call, dynamics="gbm",
                     n_slices=0, lsv_deg=0, interpret=False, sw_prng=None,
                     with_greeks=False, geo_cv=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if sw_prng is None:
        # The Mosaic interpreter stubs the hardware PRNG to zeros (see
        # ops/swprng.py) — interpret runs default to the software PRNG.
        sw_prng = bool(interpret)
    kernel = partial(
        _path_kernel, n_steps=n_steps, reps=reps, antithetic=antithetic,
        payoff_id=payoff_id, barrier_up=barrier_up, knock_out=knock_out,
        average_geo=average_geo, strike_floating=strike_floating,
        is_call=is_call, dynamics=dynamics, n_slices=n_slices,
        lsv_deg=lsv_deg, sw_prng=bool(sw_prng), with_greeks=with_greeks,
        geo_cv=geo_cv)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_programs, 8, LANES), jnp.float32),
        grid=(n_programs,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, params, svi)
    return stats_ops.combine_scan(out[:, 0, :NSTAT])


def _common_params(n_paths, n_steps, S0, K, T, r, q, sigma, is_call,
                   barrier, rebate, payout, dS_bump, heston=None, sabr=None,
                   inv_xw=0.0):
    dt = T / n_steps
    mu = (r - q - 0.5 * sigma * sigma) * dt
    sig = sigma * np.sqrt(dt)
    df = np.exp(-r * T)
    sign = 1.0 if is_call else -1.0
    h = heston or {}
    s = sabr or {}
    return jnp.asarray(
        [S0, K, mu, sig, df, float(n_paths), sign, barrier, rebate, payout,
         dt, r - q, np.sqrt(dt), dS_bump,
         h.get("v0", 0.0), h.get("kappa", 0.0), h.get("theta", 0.0),
         h.get("xi", 0.0), h.get("rho", 0.0),
         s.get("alpha0", 0.0), s.get("beta", 1.0), s.get("nu", 0.0),
         s.get("rho", 0.0), inv_xw], jnp.float32)


def _resolve_config(n_paths, n_steps, S0, K, T, r, q, sigma, is_call,
                    payoff, antithetic, barrier, barrier_type, rebate,
                    average_type, strike_type, payout, svi_slices, scheme,
                    dS_bump, heston, sabr=None, geo_cv=False, lsv=None):
    """(params, svi, static_kwargs) shared by the local and sharded entry
    points; n_steps must be even (two Box-Muller normals advance two steps
    per loop iteration).

    ``lsv`` selects LSV dynamics: a dict with the Heston parameters
    (v0/kappa/theta/xi/rho), ``coeffs`` — the per-step leverage polynomial
    table (n_steps, deg+1), monomial coefficients DESCENDING on the scaled
    log-moneyness u = clip(x/x_width, −1, 1) — and ``x_width``. The svi
    operand slot carries the coefficient table in that case."""
    if n_steps % 2:
        raise ValueError("pallas path engine requires even n_steps")
    if geo_cv and not (payoff == "asian" and average_type == "arithmetic"
                       and strike_type == "fixed" and heston is None
                       and sabr is None and svi_slices is None
                       and lsv is None):
        raise ValueError("geo_cv requires a fixed-strike arithmetic asian "
                         "payoff under GBM dynamics")
    inv_xw = 0.0
    lsv_deg = 0
    if lsv is not None:
        heston = {k: float(lsv[k])
                  for k in ("v0", "kappa", "theta", "xi", "rho")}
        inv_xw = 1.0 / float(lsv["x_width"])
    params = _common_params(n_paths, n_steps, S0, K, T, r, q,
                            sigma if sigma is not None else 0.0,
                            is_call, barrier, rebate, payout, dS_bump,
                            heston, sabr, inv_xw)
    if lsv is not None:
        # the lsv dict's own "scheme" (the discretisation the leverage
        # table was CALIBRATED under) selects Euler or Andersen-QE
        # stepping — it must match the table or Gyöngy consistency breaks
        dynamics = "lsv_qe" if lsv.get("scheme") == "qe" else "lsv"
        n_slices = 0
        svi = jnp.asarray(lsv["coeffs"], jnp.float32)
        if svi.ndim != 2 or svi.shape[0] != n_steps:
            raise ValueError(f"lsv coeffs {svi.shape} != ({n_steps}, deg+1)")
        lsv_deg = int(svi.shape[1]) - 1
    elif svi_slices is None:
        if heston is not None:
            dynamics = "heston_qe" if scheme == "qe" else "heston"
        elif sabr is not None:
            dynamics = "sabr_ln" if float(sabr["beta"]) == 1.0 else "sabr_cev"
        else:
            dynamics = "gbm"
        n_slices = 0
        svi = jnp.zeros((6, 1), jnp.float32)
    else:
        dynamics = "lv_milstein" if scheme == "milstein" else "lv_euler"
        svi = jnp.asarray(svi_slices, jnp.float32)
        n_slices = int(svi.shape[1])
    static = dict(
        n_steps=int(n_steps), antithetic=bool(antithetic),
        payoff_id=PAYOFF_IDS[payoff],
        barrier_up=barrier_type.startswith("up"),
        knock_out=barrier_type.endswith("out"),
        average_geo=(average_type == "geometric"),
        strike_floating=(strike_type == "floating"),
        is_call=bool(is_call), dynamics=dynamics, n_slices=n_slices,
        lsv_deg=lsv_deg, geo_cv=bool(geo_cv))
    return params, svi, static


def path_mc_sumstats_pallas(
    seed: int, n_paths: int, n_steps: int, S0, K, T, r, q, sigma,
    is_call: bool, *, payoff: str, antithetic: bool,
    barrier: float = 0.0, barrier_type: str = "up-and-out",
    rebate: float = 0.0, average_type: str = "arithmetic",
    strike_type: str = "fixed", payout: float = 1.0,
    svi_slices=None, scheme: str = "log_euler", dS_bump: float = 0.01,
    heston=None, sabr=None, lsv=None, interpret: bool = False,
    sw_prng=None, greek_stats: bool = False, geo_cv: bool = False,
):
    """(21,) sufficient statistics for a path-dependent payoff.

    ``greek_stats=True`` (GBM only) fills moments [11..20] with ΣY/ΣY²
    for the vega/rho/theta/gamma(/LR-delta) observables carried
    in-register — pathwise for continuous payoffs, likelihood-ratio for
    barrier and digital (gamma is mixed pathwise-LR for the continuous
    ones); otherwise those slots are zero.

    Dynamics: GBM by default; Dupire local vol when ``svi_slices`` is given
    (array (6, n_slices), rows a/b/rho/m/sg/T — σ(S,t) evaluated from the
    SVI surface *inside the kernel* with the analytic forward
    S0·e^{(r−q)t}; ``scheme`` selects log-Euler/Milstein); Heston when a
    ``heston`` dict is given (full-truncation Euler variance in registers).
    n_steps must be even (two Box-Muller normals advance two steps per
    loop); callers bump odd step counts by one.
    """
    from .pallas_mc import _plan_grid

    params, svi, static = _resolve_config(
        n_paths, n_steps, S0, K, T, r, q, sigma, is_call, payoff, antithetic,
        barrier, barrier_type, rebate, average_type, strike_type, payout,
        svi_slices, scheme, dS_bump, heston, sabr, geo_cv, lsv)
    if greek_stats:
        if static["dynamics"] != "gbm":
            raise ValueError("greek_stats requires GBM dynamics")
        if payoff not in ("vanilla", "asian", "lookback", "barrier",
                          "digital"):
            raise ValueError(f"no Greek estimator for payoff {payoff!r}")
    reps, n_programs = _plan_grid(int(n_paths), TILE)
    seed_arr = jnp.asarray([seed % (2**31 - 1), 0], jnp.int32)
    return _run_path_kernel(
        seed_arr, params, svi, n_programs=n_programs, reps=reps,
        interpret=bool(interpret), sw_prng=sw_prng,
        with_greeks=bool(greek_stats), **static)


def path_mc_sumstats_pallas_sharded(
    mesh, seed: int, n_paths: int, n_steps: int, S0, K, T, r, q, sigma,
    is_call: bool, *, payoff: str, antithetic: bool,
    barrier: float = 0.0, barrier_type: str = "up-and-out",
    rebate: float = 0.0, average_type: str = "arithmetic",
    strike_type: str = "fixed", payout: float = 1.0,
    svi_slices=None, scheme: str = "log_euler", dS_bump: float = 0.01,
    heston=None, sabr=None, lsv=None, interpret=None, sw_prng=None,
    geo_cv: bool = False, greek_stats: bool = False,
):
    """Mesh data-parallel fused path MC: per-device Pallas grids + psum.

    Same global-grid split as ``pallas_mc.mc_sumstats_pallas_sharded`` — the
    per-device kernels cover contiguous slices of the global program grid and
    the 10-stat vectors ride one ICI ``psum``, so the multi-chip estimator is
    the same dual-CV design as single-chip. ``greek_stats=True`` (GBM only)
    psums the full 21-moment layout, so the sharded Greek run is the same
    estimator as single-chip — Greek ladders scale out like pricing runs.
    """
    from functools import partial as _partial

    from jax.sharding import PartitionSpec as P

    from .pallas_mc import _plan_grid

    params, svi, static = _resolve_config(
        n_paths, n_steps, S0, K, T, r, q, sigma, is_call, payoff, antithetic,
        barrier, barrier_type, rebate, average_type, strike_type, payout,
        svi_slices, scheme, dS_bump, heston, sabr, geo_cv, lsv)
    if greek_stats and static["dynamics"] != "gbm":
        raise ValueError("greek_stats requires GBM dynamics")
    from ..parallel.mesh import mesh_axes

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
        local = _run_path_kernel(
            seed_arr, params, svi, n_programs=progs_per_dev, reps=reps,
            interpret=bool(interpret), sw_prng=sw_prng,
            with_greeks=bool(greek_stats), **static)
        return jax.lax.psum(local, axis)

    return shard_fn(offsets)
