"""Fused local-vol θ-scheme PDE march: the WHOLE solver in one TPU kernel.

The time-dependent-coefficient FD solver (``models/pde._fd_solve`` with a
``sigma_func``) re-reads and re-writes every per-step array from HBM. This
kernel instead keeps the value ladder V — and everything derived per step
(σ, operator diagonals, rhs, elimination coefficients) — resident in VMEM
for ALL time steps; HBM sees one write of the final interior values.

**Measured results (v5e, 1024-strike 512×512 ladder):** per-step Pallas
Thomas path 85 ms; fused march with the sequential Thomas walk 118 ms
(LATENCY-bound: the dependent chain is rows × 2 sweeps × steps with a
reciprocal per row); fused march with the log-depth **parallel cyclic
reduction** solve 100 ms (throughput-bound: ⌈log₂ m⌉ levels × six
sublane rotates + one full-width divide per level, insensitive to
``b_tile`` 128→1024 — i.e. pure VPU/VMEM work, no pipelining gap). PCR is
therefore the fused kernel's default (``method="pcr"``), but the fused
march as a whole remains the explicit ``solver="fused"`` opt-in of
``models.pde.fd_price_local_vol_batch`` — the per-step formulation still
wins by overlapping its HBM traffic behind eight independent lane-tile
programs while doing O(m) rather than O(m log m) solve work. Both fused
variants agree with the per-step solvers to f32 round-off (tested in
interpret mode).

Per time step, in registers/VMEM:
  1. σ(S, t) read from a precomputed (grid-node, time-step) table — the
     table is evaluated OUTSIDE the kernel with XLA on the exact same
     (S_grid, t) values the per-step solver sees, so the fused march and
     the per-step march consume bit-identical coefficients.  (Evaluating
     ``sigma_func`` inside Mosaic routed its ``jnp.log``/``jnp.exp``
     through the VPU's lower-precision transcendentals — ~74 ulps off at
     spot-scale arguments — which shifted 512-step marches by ~2e-4
     relative on hardware; the table kills that entire error class and
     drops per-kernel-call retracing of the closure.)  σ is shared across
     the strike lanes, so the table costs m_pad × n_t floats of VMEM and
     each step's column is selected by an exact one-hot lane reduction;
  2. operator diagonals aL = α−β, cL = α+β (bL derived as −(aL+cL)−r, so
     only two coefficient buffers live in VMEM);
  3. rhs = (I + (1−θ)dt·L)V + boundary transfer via two sublane rolls;
  4. Thomas elimination along the grid dimension — 8-row sublane groups
     with the recurrence carried in (lanes,) registers across groups
     (same walk as ops/pallas_tridiag);
  5. optional American projection against intrinsic.

Same linear algebra and boundary handling as ``_fd_solve``'s tridiag
branch (reference semantics: ``pde.py:145-220,385-426``), so the two agree
to f32 round-off. Grid padding rows carry zero couplings and zero rhs and
solve to zero; they never touch real rows.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .fastmath import exp32

GROUP = 8      # sublane granularity of the elimination walk
LANE = 128


def _fd_lv_kernel(par_ref, K_ref, sign_ref, sig_ref, out_ref,
                  V, CP, DP, AL, CL, S, *,
                  n_t: int, m: int, m_pad: int, b_tile: int,
                  theta: float, american: bool,
                  method: str):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x_min = par_ref[0]
    dx = par_ref[1]
    dt = par_ref[2]
    r = par_ref[3]
    q = par_ref[4]

    e = (1.0 - theta) * dt
    td = theta * dt

    rows = jax.lax.broadcasted_iota(jnp.int32, (m_pad, b_tile), 0)
    interior = (rows < m).astype(jnp.float32)
    row0 = (rows == 0).astype(jnp.float32)
    rowL = (rows == m - 1).astype(jnp.float32)

    # interior nodes x_j = x_min + (j+1)·dx
    x = x_min + (rows.astype(jnp.float32) + 1.0) * dx
    S[:] = exp32(x)
    # scalar exp via jnp (Mosaic's bitcast — hence exp32 — is vector-only);
    # ~1e-6 relative error on the two boundary constants is harmless
    S_min = jnp.exp(x_min)
    S_max = jnp.exp(x_min + (m + 1.0) * dx)

    K = K_ref[0:1, :]        # (1, b_tile), broadcasts over rows
    sign = sign_ref[0:1, :]  # +1 call / −1 put

    def intrinsic():
        return jnp.maximum(sign * (S[:] - K), 0.0) * interior

    def bc_pair(tau):
        """(left, right) Dirichlet rows, each (1, b_tile)."""
        disc_K = K * exp32(-r * tau + 0.0 * K)  # vectorised for exp32
        is_call = sign > 0.0
        left = jnp.where(is_call, 0.0, jnp.maximum(disc_K - S_min, 0.0))
        right = jnp.where(is_call, jnp.maximum(S_max - disc_K, 0.0), 0.0)
        return left, right

    V[:] = intrinsic()
    bc0 = bc_pair(jnp.float32(0.0))

    n_t_pad = -(-n_t // LANE) * LANE
    sig_lane = jax.lax.broadcasted_iota(jnp.int32, (m_pad, n_t_pad), 1)

    def time_step(i, carry):
        bc_l_old, bc_r_old = carry
        n_i = (n_t - 1) - i
        n = jnp.float32(n_t - 1) - i.astype(jnp.float32)
        tau = (jnp.float32(n_t) - n) * dt

        # exact one-hot column select: σ(·, t_n) as an (m_pad, 1) vector
        onehot = (sig_lane == n_i).astype(jnp.float32)
        sig = jnp.sum(sig_ref[:, :] * onehot, axis=1, keepdims=True)
        alpha = 0.5 * sig * sig / (dx * dx)
        beta = (r - q - 0.5 * sig * sig) / (2.0 * dx)
        AL[:] = (alpha - beta) * interior
        CL[:] = (alpha + beta) * interior

        bc_l_new, bc_r_new = bc_pair(tau)

        # rhs = (I + e·L)V + boundary transfer (old bc on the rhs operator,
        # new bc on the lhs operator — mirror of _fd_solve's tridiag branch)
        Vm1 = pltpu.roll(V[:], 1, 0)
        Vm1 = jnp.where(rows == 0, jnp.broadcast_to(bc_l_old,
                                                    (m_pad, b_tile)), Vm1)
        Vp1 = pltpu.roll(V[:], m_pad - 1, 0)  # circular shift by −1
        Vp1 = jnp.where(rows == m - 1, jnp.broadcast_to(bc_r_old,
                                                        (m_pad, b_tile)),
                        Vp1)
        bL = -(AL[:] + CL[:]) - r * interior
        DP[:] = ((1.0 + e * bL) * V[:] + e * AL[:] * Vm1 + e * CL[:] * Vp1
                 + td * AL[:] * row0 * bc_l_new
                 + td * CL[:] * rowL * bc_r_new)

        if method == "pcr":
            # ---- parallel cyclic reduction: log-depth, full-width ----
            # LHS coefficients as whole (m_pad, b_tile) arrays; a is zeroed
            # on row 0 and c on row m-1 (the Dirichlet transfer already
            # moved both couplings onto the rhs), padding rows are identity
            # equations solving to zero.  Every PCR level is pure
            # elementwise VPU work + eight sublane rotates — no sequential
            # reciprocal chain, which is what bounds the Thomas walk.
            #
            # Wrap-around safety needs no masks: a_i = 0 for i < 2^k and
            # c_i = 0 for i >= m_pad - 2^k hold inductively, so every
            # rolled-in garbage value is multiplied by an exact zero.
            not0 = (rows != 0).astype(jnp.float32)
            notL = (rows != m - 1).astype(jnp.float32)
            # diagonal-normalised form: divide each equation by its diag
            # once, then every level needs only six rolls and one divide.
            rb0 = 1.0 / (1.0 + td * (AL[:] + CL[:] + r * interior))
            DP[:] = DP[:] * rb0
            a_new = -td * AL[:] * not0 * rb0
            CL[:] = -td * CL[:] * notL * rb0
            AL[:] = a_new
            for _k in range((m_pad - 1).bit_length()):
                sft = 1 << _k
                am = pltpu.roll(AL[:], sft, 0)
                cm = pltpu.roll(CL[:], sft, 0)
                dm = pltpu.roll(DP[:], sft, 0)
                ap = pltpu.roll(AL[:], m_pad - sft, 0)
                cpv = pltpu.roll(CL[:], m_pad - sft, 0)
                dpv = pltpu.roll(DP[:], m_pad - sft, 0)
                rcp = 1.0 / (1.0 - AL[:] * cm - CL[:] * ap)
                new_a = -rcp * AL[:] * am
                new_c = -rcp * CL[:] * cpv
                new_d = rcp * (DP[:] - AL[:] * dm - CL[:] * dpv)
                AL[:] = new_a
                CL[:] = new_c
                DP[:] = new_d
            V[:] = DP[:]
            if american:
                V[:] = jnp.maximum(V[:], intrinsic())
            return bc_l_new, bc_r_new

        # ---- Thomas elimination along rows, systems on lanes ----
        lane_zeros = jnp.zeros((b_tile,), jnp.float32)

        # group walk: static python unroll of the 8 in-group rows, lax
        # loop over groups; lhs coefficients re-derived per row from AL/CL
        def fwd(g, fc):
            cp_prev, dp_prev = fc
            s = pl.multiple_of(g * GROUP, GROUP)
            A = AL[pl.ds(s, GROUP), :]
            C = CL[pl.ds(s, GROUP), :]
            D = DP[pl.ds(s, GROUP), :]
            g_rows = s + jax.lax.broadcasted_iota(jnp.int32, (GROUP, 1), 0)
            cps, dps = [], []
            for j in range(GROUP):
                mask_int = (g_rows[j, 0] < m).astype(jnp.float32)
                a_lhs = jnp.where(g_rows[j, 0] == 0, 0.0, -td * A[j, :])
                b_lhs = 1.0 + td * (A[j, :] + C[j, :] + r * mask_int)
                c_lhs = -td * C[j, :]
                # one reciprocal per row (divisions sit on the critical
                # dependency chain of the whole march)
                rcp = 1.0 / (b_lhs - a_lhs * cp_prev)
                cp_prev = c_lhs * rcp
                dp_prev = (D[j, :] - a_lhs * dp_prev) * rcp
                cps.append(cp_prev)
                dps.append(dp_prev)
            CP[pl.ds(s, GROUP), :] = jnp.stack(cps)
            DP[pl.ds(s, GROUP), :] = jnp.stack(dps)
            return cp_prev, dp_prev

        jax.lax.fori_loop(0, m_pad // GROUP, fwd, (lane_zeros, lane_zeros))

        def back(gr, x_next):
            g = m_pad // GROUP - 1 - gr
            s = pl.multiple_of(g * GROUP, GROUP)
            CPb = CP[pl.ds(s, GROUP), :]
            DPb = DP[pl.ds(s, GROUP), :]
            xs = [None] * GROUP
            for j in reversed(range(GROUP)):
                last = (gr == 0) & (j == GROUP - 1)
                cj = jnp.where(last, 0.0, CPb[j, :])
                x_next = DPb[j, :] - cj * x_next
                xs[j] = x_next
            V[pl.ds(s, GROUP), :] = jnp.stack(xs)
            return x_next

        jax.lax.fori_loop(0, m_pad // GROUP, back, lane_zeros)

        if american:
            V[:] = jnp.maximum(V[:], intrinsic())
        return bc_l_new, bc_r_new

    jax.lax.fori_loop(0, n_t, time_step, bc0)
    out_ref[:, :] = V[:]


@partial(jax.jit, static_argnames=("n_t", "m", "m_pad", "b_tile", "n_prog",
                                   "theta", "american",
                                   "interpret", "method"))
def _run_fd_lv(params, K_pad, sign_pad, sig_tab, *, n_t, m, m_pad, b_tile,
               n_prog, theta, american, interpret, method):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = partial(_fd_lv_kernel, n_t=n_t, m=m, m_pad=m_pad,
                     b_tile=b_tile, theta=theta, american=american,
                     method=method)
    lane_spec = pl.BlockSpec((1, b_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, n_prog * b_tile),
                                       jnp.float32),
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            lane_spec,
            lane_spec,
            pl.BlockSpec(sig_tab.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_pad, b_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((m_pad, b_tile), jnp.float32)
                        for _ in range(6)],
        interpret=pltpu.InterpretParams() if interpret else False,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(params, K_pad, sign_pad, sig_tab)


def fd_lv_ladder_pallas(S0, K, T, r, q, sigma_func, kind, *,
                        N_S: int = 512, N_t: int = 512, theta: float = 0.5,
                        S_max_mult: float = 4.0, ref_vol: float = 0.3,
                        american: bool = False, b_tile: int = 512,
                        interpret=None, method: str = "pcr"):
    """Local-vol strike/kind ladder priced by the fused VMEM-resident march.

    Same grid construction and θ-scheme semantics as
    ``models.pde.fd_price_local_vol_batch``; ``sigma_func(S, t)`` must be a
    JAX-traceable closure (it is traced INTO the kernel). Returns (B,)
    prices interpolated at ``ln S0``.

    ``method`` selects the in-kernel solve: ``"pcr"`` (default) is the
    log-depth parallel cyclic reduction — throughput-bound VPU work;
    ``"thomas"`` is the sequential group-walk elimination, kept for
    cross-validation and for convection-dominated grids where PCR's
    diagonal-dominance margin is thin.
    """
    from ..models.pde import _build_grid
    from ..ops.black_scholes import is_call_mask

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    K_arr = np.atleast_1d(np.asarray(K, dtype=float))
    mask = np.broadcast_to(np.atleast_1d(is_call_mask(kind)), K_arr.shape)
    B = K_arr.size

    x_np, dx, dt = _build_grid(S0, T, ref_vol, N_S, N_t, S_max_mult)
    m = N_S - 1
    m_pad = -(-m // GROUP) * GROUP
    b_tile = max(LANE, min(int(b_tile), -(-B // LANE) * LANE))
    b_tile = -(-b_tile // LANE) * LANE
    n_prog = -(-B // b_tile)
    B_pad = n_prog * b_tile

    K_pad = np.full((1, B_pad), K_arr[0], np.float32)
    K_pad[0, :B] = K_arr
    sign_pad = np.where(np.pad(mask, (0, B_pad - B), constant_values=True),
                        1.0, -1.0).astype(np.float32)[None, :]
    params = jnp.asarray([x_np[0], dx, dt, r, q, T], jnp.float32)

    # σ table evaluated by XLA on the exact (S_grid, t_n) the per-step
    # solver uses (models/pde.py:195): full-grid exp then interior slice,
    # t_n = n·dt in f32 — coefficient parity with solver="pallas" is exact.
    n_t_pad = -(-int(N_t) // LANE) * LANE
    S_grid32 = jnp.exp(jnp.asarray(x_np, jnp.float32))
    t_vals = (jnp.arange(int(N_t), dtype=jnp.float32)
              * jnp.asarray(dt, jnp.float32))
    sig_rows = jax.vmap(
        lambda t: jnp.broadcast_to(
            jnp.asarray(sigma_func(S_grid32, t), jnp.float32),
            S_grid32.shape)[1:N_S])(t_vals)          # (n_t, m)
    sig_tab = jnp.zeros((m_pad, n_t_pad), jnp.float32)
    sig_tab = sig_tab.at[:m, :int(N_t)].set(sig_rows.T)

    V_int = _run_fd_lv(
        params, jnp.asarray(K_pad), jnp.asarray(sign_pad), sig_tab,
        n_t=int(N_t), m=m, m_pad=int(m_pad), b_tile=int(b_tile),
        n_prog=int(n_prog), theta=float(theta), american=bool(american),
        interpret=bool(interpret), method=str(method))

    # assemble the full grid: analytic Dirichlet rows at tau = T
    V_int = np.asarray(V_int)[:m, :B]           # (m, B)
    disc_K = K_arr * np.exp(-r * T)
    S_min, S_max = np.exp(x_np[0]), np.exp(x_np[-1])
    left = np.where(mask, 0.0, np.maximum(disc_K - S_min, 0.0))
    right = np.where(mask, np.maximum(S_max - disc_K, 0.0), 0.0)
    V_full = np.concatenate([left[None, :], V_int, right[None, :]], axis=0)
    x0 = np.log(S0)
    prices = np.empty(B)
    for b in range(B):
        prices[b] = np.interp(x0, x_np, V_full[:, b])
    return prices
