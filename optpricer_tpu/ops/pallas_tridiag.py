"""Pallas TPU kernel: batched Thomas solve, one system per vector lane.

The PDE stack mostly avoids per-step tridiagonal solves (constant-vol
θ-schemes use the dense propagator, models/pde.py), but the local-vol path
and any time-dependent-coefficient solver need a genuine batched solve each
step. This kernel lays ``batch`` systems across the VPU lanes and sweeps the
system dimension sequentially in VMEM — two passes over the data (vs log(n)
full passes for the associative-scan formulation), with all per-row work an
(1, 128)-lane vector op.

TPU constraint: VMEM rows can only be sliced at sublane (8-row) granularity,
so the sweeps walk 8-row blocks with the recurrence carried across block
boundaries in registers; the 8 rows inside a block unroll statically.

Layout: inputs are (n, batch) — system index is the *leading* axis. Callers
transpose (batch, n) data once; n must be a multiple of 8 and batch a
multiple of 128 (pad).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BATCH_TILE = 128
GROUP = 8  # sublane granularity


def _thomas_kernel(a_ref, b_ref, c_ref, d_ref, x_ref, cp_ref, dp_ref):
    from jax.experimental import pallas as pl

    n = a_ref.shape[0]
    n_groups = n // GROUP
    lane_zeros = jnp.zeros((BATCH_TILE,), a_ref.dtype)

    # Forward elimination: c'_i = c_i / (b_i − a_i c'_{i−1}),
    #                      d'_i = (d_i − a_i d'_{i−1}) / (b_i − a_i c'_{i−1})
    # First row: a_0 treated as 0 (unused by convention).
    def fwd_group(g, carry):
        cp_prev, dp_prev, first = carry
        s = pl.multiple_of(g * GROUP, GROUP)
        A = a_ref[pl.ds(s, GROUP), :]
        B = b_ref[pl.ds(s, GROUP), :]
        C = c_ref[pl.ds(s, GROUP), :]
        D = d_ref[pl.ds(s, GROUP), :]
        cps = []
        dps = []
        for j in range(GROUP):
            aj = jnp.where(first & (j == 0), 0.0, A[j, :])
            denom = B[j, :] - aj * cp_prev
            cp_prev = C[j, :] / denom
            dp_prev = (D[j, :] - aj * dp_prev) / denom
            cps.append(cp_prev)
            dps.append(dp_prev)
        cp_ref[pl.ds(s, GROUP), :] = jnp.stack(cps)
        dp_ref[pl.ds(s, GROUP), :] = jnp.stack(dps)
        return cp_prev, dp_prev, jnp.asarray(False)

    jax.lax.fori_loop(0, n_groups, fwd_group,
                      (lane_zeros, lane_zeros, jnp.asarray(True)))

    # Back substitution: x_i = d'_i − c'_i x_{i+1}; x_{n−1} = d'_{n−1}
    # (c'_{n−1} multiplies a zero "next" value).
    def back_group(gr, x_next):
        g = n_groups - 1 - gr
        s = pl.multiple_of(g * GROUP, GROUP)
        CP = cp_ref[pl.ds(s, GROUP), :]
        DP = dp_ref[pl.ds(s, GROUP), :]
        xs = [None] * GROUP
        for j in reversed(range(GROUP)):
            last = (gr == 0) & (j == GROUP - 1)
            cj = jnp.where(last, 0.0, CP[j, :])
            x_next = DP[j, :] - cj * x_next
            xs[j] = x_next
        x_ref[pl.ds(s, GROUP), :] = jnp.stack(xs)
        return x_next

    jax.lax.fori_loop(0, n_groups, back_group, lane_zeros)


@partial(jax.jit, static_argnames=("interpret",))
def tridiag_solve_pallas(a, b, c, d, *, interpret: bool = False):
    """Solve T x = d for a batch of systems laid out as (n, batch).

    ``a[0]`` and ``c[-1]`` are unused (reference convention). n must be a
    multiple of 8, batch a multiple of 128.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, batch = a.shape
    if n % GROUP or batch % BATCH_TILE:
        raise ValueError(f"need n % {GROUP} == 0 and batch % {BATCH_TILE}"
                         f" == 0, got {a.shape}")
    grid = (batch // BATCH_TILE,)
    spec = pl.BlockSpec((n, BATCH_TILE), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _thomas_kernel,
        out_shape=jax.ShapeDtypeStruct((n, batch), a.dtype),
        grid=grid,
        in_specs=[spec, spec, spec, spec],
        out_specs=spec,
        scratch_shapes=[
            pltpu.VMEM((n, BATCH_TILE), a.dtype),
            pltpu.VMEM((n, BATCH_TILE), a.dtype),
        ],
        interpret=interpret,
    )(a, b, c, d)


def tridiag_solve_pallas_lastdim(a, b, c, d, *, interpret: bool = False):
    """Solve along the LAST axis with arbitrary leading batch dims.

    Adapter for the PDE stack, whose systems live as ``(..., n)`` rows
    (matching :func:`optpricer_tpu.ops.tridiag.tridiag_solve`): transposes
    once to the kernel's (n, batch) lane layout and pads to the 8-sublane /
    128-lane granularity. Padded trailing rows get an identity diagonal with
    zero couplings, so they solve to zero and never touch real rows; padded
    lanes solve an identity system. ``a``/``b``/``c`` broadcast against
    ``d``. In f32 the kernel solve is ~f32-roundoff close to the
    associative-scan solver (diagonally dominant θ-scheme systems).
    """
    shape = jnp.shape(d)
    M = shape[-1]
    B = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    a, b, c = (jnp.broadcast_to(x, shape) for x in (a, b, c))
    to2d = lambda x: x.reshape(-1, M).T
    A, Bm, C, D = map(to2d, (a, b, c, d))
    n_pad = -M % GROUP
    b_pad = -B % BATCH_TILE
    if n_pad or b_pad:
        zpad = lambda x: jnp.pad(x, ((0, n_pad), (0, b_pad)))
        A, C, D = zpad(A), zpad(C), zpad(D)
        Bm = jnp.pad(Bm, ((0, n_pad), (0, b_pad)), constant_values=1.0)
    x = tridiag_solve_pallas(A, Bm, C, D, interpret=interpret)
    return x[:M, :B].T.reshape(shape)
