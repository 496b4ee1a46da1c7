"""Batch-axis data parallelism: shard option books across the mesh.

The reference's only batch parallelism is single-host vectorisation
(``black_scholes_vec.py:37-56``, ``binomial.py:44-109``). Here the batch
axis itself is laid out across a ``jax.sharding.Mesh``: each device prices
its shard of the book with the same compiled kernel and no cross-device
communication (embarrassingly parallel — results are gathered only at the
output). Ragged books are padded to a multiple of the mesh size and
unpadded on return.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..dtypes import canonical
from ..ops.black_scholes import greeks_core, is_call_mask, price_core
from .mesh import mesh_axes

__all__ = ["bs_price_sharded", "bs_greeks_sharded", "crr_vec_sharded",
           "fd_batch_sharded"]


def _pad(arr: np.ndarray, n_dev: int):
    B = arr.shape[0]
    padded = -(-B // n_dev) * n_dev
    if padded != B:
        arr = np.concatenate([arr, np.repeat(arr[-1:], padded - B, axis=0)])
    return arr, B


def _prep_batch(mesh: Mesh, dtype, S, K, T, r, q, sigma, kind):
    dt = canonical(dtype)
    mask = np.atleast_1d(is_call_mask(kind))
    cols = [np.atleast_1d(np.asarray(v, dtype=float))
            for v in (S, K, T, r, q, sigma)]
    B = max(max(c.shape[0] for c in cols), mask.shape[0])
    cols = [np.broadcast_to(c, (B,)).copy() for c in cols]
    mask = np.broadcast_to(mask, (B,)).copy()
    n_dev = mesh.devices.size
    cols, _ = zip(*[_pad(c, n_dev) for c in cols])
    mask, _ = _pad(mask, n_dev)
    sharding = jax.NamedSharding(mesh, P(mesh_axes(mesh)))
    put = lambda a, d: jax.device_put(jnp.asarray(a, d), sharding)
    return ([put(c, dt) for c in cols] + [put(mask, bool)], B, sharding)


def bs_price_sharded(mesh: Mesh, S, K, T, r, q, sigma, kind, *, dtype=None):
    """Black-Scholes prices with the batch axis sharded over ``mesh``."""
    args, B, sharding = _prep_batch(mesh, dtype, S, K, T, r, q, sigma, kind)
    out = jax.jit(price_core, out_shardings=sharding)(*args)
    return np.asarray(out)[:B]


def bs_greeks_sharded(mesh: Mesh, S, K, T, r, q, sigma, kind, *, dtype=None):
    """Greeks dict with the batch axis sharded over ``mesh``."""
    args, B, sharding = _prep_batch(mesh, dtype, S, K, T, r, q, sigma, kind)
    out = jax.jit(greeks_core)(*args)
    return {k: np.asarray(v)[:B] for k, v in out.items()}


def crr_vec_sharded(mesh: Mesh, S0, K, T, r, q, sigma, kind, N: int = 500,
                    *, american: bool = False, dtype=None):
    """CRR strike/kind batch sharded over the mesh (one tree per device
    shard, no communication)."""
    from math import sqrt

    from ..models.binomial import _crr_core, _tree_params

    dt = canonical(dtype)
    _, u, d, disc, p = _tree_params(T, r, q, sigma, N)
    K_arr = np.atleast_1d(np.asarray(K, dtype=float))
    mask = np.broadcast_to(np.atleast_1d(is_call_mask(kind)),
                           K_arr.shape).copy()
    n_dev = mesh.devices.size
    K_pad, B = _pad(K_arr, n_dev)
    mask_pad, _ = _pad(mask, n_dev)

    axis = mesh_axes(mesh)

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(axis), P(axis)),
             out_specs=P(axis))
    def shard_fn(K_local, mask_local):
        return _crr_core(
            jnp.asarray(S0, dt), K_local,
            jnp.asarray(sigma * sqrt(T / N), dt), jnp.asarray(disc, dt),
            jnp.asarray(p, dt), mask_local,
            N=int(N), american=bool(american), dtype=dt)

    out = shard_fn(jnp.asarray(K_pad, dt), jnp.asarray(mask_pad))
    return np.asarray(out)[:B]


def fd_batch_sharded(mesh: Mesh, S0, K, T, r, q, sigma, kind, *,
                     N_S: int = 200, N_t: int = 200, theta: float = 0.5,
                     S_max_mult: float = 4.0, american: bool = False,
                     dtype=None):
    """θ-scheme strike ladder with the batch axis sharded over the mesh.

    Every device runs the same propagator scan on its shard of strikes —
    grid and propagator are replicated (tiny), option state is sharded.
    """
    from ..models.pde import _build_grid, _fd_solve

    dt_ = canonical(dtype)
    K_arr = np.atleast_1d(np.asarray(K, dtype=float))
    mask = np.broadcast_to(np.atleast_1d(is_call_mask(kind)),
                           K_arr.shape).copy()
    n_dev = mesh.devices.size
    K_pad, B = _pad(K_arr, n_dev)
    mask_pad, _ = _pad(mask, n_dev)

    x_np, dx, dt = _build_grid(S0, T, sigma, N_S, N_t, S_max_mult)
    x_grid = jnp.asarray(x_np, dt_)
    axis = mesh_axes(mesh)

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(axis), P(axis)),
             out_specs=P(axis))
    def shard_fn(K_local, mask_local):
        V, _ = _fd_solve(
            x_grid=x_grid, dt=jnp.asarray(dt, dt_), K=K_local,
            r=jnp.asarray(r, dt_), q=jnp.asarray(q, dt_),
            sigma=jnp.asarray(sigma, dt_), is_call=mask_local,
            theta=jnp.asarray(theta, dt_), barrier_mask=None,
            barrier_value=0.0, N_t=int(N_t), american=bool(american),
            two_layers=False)
        # x0 from host f64 log — the TPU VPU f32 log is ~74 ulps biased at
        # spot scale, which would shift every read-out (see pde._readout).
        x0 = jnp.asarray(np.log(S0), dt_)
        return jax.vmap(lambda v: jnp.interp(x0, x_grid, v))(V)

    out = shard_fn(jnp.asarray(K_pad, dt_), jnp.asarray(mask_pad))
    return np.asarray(out)[:B]
