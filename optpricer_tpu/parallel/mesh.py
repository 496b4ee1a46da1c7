"""Device-mesh data parallelism.

The reference's only distribution mechanism is a host process pool fanning out
MC chunks and summing six floats back (``monte_carlo.py:128-139``). The
TPU-native equivalent is a 1-D ``jax.sharding.Mesh`` over the ``"paths"``
axis: every device runs the same compiled chunk-scan on its shard of the
chunk-id grid and the sufficient statistics ride ICI through a single
``psum``. Because each chunk's stream is fixed by ``fold_in(key, chunk_id)``,
the estimate is invariant to how chunks land on devices (up to float-sum
order, which the Kahan-compensated per-device scan keeps at the 1e-7 level).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["get_mesh", "mc_sumstats_sharded"]


def get_mesh(n_devices: Optional[int] = None, axis: str = "paths",
             devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the first ``n_devices`` local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (axis,))


def mc_sumstats_sharded(
    mesh: Mesh, key, n_chunks: int, n_paths, S0, K, T, r, q, sigma, is_call,
    *, chunk_size: int, antithetic: bool, dtype,
):
    """Mesh-parallel MC sufficient statistics: shard chunk ids, psum stats.

    The chunk grid is padded to a multiple of the mesh size; padded ids fall
    beyond ``n_paths`` and carry zero weight inside the chunk kernel, so the
    result equals the single-device scan over ``arange(n_chunks)``.
    """
    from ..models.monte_carlo import mc_sumstats

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    padded = -(-n_chunks // n_dev) * n_dev
    chunk_ids = jnp.arange(padded)

    args = [jnp.asarray(v, dtype) for v in (S0, K, T, r, q, sigma)]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(),
    )
    def shard_fn(key, ids):
        local = mc_sumstats(
            key, ids, jnp.asarray(n_paths), *args, jnp.asarray(is_call),
            chunk_size=chunk_size, antithetic=antithetic, dtype=dtype,
        )
        return jax.lax.psum(local, axis)

    return shard_fn(key, chunk_ids)
