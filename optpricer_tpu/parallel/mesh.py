"""Device-mesh data parallelism.

The reference's only distribution mechanism is a host process pool fanning out
MC chunks and summing six floats back (``monte_carlo.py:128-139``). The
TPU-native equivalent is a ``jax.sharding.Mesh``: every device runs the same
compiled chunk-scan on its shard of the chunk-id grid and the sufficient
statistics ride through a single ``psum``. Because each chunk's stream is
fixed by ``fold_in(key, chunk_id)``, the estimate is invariant to how chunks
land on devices (up to float-sum order, which the Kahan-compensated
per-device scan keeps at the 1e-7 level).

**Single- and multi-slice.** Every mesh-taking entry point in this package
accepts a mesh of ANY rank and shards/reduces over *all* of its axes: a 1-D
``("paths",)`` mesh is plain DP over ICI; a 2-D ``("slice", "chip")`` mesh
(`get_mesh_multislice`) is the multi-slice layout, where the ``psum`` over
the axis tuple lets XLA reduce hierarchically — within each slice over ICI,
then once per slice over DCN. The sufficient-statistics design makes that
free: only the 10-float vector crosses the slow links, never path data.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["get_mesh", "get_mesh_multislice", "mesh_axes",
           "mc_sumstats_sharded"]


def mesh_axes(mesh: Mesh) -> tuple:
    """All axis names of ``mesh`` — the tuple both ``PartitionSpec`` (shard
    dim 0 over every axis jointly, row-major device order) and
    ``jax.lax.psum`` (reduce over every axis; hierarchical ICI-then-DCN on
    multi-slice meshes) understand."""
    return tuple(mesh.axis_names)


def get_mesh(n_devices: Optional[int] = None, axis: str = "paths",
             devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the first ``n_devices`` local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (axis,))


def get_mesh_multislice(n_slices: int, chips_per_slice: Optional[int] = None,
                        axes: Sequence[str] = ("slice", "chip"),
                        devices: Optional[Sequence] = None) -> Mesh:
    """2-D ``(slice, chip)`` mesh for multi-slice (DCN-connected) topologies.

    Devices are laid out so that the trailing ``chip`` axis stays within a
    slice (ICI) and the leading ``slice`` axis crosses slices (DCN); a psum
    over ``mesh_axes(mesh)`` then reduces within slices first. On real
    multi-slice deployments pass ``jax.devices()`` (ordered slice-major by
    the runtime); for tests any device list works.
    """
    import numpy as np

    if devices is None:
        devices = jax.devices()
    if chips_per_slice is None:
        chips_per_slice = len(devices) // n_slices
    if n_slices < 1 or chips_per_slice < 1:
        raise ValueError(f"cannot lay out {n_slices} slice(s) × "
                         f"{chips_per_slice} chip(s) over "
                         f"{len(devices)} devices")
    n = n_slices * chips_per_slice
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(n_slices, chips_per_slice)
    return Mesh(grid, tuple(axes))


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

    axis = mesh_axes(mesh)
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
