"""Dtype policy for the TPU build.

TPU-first default is float32 (VPU/MXU native); float64 is available when the
caller has enabled ``jax_enable_x64`` (CPU test runs do this to exercise the
tight reference tolerances). Every public engine accepts a ``dtype=`` override,
so the precision decision stays at the call site rather than in a global flag.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def default_dtype() -> jnp.dtype:
    """float64 when x64 is enabled (CPU validation runs), else float32 (TPU)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def canonical(dtype) -> jnp.dtype:
    return jnp.dtype(default_dtype() if dtype is None else dtype)
