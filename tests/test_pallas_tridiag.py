"""Pallas batched Thomas kernel vs the XLA solvers (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from optpricer_tpu.ops.pallas_tridiag import tridiag_solve_pallas
from optpricer_tpu.ops.tridiag import tridiag_solve_thomas

# tight in f64 (CPU test harness); f32 rounding when x64 is off (TPU runs)
TOLS = (dict(rtol=1e-9, atol=1e-10) if jax.config.jax_enable_x64
        else dict(rtol=5e-4, atol=1e-5))


def _system(n, batch, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, batch))
    b = rng.normal(size=(n, batch)) + 4.0
    c = rng.normal(size=(n, batch))
    d = rng.normal(size=(n, batch))
    return a, b, c, d


def test_matches_thomas():
    n, batch = 64, 128
    a, b, c, d = _system(n, batch)
    x = np.asarray(tridiag_solve_pallas(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(c), jnp.asarray(d),
        interpret=True))
    # XLA solver works along the last axis → transpose views
    ref = np.asarray(tridiag_solve_thomas(
        jnp.asarray(a.T), jnp.asarray(b.T), jnp.asarray(c.T),
        jnp.asarray(d.T))).T
    np.testing.assert_allclose(x, ref, **TOLS)


def test_multi_tile_batch():
    n, batch = 32, 256  # two lane tiles
    a, b, c, d = _system(n, batch, seed=3)
    x = np.asarray(tridiag_solve_pallas(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(c), jnp.asarray(d),
        interpret=True))
    ref = np.asarray(tridiag_solve_thomas(
        jnp.asarray(a.T), jnp.asarray(b.T), jnp.asarray(c.T),
        jnp.asarray(d.T))).T
    np.testing.assert_allclose(x, ref, **TOLS)
