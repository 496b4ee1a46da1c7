"""Tridiagonal solver ops vs dense oracle."""
import jax.numpy as jnp
import numpy as np
import pytest

from optpricer_tpu.ops.tridiag import (
    tridiag_matvec, tridiag_solve, tridiag_solve_thomas,
)


def _random_system(n, batch=(), seed=0, dtype=np.float64, dominant=True):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=batch + (n,))
    b = rng.normal(size=batch + (n,))
    c = rng.normal(size=batch + (n,))
    if dominant:
        b = b + 4.0 * (np.abs(a) + np.abs(c)) + 1.0
    d = rng.normal(size=batch + (n,))
    return (x.astype(dtype) for x in (a, b, c, d))


def _dense_solve(a, b, c, d):
    n = b.shape[-1]
    A = np.zeros(b.shape + (n,))
    for idx in np.ndindex(b.shape[:-1]):
        M = np.diag(b[idx]) + np.diag(a[idx][1:], -1) + np.diag(c[idx][:-1], 1)
        A[idx] = M
    return np.linalg.solve(A, d[..., None])[..., 0]


@pytest.mark.parametrize("solver", [tridiag_solve, tridiag_solve_thomas])
@pytest.mark.parametrize("n", [4, 33, 257, 512])
def test_matches_dense(solver, n):
    a, b, c, d = _random_system(n, seed=n)
    x = np.asarray(solver(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c),
                          jnp.asarray(d)))
    ref = _dense_solve(a, b, c, d)
    np.testing.assert_allclose(x, ref, rtol=1e-9, atol=1e-10)


@pytest.mark.parametrize("solver", [tridiag_solve, tridiag_solve_thomas])
def test_batched(solver):
    a, b, c, d = _random_system(64, batch=(5,), seed=3)
    x = np.asarray(solver(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c),
                          jnp.asarray(d)))
    ref = _dense_solve(a, b, c, d)
    np.testing.assert_allclose(x, ref, rtol=1e-8, atol=1e-9)


def test_f32_accuracy_diag_dominant():
    """f32 path (TPU default) keeps ~1e-5 relative error on CN-like systems."""
    a, b, c, d = _random_system(512, seed=7, dtype=np.float32)
    x = np.asarray(tridiag_solve(jnp.asarray(a), jnp.asarray(b),
                                 jnp.asarray(c), jnp.asarray(d)))
    ref = _dense_solve(*(v.astype(np.float64) for v in (a, b, c, d)))
    rel = np.abs(x - ref) / (np.abs(ref) + 1e-6)
    assert rel.max() < 1e-4


def test_matvec_roundtrip():
    a, b, c, d = _random_system(128, seed=11)
    x = tridiag_solve(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c),
                      jnp.asarray(d))
    d2 = np.asarray(tridiag_matvec(jnp.asarray(a), jnp.asarray(b),
                                   jnp.asarray(c), x))
    np.testing.assert_allclose(d2, d, rtol=1e-9, atol=1e-10)
