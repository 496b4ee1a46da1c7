"""Bias-free f32 exp/log kernels vs float64 oracle."""
import jax
import jax.numpy as jnp
import numpy as np

from optpricer_tpu.ops.fastmath import exp32, log32


class TestExp32:
    def test_accuracy_and_no_bias(self):
        x = np.linspace(-5.0, 5.0, 400001)
        got = np.asarray(jax.jit(exp32)(jnp.asarray(x, jnp.float32)),
                         np.float64)
        ref = np.exp(x.astype(np.float32).astype(np.float64))
        rel = got / ref - 1.0
        assert np.abs(rel).max() < 3e-7
        assert abs(rel.mean()) < 2e-8  # no systematic bias

    def test_extremes(self):
        x = jnp.asarray([-80.0, 0.0, 80.0], jnp.float32)
        got = np.asarray(exp32(x), np.float64)
        ref = np.exp(np.asarray([-80.0, 0.0, 80.0]))
        np.testing.assert_allclose(got, ref, rtol=1e-6)


class TestLog32:
    def test_accuracy_and_no_bias(self):
        u = (np.arange(1, 2**20) + 0.5) / 2**20
        got = np.asarray(jax.jit(log32)(jnp.asarray(u, jnp.float32)),
                         np.float64)
        ref = np.log(u.astype(np.float32).astype(np.float64))
        err = got - ref
        assert np.abs(err).max() < 1e-6
        assert abs(err.mean()) < 5e-9

    def test_round_trip(self):
        x = np.linspace(-10, 10, 100001)
        u = np.asarray(exp32(jnp.asarray(x, jnp.float32)), np.float64)
        back = np.asarray(log32(jnp.asarray(u, jnp.float32)), np.float64)
        assert np.abs(back - x).max() < 4e-6


class TestBoxMullerMoments:
    def test_variance_from_quantised_uniforms(self):
        """E[-2 ln u] over midpoint-quantised 24-bit uniforms = 2 ± 1e-6."""
        # Use a 2^22 stratified subsample of the 2^24 grid
        k = np.arange(2**22) * 4 + np.random.default_rng(0).integers(0, 4, 2**22)
        u = (k.astype(np.float64) + 0.5) * 2.0**-24
        r2 = np.asarray(-2.0 * log32(jnp.asarray(u, jnp.float32)), np.float64)
        assert abs(r2.mean() - 2.0) < 1e-5
