"""Bias-free f32 exp/log kernels vs float64 oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


class TestNorminv32:
    """Acklam inverse normal CDF on the kernel's 24-bit uniform grid."""

    def test_moments_on_exact_grid(self):
        # exact expectation under the discrete bin-midpoint uniform
        import jax.numpy as jnp

        from optpricer_tpu.ops.fastmath import norminv32

        tiny = 5.9604645e-8
        idx = np.arange(0, 2**24, 7)  # stride 7 keeps it cheap, stays exact
        u = ((idx + 0.5) * tiny).astype(np.float32)
        z = np.asarray(norminv32(jnp.asarray(u))).astype(np.float64)
        assert abs(z.mean()) < 5e-6
        assert abs((z * z).mean() - 1.0) < 5e-5

    def test_martingale_bias_below_gate(self):
        # the CV estimator trusts analytic E[e^{σ√T z − σ²T/2}] = 1; the
        # generator's systematic bias must sit far below the 1e-4 gate
        import jax.numpy as jnp

        from optpricer_tpu.ops.fastmath import norminv32

        tiny = 5.9604645e-8
        u = ((np.arange(2**24) + 0.5) * tiny).astype(np.float32)
        z = np.asarray(norminv32(jnp.asarray(u))).astype(np.float64)
        for s in (0.1, 0.4):
            bias = np.exp(s * z - 0.5 * s * s).mean() - 1.0
            assert abs(bias) < 5e-6, (s, bias)

    def test_accuracy_vs_scipy(self):
        import jax.numpy as jnp

        from optpricer_tpu.ops.fastmath import norminv32

        scipy_stats = pytest.importorskip("scipy.stats")
        u = np.linspace(1e-6, 1 - 1e-6, 100_001).astype(np.float32)
        z = np.asarray(norminv32(jnp.asarray(u)))
        ref = scipy_stats.norm.ppf(u.astype(np.float64))
        assert np.abs(z - ref).max() < 5e-6

    def test_top_bin_maps_to_finite_tail(self):
        # f32 rounds the top bin midpoint to 1.0; the floor must give the
        # bin's ±5.47, not a log-floor blow-up
        import jax.numpy as jnp

        from optpricer_tpu.ops.fastmath import norminv32

        z = np.asarray(norminv32(jnp.asarray([1.0, 2.9802322e-8],
                                             np.float32)))
        assert 5.0 < z[0] < 6.0 and -6.0 < z[1] < -5.0


def test_invcdf_kernel_option_runs_interpret():
    from optpricer_tpu.ops.pallas_mc import mc_sumstats_pallas

    s = np.asarray(mc_sumstats_pallas(
        3, 100_000, 100.0, 110.0, 1.0, 0.03, 0.0, 0.2, True,
        antithetic=True, interpret=True, invcdf=True))
    assert np.all(np.isfinite(s)) and s[0] == 100_000
