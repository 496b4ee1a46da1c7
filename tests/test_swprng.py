"""Software counter-based PRNG (ops/swprng.py) and the interpret-mode
statistics it makes real.

JAX 0.9's Mosaic interpreter stubs ``pltpu.prng_random_bits`` to zeros, so
before the ``sw_prng`` path every interpret-mode kernel draw collapsed to
one constant normal (z ≈ 5.88) — prices computed on the CPU harness were
deterministic garbage and only interpret-vs-interpret comparisons could
pass. These tests pin the threefry block itself and then check the
kernels' interpret-mode prices against analytic truth, which was
impossible before.

Reference anchor: /root/reference/src/optpricer/monte_carlo.py:30-64 — the
reference's estimator quality gates (±4 se of the BS price) are the model
for the accuracy assertions here.
"""
import numpy as np
import pytest

from optpricer_tpu.ops.black_scholes import bs_price_vec
from optpricer_tpu.ops.swprng import threefry2x32


class TestThreefryBlock:
    def test_random123_known_answer(self):
        # Random123 distribution KAT: threefry2x32-20, key=0, ctr=0
        import jax.numpy as jnp

        x0, x1 = threefry2x32(0, 0, jnp.uint32(0), jnp.uint32(0))
        assert int(x0) == 0x6B200159 and int(x1) == 0x99BA4EFE

    def test_matches_jax_host_prng(self):
        # same PRF as jax's own threefry_2x32 (any divergence would mean a
        # transcription bug in the round schedule / key injection)
        import jax.numpy as jnp
        from jax._src.prng import threefry_2x32

        rng = np.random.default_rng(0)
        keys = rng.integers(0, 2**32, size=(8, 2), dtype=np.uint32)
        ctrs = rng.integers(0, 2**32, size=(8, 2), dtype=np.uint32)
        for (k0, k1), (c0, c1) in zip(keys, ctrs):
            ref = threefry_2x32(jnp.asarray([k0, k1], jnp.uint32),
                                jnp.asarray([c0, c1], jnp.uint32))
            got0, got1 = threefry2x32(int(k0), int(k1), jnp.uint32(c0),
                                      jnp.uint32(c1))
            assert int(ref[0]) == int(got0) and int(ref[1]) == int(got1)

    def test_tile_outputs_are_standard_normals(self):
        # push a counter tile through the same Box-Muller pipeline as the
        # kernels and check the first four moments
        import jax.numpy as jnp

        n = 1 << 16
        ctr = jnp.arange(n, dtype=jnp.uint32)
        z = []
        for draw in range(4):
            a, b = threefry2x32(123, 7, ctr, jnp.uint32(draw))
            u1 = (np.asarray(a >> 8, np.float64) + 0.5) * 2.0**-24
            u2 = np.asarray(b >> 8, np.float64) * 2.0**-24
            rad = np.sqrt(-2.0 * np.log(u1))
            z += [rad * np.cos(2 * np.pi * u2), rad * np.sin(2 * np.pi * u2)]
        z = np.concatenate(z)
        m = z.size
        assert abs(z.mean()) < 4.0 / np.sqrt(m)
        assert abs(z.std() - 1.0) < 4.0 / np.sqrt(2 * m)
        assert abs((z**3).mean()) < 4.0 * np.sqrt(15.0 / m)
        assert abs((z**4).mean() - 3.0) < 4.0 * np.sqrt(96.0 / m)


S0, K, T, R, Q, SIG = 100.0, 105.0, 1.0, 0.05, 0.01, 0.25
BS = float(bs_price_vec(S0, K, T, R, Q, SIG, "call"))


class TestInterpretModeAccuracy:
    """Interpret-mode kernel prices vs analytic truth — the CPU-harness
    gate that the zero-stub PRNG made impossible."""

    def test_terminal_kernel_prices_bs(self):
        from optpricer_tpu.ops.pallas_mc import (mc_sumstats_pallas,
                                                 pallas_estimate)

        s = mc_sumstats_pallas(3, 1 << 19, S0, K, T, R, Q, SIG, True,
                               antithetic=True, interpret=True)
        price, se = pallas_estimate(s, S0, K, T, R, Q, SIG, True, True)
        assert se < 0.05
        assert abs(price - BS) < 4 * se + 1e-3

    def test_terminal_kernel_invcdf_prices_bs(self):
        from optpricer_tpu.ops.pallas_mc import (mc_sumstats_pallas,
                                                 pallas_estimate)

        s = mc_sumstats_pallas(4, 1 << 19, S0, K, T, R, Q, SIG, True,
                               antithetic=True, interpret=True, invcdf=True)
        price, se = pallas_estimate(s, S0, K, T, R, Q, SIG, True, True)
        assert abs(price - BS) < 4 * se + 1e-3

    def test_path_kernel_prices_bs(self):
        from optpricer_tpu.ops.pallas_path_mc import path_mc_sumstats_pallas
        from optpricer_tpu.ops.stats import cv2_mean_se

        s = np.asarray(path_mc_sumstats_pallas(
            5, 1 << 16, 16, S0, K, T, R, Q, SIG, True, payoff="vanilla",
            antithetic=True, interpret=True), np.float64)
        EY1 = S0 * np.exp(-Q * T)
        srt = SIG * np.sqrt(T)
        d2 = (np.log(S0 / K) + (R - Q) * T - 0.5 * srt * srt) / srt
        from math import erf
        EY2 = np.exp(-R * T) * 0.5 * (1.0 + erf(d2 / np.sqrt(2.0)))
        price, se = cv2_mean_se(s[:10], EY1, EY2)
        assert abs(price - BS) < 4 * se + 2e-3

    def test_path_kernel_heston_matches_xla_engine(self):
        from optpricer_tpu.models.mc_fused import exotic_price_mc

        hp = dict(v0=0.04, kappa=1.5, theta=0.04, xi=0.4, rho=-0.6)
        kw = dict(n_steps=16, n_paths=1 << 15, heston=hp, kind="call")
        p_x, s_x = exotic_price_mc("vanilla", S0, K, T, R, q=Q, seed=1,
                                   backend="xla", **kw)
        p_p, s_p = exotic_price_mc("vanilla", S0, K, T, R, q=Q, seed=2,
                                   backend="pallas", **kw)
        assert abs(p_x - p_p) < 4 * (s_x + s_p)

    def test_batch_kernel_prices_bs(self):
        from optpricer_tpu.ops.pallas_mc_batch import euro_price_mc_batch

        Ks = np.array([90.0, 100.0, 110.0])
        px, se = euro_price_mc_batch(S0, Ks, T, R, Q, SIG, "put",
                                     n_paths=1 << 17, seed=6,
                                     interpret=True)
        ref = np.asarray(bs_price_vec(S0, Ks, T, R, Q, SIG, "put"))
        np.testing.assert_allclose(px, ref, atol=float((4 * se).max()) + 2e-3)

    def test_seed_decorrelation(self):
        # adjacent seeds must give statistically independent estimates
        from optpricer_tpu.ops.pallas_mc import (mc_sumstats_pallas,
                                                 pallas_estimate)

        prices = []
        for seed in range(4):
            s = mc_sumstats_pallas(seed, 1 << 16, S0, K, T, R, Q, SIG, True,
                                   antithetic=True, interpret=True)
            p, _ = pallas_estimate(s, S0, K, T, R, Q, SIG, True, False)
            prices.append(p)
        assert len(set(prices)) == len(prices)
        assert np.std(prices) > 1e-4  # degenerate PRNG ⇒ identical values


class TestShardedConsistency:
    def test_sharded_path_kernel_equals_single(self):
        # with real draws the single/sharded equality is now a meaningful
        # statistical check, not a zeros-vs-zeros tautology
        from optpricer_tpu.ops.pallas_path_mc import (
            path_mc_sumstats_pallas, path_mc_sumstats_pallas_sharded)
        from optpricer_tpu.parallel.mesh import get_mesh

        args = (9, 100_000, 8, S0, K, T, R, Q, SIG, True)
        ref = np.asarray(path_mc_sumstats_pallas(
            *args, payoff="asian", antithetic=True, interpret=True))
        out = np.asarray(path_mc_sumstats_pallas_sharded(
            get_mesh(8), *args, payoff="asian", antithetic=True))
        assert ref[1] != 0.0
        np.testing.assert_allclose(out, ref, rtol=3e-6)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
