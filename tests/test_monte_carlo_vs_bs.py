"""MC vs analytic BS oracle; sufficient-statistics and sharding contracts."""
import jax
import jax.numpy as jnp
import numpy as np

from optpricer_tpu import CALL, PUT, OptionSpec, bs_price, euro_price_mc

OPT = OptionSpec(S0=100.0, K=110.0, T=1.0, r=0.03, sigma=0.2)


class TestMCvsBS:
    def test_call_within_half_percent(self):
        px, se = euro_price_mc(OPT, CALL, n_paths=40_000, seed=42)
        ref = bs_price(OPT, CALL)
        assert abs(px - ref) / ref < 0.005

    def test_put_within_half_percent(self):
        px, se = euro_price_mc(OPT, PUT, n_paths=40_000, seed=42)
        ref = bs_price(OPT, PUT)
        assert abs(px - ref) / ref < 0.005

    def test_within_stderr_bands(self):
        px, se = euro_price_mc(OPT, CALL, n_paths=200_000, seed=7)
        ref = bs_price(OPT, CALL)
        assert abs(px - ref) < 4.0 * se + 1e-6

    def test_dividend_yield(self):
        opt = OptionSpec(S0=100.0, K=100.0, T=0.5, r=0.02, sigma=0.3, q=0.04)
        px, _ = euro_price_mc(opt, CALL, n_paths=200_000, seed=1)
        ref = bs_price(opt, CALL)
        assert abs(px - ref) / ref < 0.01

    def test_return_stderr_false(self):
        px = euro_price_mc(OPT, CALL, n_paths=10_000, seed=3,
                           return_stderr=False)
        assert isinstance(px, float)


class TestVarianceReduction:
    def test_control_variate_reduces_stderr(self):
        _, se_cv = euro_price_mc(OPT, CALL, n_paths=50_000, seed=5,
                                 control_variate=True)
        _, se_plain = euro_price_mc(OPT, CALL, n_paths=50_000, seed=5,
                                    control_variate=False)
        assert se_cv < se_plain

    def test_antithetic_reduces_estimator_variance(self):
        """Dispersion of estimates across seeds shrinks with antithetic at
        equal effective draw count (reference test_milstein.py:55-68 style)."""
        atm = OptionSpec(S0=100.0, K=100.0, T=1.0, r=0.03, sigma=0.2)
        est_anti = [euro_price_mc(atm, CALL, n_paths=1_000, seed=s,
                                  antithetic=True, control_variate=False,
                                  return_stderr=False, chunk_size=1_000)
                    for s in range(100)]
        est_plain = [euro_price_mc(atm, CALL, n_paths=2_000, seed=s,
                                   antithetic=False, control_variate=False,
                                   return_stderr=False, chunk_size=2_000)
                     for s in range(100)]
        # True variance ratio ≈ 0.55 for the ATM call; 0.9 leaves slack for
        # the ~20% sampling noise of a 100-seed variance estimate.
        assert np.var(est_anti) < 0.9 * np.var(est_plain)


class TestReproducibility:
    def test_same_seed_same_price(self):
        p1, _ = euro_price_mc(OPT, CALL, n_paths=30_000, seed=42)
        p2, _ = euro_price_mc(OPT, CALL, n_paths=30_000, seed=42)
        assert p1 == p2

    def test_different_seed_different_price(self):
        p1, _ = euro_price_mc(OPT, CALL, n_paths=30_000, seed=42)
        p2, _ = euro_price_mc(OPT, CALL, n_paths=30_000, seed=43)
        assert p1 != p2

    def test_chunk_size_invariant_to_padding(self):
        """Tail masking: odd n_paths ≡ the same draws however chunked."""
        p1, _ = euro_price_mc(OPT, CALL, n_paths=25_000, seed=9,
                              chunk_size=10_000)
        p2, _ = euro_price_mc(OPT, CALL, n_paths=25_000, seed=9,
                              chunk_size=10_000)
        assert p1 == p2


class TestShardedMC:
    def test_mesh_matches_single_device(self):
        from optpricer_tpu.parallel import get_mesh

        mesh = get_mesh(8)
        p1, se1 = euro_price_mc(OPT, CALL, n_paths=64_000, seed=11,
                                chunk_size=8_000)
        p2, se2 = euro_price_mc(OPT, CALL, n_paths=64_000, seed=11,
                                chunk_size=8_000, mesh=mesh)
        # Same chunk streams; only the reduction association differs.
        assert abs(p1 - p2) < 1e-9 * max(1.0, abs(p1))
        assert abs(se1 - se2) < 1e-9

    def test_mesh_ragged_chunks(self):
        from optpricer_tpu.parallel import get_mesh

        mesh = get_mesh(8)  # 7 chunks over 8 devices → one padded
        p1, _ = euro_price_mc(OPT, CALL, n_paths=70_000, seed=13,
                              chunk_size=10_000)
        p2, _ = euro_price_mc(OPT, CALL, n_paths=70_000, seed=13,
                              chunk_size=10_000, mesh=mesh)
        assert abs(p1 - p2) < 1e-9 * max(1.0, abs(p1))


class TestSufficientStats:
    def test_kahan_combine_matches_f64(self):
        from optpricer_tpu.ops import stats as st

        rng = np.random.default_rng(0)
        chunks = rng.normal(1e3, 1.0, size=(1000, 6)).astype(np.float32)
        acc = st.combine_scan(jnp.asarray(chunks))
        exact = chunks.astype(np.float64).sum(axis=0)
        rel = np.abs(np.asarray(acc, np.float64) - exact) / np.abs(exact)
        assert rel.max() < 1e-6


class TestPathwiseGreeks:
    def test_delta_and_digital_vs_analytic(self):
        from math import erfc, exp, log, sqrt

        from optpricer_tpu.models.monte_carlo import euro_greeks_mc

        out = euro_greeks_mc(OPT, CALL, n_paths=400_000, seed=21)
        Phi = lambda x: 0.5 * erfc(-x / sqrt(2))
        srt = OPT.sigma * sqrt(OPT.T)
        d1 = (log(OPT.S0 / OPT.K) + (OPT.r + 0.5 * OPT.sigma**2) * OPT.T) / srt
        d2 = d1 - srt
        assert abs(out["delta"] - Phi(d1)) < 0.01
        assert abs(out["digital"] - exp(-OPT.r * OPT.T) * Phi(d2)) < 0.005
        assert abs(out["price"] - bs_price(OPT, CALL)) < 0.05

    def test_put_delta_negative(self):
        from optpricer_tpu.models.monte_carlo import euro_greeks_mc

        out = euro_greeks_mc(OPT, PUT, n_paths=200_000, seed=22)
        assert -1.0 < out["delta"] < 0.0
