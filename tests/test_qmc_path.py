"""Path-dependent randomised QMC (Sobol + Brownian bridge).

Oracles: torch's own SobolEngine (the direction-number source), exact
Brownian covariance structure, and the closed-form geometric Asian — the
strongest possible end-to-end check, since the whole pipeline
(points → Φ⁻¹ → bridge → GBM paths → payoff) must be unbiased for the
QMC estimate to land within ~1e-5 of the analytic value.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from optpricer_tpu import exotic_price_mc, geometric_asian_price
from optpricer_tpu.ops.sobol import (bridge_paths, brownian_bridge_order,
                                     direction_numbers, sobol_uniforms)


class TestSobol:
    def test_matches_torch_unscrambled(self):
        import torch

        from optpricer_tpu.ops.sobol import _sobol_bits

        V = direction_numbers(5, 10)
        bits = np.asarray(_sobol_bits(jnp.asarray(V),
                                      jnp.zeros(5, jnp.uint32),
                                      n=64, m_bits=10))
        ref = torch.quasirandom.SobolEngine(5, scramble=False).draw(
            64, dtype=torch.float64).numpy()
        np.testing.assert_allclose(bits / 2 ** 32, ref, atol=0)

    def test_uniform_stratification(self):
        # every dimension of a Sobol set is perfectly stratified in 64 bins
        u = np.asarray(sobol_uniforms(1 << 12, 8, jax.random.key(0)))
        for j in range(8):
            h = np.histogram(u[:, j], bins=64, range=(0, 1))[0]
            assert h.min() == h.max() == (1 << 12) // 64
        assert 0.0 < u.min() and u.max() < 1.0

    def test_shift_changes_points_not_law(self):
        u0 = np.asarray(sobol_uniforms(256, 4, jax.random.key(0)))
        u1 = np.asarray(sobol_uniforms(256, 4, jax.random.key(1)))
        assert not np.allclose(u0, u1)
        # each shifted set is still near-uniform (mean error ~ O(1/n))
        assert abs(u0.mean() - 0.5) < 5e-3 and abs(u1.mean() - 0.5) < 5e-3

    def test_point_budget_guard(self):
        with pytest.raises(ValueError, match="exceeds"):
            sobol_uniforms(1 << 22, 4, jax.random.key(0), m_bits=21)


class TestBrownianBridge:
    def test_order_covers_all_steps(self):
        for d in (4, 64, 252):
            ms, ls, rs, depth = brownian_bridge_order(d)
            assert sorted(ms) == list(range(1, d)) and len(ms) == d - 1
            assert np.all(ls < ms) and np.all(ms < rs)
            # a node's neighbours must be built at strictly earlier depths
            built_depth = {0: -1, d: -1}
            for m, l, r, dep in zip(ms, ls, rs, depth):
                assert built_depth[int(l)] < dep and built_depth[int(r)] < dep
                built_depth[int(m)] = dep

    def test_covariance_structure(self):
        d, n = 16, 200_000
        z = jax.random.normal(jax.random.key(1), (n, d))
        W = np.asarray(bridge_paths(z, 1.0), np.float64)
        t = np.arange(1, d + 1) / d
        assert np.abs(W.var(axis=0) - t).max() < 0.02
        cov = np.cov(W[:, 3], W[:, 11])[0, 1]
        assert abs(cov - t[3]) < 0.02
        inc1 = W[:, 5] - W[:, 4]
        inc2 = W[:, 9] - W[:, 8]
        assert abs(np.corrcoef(inc1, inc2)[0, 1]) < 0.02


class TestPathQMC:
    KW = dict(sigma=0.2, n_steps=64, n_paths=1 << 14, backend="qmc",
              seed=0, dtype="float64")

    def test_geometric_asian_hits_closed_form(self):
        ref = float(geometric_asian_price(100.0, 100.0, 1.0, 0.05, 0.0,
                                          0.2, kind="call", n_steps=64))
        p, se = exotic_price_mc("asian", 100.0, 100.0, 1.0, 0.05,
                                kind="call", average_type="geometric",
                                **dict(self.KW, n_paths=1 << 16))
        assert abs(p - ref) < 1e-4      # plain MC needs ~10^9 paths for this
        assert se < 1e-3

    def test_beats_mc_at_equal_budget(self):
        ref = float(geometric_asian_price(100.0, 100.0, 1.0, 0.05, 0.0,
                                          0.2, kind="call", n_steps=64))
        p_q, _ = exotic_price_mc("asian", 100.0, 100.0, 1.0, 0.05,
                                 kind="call", average_type="geometric",
                                 **self.KW)
        p_m, _ = exotic_price_mc("asian", 100.0, 100.0, 1.0, 0.05,
                                 kind="call", average_type="geometric",
                                 **dict(self.KW, backend="xla",
                                        n_paths=8 * (1 << 14)))
        assert abs(p_q - ref) < abs(p_m - ref)

    @pytest.mark.parametrize("payoff,extra", [
        ("vanilla", {}),
        ("asian", {}),
        ("lookback", {}),
        ("barrier", {"barrier": 130.0}),
        ("digital", {}),
    ])
    def test_agrees_with_mc(self, payoff, extra):
        p_q, se_q = exotic_price_mc(payoff, 100.0, 100.0, 1.0, 0.05,
                                    kind="call", **self.KW, **extra)
        p_m, se_m = exotic_price_mc(payoff, 100.0, 100.0, 1.0, 0.05,
                                    kind="call",
                                    **dict(self.KW, backend="xla",
                                           n_paths=400_000), **extra)
        assert abs(p_q - p_m) < 4.0 * (se_q + se_m) + 1e-3

    def test_qmc_requires_gbm(self):
        with pytest.raises(ValueError, match="GBM"):
            exotic_price_mc("asian", 100.0, 100.0, 1.0, 0.05,
                            heston=dict(v0=0.04, kappa=1.0, theta=0.04,
                                        xi=0.3, rho=-0.5),
                            backend="qmc")
