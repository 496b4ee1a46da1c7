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

if jax.default_backend() == "tpu":
    pytest.skip(
        "CPU-harness module: the staged pipeline is the CPU fallback and "
        "the kernel parity tests run the Mosaic interpreter (which does "
        "not terminate in reasonable time on the TPU platform); hardware "
        "QMC coverage lives in test_pallas_tpu.py::TestFusedQmcPathTPU",
        allow_module_level=True)

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

    def test_sobolstate_matches_xor_recovery_oracle(self):
        # the O(1) sobolstate read must equal the O(2^k) Gray-code
        # recovery from actual SobolEngine draws, row for row
        from optpricer_tpu.ops.sobol import _direction_numbers_xor

        np.testing.assert_array_equal(direction_numbers(6, 14),
                                      _direction_numbers_xor(6, 14))

    def test_full_precision_table_is_cheap(self):
        import time

        from optpricer_tpu.ops.sobol import _DIR_CACHE, _MAXBIT

        _DIR_CACHE.pop((64, _MAXBIT), None)
        t0 = time.time()
        V = direction_numbers(64, _MAXBIT)     # 2^32-point budget
        assert time.time() - t0 < 5.0          # was hours via fast_forward
        assert V.shape == (_MAXBIT, 64) and V.dtype == np.uint32
        # every dimension's leading direction number is 0.5 (Sobol axiom)
        assert np.all(V[0] == np.uint32(1) << 31)
        with pytest.raises(ValueError, match="precision"):
            direction_numbers(4, _MAXBIT + 1)

    def test_scipy_table_matches_torch_oracle_on_shared_bits(self):
        # scipy's 64-bit Joe-Kuo table (primary source, rows 0..31) must
        # agree bit-for-bit with torch's independent 30-bit sobolstate
        # on the rows both ship; rows 30-31 extend past torch's table
        from optpricer_tpu.ops.sobol import (_direction_numbers_torch,
                                             _TORCH_MAXBIT, _MAXBIT)

        V32 = direction_numbers(128, _MAXBIT)
        np.testing.assert_array_equal(
            V32[:_TORCH_MAXBIT], _direction_numbers_torch(128, _TORCH_MAXBIT))
        # the extra rows are real direction numbers, not zero padding
        assert np.all(V32[_TORCH_MAXBIT:].any(axis=0))


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


class TestFusedQmcKernel:
    """The one-kernel Pallas pipeline (ops/pallas_qmc_path): Sobol XOR
    ladder + Φ⁻¹ + bridge-as-matmul + payoff. Interpret mode here; the
    hardware run and perf live in the TPU-gated suite."""

    def test_bridge_matrix_equals_recursive_bridge(self):
        from optpricer_tpu.ops.pallas_qmc_path import bridge_matrix

        for d, T in ((8, 1.0), (64, 1.7), (100, 0.25)):
            z = np.asarray(jax.random.normal(jax.random.key(d), (50, d)))
            W_rec = np.asarray(bridge_paths(jnp.asarray(z, jnp.float64), T))
            W_mat = z @ bridge_matrix(d, T)
            np.testing.assert_allclose(W_rec, W_mat, atol=1e-8)

    def test_matches_staged_pipeline(self):
        # same direction numbers, same threefry shifts → same point set:
        # the two implementations must agree to f32 round-off, not just
        # statistically.
        from optpricer_tpu.ops.pallas_qmc_path import (
            path_qmc_sumstats_pallas, qmc_path_estimate)

        args = (100.0, 100.0, 1.0, 0.04, 0.01, 0.2)
        stats = path_qmc_sumstats_pallas(
            3, 1 << 13, 64, *args, True, payoff="asian",
            average_type="geometric", n_replicates=4, interpret=True)
        px, se = qmc_path_estimate(stats, 100.0, 0.01, 1.0,
                                   control_variate=False)
        p_staged, _ = exotic_price_mc(
            "asian", *args[:4], q=args[4], sigma=args[5], n_steps=64,
            n_paths=1 << 13, seed=3, backend="qmc",
            average_type="geometric")
        # staged runs 8 replicates vs our 4 — compare against a direct
        # 4-replicate staged estimate instead: recompute via its stages
        from optpricer_tpu.models.mc_fused import _qmc_replicate

        fixed = {k: jnp.asarray(v, jnp.float32) for k, v in zip(
            ("S0", "K", "T", "r", "q", "sigma"), args)}
        fixed.update(barrier=jnp.float32(0), rebate=jnp.float32(0),
                     payout=jnp.float32(1))
        key0 = jax.random.key(3)
        est = [float(_qmc_replicate(
            jax.random.fold_in(key0, i), fixed, payoff="asian",
            kind="call", n_steps=64, n_points=1 << 13,
            barrier_type="up-and-out", average_type="geometric",
            strike_type="fixed", dtype=jnp.float32)) for i in range(4)]
        assert abs(px - np.mean(est)) < 5e-5
        assert abs(px - p_staged) < 6 * se + 1e-4

    def test_ragged_budget_tail_mask(self):
        # a non-tile-multiple budget must be masked exactly (n = budget)
        from optpricer_tpu.ops.pallas_qmc_path import path_qmc_sumstats_pallas

        stats = path_qmc_sumstats_pallas(
            0, 3000, 8, 100.0, 100.0, 1.0, 0.03, 0.0, 0.2, True,
            payoff="vanilla", n_replicates=2, interpret=True)
        assert float(stats[0, 0]) == 3000.0
        assert float(stats[1, 0]) == 3000.0

    def test_budget_guard(self):
        from optpricer_tpu.ops.pallas_qmc_path import path_qmc_sumstats_pallas

        # beyond the kernel's int32 tile indexing (2^31 points): must
        # raise BEFORE any compute
        with pytest.raises(ValueError, match="exceeds"):
            path_qmc_sumstats_pallas(0, (1 << 31) + 1, 8, 100.0, 100.0,
                                     1.0, 0.03, 0.0, 0.2, True)

    @pytest.mark.parametrize("payoff,extra", [
        ("barrier", {"barrier": 130.0}),
        ("barrier", {"barrier": 80.0, "barrier_type": "down-and-in"}),
        ("lookback", {"strike_type": "floating"}),
        ("digital", {"payout": 10.0}),
        ("asian", {"strike_type": "floating"}),
    ])
    def test_payoffs_agree_with_staged(self, payoff, extra):
        from optpricer_tpu.ops.pallas_qmc_path import (
            path_qmc_sumstats_pallas, qmc_path_estimate)
        from optpricer_tpu.models.mc_fused import _qmc_replicate

        args = (100.0, 100.0, 1.0, 0.04, 0.01, 0.2)
        kw = dict(barrier=extra.get("barrier", 0.0),
                  barrier_type=extra.get("barrier_type", "up-and-out"),
                  average_type=extra.get("average_type", "arithmetic"),
                  strike_type=extra.get("strike_type", "fixed"),
                  payout=extra.get("payout", 1.0))
        stats = path_qmc_sumstats_pallas(
            7, 1 << 12, 32, *args, True, payoff=payoff, n_replicates=2,
            rebate=0.0, interpret=True, **kw)
        px, _ = qmc_path_estimate(stats, 100.0, 0.01, 1.0,
                                  control_variate=False)
        fixed = {k: jnp.asarray(v, jnp.float32) for k, v in zip(
            ("S0", "K", "T", "r", "q", "sigma"), args)}
        fixed.update(barrier=jnp.float32(kw["barrier"]),
                     rebate=jnp.float32(0), payout=jnp.float32(kw["payout"]))
        key0 = jax.random.key(7)
        est = [float(_qmc_replicate(
            jax.random.fold_in(key0, i), fixed, payoff=payoff, kind="call",
            n_steps=32, n_points=1 << 12, barrier_type=kw["barrier_type"],
            average_type=kw["average_type"], strike_type=kw["strike_type"],
            dtype=jnp.float32)) for i in range(2)]
        assert abs(px - np.mean(est)) < 2e-4, (px, np.mean(est))
