"""Randomised QMC backend (scrambled van der Corput → inverse CDF).

Runs the kernel in the Mosaic interpreter on CPU — unlike the PRNG-driven
Pallas paths, the QMC point set is pure arithmetic, so CPU evaluates the
same sample set as TPU (values agree to f32 round-off) and full statistical
validation works here.
"""
import numpy as np
import pytest

from optpricer_tpu import CALL, OptionSpec, euro_price_mc
from optpricer_tpu.ops.pallas_mc import mc_sumstats_qmc, qmc_estimate

OPT = OptionSpec(S0=100.0, K=110.0, T=1.0, r=0.03, sigma=0.2)


def _bs64():
    from math import erfc, exp, log, sqrt

    d1 = (log(100 / 110) + 0.03 + 0.02) / 0.2
    d2 = d1 - 0.2
    P = lambda x: 0.5 * erfc(-x / sqrt(2))
    return 100 * P(d1) - 110 * exp(-0.03) * P(d2)


class TestQmcEstimator:
    def test_beats_gate_and_its_own_errorbar(self):
        ref = _bs64()
        px, se = euro_price_mc(OPT, CALL, n_paths=1 << 20, seed=7,
                               backend="qmc")
        assert abs(px - ref) < 5 * se + 1e-5
        assert abs(px - ref) < 1e-4  # the driver accuracy gate, at only 1M

    def test_crushes_plain_mc_variance(self):
        ref = _bs64()
        n = 1 << 20
        _, se_qmc = euro_price_mc(OPT, CALL, n_paths=n, seed=3,
                                  backend="qmc")
        _, se_mc = euro_price_mc(OPT, CALL, n_paths=n, seed=3,
                                 backend="xla")
        assert se_qmc < se_mc / 10  # measured ~50x at 2^20

    def test_deterministic_and_platform_free(self):
        a = euro_price_mc(OPT, CALL, n_paths=1 << 18, seed=11,
                          backend="qmc")
        b = euro_price_mc(OPT, CALL, n_paths=1 << 18, seed=11,
                          backend="qmc")
        assert a == b

    def test_seed_changes_randomisation_not_points(self):
        ref = _bs64()
        px = [euro_price_mc(OPT, CALL, n_paths=1 << 18, seed=s,
                            backend="qmc")[0] for s in (1, 2)]
        assert px[0] != px[1]
        assert all(abs(p - ref) < 5e-4 for p in px)

    def test_put_side(self):
        from optpricer_tpu.ops.black_scholes import bs_price_vec

        ref = float(bs_price_vec(100.0, 110.0, 1.0, 0.03, 0.0, 0.2, "put",
                                 dtype="float64"))
        px, se = euro_price_mc(OPT, "put", n_paths=1 << 20, seed=5,
                               backend="qmc")
        assert abs(px - ref) < 5 * se + 1e-5


class TestQmcStats:
    def test_replicate_layout(self):
        from optpricer_tpu.ops import stats as stats_ops

        s = mc_sumstats_qmc(0, 100_000, 100.0, 110.0, 1.0, 0.03, 0.0, 0.2,
                            True, n_replicates=8, interpret=True)
        assert s.shape == (8, stats_ops.STATSG_DIM)
        # equal tile-aligned point count per replicate, total >= requested
        counts = s[:, 0]
        assert np.all(counts == counts[0]) and counts.sum() >= 100_000

    def test_no_cv_estimate_also_valid(self):
        ref = _bs64()
        s = mc_sumstats_qmc(2, 1 << 20, 100.0, 110.0, 1.0, 0.03, 0.0, 0.2,
                            True, interpret=True)
        px, se = qmc_estimate(s, 100.0, 110.0, 1.0, 0.03, 0.0, 0.2, True,
                              control_variate=False)
        assert abs(px - ref) < 5 * se + 5e-4
