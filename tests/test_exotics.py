"""Exotic payoffs: parity invariants and oracle cross-checks.

Mirrors reference test_exotics.py: in+out=vanilla, arithmetic≥geometric,
lookback≥vanilla, digitals vs closed form.
"""
import numpy as np
import pytest

from optpricer_tpu import (
    CALL, PUT, OptionSpec, asian_price, barrier_price, bs_price,
    digital_price, lookback_price,
)
from optpricer_tpu.models.processes import gbm_paths

S0, K, R, T, SIG = 100.0, 100.0, 0.05, 1.0, 0.2


@pytest.fixture(scope="module")
def paths():
    return gbm_paths(S0, R, 0.0, SIG, T, 100, 100_000, antithetic=True,
                     seed=42)


class TestBarrier:
    def test_in_out_parity(self, paths):
        """knock-in + knock-out = vanilla (same paths ⇒ exact identity)."""
        out_px, _ = barrier_price(paths, K, R, T, CALL, 120.0, "up-and-out")
        in_px, _ = barrier_price(paths, K, R, T, CALL, 120.0, "up-and-in")
        ST = np.asarray(paths[-1])
        vanilla = float(np.exp(-R * T) * np.maximum(ST - K, 0.0).mean())
        assert abs((out_px + in_px) - vanilla) < 1e-8

    def test_down_parity(self, paths):
        out_px, _ = barrier_price(paths, K, R, T, PUT, 80.0, "down-and-out")
        in_px, _ = barrier_price(paths, K, R, T, PUT, 80.0, "down-and-in")
        ST = np.asarray(paths[-1])
        vanilla = float(np.exp(-R * T) * np.maximum(K - ST, 0.0).mean())
        assert abs((out_px + in_px) - vanilla) < 1e-8

    def test_knockout_cheaper_than_vanilla(self, paths):
        out_px, _ = barrier_price(paths, K, R, T, CALL, 130.0, "up-and-out")
        ref = bs_price(OptionSpec(S0, K, T, R, SIG), CALL)
        assert out_px < ref

    def test_rebate_increases_knockout(self, paths):
        p0, _ = barrier_price(paths, K, R, T, CALL, 120.0, "up-and-out")
        p5, _ = barrier_price(paths, K, R, T, CALL, 120.0, "up-and-out",
                              rebate=5.0)
        assert p5 > p0

    def test_invalid_type_raises(self, paths):
        with pytest.raises(ValueError):
            barrier_price(paths, K, R, T, CALL, 120.0, "sideways-and-out")


class TestAsian:
    def test_arithmetic_ge_geometric(self, paths):
        a, _ = asian_price(paths, K, R, T, CALL, "arithmetic")
        g, _ = asian_price(paths, K, R, T, CALL, "geometric")
        assert a >= g

    def test_asian_cheaper_than_vanilla(self, paths):
        a, _ = asian_price(paths, K, R, T, CALL, "arithmetic")
        ref = bs_price(OptionSpec(S0, K, T, R, SIG), CALL)
        assert a < ref

    def test_floating_strike(self, paths):
        px, se = asian_price(paths, K, R, T, CALL, "arithmetic", "floating")
        assert px > 0
        assert se > 0

    def test_geometric_fixed_matches_closed_form(self):
        """Geometric Asian has a closed form — oracle check within 3·SE."""
        n_steps = 64
        p = gbm_paths(S0, R, 0.0, SIG, T, n_steps, 200_000, seed=7)
        px, se = asian_price(p, K, R, T, CALL, "geometric")
        # Closed form for discrete geometric Asian (no t=0 in average)
        dt = T / n_steps
        ts = dt * np.arange(1, n_steps + 1)
        T_bar = ts.mean()
        var_bar = (SIG**2 / n_steps**2) * sum(
            (2 * min(i, j) - (i == j)) * dt if False else 0
            for i in range(0) for j in range(0))
        # Σ_ij min(t_i, t_j): use formula
        mins = np.minimum.outer(ts, ts)
        var_g = SIG**2 * mins.mean()
        mu_g = (R - 0.5 * SIG**2) * T_bar + 0.5 * var_g
        from math import erf, exp, log, sqrt
        F = S0 * exp(mu_g)
        sd = sqrt(var_g)
        d1 = (log(S0 / K) + mu_g + var_g) / sd
        d2 = d1 - sd
        Phi = lambda x: 0.5 * (1 + erf(x / sqrt(2)))
        ref = exp(-R * T) * (F * Phi(d1) - K * Phi(d2))
        assert abs(px - ref) < 3 * se + 1e-3


class TestDigital:
    def test_matches_closed_form(self, paths):
        px, se = digital_price(paths, K, R, T, CALL)
        from math import erf, exp, log, sqrt
        d2 = (log(S0 / K) + (R - 0.5 * SIG**2) * T) / (SIG * sqrt(T))
        ref = exp(-R * T) * 0.5 * (1 + erf(d2 / sqrt(2)))
        assert abs(px - ref) < 3 * se + 1e-3

    def test_call_put_sum(self, paths):
        c, _ = digital_price(paths, K, R, T, CALL, payout=1.0)
        p, _ = digital_price(paths, K, R, T, PUT, payout=1.0)
        # c + p = e^{-rT}·P(ST≠K) ≈ e^{-rT}
        assert abs((c + p) - np.exp(-R * T)) < 1e-6

    def test_payout_scales(self, paths):
        p1, _ = digital_price(paths, K, R, T, CALL, payout=1.0)
        p10, _ = digital_price(paths, K, R, T, CALL, payout=10.0)
        assert abs(p10 - 10 * p1) < 1e-9


class TestLookback:
    def test_floating_call_ge_vanilla(self, paths):
        px, _ = lookback_price(paths, R, T, CALL)
        ref = bs_price(OptionSpec(S0, S0, T, R, SIG), CALL)
        assert px >= ref

    def test_fixed_ge_vanilla(self, paths):
        px, _ = lookback_price(paths, R, T, CALL, K=K, strike_type="fixed")
        ref = bs_price(OptionSpec(S0, K, T, R, SIG), CALL)
        assert px >= ref

    def test_floating_put_positive(self, paths):
        px, _ = lookback_price(paths, R, T, PUT)
        assert px > 0

    def test_invalid_strike_type(self, paths):
        with pytest.raises(ValueError):
            lookback_price(paths, R, T, CALL, strike_type="diagonal")
