"""Multilevel Monte Carlo: continuous-monitoring / exact-transition
limits priced at target RMSE.

Oracles: closed-form BS (vanilla), the continuous geometric-Asian
lognormal closed form (σ/√3, half-drift), the Haug/Merton reflection
formula (continuously-monitored barrier), and the Heston COS transform
(exact transition limit of the Euler telescoping). The reference has no
MLMC — its MC is single-grid (monte_carlo.py:11-64) — so correctness is
defined entirely by these limits plus the Giles estimator's internal
contracts (variance decay across levels, exact-coupling collapse for
terminal payoffs under the exact GBM step).
"""
import numpy as np
import pytest
from scipy.stats import norm

from optpricer_tpu import OptionSpec, bs_price, heston_price_cos, mlmc_price

S0, K, T, R, Q, SIG = 100.0, 100.0, 1.0, 0.05, 0.0, 0.2


def _geo_asian_continuous(S0, K, T, r, q, sigma):
    """Continuous geometric-average Asian call: lognormal with
    σ_G = σ/√3 and E[ln G] = ln S0 + (r − q − σ²/2)T/2."""
    sig_g = sigma / np.sqrt(3.0)
    mu_g = np.log(S0) + 0.5 * (r - q - 0.5 * sigma * sigma) * T
    d1 = (mu_g - np.log(K) + sig_g * sig_g * T) / (sig_g * np.sqrt(T))
    d2 = d1 - sig_g * np.sqrt(T)
    fwd = np.exp(mu_g + 0.5 * sig_g * sig_g * T)
    return np.exp(-r * T) * (fwd * norm.cdf(d1) - K * norm.cdf(d2))


def _haug_uoc(S, K, H, T, r, q, sig):
    """Continuously-monitored up-and-out call (reflection formula)."""
    mu = (r - q - 0.5 * sig * sig) / (sig * sig)
    st = sig * np.sqrt(T)
    x1 = np.log(S / K) / st + (1 + mu) * st
    x2 = np.log(S / H) / st + (1 + mu) * st
    y1 = np.log(H * H / (S * K)) / st + (1 + mu) * st
    y2 = np.log(H / S) / st + (1 + mu) * st
    A = S * np.exp(-q * T) * norm.cdf(x1) \
        - K * np.exp(-r * T) * norm.cdf(x1 - st)
    B = S * np.exp(-q * T) * norm.cdf(x2) \
        - K * np.exp(-r * T) * norm.cdf(x2 - st)
    C = (S * np.exp(-q * T) * (H / S) ** (2 * (mu + 1)) * norm.cdf(-y1)
         - K * np.exp(-r * T) * (H / S) ** (2 * mu) * norm.cdf(-y1 + st))
    D = (S * np.exp(-q * T) * (H / S) ** (2 * (mu + 1)) * norm.cdf(-y2)
         - K * np.exp(-r * T) * (H / S) ** (2 * mu) * norm.cdf(-y2 + st))
    return A - B + C - D


class TestGBM:
    def test_vanilla_collapses_to_level0(self):
        # exact GBM step ⇒ coarse and fine terminals are IDENTICAL
        # (aggregated increments), so every correction level is exactly
        # zero and the estimate is plain MC vs BS
        ref = float(bs_price(OptionSpec(S0=S0, K=K, T=T, r=R, sigma=SIG),
                             "call"))
        px, se, info = mlmc_price("vanilla", S0, K, T, R, Q, sigma=SIG,
                                  eps=0.01, seed=3, return_info=True)
        assert max(abs(v) for v in info["var"][1:]) < 1e-10
        assert abs(px - ref) < max(4.0 * se, 0.02), (px, ref)

    def test_continuous_geometric_asian(self):
        ref = _geo_asian_continuous(S0, K, T, R, Q, SIG)
        px, se, info = mlmc_price(
            "asian", S0, K, T, R, Q, sigma=SIG, eps=0.01,
            average_type="geometric", seed=5, return_info=True)
        # RMSE target eps: statistical + weak remainder
        assert abs(px - ref) < 3.0 * 0.01 + 3.0 * se, (px, ref, info)
        # the MLMC point is the whole game: correction variance decays
        assert info["var"][1] > info["var"][-1]
        # and level 0 alone is visibly biased (monitoring at 8 dates)
        assert abs(info["mean"][0] - ref) > 0.05

    def test_continuous_barrier_upandout(self):
        # exact GBM steps + Brownian-bridge survival conditioning make
        # EVERY level unbiased for the continuously-monitored price
        # (the log-path between grid points IS a σ-bridge), so the
        # corrections are zero-mean and the estimate matches the
        # reflection formula to statistical error
        ref = _haug_uoc(S0, K, 130.0, T, R, Q, SIG)
        px, se, info = mlmc_price(
            "barrier", S0, K, T, R, Q, sigma=SIG, eps=0.02,
            barrier=130.0, barrier_type="up-and-out", seed=7,
            return_info=True)
        assert abs(px - ref) < 4.0 * se + 0.02, (px, ref, info)
        assert all(abs(mm) < 0.05 for mm in info["mean"][1:])

    def test_barrier_f32_is_finite_and_close(self):
        # regression: the bridge exponent must be clamped into exp32's
        # valid range (|x| ≲ 85) — unclamped it NaN'd every f32 barrier
        ref = _haug_uoc(S0, K, 130.0, T, R, Q, SIG)
        px, se = mlmc_price("barrier", S0, K, T, R, Q, sigma=SIG,
                            eps=0.02, barrier=130.0, seed=7,
                            dtype="float32")
        assert np.isfinite(px) and np.isfinite(se)
        assert abs(px - ref) < 4.0 * se + 0.03, (px, ref)

    def test_barrier_in_out_parity(self):
        van = float(bs_price(OptionSpec(S0=S0, K=K, T=T, r=R, sigma=SIG),
                             "call"))
        kw = dict(sigma=SIG, eps=0.02, barrier=130.0, seed=13)
        uo, se_o = mlmc_price("barrier", S0, K, T, R, Q,
                              barrier_type="up-and-out", **kw)
        ui, se_i = mlmc_price("barrier", S0, K, T, R, Q,
                              barrier_type="up-and-in", **kw)
        assert abs((uo + ui) - van) < 4.0 * (se_o + se_i) + 0.02

    def test_arithmetic_asian_bracket(self):
        # continuous arithmetic Asian has no closed form; bracket it:
        # above the geometric closed form, below the vanilla
        geo = _geo_asian_continuous(S0, K, T, R, Q, SIG)
        van = float(bs_price(OptionSpec(S0=S0, K=K, T=T, r=R, sigma=SIG),
                             "call"))
        px, se = mlmc_price("asian", S0, K, T, R, Q, sigma=SIG,
                            eps=0.015, seed=9)
        assert geo - 3 * se < px < van, (geo, px, van)


class TestHeston:
    HP = dict(v0=0.04, kappa=2.0, theta=0.04, xi=0.3, rho=-0.5)

    def test_vanilla_converges_to_cos(self):
        # the telescoping removes the Euler transition bias; COS is truth
        ref = float(heston_price_cos(S0, K, T, R, Q, **self.HP,
                                     kind="call"))
        px, se, info = mlmc_price("vanilla", S0, K, T, R, Q,
                                  heston=self.HP, eps=0.015, seed=11,
                                  return_info=True)
        assert abs(px - ref) < 3.0 * 0.015 + 3.0 * se, (px, ref, info)
        assert info["var"][1] > info["var"][-1]


class TestGuards:
    def test_bad_inputs_raise(self):
        with pytest.raises(ValueError, match="payoff"):
            mlmc_price("swing", S0, K, T, R, Q, sigma=SIG)
        with pytest.raises(ValueError, match="exactly one"):
            mlmc_price("vanilla", S0, K, T, R, Q)
        with pytest.raises(ValueError, match="exactly one"):
            mlmc_price("vanilla", S0, K, T, R, Q, sigma=SIG,
                       heston=TestHeston.HP)
        with pytest.raises(ValueError, match="M must"):
            mlmc_price("vanilla", S0, K, T, R, Q, sigma=SIG, M=1)
        with pytest.raises(ValueError, match="kind"):
            mlmc_price("vanilla", S0, K, T, R, Q, sigma=SIG,
                       kind="straddle")

    def test_info_table_is_consistent(self):
        px, se, info = mlmc_price("asian", S0, K, T, R, Q, sigma=SIG,
                                  eps=0.05, seed=1, return_info=True)
        assert info["levels"] == len(info["n"]) == len(info["mean"]) \
            == len(info["var"]) == len(info["fine_steps"])
        assert abs(px - sum(info["mean"])) < 1e-12
        assert all(b == 2 * a for a, b in zip(info["fine_steps"],
                                              info["fine_steps"][1:]))


class TestMesh:
    def test_sharded_matches_single_statistically(self):
        import jax

        from optpricer_tpu.parallel.mesh import get_mesh

        if len(jax.devices()) < 2:
            pytest.skip("needs a multi-device harness")
        mesh = get_mesh()
        ref = _geo_asian_continuous(S0, K, T, R, Q, SIG)
        px, se = mlmc_price("asian", S0, K, T, R, Q, sigma=SIG, eps=0.02,
                            average_type="geometric", seed=5, mesh=mesh)
        assert se > 0.0
        assert abs(px - ref) < 3.0 * 0.02 + 3.0 * se, (px, ref)
