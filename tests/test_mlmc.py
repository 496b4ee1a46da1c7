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


class TestLocalVol:
    """sigma_loc(S, t) dynamics: constant callable collapses to GBM
    oracles; a CEV-like smile is pinned to the fine-grid 1-D FD
    local-vol solver (itself BS-validated in test_dupire.py)."""

    def test_flat_callable_matches_bs(self):
        ref = float(bs_price(OptionSpec(S0=S0, K=K, T=T, r=R, sigma=SIG),
                             "call"))
        for scheme in ("euler", "milstein"):
            px, se = mlmc_price("vanilla", S0, K, T, R, Q,
                                sigma_loc=lambda s, t: 0.2 * s / s,
                                scheme=scheme, eps=0.015, seed=21)
            assert abs(px - ref) < 3.0 * 0.015 + 3.0 * se, (scheme, px)

    def test_cev_smile_matches_fd_local_vol(self):
        from optpricer_tpu import fd_price_local_vol

        def sig(s, t):
            import jax.numpy as jnp

            return 0.2 * (jnp.maximum(s, 1e-8) / 100.0) ** -0.3

        ref = fd_price_local_vol(S0, K, T, R, Q, sig, "call",
                                 N_S=400, N_t=400)
        px, se, info = mlmc_price("vanilla", S0, K, T, R, Q,
                                  sigma_loc=sig, scheme="milstein",
                                  eps=0.015, seed=23, return_info=True)
        assert abs(px - ref) < 3.0 * 0.015 + 3.0 * se, (px, ref, info)
        # Milstein coupling: correction variance must decay with level
        assert info["var"][1] > info["var"][-1]

    def test_geometric_asian_local_vol_euler(self):
        # flat callable + continuous geometric-Asian closed form: the
        # Euler track's bias telescopes alongside the monitoring bias
        ref = _geo_asian_continuous(S0, K, T, R, Q, SIG)
        px, se = mlmc_price("asian", S0, K, T, R, Q,
                            sigma_loc=lambda s, t: 0.2 * s / s,
                            average_type="geometric", eps=0.02, seed=25)
        assert abs(px - ref) < 3.0 * 0.02 + 3.0 * se, (px, ref)


class TestGreeks:
    """Pathwise MLMC Greeks (Burgos & Giles 2012): the telescoped
    estimator is forward-differentiated level by level, so each Greek
    inherits the continuous-monitoring / exact-transition limit its
    price has. Oracles: closed-form BS Greeks (GBM vanilla, where every
    correction level is exactly zero), a central bump of the
    reflection-formula barrier price (continuous-monitoring delta), and
    the AD-COS Heston Greek set."""

    @staticmethod
    def _bs_greeks(S, K_, T_, r, sig):
        d1 = (np.log(S / K_) + (r + 0.5 * sig * sig) * T_) \
            / (sig * np.sqrt(T_))
        d2 = d1 - sig * np.sqrt(T_)
        return dict(delta=norm.cdf(d1),
                    vega=S * norm.pdf(d1) * np.sqrt(T_),
                    rho=K_ * T_ * np.exp(-r * T_) * norm.cdf(d2))

    def test_gbm_vanilla_matches_closed_form(self):
        ref = self._bs_greeks(S0, K, T, R, SIG)
        px, se, g = mlmc_price("vanilla", S0, K, T, R, Q, sigma=SIG,
                               eps=0.01, seed=31, greeks=True)
        for name in ("delta", "vega", "rho"):
            tol = 4.0 * g[name + "_stderr"] + 1e-3
            assert abs(g[name] - ref[name]) < tol, (name, g, ref)

    def test_barrier_delta_matches_reflection_bump(self):
        # continuous-monitoring delta: the bridge-survival weights are
        # differentiable in S0, unlike crossing indicators
        h = 0.05
        ref = (_haug_uoc(S0 + h, K, 130.0, T, R, Q, SIG)
               - _haug_uoc(S0 - h, K, 130.0, T, R, Q, SIG)) / (2 * h)
        px, se, g = mlmc_price("barrier", S0, K, T, R, Q, sigma=SIG,
                               eps=0.02, barrier=130.0,
                               barrier_type="up-and-out", seed=33,
                               greeks=True)
        tol = 4.0 * g["delta_stderr"] + 0.01
        assert abs(g["delta"] - ref) < tol, (g, ref)

    def test_heston_vanilla_delta_and_v0(self):
        hp = dict(v0=0.04, kappa=2.0, theta=0.04, xi=0.3, rho=-0.5)
        from optpricer_tpu import heston_greeks_cos

        ref = heston_greeks_cos(S0, K, T, R, Q, **hp, kind="call")
        px, se, g, info = mlmc_price("vanilla", S0, K, T, R, Q,
                                     heston=hp, eps=0.015, seed=35,
                                     greeks=True, return_info=True)
        assert abs(g["delta"] - ref["delta"]) \
            < 4.0 * g["delta_stderr"] + 0.01, (g, ref)
        assert abs(g["d_v0"] - ref["vega_v0"]) \
            < 4.0 * g["d_v0_stderr"] + 0.1 * abs(ref["vega_v0"]), \
            (g, ref)

    def test_localvol_flat_delta(self):
        ref = self._bs_greeks(S0, K, T, R, SIG)
        px, se, g = mlmc_price("vanilla", S0, K, T, R, Q,
                               sigma_loc=lambda s, t: 0.2 * s / s,
                               scheme="milstein", eps=0.015, seed=37,
                               greeks=True)
        assert abs(g["delta"] - ref["delta"]) \
            < 4.0 * g["delta_stderr"] + 0.01, (g, ref)

    def test_digital_greeks_rejected(self):
        with pytest.raises(ValueError, match="pathwise"):
            mlmc_price("digital", S0, K, T, R, Q, sigma=SIG,
                       greeks=True)

    def test_price_unchanged_by_greeks_flag(self):
        # the primal pass is shared: greeks=True must not perturb the
        # price path (same chunks, same keys)
        p0, s0_ = mlmc_price("asian", S0, K, T, R, Q, sigma=SIG,
                             eps=0.02, seed=39)
        p1, s1_, g = mlmc_price("asian", S0, K, T, R, Q, sigma=SIG,
                                eps=0.02, seed=39, greeks=True)
        assert abs(p0 - p1) < 1e-9 and abs(s0_ - s1_) < 1e-9


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
        with pytest.raises(ValueError, match="scheme"):
            mlmc_price("vanilla", S0, K, T, R, Q, sigma=SIG,
                       scheme="heun")
        with pytest.raises(ValueError, match="milstein"):
            mlmc_price("vanilla", S0, K, T, R, Q, sigma=SIG,
                       scheme="milstein")

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
