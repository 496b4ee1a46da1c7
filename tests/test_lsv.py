"""LSV particle calibration + pricing: repricing gate, degenerate limits,
mesh equality.

The reference has no LSV model (its most advanced dynamics are Heston and
local vol separately, ``monte_carlo.py:141-258``); the vanilla-surface
repricing test below is the Gyongy-consistency contract that defines
correctness for this capstone model. Sizes are CPU-harness small — the
hardware-scale accuracy numbers live in the lsv_calibrate docstring.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optpricer_tpu import (
    LSVModel, SVIParams, VolSurface, lsv_calibrate, lsv_price_mc,
)
from optpricer_tpu.ops.black_scholes import bs_price_vec

S0, R, Q, T = 100.0, 0.03, 0.0, 1.0


def _flat_surface(vol=0.2):
    slices = {
        Te: SVIParams(a=vol**2 * Te, b=1e-6, rho=0.0, m=0.0, sigma=0.1,
                      expiry=Te)
        for Te in (0.25, 0.5, 1.0)
    }
    return VolSurface(slices,
                      forward_curve={Te: S0 * np.exp((R - Q) * Te)
                                     for Te in slices})


def _smile_surface():
    slices = {
        Te: SVIParams(a=0.03 * Te, b=0.12 * Te, rho=-0.4, m=0.0,
                      sigma=0.25, expiry=Te)
        for Te in (0.25, 0.5, 1.0)
    }
    return VolSurface(slices,
                      forward_curve={Te: S0 * np.exp((R - Q) * Te)
                                     for Te in slices})


HESTON = dict(v0=0.04, kappa=1.5, theta=0.04, xi=0.5, rho=-0.6)
# v ≡ 1 exactly: kappa=0, xi=0 freeze the variance at v0
DEGENERATE = dict(v0=1.0, kappa=0.0, theta=1.0, xi=0.0, rho=0.0)

CAL_KW = dict(n_steps=32, n_paths=16_384, n_bins=64, seed=0)


def _surface_call(surface, K):
    F = S0 * np.exp((R - Q) * T)
    iv = float(np.asarray(surface.iv_from_logm(np.log(K / F), T)))
    return float(np.asarray(bs_price_vec(S0, K, T, R, Q, iv, "call")))


class TestCalibration:
    def test_flat_degenerate_leverage_is_flat_vol(self):
        # v ≡ 1 ⇒ L(x, t) = sigma_Dup(x, t) = flat vol on interior bins
        model = lsv_calibrate(_flat_surface(0.2), DEGENERATE, S0, R, Q,
                              T=T, **CAL_KW)
        L = np.asarray(model.leverage)
        interior = L[:, 16:48]
        assert np.all(np.abs(interior - 0.2) < 0.02), \
            f"max dev {np.max(np.abs(interior - 0.2))}"

    def test_model_is_pytree_and_jittable(self):
        model = lsv_calibrate(_flat_surface(0.2), HESTON, S0, R, Q,
                              T=T, **CAL_KW)
        leaves = jax.tree_util.tree_leaves(model)
        assert len(leaves) == 2

        @jax.jit
        def mean_leverage(m: LSVModel):
            return jnp.mean(m.leverage)

        assert float(mean_leverage(model)) > 0.0

    def test_leverage_shape_and_positivity(self):
        model = lsv_calibrate(_smile_surface(), HESTON, S0, R, Q,
                              T=T, **CAL_KW)
        assert model.leverage.shape == (32, 64)
        assert model.n_steps == 32
        assert np.all(np.asarray(model.leverage) > 0)

    def test_regression_modes_agree(self):
        kw = dict(CAL_KW, n_bins=96, smooth=1)
        m_ll = lsv_calibrate(_smile_surface(), HESTON, S0, R, Q, T=T,
                             regression="local_linear", **kw)
        m_nw = lsv_calibrate(_smile_surface(), HESTON, S0, R, Q, T=T,
                             regression="nw", **kw)
        p_ll, _ = lsv_price_mc("vanilla", m_ll, 100.0, n_paths=65_536,
                               seed=3)
        p_nw, se = lsv_price_mc("vanilla", m_nw, 100.0, n_paths=65_536,
                                seed=3)
        assert abs(p_ll - p_nw) < 4 * se

    def test_f32_calibration_matches_f64(self):
        # f32 is the TPU default; the local-linear moments must not
        # cancel. Regression guard for the own-bin-center recentering
        # (global-x moments once biased f32 repricing by +0.7 of spot —
        # an upward Jensen bias of L through a noisy E[v|x]).
        kw = dict(T=T, n_steps=48, n_paths=32_768, n_bins=96, seed=0)
        m64 = lsv_calibrate(_smile_surface(), HESTON, S0, R, Q,
                            dtype="float64", **kw)
        m32 = lsv_calibrate(_smile_surface(), HESTON, S0, R, Q,
                            dtype="float32", **kw)
        p64, se64 = lsv_price_mc("vanilla", m64, 100.0, n_paths=65_536,
                                 seed=7, dtype="float64")
        p32, se32 = lsv_price_mc("vanilla", m32, 100.0, n_paths=65_536,
                                 seed=7, dtype="float32")
        assert abs(p64 - p32) < 4 * (se64 + se32) + 0.05, (p64, p32)
        # interior leverage columns agree pointwise (wings may sit on
        # the no-particle fallback/clip)
        lo, hi = 36, 60
        d = np.abs(np.asarray(m64.leverage, np.float64)[:, lo:hi]
                   - np.asarray(m32.leverage, np.float64)[:, lo:hi])
        assert np.median(d) < 0.02, float(np.median(d))


class TestRepricing:
    """Gyongy consistency: the calibrated model must reprice vanillas."""

    @pytest.fixture(scope="class")
    def model(self):
        return lsv_calibrate(_smile_surface(), HESTON, S0, R, Q, T=T,
                             n_steps=48, n_paths=32_768, n_bins=96,
                             smooth=3, seed=0)

    @pytest.mark.parametrize("K", [85.0, 100.0, 115.0])
    def test_reprices_vanilla_surface(self, model, K):
        target = _surface_call(_smile_surface(), K)
        px, se = lsv_price_mc("vanilla", model, K, kind="call",
                              n_paths=131_072, seed=7)
        # calibration MC + bin bias + pricing MC: 4 se & 25bp absolute
        assert abs(px - target) < max(4.0 * se, 0.25), \
            f"K={K}: lsv {px:.4f} vs surface {target:.4f} (se {se:.4f})"

    def test_put_call_parity(self, model):
        c, _ = lsv_price_mc("vanilla", model, 100.0, kind="call",
                            n_paths=65_536, seed=11)
        p, _ = lsv_price_mc("vanilla", model, 100.0, kind="put",
                            n_paths=65_536, seed=11)
        fwd_minus_k = S0 * np.exp(-Q * T) - 100.0 * np.exp(-R * T)
        assert abs((c - p) - fwd_minus_k) < 0.05


class TestExoticPayoffs:
    @pytest.fixture(scope="class")
    def model(self):
        return lsv_calibrate(_smile_surface(), HESTON, S0, R, Q, T=T,
                             **CAL_KW)

    def test_barrier_below_vanilla(self, model):
        van, _ = lsv_price_mc("vanilla", model, 100.0, n_paths=32_768,
                              seed=5)
        uo, _ = lsv_price_mc("barrier", model, 100.0, barrier=130.0,
                             barrier_type="up-and-out", n_paths=32_768,
                             seed=5)
        assert 0.0 < uo < van

    def test_barrier_in_out_parity(self, model):
        kw = dict(K=100.0, barrier=130.0, n_paths=32_768, seed=5)
        van, _ = lsv_price_mc("vanilla", model, 100.0, n_paths=32_768,
                              seed=5)
        uo, _ = lsv_price_mc("barrier", model, barrier_type="up-and-out",
                             **kw)
        ui, _ = lsv_price_mc("barrier", model, barrier_type="up-and-in",
                             **kw)
        assert abs((uo + ui) - van) < 1e-5

    def test_asian_below_vanilla(self, model):
        van, _ = lsv_price_mc("vanilla", model, 100.0, n_paths=32_768,
                              seed=5)
        asi, se = lsv_price_mc("asian", model, 100.0, n_paths=32_768,
                               seed=5)
        assert asi < van + 3 * se

    def test_digital_in_unit_range(self, model):
        dig, _ = lsv_price_mc("digital", model, 100.0, n_paths=32_768,
                              seed=5)
        assert 0.0 < dig < np.exp(-R * T)

    def test_unknown_payoff_raises(self, model):
        with pytest.raises(ValueError, match="unknown payoff"):
            lsv_price_mc("rainbow", model, 100.0)
        with pytest.raises(ValueError, match="kind"):
            lsv_price_mc("vanilla", model, 100.0, kind="straddle")


class TestMesh:
    def test_sharded_price_matches_single_device(self):
        from optpricer_tpu.parallel.mesh import get_mesh

        model = lsv_calibrate(_smile_surface(), HESTON, S0, R, Q, T=T,
                              **CAL_KW)
        mesh = get_mesh()
        px1, se1 = lsv_price_mc("vanilla", model, 100.0,
                                n_paths=65_536, seed=9)
        pxm, sem = lsv_price_mc("vanilla", model, 100.0,
                                n_paths=65_536, seed=9, mesh=mesh)
        # different per-device fold_in streams: statistical, not bitwise
        assert abs(px1 - pxm) < 4 * max(se1, sem)
        assert sem < 2 * se1


class TestPallasKernel:
    """In-register LSV path kernel (interpret mode on the CPU harness;
    the real-chip run lives in test_pallas_tpu.py)."""

    def _model(self):
        x_bins = np.linspace(-1.0, 1.0, 64).astype(np.float32)
        lev = np.stack([1.0 + 0.3 * x_bins**2 * np.exp(-0.5 * k / 8)
                        for k in range(8)]).astype(np.float32)
        return LSVModel(S0=100.0, r=0.03, q=0.0, T=1.0, v0=0.04,
                        kappa=1.5, theta=0.04, xi=0.5, rho=-0.6,
                        x_bins=x_bins, leverage=lev)

    def test_leverage_poly_accuracy(self):
        from optpricer_tpu.models.lsv import _leverage_poly

        model = self._model()
        coeffs, x_width = _leverage_poly(model)
        assert coeffs.shape == (8, 13)
        u = np.asarray(model.x_bins) / x_width
        for k in range(8):
            fit = np.polyval(coeffs[k].astype(np.float64), u)
            ref = np.asarray(model.leverage[k], np.float64)
            assert np.max(np.abs(fit - ref)) < 1e-3 * np.max(ref)

    def test_kernel_matches_xla_engine(self):
        model = self._model()
        kw = dict(n_paths=1 << 14, seed=0, dtype="float32")
        for payoff, extra in (("vanilla", {}),
                              ("barrier", dict(barrier=125.0)),
                              ("asian", {})):
            px_x, se_x = lsv_price_mc(payoff, model, 100.0,
                                      backend="xla", **kw, **extra)
            px_p, se_p = lsv_price_mc(payoff, model, 100.0,
                                      backend="pallas", **kw, **extra)
            assert abs(px_x - px_p) < 4 * (se_x + se_p), \
                f"{payoff}: xla {px_x}±{se_x} vs pallas {px_p}±{se_p}"

    def test_pallas_requires_even_steps(self):
        x_bins = np.linspace(-1.0, 1.0, 16).astype(np.float32)
        model = LSVModel(S0=100.0, r=0.03, q=0.0, T=1.0, v0=0.04,
                        kappa=1.5, theta=0.04, xi=0.5, rho=-0.6,
                        x_bins=x_bins,
                        leverage=np.ones((7, 16), np.float32))
        with pytest.raises(ValueError, match="even"):
            lsv_price_mc("vanilla", model, 100.0, backend="pallas",
                         dtype="float32")


class TestLSVGreeks:
    """Pathwise-AD Greeks under LSV (sticky leverage): CRN bump-and-
    reprice cross-checks, delta sanity against BS, mesh agreement."""

    def _model(self, **over):
        x_bins = np.linspace(-1.2, 1.2, 48).astype(np.float32)
        lev = np.ones((8, 48), np.float32)
        base = dict(S0=100.0, r=0.03, q=0.0, T=1.0, v0=0.04, kappa=1.5,
                    theta=0.04, xi=0.4, rho=-0.5)
        base.update(over)
        return LSVModel(x_bins=x_bins, leverage=lev, **base)

    def test_delta_matches_crn_bump(self):
        from optpricer_tpu import lsv_greeks_mc

        m = self._model()
        g = lsv_greeks_mc("vanilla", m, 100.0, n_paths=1 << 14, seed=3)
        h = 0.5
        up, _ = lsv_price_mc("vanilla", self._model(S0=100.0 + h), 100.0,
                             n_paths=1 << 14, seed=3, backend="xla")
        dn, _ = lsv_price_mc("vanilla", self._model(S0=100.0 - h), 100.0,
                             n_paths=1 << 14, seed=3, backend="xla")
        fd = (up - dn) / (2 * h)
        assert abs(g["delta"] - fd) < 0.02 * max(1.0, abs(fd)) \
            + 4 * g["delta_stderr"]

    def test_d_v0_matches_crn_bump(self):
        from optpricer_tpu import lsv_greeks_mc

        m = self._model()
        g = lsv_greeks_mc("asian", m, 100.0, n_paths=1 << 14, seed=4)
        h = 0.002
        up, _ = lsv_price_mc("asian", self._model(v0=0.04 + h), 100.0,
                             n_paths=1 << 14, seed=4, backend="xla")
        dn, _ = lsv_price_mc("asian", self._model(v0=0.04 - h), 100.0,
                             n_paths=1 << 14, seed=4, backend="xla")
        fd = (up - dn) / (2 * h)
        assert abs(g["d_v0"] - fd) < 0.05 * max(1.0, abs(fd)) \
            + 4 * g["d_v0_stderr"]
        assert g["d_v0"] > 0.0  # more variance, more option value

    def test_unit_leverage_vanilla_near_heston_limits(self):
        # L == 1 => pure Heston; delta of an ATM call ~ 0.5-0.65 band and
        # theta negative, price matches the pricer on the same seed
        from optpricer_tpu import lsv_greeks_mc

        m = self._model()
        g = lsv_greeks_mc("vanilla", m, 100.0, n_paths=1 << 14, seed=5)
        px, se = lsv_price_mc("vanilla", m, 100.0, n_paths=1 << 14,
                              seed=5, backend="xla")
        assert abs(g["price"] - px) < 4 * (g["stderr"] + se)
        assert 0.4 < g["delta"] < 0.75
        assert g["theta"] < 0.0

    def test_barrier_raises(self):
        from optpricer_tpu import lsv_greeks_mc

        with pytest.raises(ValueError, match="continuous"):
            lsv_greeks_mc("barrier", self._model(), 100.0)

    def test_mesh_matches_single_statistically(self):
        from optpricer_tpu import lsv_greeks_mc
        from optpricer_tpu.parallel.mesh import get_mesh

        m = self._model()
        g1 = lsv_greeks_mc("vanilla", m, 100.0, n_paths=1 << 13, seed=6)
        gm = lsv_greeks_mc("vanilla", m, 100.0, n_paths=1 << 13, seed=6,
                           mesh=get_mesh(8))
        for k in ("delta", "d_v0", "rho"):
            tol = 4 * (g1[f"{k}_stderr"] + gm[f"{k}_stderr"]) + 1e-4
            assert abs(g1[k] - gm[k]) < tol, (k, g1[k], gm[k])


class TestQEScheme:
    """scheme="qe": Andersen QE variance + leverage-scaled central asset
    step in both the calibrator and the pricer. Calibration and pricing
    share the discretisation, so the Gyöngy repricing gate is the same
    contract as the Euler scheme's."""

    def test_qe_calibration_reprices_surface(self):
        m = lsv_calibrate(_smile_surface(), HESTON, S0, R, Q, T=T,
                          n_steps=48, n_paths=32_768, n_bins=96,
                          smooth=3, seed=0, scheme="qe")
        assert m.scheme == "qe"
        target = _surface_call(_smile_surface(), 100.0)
        px, se = lsv_price_mc("vanilla", m, 100.0, n_paths=131_072,
                              seed=7, backend="xla")
        assert abs(px - target) < max(4.0 * se, 0.25), (px, target)

    def test_scheme_survives_serialization(self):
        from optpricer_tpu.utils.serialization import (lsv_from_dict,
                                                       lsv_to_dict)

        m = lsv_calibrate(_smile_surface(), HESTON, S0, R, Q, T=T,
                          scheme="qe", **CAL_KW)
        m2 = lsv_from_dict(lsv_to_dict(m))
        assert m2.scheme == "qe"
        p1, _ = lsv_price_mc("vanilla", m, 100.0, n_paths=8_192, seed=1,
                             backend="xla")
        p2, _ = lsv_price_mc("vanilla", m2, 100.0, n_paths=8_192, seed=1,
                             backend="xla")
        assert abs(p1 - p2) < 1e-6

    def test_guards(self):
        from optpricer_tpu import lsv_greeks_mc

        with pytest.raises(ValueError, match="scheme"):
            lsv_calibrate(_smile_surface(), HESTON, S0, R, Q, T=T,
                          scheme="milstein", **CAL_KW)
        m = lsv_calibrate(_smile_surface(), HESTON, S0, R, Q, T=T,
                          scheme="qe", **CAL_KW)
        with pytest.raises(ValueError, match="point mass"):
            lsv_greeks_mc("vanilla", m, 100.0)

    def test_qe_kernel_matches_xla(self):
        # the in-register LSV kernel's QE branch (interpret mode,
        # software PRNG) vs the XLA QE scan — independent streams, so
        # statistical agreement is the contract
        m = lsv_calibrate(_smile_surface(), HESTON, S0, R, Q, T=T,
                          scheme="qe", **CAL_KW)
        p_x, s_x = lsv_price_mc("vanilla", m, 100.0, n_paths=1 << 14,
                                seed=3, backend="xla", dtype="float32")
        p_p, s_p = lsv_price_mc("vanilla", m, 100.0, n_paths=1 << 14,
                                seed=3, backend="pallas", dtype="float32")
        assert s_p > 0.0
        assert abs(p_x - p_p) < 4 * (s_x + s_p) + 2e-3, (p_x, p_p)

    def test_degenerate_qe_matches_flat_vol(self):
        # v frozen at 1 (kappa=0, xi=0 via the QE deterministic limit),
        # flat surface: leverage ~ flat 0.2 and the price is BS(0.2)
        m = lsv_calibrate(_flat_surface(0.2), DEGENERATE, S0, R, Q,
                          T=T, scheme="qe", **CAL_KW)
        interior = np.asarray(m.leverage)[4:, 16:48]
        assert np.all(np.abs(interior - 0.2) < 0.02)


def _unit_leverage_model(heston, n_steps=24, scheme="qe", n_bins=33):
    """LSVModel with L ≡ 1: the dynamics are EXACTLY Heston — the
    degenerate limit that lets pure-Heston engines adjudicate."""
    return LSVModel(S0, R, Q, T, heston["v0"], heston["kappa"],
                    heston["theta"], heston["xi"], heston["rho"],
                    x_bins=jnp.linspace(-2.0, 2.0, n_bins),
                    leverage=jnp.ones((n_steps, n_bins)), scheme=scheme)


class TestPathMatrix:
    def test_shape_contract_and_t0_row(self):
        from optpricer_tpu import lsv_path_matrix

        m = _unit_leverage_model(HESTON, n_steps=12)
        S, v = lsv_path_matrix(m, n_paths=256, seed=0)
        assert S.shape == v.shape == (13, 512)  # antithetic doubles
        assert np.allclose(np.asarray(S[0]), S0)
        assert np.allclose(np.asarray(v[0]), HESTON["v0"])
        S2, _ = lsv_path_matrix(m, n_paths=256, seed=0, antithetic=False)
        assert S2.shape == (13, 256)

    def test_truncated_T_prefix(self):
        # T on the grid uses the first rows; off-grid T raises
        from optpricer_tpu import lsv_path_matrix

        m = _unit_leverage_model(HESTON, n_steps=12)
        S_half, _ = lsv_path_matrix(m, n_paths=128, T=0.5, seed=1)
        assert S_half.shape[0] == 7
        with pytest.raises(ValueError, match="multiple"):
            lsv_path_matrix(m, n_paths=128, T=0.4, seed=1)

    def test_terminal_martingale(self):
        # E[S_T] = S0 e^{(r-q)T} under any leverage (discretisation +
        # MC error band)
        from optpricer_tpu import lsv_path_matrix

        m = _unit_leverage_model(HESTON, n_steps=24)
        S, _ = lsv_path_matrix(m, n_paths=1 << 15, seed=2)
        mean_T = float(np.mean(np.asarray(S[-1], np.float64)))
        assert abs(mean_T - S0 * np.exp((R - Q) * T)) < 0.35


class TestAmericanLsmc:
    OPT_KW = dict(n_paths=20_000, seed=7)

    def test_unit_leverage_matches_heston_lsmc(self):
        # L ≡ 1 ⇒ the LSV American IS the Heston American; the two
        # engines draw independent streams, so agreement is statistical
        from optpricer_tpu import OptionSpec, lsmc_price

        m = _unit_leverage_model(HESTON, n_steps=24)
        opt = OptionSpec(S0=S0, K=105.0, T=T, r=R, q=Q, sigma=0.2)
        p_lsv, se_lsv = lsmc_price(opt, "put", lsv=m, **self.OPT_KW)
        p_h, se_h = lsmc_price(opt, "put", heston=HESTON, n_steps=24,
                               n_paths=20_000, seed=11)
        assert se_lsv > 0.0
        assert abs(p_lsv - p_h) < 4.0 * (se_lsv + se_h) + 0.02, (p_lsv, p_h)

    def test_frozen_vol_flat_leverage_matches_crr(self):
        # v ≡ 1 (kappa=0, xi=0), L ≡ 0.2 ⇒ GBM(σ=0.2): CRR is the oracle
        from optpricer_tpu import OptionSpec, crr, lsmc_price

        n_bins = 33
        m = LSVModel(S0, R, Q, T, 1.0, 0.0, 1.0, 0.0, 0.0,
                     x_bins=jnp.linspace(-2.0, 2.0, n_bins),
                     leverage=0.2 * jnp.ones((32, n_bins)), scheme="qe")
        opt = OptionSpec(S0=S0, K=110.0, T=T, r=R, q=Q, sigma=0.2)
        ref = float(crr(opt, "put", N=500, american=True))
        lo, se = lsmc_price(opt, "put", lsv=m, bound="lower",
                            **self.OPT_KW)
        # two-pass is low-biased; allow the policy gap + 3 se either way
        assert lo < ref + 3.0 * se + 0.02
        assert lo > ref - 0.12 - 3.0 * se, (lo, ref)

    def test_exercise_premium_and_truncation(self):
        from optpricer_tpu import OptionSpec, lsmc_price

        m = _unit_leverage_model(HESTON, n_steps=24)
        opt_half = OptionSpec(S0=S0, K=105.0, T=0.5, r=R, q=Q, sigma=0.2)
        p_half, _ = lsmc_price(opt_half, "put", lsv=m, **self.OPT_KW)
        opt_full = OptionSpec(S0=S0, K=105.0, T=T, r=R, q=Q, sigma=0.2)
        p_full, _ = lsmc_price(opt_full, "put", lsv=m, **self.OPT_KW)
        assert p_half < p_full  # American put grows with maturity
        eu, se_eu = lsv_price_mc("vanilla", m, 105.0, kind="put",
                                 n_paths=1 << 15, seed=5)
        assert p_full > eu - 3.0 * se_eu  # early exercise adds value

    def test_guards(self):
        from optpricer_tpu import OptionSpec, lsmc_price

        m = _unit_leverage_model(HESTON, n_steps=12)
        opt = OptionSpec(S0=S0, K=100.0, T=T, r=R, q=Q, sigma=0.2)
        with pytest.raises(ValueError, match="at most one"):
            lsmc_price(opt, "put", lsv=m, heston=HESTON)
        # bound="both" under lsv= is SUPPORTED since the LSV dual landed;
        # Bermudan dates remain single-pass-only
        with pytest.raises(ValueError, match="single-pass"):
            lsmc_price(opt, "put", lsv=m, bound="both",
                       exercise_dates=[0.5])
        bad = OptionSpec(S0=95.0, K=100.0, T=T, r=R, q=Q, sigma=0.2)
        with pytest.raises(ValueError, match="disagrees"):
            lsmc_price(bad, "put", lsv=m)
