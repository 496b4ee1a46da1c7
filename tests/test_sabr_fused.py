"""SABR dynamics in the fused engines (XLA scan + Pallas path kernel).

Discretisation parity target: processes._sabr_core (exact lognormal σ step,
asset step with the updated σ; clamped Euler CEV for β<1). The Pallas-vs-XLA
z-test on real hardware lives in tests/test_pallas_tpu.py.
"""
import numpy as np
import pytest

from optpricer_tpu import exotic_price_mc
from optpricer_tpu.models.exotics import asian_price
from optpricer_tpu.models.processes import sabr_paths
from optpricer_tpu.ops.black_scholes import bs_price_vec

SABR = dict(alpha0=0.25, beta=1.0, nu=0.5, rho=-0.4)


def test_nu_zero_beta_one_is_gbm():
    # ν=0, β=1 degenerates to GBM with σ=α0 → analytic BS must be inside
    # the MC confidence band.
    sabr = dict(alpha0=0.2, beta=1.0, nu=0.0, rho=0.0)
    p, se = exotic_price_mc("vanilla", 100.0, 105.0, 1.0, 0.03, sabr=sabr,
                            n_steps=64, n_paths=400_000, seed=0,
                            backend="xla", control_variate=True)
    ref = float(bs_price_vec(100.0, 105.0, 1.0, 0.03, 0.0, 0.2, "call",
                             dtype="float64"))
    assert abs(p - ref) < 5 * se + 5e-3


def test_fused_matches_path_matrix_engine():
    # independent streams → statistical agreement with the paths+payoff
    # protocol (same SABR discretisation)
    kw = dict(n_steps=64, n_paths=200_000)
    p_f, se_f = exotic_price_mc("asian", 100.0, 100.0, 1.0, 0.03, sabr=SABR,
                                seed=1, backend="xla", **kw)
    paths = sabr_paths(100.0, 0.03, 0.0, SABR["alpha0"], SABR["beta"],
                       SABR["nu"], SABR["rho"], 1.0, seed=2, **kw)
    p_m, se_m = asian_price(paths, 100.0, 0.03, 1.0, "call")
    assert abs(p_f - p_m) < 5 * np.hypot(se_f, se_m)


def test_cev_beta_half_runs_and_prices_sanely():
    # β=0.5 CEV: ATM call under a 0.25·S^0.5 vol scale ~ σ_ln ≈ 0.25/√S0·...
    sabr = dict(alpha0=2.0, beta=0.5, nu=0.4, rho=-0.3)
    p, se = exotic_price_mc("vanilla", 100.0, 100.0, 1.0, 0.03, sabr=sabr,
                            n_steps=64, n_paths=100_000, seed=3,
                            backend="xla")
    assert np.isfinite(p) and 0.0 < p < 30.0


def test_pallas_interpret_sabr_runs():
    from optpricer_tpu.ops.pallas_path_mc import path_mc_sumstats_pallas

    s = np.asarray(path_mc_sumstats_pallas(
        5, 50_000, 8, 100.0, 100.0, 1.0, 0.03, 0.0, None, True,
        payoff="vanilla", antithetic=True, sabr=SABR, interpret=True))
    assert s.shape == (21,) and np.all(np.isfinite(s)) and s[0] == 50_000


def test_pallas_sharded_sabr_matches_single():
    from optpricer_tpu.ops.pallas_path_mc import (
        path_mc_sumstats_pallas, path_mc_sumstats_pallas_sharded)
    from optpricer_tpu.parallel import get_mesh

    ref = np.asarray(path_mc_sumstats_pallas(
        5, 100_000, 8, 100.0, 100.0, 1.0, 0.03, 0.0, None, True,
        payoff="asian", antithetic=True, sabr=SABR, interpret=True))
    out = np.asarray(path_mc_sumstats_pallas_sharded(
        get_mesh(8), 5, 100_000, 8, 100.0, 100.0, 1.0, 0.03, 0.0, None,
        True, payoff="asian", antithetic=True, sabr=SABR))
    np.testing.assert_allclose(out, ref, rtol=3e-6)


def test_model_exclusivity_includes_sabr():
    with pytest.raises(ValueError, match="exactly one"):
        exotic_price_mc("vanilla", 100.0, 100.0, 1.0, 0.03, sigma=0.2,
                        sabr=SABR)
