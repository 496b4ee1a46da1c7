"""Geometric-Asian control variate (exotic_price_mc arith asian + CV).

The geometric-average payoff rides the same fused run (one extra log per
step in the scan/kernel carry), its mean is exact
(analytic.geometric_asian_price), and corr(arith, geo) ≈ 1 — so the CV
cuts the stderr ~30× at no extra path cost, on the XLA, Pallas and mesh
engines alike.
"""
import numpy as np
import pytest

from optpricer_tpu import exotic_price_mc, geometric_asian_price

KW = dict(sigma=0.2, n_steps=64, n_paths=200_000, seed=3, backend="xla",
          dtype="float64")
ARGS = (100.0, 100.0, 1.0, 0.05)


class TestGeometricClosedForm:
    def test_one_step_is_european_bs(self):
        from optpricer_tpu import bs_price_vec

        g = float(geometric_asian_price(100.0, 105.0, 1.0, 0.05, 0.01, 0.2,
                                        kind="call", n_steps=1))
        bs = float(bs_price_vec(100.0, 105.0, 1.0, 0.05, 0.01, 0.2, "call",
                                dtype="float64"))
        assert g == pytest.approx(bs, abs=1e-8)

    @pytest.mark.parametrize("kind", ["call", "put"])
    def test_matches_geometric_mc(self, kind):
        px, se = exotic_price_mc("asian", *ARGS, kind=kind,
                                 average_type="geometric", **KW)
        ref = float(geometric_asian_price(*ARGS, 0.0, 0.2, kind=kind,
                                          n_steps=KW["n_steps"]))
        assert abs(px - ref) < 4.0 * se

    def test_below_vanilla(self):
        # averaging reduces effective variance ⇒ cheaper than European
        from optpricer_tpu import bs_price_vec

        g = float(geometric_asian_price(*ARGS, 0.0, 0.2, kind="call",
                                        n_steps=252))
        bs = float(bs_price_vec(*ARGS, 0.0, 0.2, "call", dtype="float64"))
        assert g < bs


class TestGeoCV:
    @pytest.mark.parametrize("kind", ["call", "put"])
    def test_unbiased_and_tighter(self, kind):
        p0, se0 = exotic_price_mc("asian", *ARGS, kind=kind, **KW)
        p1, se1 = exotic_price_mc("asian", *ARGS, kind=kind,
                                  control_variate=True, **KW)
        assert se1 < se0 / 10.0           # ≥10× variance reduction
        assert abs(p1 - p0) < 4.0 * (se0 + se1)

    def test_matches_path_matrix_engine(self):
        # independent oracle: asian_price over materialised GBM paths
        from optpricer_tpu.models.exotics import asian_price
        from optpricer_tpu.models.processes import gbm_paths

        paths = gbm_paths(100.0, 0.05, 0.0, 0.2, 1.0, KW["n_steps"],
                          200_000, seed=8)
        ref, ref_se = asian_price(paths, 100.0, 1.0, 0.05, kind="call")
        p1, se1 = exotic_price_mc("asian", *ARGS, kind="call",
                                  control_variate=True, **KW)
        assert abs(p1 - ref) < 4.0 * (ref_se + se1)

    def test_mesh_estimator_matches_single_device(self, ):
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device harness")
        from optpricer_tpu.parallel.mesh import get_mesh

        p1, se1 = exotic_price_mc("asian", *ARGS, kind="call",
                                  control_variate=True, **KW)
        pm, sem = exotic_price_mc("asian", *ARGS, kind="call",
                                  control_variate=True,
                                  mesh=get_mesh(8), **KW)
        # same estimator semantics: scaling out must not degrade the CV
        assert sem < 1e-3 and abs(pm - p1) < 4.0 * (se1 + sem)

    def test_geo_cv_guard(self):
        from optpricer_tpu.ops.pallas_path_mc import path_mc_sumstats_pallas

        with pytest.raises(ValueError, match="geo_cv"):
            path_mc_sumstats_pallas(
                0, 4096, 16, 100.0, 100.0, 1.0, 0.03, 0.0, 0.2, True,
                payoff="lookback", antithetic=True, geo_cv=True,
                interpret=True)

    def test_floating_strike_keeps_old_cv(self):
        # floating strikes have no geo closed form wired — must still price
        p, se = exotic_price_mc("asian", *ARGS, kind="call",
                                strike_type="floating",
                                control_variate=True, **KW)
        assert np.isfinite(p) and se > 0.0
