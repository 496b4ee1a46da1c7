"""Checkpoint/persistence round trips (utils/serialization.py).

Surface round-trips live in test_calibration; here: the model-parameter
artifacts (Heston fits, multi-asset specs) added in round 2.
"""


class TestModelParamRoundTrips:
    def test_heston_round_trip(self, tmp_path):
        from optpricer_tpu.utils import serialization as sz

        fit = dict(v0=0.04, kappa=1.8, theta=0.05, xi=0.45, rho=-0.55,
                   rmse=1e-6, S0=100.0, r=0.03, q=0.01)
        p = tmp_path / "heston.json"
        sz.save_heston(fit, p)
        back = sz.load_heston(p)
        # load returns exactly the pricing kwargs, not the metadata
        assert back == {k: fit[k] for k in
                        ("v0", "kappa", "theta", "xi", "rho")}
        from optpricer_tpu import heston_price_cos

        px = float(heston_price_cos(100.0, 100.0, 1.0, 0.03, 0.01, **back))
        assert px > 0.0

    def test_heston_missing_key_raises(self, tmp_path):
        import json

        import pytest

        from optpricer_tpu.utils import serialization as sz

        p = tmp_path / "bad.json"
        p.write_text(json.dumps({"v0": 0.04, "kappa": 1.0}))
        with pytest.raises(KeyError, match="theta"):
            sz.load_heston(p)

    def test_basket_round_trip(self, tmp_path):
        import numpy as np

        from optpricer_tpu import basket_price_mc
        from optpricer_tpu.utils import serialization as sz

        p = tmp_path / "basket.json"
        corr = np.array([[1.0, 0.5], [0.5, 1.0]])
        sz.save_basket(p, S0s=[100.0, 95.0], weights=[0.6, 0.4],
                       sigmas=[0.2, 0.3], corr=corr)
        spec = sz.load_basket(p)
        np.testing.assert_allclose(spec["corr"], corr)
        px, se = basket_price_mc(spec["S0s"], spec["weights"], 100.0, 1.0,
                                 0.03, qs=spec["qs"],
                                 sigmas=spec["sigmas"], corr=spec["corr"],
                                 seed=0, n_paths=1 << 14, dtype="float64")
        assert np.isfinite(px) and se > 0.0

    def test_lsv_round_trip(self, tmp_path):
        import numpy as np

        from optpricer_tpu import lsv_price_mc
        from optpricer_tpu.models.lsv import LSVModel
        from optpricer_tpu.utils import serialization as sz

        x_bins = np.linspace(-1.0, 1.0, 32, dtype=np.float32)
        lev = np.full((8, 32), 1.1, np.float32)
        model = LSVModel(S0=100.0, r=0.03, q=0.0, T=1.0, v0=0.04,
                         kappa=1.5, theta=0.04, xi=0.5, rho=-0.6,
                         x_bins=x_bins, leverage=lev)
        p = tmp_path / "lsv.json"
        sz.save_lsv(model, p)
        back = sz.load_lsv(p)
        np.testing.assert_allclose(np.asarray(back.leverage), lev)
        assert back.n_steps == 8 and back.kappa == 1.5
        # the reloaded model prices bit-identically to the original
        a = lsv_price_mc("vanilla", model, 100.0, n_paths=1 << 12, seed=0)
        b = lsv_price_mc("vanilla", back, 100.0, n_paths=1 << 12, seed=0)
        assert a == b

    def test_lsv_inconsistent_table_raises(self, tmp_path):
        import json

        import pytest

        from optpricer_tpu.utils import serialization as sz

        d = {"S0": 100.0, "r": 0.03, "q": 0.0, "T": 1.0, "v0": 0.04,
             "kappa": 1.5, "theta": 0.04, "xi": 0.5, "rho": -0.6,
             "x_bins": [0.0, 0.1], "leverage": [[1.0, 1.0, 1.0]]}
        p = tmp_path / "bad_lsv.json"
        p.write_text(json.dumps(d))
        with pytest.raises(ValueError, match="inconsistent"):
            sz.load_lsv(p)
