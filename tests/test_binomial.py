"""CRR binomial lattice: convergence to BS, American premium, batch parity."""
import numpy as np
import pytest

from optpricer_tpu import CALL, PUT, OptionSpec, bs_price, crr, crr_vec

OPT = OptionSpec(S0=100.0, K=100.0, T=1.0, r=0.05, sigma=0.2)


class TestCRR:
    def test_european_converges_to_bs(self):
        ref = bs_price(OPT, CALL)
        px = crr(OPT, CALL, N=1000)
        assert abs(px - ref) / ref < 1e-3

    def test_put_converges_to_bs(self):
        ref = bs_price(OPT, PUT)
        px = crr(OPT, PUT, N=1000)
        assert abs(px - ref) / ref < 1e-3

    def test_american_put_premium(self):
        eu = crr(OPT, PUT, N=500)
        am = crr(OPT, PUT, N=500, american=True)
        assert am > eu
        # American ≥ intrinsic
        assert am >= max(OPT.K - OPT.S0, 0.0)

    def test_american_call_no_dividend_equals_european(self):
        eu = crr(OPT, CALL, N=500)
        am = crr(OPT, CALL, N=500, american=True)
        assert abs(am - eu) < 1e-8

    def test_convergence_with_N(self):
        ref = bs_price(OPT, CALL)
        errs = [abs(crr(OPT, CALL, N=N) - ref) for N in (50, 200, 800)]
        assert errs[2] < errs[0]

    def test_invalid_N_raises(self):
        with pytest.raises(ValueError):
            crr(OPT, CALL, N=0)


class TestCRRVec:
    def test_matches_scalar(self):
        Ks = np.array([80.0, 100.0, 120.0])
        px = np.asarray(crr_vec(100.0, Ks, 1.0, 0.05, 0.0, 0.2, CALL, N=300))
        for i, K in enumerate(Ks):
            scalar = crr(OptionSpec(100.0, float(K), 1.0, 0.05, 0.2), CALL,
                         N=300)
            assert abs(px[i] - scalar) < 1e-10

    def test_matches_scalar_american(self):
        Ks = np.array([90.0, 110.0])
        px = np.asarray(crr_vec(100.0, Ks, 1.0, 0.05, 0.0, 0.2, PUT, N=300,
                                american=True))
        for i, K in enumerate(Ks):
            scalar = crr(OptionSpec(100.0, float(K), 1.0, 0.05, 0.2), PUT,
                         N=300, american=True)
            assert abs(px[i] - scalar) < 1e-10

    def test_mixed_kinds(self):
        Ks = np.array([100.0, 100.0])
        kinds = np.array(["call", "put"])
        px = np.asarray(crr_vec(100.0, Ks, 1.0, 0.05, 0.0, 0.2, kinds, N=200))
        assert abs(px[0] - crr(OPT, CALL, N=200)) < 1e-10
        assert abs(px[1] - crr(OPT, PUT, N=200)) < 1e-10

    def test_large_batch_shape(self):
        Ks = np.linspace(50, 150, 1000)
        px = np.asarray(crr_vec(100.0, Ks, 1.0, 0.05, 0.0, 0.2, PUT, N=100,
                                american=True))
        assert px.shape == (1000,)
        assert np.all(np.diff(px) > 0)  # put price increasing in strike


class TestAmericanImpliedVol:
    """De-Americanisation: invert the CRR lattice for listed-style quotes."""

    def test_round_trips_a_skewed_put_chain(self):
        from optpricer_tpu import american_implied_vol, crr_vec

        S0, T, r, q = 100.0, 1.0, 0.05, 0.02
        Ks = np.array([80.0, 90.0, 100.0, 110.0, 120.0])
        sig = np.array([0.32, 0.27, 0.22, 0.20, 0.19])
        px = np.array([float(np.asarray(crr_vec(
            S0, k, T, r, q, s, "put", N=500, american=True)).ravel()[0])
            for k, s in zip(Ks, sig)])
        iv = american_implied_vol(px, S0, Ks, T, r, q, kind="put", N=500)
        np.testing.assert_allclose(iv, sig, atol=1e-8)

    def test_no_dividend_call_matches_european_inverse(self):
        # q=0 American call never exercises early -> the American
        # inverse agrees with the BS inverse up to lattice error
        from optpricer_tpu import (
            american_implied_vol, bs_implied_vol_vec, crr_vec,
        )

        px = float(np.asarray(crr_vec(100.0, 105.0, 1.0, 0.05, 0.0, 0.25,
                                      "call", N=500,
                                      american=True)).ravel()[0])
        ia = american_implied_vol(px, 100.0, 105.0, 1.0, 0.05, 0.0,
                                  kind="call", N=500)
        ib = float(bs_implied_vol_vec(100.0, 105.0, 1.0, 0.05, 0.0, px,
                                      "call"))
        assert abs(ia - ib) < 5e-5

    def test_american_iv_below_naive_european_iv(self):
        # pricing an American put quote through the EUROPEAN inverse
        # overstates the vol (the early-exercise premium masquerades as
        # vol) — the American inverse strips it
        from optpricer_tpu import (
            american_implied_vol, bs_implied_vol_vec, crr_vec,
        )

        S0, K, T, r = 100.0, 115.0, 1.0, 0.06
        px = float(np.asarray(crr_vec(S0, K, T, r, 0.0, 0.25, "put",
                                      N=500, american=True)).ravel()[0])
        ia = american_implied_vol(px, S0, K, T, r, 0.0, kind="put")
        ie = float(bs_implied_vol_vec(S0, K, T, r, 0.0, px, "put"))
        assert abs(ia - 0.25) < 1e-6
        assert ie > ia + 0.01

    def test_unidentifiable_marked_nan(self):
        from optpricer_tpu import american_implied_vol

        # at intrinsic (immediate exercise) and above the price cap
        assert np.isnan(american_implied_vol(40.0, 100.0, 140.0, 1.0,
                                             0.05, 0.02, kind="put"))
        assert np.isnan(american_implied_vol(101.0, 100.0, 90.0, 1.0,
                                             0.05, 0.0, kind="call"))

    def test_scalar_in_float_out(self):
        from optpricer_tpu import american_implied_vol

        out = american_implied_vol(8.0, 100.0, 100.0, 1.0, 0.05, 0.0,
                                   kind="put")
        assert isinstance(out, float) and 0.1 < out < 0.4

    def test_bs2002_engine_round_trips_its_own_prices(self):
        from optpricer_tpu import (american_implied_vol,
                                   bjerksund_stensland_price)

        S0, T, r, q = 100.0, 1.0, 0.05, 0.02
        Ks = np.array([80.0, 90.0, 100.0, 110.0, 120.0])
        sig = np.array([0.32, 0.27, 0.22, 0.20, 0.19])
        px = np.asarray(bjerksund_stensland_price(S0, Ks, T, r, q,
                                                  sigma=sig, kind="put"))
        iv = american_implied_vol(px, S0, Ks, T, r, q, kind="put",
                                  engine="bs2002")
        np.testing.assert_allclose(iv, sig, atol=1e-8)

    def test_bs2002_engine_tracks_the_lattice_inverse(self):
        # inverting LATTICE prices through the closed form: the vol
        # error is the BS2002 price error over vega — ≲1e-3 here
        from optpricer_tpu import american_implied_vol, crr_vec

        S0, T, r, q = 100.0, 1.0, 0.05, 0.02
        Ks = np.array([90.0, 100.0, 110.0])
        sig = np.array([0.27, 0.22, 0.20])
        px = np.array([float(np.asarray(crr_vec(
            S0, k, T, r, q, s, "put", N=2000, american=True)).ravel()[0])
            for k, s in zip(Ks, sig)])
        iv = american_implied_vol(px, S0, Ks, T, r, q, kind="put",
                                  engine="bs2002")
        np.testing.assert_allclose(iv, sig, atol=2e-3)

    def test_bad_engine_raises(self):
        from optpricer_tpu import american_implied_vol

        with pytest.raises(ValueError):
            american_implied_vol(8.0, 100.0, 100.0, 1.0, 0.05, 0.0,
                                 kind="put", engine="nope")
