"""FEM Galerkin solver: oracle vs BS (<0.2% @400², reference test_fem.py),
parity and convergence."""
import numpy as np

from optpricer_tpu import CALL, PUT, OptionSpec, bs_price, fd_price, fem_price

OPT = OptionSpec(S0=100.0, K=100.0, T=1.0, r=0.05, sigma=0.2)


class TestFEM:
    def test_call_accuracy(self):
        px = fem_price(OPT, CALL, N_S=400, N_t=400)
        ref = bs_price(OPT, CALL)
        assert abs(px - ref) / ref < 0.002

    def test_put_accuracy(self):
        px = fem_price(OPT, PUT, N_S=400, N_t=400)
        ref = bs_price(OPT, PUT)
        assert abs(px - ref) / ref < 0.002

    def test_put_call_parity(self):
        c = fem_price(OPT, CALL, N_S=300, N_t=300)
        p = fem_price(OPT, PUT, N_S=300, N_t=300)
        parity = OPT.S0 - OPT.K * np.exp(-OPT.r * OPT.T)
        assert abs((c - p) - parity) < 0.05

    def test_matches_fdm(self):
        pf = fem_price(OPT, CALL, N_S=300, N_t=300)
        pd = fd_price(OPT, CALL, N_S=300, N_t=300)
        assert abs(pf - pd) < 0.05

    def test_convergence(self):
        ref = bs_price(OPT, CALL)
        errs = [abs(fem_price(OPT, CALL, N_S=n, N_t=n) - ref)
                for n in (50, 100, 200)]
        assert errs[2] < errs[0]

    def test_thomas_matches_parallel(self):
        p1 = fem_price(OPT, CALL, N_S=200, N_t=200, solver="parallel")
        p2 = fem_price(OPT, CALL, N_S=200, N_t=200, solver="thomas")
        assert abs(p1 - p2) < 1e-8

    def test_itm_otm(self):
        itm = fem_price(OptionSpec(100.0, 80.0, 1.0, 0.05, 0.2), CALL,
                        N_S=300, N_t=300)
        otm = fem_price(OptionSpec(100.0, 120.0, 1.0, 0.05, 0.2), CALL,
                        N_S=300, N_t=300)
        ref_itm = bs_price(OptionSpec(100.0, 80.0, 1.0, 0.05, 0.2), CALL)
        ref_otm = bs_price(OptionSpec(100.0, 120.0, 1.0, 0.05, 0.2), CALL)
        assert abs(itm - ref_itm) / ref_itm < 0.002
        assert abs(otm - ref_otm) / ref_otm < 0.01


class TestFEMSolverEquivalence:
    def test_propagator_matches_tridiag(self):
        pp = fem_price(OPT, CALL, N_S=200, N_t=200, solver="propagator")
        pt = fem_price(OPT, CALL, N_S=200, N_t=200, solver="parallel")
        assert abs(pp - pt) < 1e-7
