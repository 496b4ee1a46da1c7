"""Mesh parallelism: sharded batch pricers equal their single-device twins
on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

from optpricer_tpu import CALL, PUT, OptionSpec, bs_greeks_vec, bs_price_vec
from optpricer_tpu.parallel import get_mesh
from optpricer_tpu.parallel.batch import (
    bs_greeks_sharded, bs_price_sharded, crr_vec_sharded, fd_batch_sharded,
)


@pytest.fixture(scope="module")
def mesh():
    return get_mesh(8)


class TestShardedBS:
    def test_price_matches(self, mesh):
        K = np.linspace(50, 150, 203)  # ragged: 203 % 8 != 0
        ref = np.asarray(bs_price_vec(100.0, K, 1.0, 0.05, 0.0, 0.2, CALL))
        out = bs_price_sharded(mesh, 100.0, K, 1.0, 0.05, 0.0, 0.2, CALL)
        np.testing.assert_allclose(out, ref, rtol=1e-12)

    def test_greeks_match(self, mesh):
        K = np.linspace(80, 120, 37)
        ref = bs_greeks_vec(100.0, K, 1.0, 0.05, 0.0, 0.2, PUT)
        out = bs_greeks_sharded(mesh, 100.0, K, 1.0, 0.05, 0.0, 0.2, PUT)
        for k in ref:
            np.testing.assert_allclose(out[k], np.asarray(ref[k]),
                                       rtol=1e-12)

    def test_mixed_kinds(self, mesh):
        K = np.full(16, 100.0)
        kinds = np.array(["call", "put"] * 8)
        ref = np.asarray(bs_price_vec(100.0, K, 1.0, 0.05, 0.0, 0.2, kinds))
        out = bs_price_sharded(mesh, 100.0, K, 1.0, 0.05, 0.0, 0.2, kinds)
        np.testing.assert_allclose(out, ref, rtol=1e-12)


class TestShardedCRR:
    def test_matches_crr_vec(self, mesh):
        from optpricer_tpu import crr_vec

        K = np.linspace(70, 130, 100)
        ref = np.asarray(crr_vec(100.0, K, 1.0, 0.05, 0.0, 0.2, PUT, N=200,
                                 american=True))
        out = crr_vec_sharded(mesh, 100.0, K, 1.0, 0.05, 0.0, 0.2, PUT,
                              N=200, american=True)
        np.testing.assert_allclose(out, ref, rtol=1e-10)


class TestShardedFD:
    def test_matches_fd_batch(self, mesh):
        from optpricer_tpu.models.pde import fd_price_batch

        K = np.linspace(80, 120, 23)
        ref = np.asarray(fd_price_batch(100.0, K, 1.0, 0.05, 0.0, 0.2, CALL,
                                        N_S=128, N_t=128))
        out = fd_batch_sharded(mesh, 100.0, K, 1.0, 0.05, 0.0, 0.2, CALL,
                               N_S=128, N_t=128)
        np.testing.assert_allclose(out, ref, rtol=1e-8, atol=1e-10)
