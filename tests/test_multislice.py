"""Multi-slice (DCN) mesh story: every mesh-taking entry point accepts a
2-D ("slice", "chip") mesh and produces the same numbers as the 1-D mesh
over the same 8 virtual devices — the psum over the axis tuple is the only
thing that changes (hierarchical ICI-then-DCN reduction on real hardware).
"""
import jax
import numpy as np
import pytest

from optpricer_tpu import CALL, PUT, OptionSpec, euro_price_mc
from optpricer_tpu.parallel import get_mesh, get_mesh_multislice, mesh_axes


@pytest.fixture(scope="module")
def mesh1d():
    return get_mesh(8)


@pytest.fixture(scope="module")
def mesh2d():
    return get_mesh_multislice(2, 4)


def test_constructor_layout(mesh2d):
    assert mesh2d.devices.shape == (2, 4)
    assert mesh_axes(mesh2d) == ("slice", "chip")
    with pytest.raises(ValueError, match="need 16 devices"):
        get_mesh_multislice(4, 4)
    # degenerate layouts must raise, not build an empty mesh
    with pytest.raises(ValueError, match="cannot lay out"):
        get_mesh_multislice(16)
    with pytest.raises(ValueError, match="cannot lay out"):
        get_mesh_multislice(0, 4)


def test_mc_xla_path(mesh1d, mesh2d):
    opt = OptionSpec(S0=100.0, K=105.0, T=1.0, r=0.05, sigma=0.2)
    kw = dict(n_paths=200_000, seed=11, chunk_size=25_000)
    p1, s1 = euro_price_mc(opt, CALL, mesh=mesh1d, **kw)
    p2, s2 = euro_price_mc(opt, CALL, mesh=mesh2d, **kw)
    # identical chunk streams; only float psum order may differ
    assert abs(p1 - p2) < 1e-9
    assert abs(s1 - s2) < 1e-9


def test_mc_pallas_path(mesh1d, mesh2d):
    from optpricer_tpu.ops.pallas_mc import mc_sumstats_pallas_sharded

    kw = dict(antithetic=True, dtype=None, interpret=True)
    s1 = np.asarray(mc_sumstats_pallas_sharded(
        mesh1d, 7, 65_536, 100.0, 100.0, 1.0, 0.05, 0.0, 0.2, True, **kw))
    s2 = np.asarray(mc_sumstats_pallas_sharded(
        mesh2d, 7, 65_536, 100.0, 100.0, 1.0, 0.05, 0.0, 0.2, True, **kw))
    np.testing.assert_allclose(s1, s2, rtol=1e-6)


def test_fused_exotics_path(mesh1d, mesh2d):
    from optpricer_tpu.models.mc_fused import exotic_price_mc

    kw = dict(sigma=0.2, kind=CALL, n_paths=16_384, n_steps=16, seed=3,
              average_type="arithmetic")
    p1, s1 = exotic_price_mc("asian", 100.0, 100.0, 1.0, 0.05, 0.0,
                             mesh=mesh1d, **kw)
    p2, s2 = exotic_price_mc("asian", 100.0, 100.0, 1.0, 0.05, 0.0,
                             mesh=mesh2d, **kw)
    assert abs(p1 - p2) < 1e-6 * max(1.0, abs(p1))


def test_lsmc_path(mesh1d, mesh2d):
    from optpricer_tpu.models.american_mc import lsmc_price_sharded

    opt = OptionSpec(S0=100.0, K=110.0, T=1.0, r=0.05, sigma=0.25)
    kw = dict(n_paths=16_384, n_steps=12, seed=5)
    p1, _ = lsmc_price_sharded(mesh1d, opt, PUT, **kw)
    p2, _ = lsmc_price_sharded(mesh2d, opt, PUT, **kw)
    # same per-device streams and global regression; psum order only
    assert abs(p1 - p2) < 1e-8 * max(1.0, abs(p1))


def test_batch_pricers(mesh2d):
    from optpricer_tpu import bs_price_vec, crr_vec
    from optpricer_tpu.parallel.batch import (bs_price_sharded,
                                              crr_vec_sharded)

    K = np.linspace(50, 150, 203)
    ref = np.asarray(bs_price_vec(100.0, K, 1.0, 0.05, 0.0, 0.2, CALL))
    out = bs_price_sharded(mesh2d, 100.0, K, 1.0, 0.05, 0.0, 0.2, CALL)
    np.testing.assert_allclose(out, ref, rtol=1e-12)

    K = np.linspace(70, 130, 100)
    ref = np.asarray(crr_vec(100.0, K, 1.0, 0.05, 0.0, 0.2, PUT, N=100,
                             american=True))
    out = crr_vec_sharded(mesh2d, 100.0, K, 1.0, 0.05, 0.0, 0.2, PUT,
                          N=100, american=True)
    np.testing.assert_allclose(out, ref, rtol=1e-10)
