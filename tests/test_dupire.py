"""Dupire local-vol extraction: flat-surface reduction and engine round trips.

Mirrors reference test_dupire.py. Because this build interpolates total
variance consistently, a flat surface gives local vol ≈ flat vol *tightly*
(the reference only manages ±0.03 due to its w·T interpolation bias).
"""
import jax.numpy as jnp
import numpy as np

from optpricer_tpu import (
    CALL, OptionSpec, SVIParams, VolSurface, bs_price, dupire_local_vol,
    dupire_local_vol_func, fd_price_local_vol,
)
from optpricer_tpu.models.processes import local_vol_paths


def _flat_surface(flat_vol=0.2, forward=100.0):
    slices = {}
    for T in [0.25, 0.5, 1.0]:
        slices[T] = SVIParams(a=flat_vol**2 * T, b=1e-6, rho=0.0, m=0.0,
                              sigma=0.1, expiry=T)
    return VolSurface(slices, forward_curve={T: forward for T in slices})


class TestDupireLocalVol:
    def test_flat_surface_gives_const_local_vol(self):
        surface = _flat_surface(0.2)
        lv = float(dupire_local_vol(surface, 100.0, 0.5, 0.05, 0.0))
        assert abs(lv - 0.2) < 0.005

    def test_flat_surface_across_times(self):
        surface = _flat_surface(0.3)
        for t in (0.3, 0.5, 0.75, 0.9):
            lv = float(dupire_local_vol(surface, 100.0, t, 0.05, 0.0))
            assert abs(lv - 0.3) < 0.01, f"t={t}: {lv}"

    def test_positive_local_vol(self):
        surface = _flat_surface(0.3)
        lv = np.asarray(dupire_local_vol(surface, np.linspace(80, 120, 20),
                                         0.5, 0.05, 0.0))
        assert np.all(lv > 0)

    def test_callable_interface(self):
        surface = _flat_surface(0.2)
        func = dupire_local_vol_func(surface, 0.05, 0.0)
        result = func(np.array([90.0, 100.0, 110.0]), 0.5)
        assert np.asarray(result).shape == (3,)
        assert np.all(np.asarray(result) > 0)

    def test_traceable_inside_jit(self):
        import jax
        surface = _flat_surface(0.2)
        func = dupire_local_vol_func(surface, 0.05, 0.0)
        out = jax.jit(lambda S, t: func(S, t))(jnp.asarray([100.0]), 0.5)
        assert abs(float(out[0]) - 0.2) < 0.01


class TestDupireIntegration:
    def test_fd_with_constant_local_vol(self):
        sigma_const = lambda S, t: 0.2 * jnp.ones_like(S)
        lv_price = fd_price_local_vol(100, 100, 1.0, 0.05, 0.0, sigma_const,
                                      CALL, N_S=200, N_t=200, ref_vol=0.2)
        bs = bs_price(OptionSpec(100, 100, 1.0, 0.05, 0.2), CALL)
        assert abs(lv_price - bs) / bs < 0.002

    def test_fd_with_dupire_flat_surface(self):
        surface = _flat_surface(0.2)
        func = dupire_local_vol_func(surface, 0.05, 0.0)
        lv_price = fd_price_local_vol(100, 100, 1.0, 0.05, 0.0, func, CALL,
                                      N_S=200, N_t=200, ref_vol=0.2)
        bs = bs_price(OptionSpec(100, 100, 1.0, 0.05, 0.2), CALL)
        # consistent total-variance interp ⇒ much tighter than reference's 10%
        assert abs(lv_price - bs) / bs < 0.02

    def test_mc_with_dupire_flat_surface(self):
        surface = _flat_surface(0.2)
        func = dupire_local_vol_func(surface, 0.05, 0.0)
        paths = local_vol_paths(100, 0.05, 0.0, 1.0, 200, 50_000, func,
                                antithetic=True, seed=42)
        ST = np.asarray(paths[-1])
        mc_price = float(np.exp(-0.05) * np.maximum(ST - 100, 0.0).mean())
        bs = bs_price(OptionSpec(100, 100, 1.0, 0.05, 0.2), CALL)
        assert abs(mc_price - bs) / bs < 0.02
