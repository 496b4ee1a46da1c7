"""Pallas batched Thomas kernel vs the XLA solvers (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from optpricer_tpu.ops.pallas_tridiag import tridiag_solve_pallas
from optpricer_tpu.ops.tridiag import tridiag_solve_thomas

# tight in f64 (CPU test harness); f32 rounding when x64 is off (TPU runs)
TOLS = (dict(rtol=1e-9, atol=1e-10) if jax.config.jax_enable_x64
        else dict(rtol=5e-4, atol=1e-5))


def _system(n, batch, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, batch))
    b = rng.normal(size=(n, batch)) + 4.0
    c = rng.normal(size=(n, batch))
    d = rng.normal(size=(n, batch))
    return a, b, c, d


def test_matches_thomas():
    n, batch = 64, 128
    a, b, c, d = _system(n, batch)
    x = np.asarray(tridiag_solve_pallas(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(c), jnp.asarray(d),
        interpret=True))
    # XLA solver works along the last axis → transpose views
    ref = np.asarray(tridiag_solve_thomas(
        jnp.asarray(a.T), jnp.asarray(b.T), jnp.asarray(c.T),
        jnp.asarray(d.T))).T
    np.testing.assert_allclose(x, ref, **TOLS)


def test_multi_tile_batch():
    n, batch = 32, 256  # two lane tiles
    a, b, c, d = _system(n, batch, seed=3)
    x = np.asarray(tridiag_solve_pallas(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(c), jnp.asarray(d),
        interpret=True))
    ref = np.asarray(tridiag_solve_thomas(
        jnp.asarray(a.T), jnp.asarray(b.T), jnp.asarray(c.T),
        jnp.asarray(d.T))).T
    np.testing.assert_allclose(x, ref, **TOLS)


class TestFdSolvePallas:
    """The PDE time-dependent branch driven by the Pallas Thomas kernel
    (interpret mode here; real kernel covered by test_pallas_tpu.py)."""

    @staticmethod
    def _sigma(S, t):
        return 0.2 + 0.1 * jnp.exp(-((jnp.log(S / 100.0)) ** 2)) + 0.05 * t

    def test_local_vol_matches_assoc_scan(self):
        from optpricer_tpu.models.pde import fd_price_local_vol

        kw = dict(N_S=96, N_t=40, ref_vol=0.3)
        ref = fd_price_local_vol(100.0, 105.0, 1.0, 0.04, 0.01, self._sigma,
                                 "call", solver="auto", **kw)
        out = fd_price_local_vol(100.0, 105.0, 1.0, 0.04, 0.01, self._sigma,
                                 "call", solver="pallas", **kw)
        assert abs(out - ref) < (1e-8 if jax.config.jax_enable_x64 else 1e-3)

    def test_const_vol_pallas_matches_propagator(self):
        from optpricer_tpu import OptionSpec
        from optpricer_tpu.models.pde import fd_price

        opt = OptionSpec(S0=100.0, K=100.0, T=1.0, r=0.05, sigma=0.25)
        ref = fd_price(opt, "put", N_S=64, N_t=32, solver="auto")
        out = fd_price(opt, "put", N_S=64, N_t=32, solver="pallas")
        assert abs(out - ref) < (1e-7 if jax.config.jax_enable_x64 else 1e-3)

    def test_local_vol_batch_matches_loop(self):
        from optpricer_tpu.models.pde import (fd_price_local_vol,
                                              fd_price_local_vol_batch)

        Ks = np.array([90.0, 100.0, 110.0])
        kw = dict(N_S=96, N_t=40, ref_vol=0.3)
        batch = np.asarray(fd_price_local_vol_batch(
            100.0, Ks, 1.0, 0.04, 0.01, self._sigma, "call",
            solver="pallas", **kw))
        loop = np.array([fd_price_local_vol(
            100.0, float(k), 1.0, 0.04, 0.01, self._sigma, "call",
            solver="auto", **kw) for k in Ks])
        np.testing.assert_allclose(batch, loop, **TOLS)

    def test_lastdim_adapter_ragged_shapes(self):
        from optpricer_tpu.ops.pallas_tridiag import (
            tridiag_solve_pallas_lastdim)

        rng = np.random.default_rng(7)
        for shape in [(37,), (3, 37), (5, 2, 21)]:
            a = jnp.asarray(rng.normal(size=shape))
            b = jnp.asarray(rng.normal(size=shape) + 4.0)
            c = jnp.asarray(rng.normal(size=shape))
            d = jnp.asarray(rng.normal(size=shape))
            x = np.asarray(tridiag_solve_pallas_lastdim(a, b, c, d,
                                                        interpret=True))
            ref = np.asarray(tridiag_solve_thomas(a, b, c, d))
            np.testing.assert_allclose(x, ref, **TOLS)


class TestFusedFdLvKernel:
    """The whole-march VMEM-resident kernel (ops/pallas_fd_lv) agrees with
    the per-step solvers to f32 round-off (Mosaic interpreter here)."""

    @staticmethod
    def _sigma(S, t):
        return 0.2 + 0.1 * jnp.exp(-((jnp.log(S / 100.0)) ** 2)) + 0.05 * t

    def test_matches_per_step_solver(self):
        from optpricer_tpu.models.pde import fd_price_local_vol_batch

        Ks = np.array([85.0, 100.0, 115.0])
        kw = dict(N_S=96, N_t=40, ref_vol=0.3)
        fused = np.asarray(fd_price_local_vol_batch(
            100.0, Ks, 1.0, 0.04, 0.01, self._sigma, "call",
            solver="fused", **kw))
        ref = np.asarray(fd_price_local_vol_batch(
            100.0, Ks, 1.0, 0.04, 0.01, self._sigma, "call",
            solver="pallas", **kw))
        np.testing.assert_allclose(fused, ref, atol=2e-4, rtol=2e-5)

    def test_pcr_matches_thomas_walk(self):
        """Both in-kernel solves (log-depth PCR, sequential Thomas group
        walk) produce the same march to f32 round-off."""
        from optpricer_tpu.models.pde import fd_price_local_vol_batch

        Ks = np.array([85.0, 100.0, 115.0])
        kw = dict(N_S=96, N_t=40, ref_vol=0.3)
        pcr = np.asarray(fd_price_local_vol_batch(
            100.0, Ks, 1.0, 0.04, 0.01, self._sigma, "call",
            solver="fused", **kw))
        tho = np.asarray(fd_price_local_vol_batch(
            100.0, Ks, 1.0, 0.04, 0.01, self._sigma, "call",
            solver="fused_thomas", **kw))
        np.testing.assert_allclose(pcr, tho, atol=2e-4, rtol=2e-5)

    def test_puts_and_ragged_batch(self):
        from optpricer_tpu.models.pde import (fd_price_local_vol,
                                              fd_price_local_vol_batch)

        Ks = np.linspace(90.0, 120.0, 5)  # ragged: pads to one lane tile
        fused = np.asarray(fd_price_local_vol_batch(
            100.0, Ks, 0.5, 0.03, 0.0, self._sigma, "put",
            solver="fused", N_S=64, N_t=32, ref_vol=0.3))
        for k, got in zip(Ks, fused):
            ref = fd_price_local_vol(100.0, float(k), 0.5, 0.03, 0.0,
                                     self._sigma, "put", solver="auto",
                                     N_S=64, N_t=32, ref_vol=0.3)
            assert abs(got - ref) < 2e-3, (k, got, ref)
