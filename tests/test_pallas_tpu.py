"""TPU-only validation of the Pallas kernels (skipped on CPU runs; the
XLA-path equivalents are covered by the rest of the suite). Run on a TPU
host: JAX_PLATFORMS= python -m pytest tests/test_pallas_tpu.py"""
import numpy as np
import pytest

import jax

if jax.default_backend() != "tpu":
    pytest.skip("Pallas TPU kernels require TPU hardware",
                allow_module_level=True)

from optpricer_tpu import CALL, OptionSpec, euro_price_mc
from optpricer_tpu.models.mc_fused import exotic_price_mc


def test_terminal_kernel_vs_f64_bs():
    from math import erfc, exp, log, sqrt

    opt = OptionSpec(S0=100.0, K=110.0, T=1.0, r=0.03, sigma=0.2)
    d1 = (log(100 / 110) + (0.03 + 0.02)) / 0.2
    d2 = d1 - 0.2
    Phi = lambda x: 0.5 * erfc(-x / sqrt(2))
    ref = 100 * Phi(d1) - 110 * exp(-0.03) * Phi(d2)
    px, se = euro_price_mc(opt, CALL, n_paths=1 << 28, seed=3,
                           backend="pallas")
    assert abs(px - ref) < 5 * se + 1e-4


@pytest.mark.parametrize("payoff,kw", [
    ("vanilla", {}),
    ("barrier", dict(barrier=120.0, barrier_type="up-and-out")),
    ("asian", {}),
    ("digital", {}),
    ("lookback", dict(strike_type="floating")),
])
def test_path_kernel_vs_xla(payoff, kw):
    common = dict(n_steps=64, n_paths=200_000, seed=5)
    p1, s1 = exotic_price_mc(payoff, 100.0, 100.0, 1.0, 0.05, sigma=0.2,
                             backend="pallas", **common, **kw)
    p2, s2 = exotic_price_mc(payoff, 100.0, 100.0, 1.0, 0.05, sigma=0.2,
                             backend="xla", **common, **kw)
    assert abs(p1 - p2) < 5 * np.hypot(s1, s2) + 1e-3
