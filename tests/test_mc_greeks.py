"""Full MC Greek set from one sufficient-statistics run (13-stat layout).

Estimator checks against the analytic BS Greeks: pathwise delta/vega/rho/
theta and the likelihood-ratio gamma are all linear in the 13 accumulated
moments (ops/stats.py STATSG_DIM), so a single pricing run must reproduce
``greeks_core`` to statistical tolerance. Covers both option kinds and
antithetic on/off on the XLA engine (the Pallas engine shares the layout and
is z-tested against XLA in the TPU-gated suite).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from optpricer_tpu import OptionSpec
from optpricer_tpu.models.monte_carlo import euro_greeks_mc
from optpricer_tpu.ops.black_scholes import greeks_core

OPT = OptionSpec(S0=100.0, K=110.0, T=1.0, r=0.03, sigma=0.2)


def _analytic(kind):
    g = greeks_core(jnp.float64(100.0), jnp.float64(110.0), jnp.float64(1.0),
                    jnp.float64(0.03), jnp.float64(0.0), jnp.float64(0.2),
                    jnp.asarray(kind == "call"))
    return {k: float(v) for k, v in g.items()}


@pytest.mark.parametrize("kind", ["call", "put"])
@pytest.mark.parametrize("antithetic", [True, False])
def test_greeks_match_analytic(kind, antithetic):
    g = euro_greeks_mc(OPT, kind, n_paths=2_000_000, seed=11, backend="xla",
                       antithetic=antithetic, dtype="float64")
    ref = _analytic(kind)
    # scale-aware bands: MC noise at 2M paths
    assert abs(g["delta"] - ref["delta"]) < 2e-3
    assert abs(g["gamma"] - ref["gamma"]) < 1e-3
    assert abs(g["vega"] - ref["vega"]) < 0.2
    assert abs(g["theta"] - ref["theta"]) < 0.05
    assert abs(g["rho"] - ref["rho"]) < 0.2


def test_digital_matches_closed_form():
    from math import erf, exp, log, sqrt

    g = euro_greeks_mc(OPT, "call", n_paths=2_000_000, seed=5, backend="xla",
                       dtype="float64")
    d2 = (log(100 / 110) + (0.03 - 0.5 * 0.04)) / 0.2
    ref = exp(-0.03) * 0.5 * (1 + erf(d2 / sqrt(2)))
    assert abs(g["digital"] - ref) < 1e-3


def test_seed_reproducible():
    a = euro_greeks_mc(OPT, "put", n_paths=200_000, seed=9, backend="xla")
    b = euro_greeks_mc(OPT, "put", n_paths=200_000, seed=9, backend="xla")
    assert a == b


def test_stats_vector_is_13_wide():
    import jax

    from optpricer_tpu.models.monte_carlo import mc_sumstats
    from optpricer_tpu.ops import stats as stats_ops

    args = [jnp.asarray(v, jnp.float64)
            for v in (100.0, 110.0, 1.0, 0.03, 0.0, 0.2)]
    s = mc_sumstats(jax.random.key(0), jnp.arange(2), jnp.asarray(2000),
                    *args, jnp.asarray(True), chunk_size=1024,
                    antithetic=True, dtype=jnp.float64)
    assert s.shape == (stats_ops.STATSG_DIM,)
    assert s[stats_ops.N] == 4000  # antithetic doubles
