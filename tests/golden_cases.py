"""Golden-number case registry.

Each case is a zero-argument callable returning a float (or dict of floats)
that must be DETERMINISTIC on the CPU/x64 test platform: closed forms,
lattice/PDE/FEM solves, the jitted LM calibration, and threefry-seeded XLA
Monte-Carlo (counter-based → platform-independent streams). Pallas engines
are excluded (hardware PRNG).

The committed values live in tests/goldens.json; regenerate after an
*intentional* numeric change with

    python -m tests.golden_cases --update

and justify the diff in the commit message. The point of this suite is to
catch silent drift the tolerance tests can't see — a precision regression
in the propagator, a changed reduction order, an accidental f32 downcast.
"""
from __future__ import annotations

import json
from pathlib import Path

GOLDEN_PATH = Path(__file__).with_name("goldens.json")

_CASES = {}


def case(name):
    def deco(fn):
        _CASES[name] = fn
        return fn
    return deco


def _opt(**kw):
    from optpricer_tpu import OptionSpec

    base = dict(S0=100.0, K=105.0, T=0.75, r=0.04, sigma=0.22, q=0.01)
    base.update(kw)
    return OptionSpec(**base)


@case("bs_call")
def _bs_call():
    from optpricer_tpu.ops.black_scholes import price

    return price(_opt(), "call")


@case("bs_put")
def _bs_put():
    from optpricer_tpu.ops.black_scholes import price

    return price(_opt(), "put")


@case("bs_greeks_call")
def _bs_greeks():
    from optpricer_tpu import bs_greeks

    return {k: float(v) for k, v in bs_greeks(_opt(), "call").items()}


@case("implied_vol_roundtrip")
def _iv():
    from optpricer_tpu import implied_vol
    from optpricer_tpu.ops.black_scholes import price

    return implied_vol(_opt(sigma=0.3), price(_opt(), "put"), "put")


@case("crr_euro_call_n200")
def _crr_euro():
    from optpricer_tpu.models.binomial import crr

    return crr(_opt(), "call", N=200, american=False)


@case("crr_amer_put_n200")
def _crr_amer():
    from optpricer_tpu.models.binomial import crr

    return crr(_opt(), "put", N=200, american=True)


@case("fd_cn_call")
def _fd_cn():
    from optpricer_tpu.models.pde import fd_price

    return fd_price(_opt(), "call", N_S=128, N_t=128)


@case("fd_amer_put_projection")
def _fd_amer():
    from optpricer_tpu.models.pde import fd_price

    return fd_price(_opt(), "put", N_S=128, N_t=128, american=True)


@case("fd_amer_put_psor")
def _fd_psor():
    from optpricer_tpu.models.pde import fd_price

    return fd_price(_opt(), "put", N_S=128, N_t=128, american=True,
                    american_method="psor")


@case("fd_barrier_uo_call")
def _fd_barrier():
    from optpricer_tpu.models.pde import fd_price_barrier

    return fd_price_barrier(_opt(), "call", 130.0, "up-and-out",
                            N_S=128, N_t=128)


@case("fem_call")
def _fem():
    from optpricer_tpu.models.fem import fem_price

    return fem_price(_opt(), "call", N_S=128, N_t=64)


@case("svi_fit")
def _svi():
    import numpy as np

    from optpricer_tpu.models.calibration import SVIParams, fit_svi

    truth = SVIParams(a=0.03, b=0.14, rho=-0.35, m=0.02, sigma=0.11,
                      expiry=0.5)
    k = np.linspace(-0.35, 0.35, 17)
    strikes = 100.0 * np.exp(k)
    fit = fit_svi(strikes, 100.0, 0.5, np.asarray(truth.iv(k)))
    return dict(a=fit.a, b=fit.b, rho=fit.rho, m=fit.m, sigma=fit.sigma)


@case("dupire_probe")
def _dupire():
    import numpy as np

    from optpricer_tpu.models.calibration import (SVIParams, VolSurface,
                                                  dupire_local_vol_func)

    sl = {T: SVIParams(a=0.02 * T + 0.02, b=0.15, rho=-0.3, m=0.02,
                       sigma=0.12, expiry=T) for T in (0.25, 0.5, 1.0)}
    surf = VolSurface(sl, forward_curve={T: 100 * np.exp(0.03 * T)
                                         for T in sl})
    fn = dupire_local_vol_func(surf, 0.03, 0.0)
    return {f"S{S}_t{t}": float(np.asarray(fn(np.array([float(S)]), t))[0])
            for S in (90, 100, 110) for t in (0.3, 0.8)}


@case("mc_xla_call_seed42")
def _mc_xla():
    from optpricer_tpu.models.monte_carlo import euro_price_mc

    px, se = euro_price_mc(_opt(), "call", n_paths=200_000, seed=42,
                           backend="xla", dtype="float64")
    return dict(price=px, stderr=se)


@case("mc_greeks_xla_seed7")
def _mc_greeks():
    from optpricer_tpu.models.monte_carlo import euro_greeks_mc

    return euro_greeks_mc(_opt(), "call", n_paths=200_000, seed=7,
                          backend="xla", dtype="float64")


@case("exotic_asian_xla_seed3")
def _asian():
    from optpricer_tpu import exotic_price_mc

    px, se = exotic_price_mc("asian", 100.0, 100.0, 1.0, 0.03, sigma=0.2,
                             n_steps=32, n_paths=50_000, seed=3,
                             backend="xla", dtype="float64")
    return dict(price=px, stderr=se)


@case("exotic_barrier_heston_xla_seed5")
def _barrier_heston():
    from optpricer_tpu import exotic_price_mc

    heston = dict(v0=0.04, kappa=1.5, theta=0.04, xi=0.4, rho=-0.6)
    px, se = exotic_price_mc("barrier", 100.0, 100.0, 1.0, 0.03,
                             heston=heston, barrier=135.0,
                             barrier_type="up-and-out", n_steps=32,
                             n_paths=50_000, seed=5, backend="xla",
                             dtype="float64")
    return dict(price=px, stderr=se)


@case("exotic_sabr_xla_seed9")
def _sabr():
    from optpricer_tpu import exotic_price_mc

    sabr = dict(alpha0=0.25, beta=1.0, nu=0.5, rho=-0.4)
    px, se = exotic_price_mc("vanilla", 100.0, 100.0, 1.0, 0.03, sabr=sabr,
                             n_steps=32, n_paths=50_000, seed=9,
                             backend="xla", dtype="float64")
    return dict(price=px, stderr=se)


@case("mc_qmc_call_seed7")
def _qmc():
    from optpricer_tpu.models.monte_carlo import euro_price_mc

    px, se = euro_price_mc(_opt(), "call", n_paths=1 << 18, seed=7,
                           backend="qmc")
    return dict(price=px, stderr=se)


@case("merton_series")
def _merton_analytic():
    from optpricer_tpu import merton_price

    return float(merton_price(100.0, 105.0, 0.75, 0.04, 0.01, sigma=0.22,
                              lam=0.6, mJ=-0.07, sJ=0.13))


@case("heston_cos")
def _heston_analytic():
    from optpricer_tpu import heston_price_cos

    return float(heston_price_cos(100.0, 105.0, 0.75, 0.04, 0.01, v0=0.045,
                                  kappa=1.8, theta=0.05, xi=0.45, rho=-0.55))


@case("sabr_hagan")
def _sabr_analytic():
    from optpricer_tpu import sabr_price_hagan

    return float(sabr_price_hagan(100.0, 105.0, 0.75, 0.04, 0.01,
                                  alpha=0.22, beta=1.0, nu=0.5, rho=-0.4))


@case("basket_mc_seed5")
def _basket():
    import numpy as np

    from optpricer_tpu import basket_price_mc

    corr = np.array([[1.0, 0.5], [0.5, 1.0]])
    px, se = basket_price_mc([100.0, 95.0], [0.6, 0.4], 100.0, 1.0, 0.03,
                             sigmas=[0.2, 0.3], corr=corr, seed=5,
                             n_paths=1 << 16, dtype="float64")
    return dict(price=px, stderr=se)


def compute_all() -> dict:
    out = {}
    for name, fn in sorted(_CASES.items()):
        value = fn()
        out[name] = value if isinstance(value, dict) else float(value)
    return out


def main():
    import argparse
    import os

    # standalone runs must match the pytest harness platform exactly
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--update", action="store_true",
                    help="recompute and overwrite tests/goldens.json")
    ns = ap.parse_args()
    values = compute_all()
    if ns.update:
        GOLDEN_PATH.write_text(json.dumps(values, indent=2, sort_keys=True)
                               + "\n")
        print(f"wrote {len(values)} goldens to {GOLDEN_PATH}")
    else:
        print(json.dumps(values, indent=2, sort_keys=True))


if __name__ == "__main__":
    main()
