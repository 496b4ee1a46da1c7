#!/usr/bin/env python3
"""Desk-style workflow: local-vol barrier pricing end-to-end on TPU.

Pipeline parity with reference ``scripts/desk_workflow_localvol_barrier.py``
(same six stages, same synthetic market, same contract):

    synthetic vol quotes → SVI calibration → Dupire local vol
    → barrier pricing (FDM + Milstein MC + fused kernel) → Greeks → report

The TPU difference: the Dupire σ(S,t) closure is traceable, so the whole
local-vol FDM march and the 200k×500 Milstein simulation each compile to a
single XLA program (the reference calls the surface ~1500× from Python),
and the fused row runs the entire simulation inside one Pallas kernel with
the SVI surface evaluated in registers.

Usage:
    python scripts/desk_workflow_localvol_barrier.py
"""
from __future__ import annotations

import sys
import time
from contextlib import contextmanager
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

from optpricer_tpu.core import CALL, OptionSpec  # noqa: E402
from optpricer_tpu.models.calibration import (  # noqa: E402
    dupire_local_vol_func, fit_svi_surface,
)
from optpricer_tpu.models.exotics import barrier_price  # noqa: E402
from optpricer_tpu.models.mc_fused import exotic_price_mc_dupire  # noqa: E402
from optpricer_tpu.models.pde import (  # noqa: E402
    fd_greeks, fd_price, fd_price_barrier, fd_price_local_vol,
)
from optpricer_tpu.models.processes import (  # noqa: E402
    milstein_local_vol_paths,
)
from optpricer_tpu.ops.black_scholes import price as bs_price  # noqa: E402
from optpricer_tpu.risk import numerical_greeks  # noqa: E402

RULE = "─" * 68


def banner(step: int, title: str) -> None:
    print(f"\n{RULE}\n  Step {step} — {title}\n{RULE}")


@contextmanager
def stopwatch(store: list):
    start = time.perf_counter()
    yield
    store.append(time.perf_counter() - start)


def cell(value, width: int, decimals: int = 4) -> str:
    if value is None:
        return "—".rjust(width)
    if isinstance(value, str):
        return value.rjust(width)
    return f"{value:.{decimals}f}".rjust(width)


def print_table(columns, rows) -> None:
    """columns: [(name, width, decimals)]; rows: list of value tuples."""
    head = " ".join(name.rjust(w) for name, w, _ in columns)
    print("    " + head)
    print("    " + "-" * len(head))
    for row in rows:
        line = " ".join(cell(v, w, d) for v, (_, w, d) in zip(row, columns))
        print("    " + line)


def synth_market():
    """Three-slice synthetic smile (mild skew + convexity), reference parity."""
    S0, r, q, base_vol = 100.0, 0.05, 0.02, 0.20
    expiries = (0.25, 0.50, 1.00)
    forwards = {T: S0 * np.exp((r - q) * T) for T in expiries}
    strikes, ivs = {}, {}
    for T in expiries:
        grid = np.linspace(0.75, 1.25, 21) * forwards[T]
        k = np.log(grid / forwards[T])
        strikes[T] = grid
        ivs[T] = base_vol + 0.05 * k * k - 0.02 * k + 0.005 * np.sqrt(T)
    return S0, r, q, base_vol, forwards, strikes, ivs


def main():
    banner(1, "Synthetic Market Data")
    S0, r, q, base_vol, forwards, strikes, ivs = synth_market()
    n_quotes = sum(map(len, strikes.values()))
    print(f"Generated {n_quotes} synthetic quotes across "
          f"{len(strikes)} expiries")
    print(f"Spot: {S0}  |  Rate: {r}  |  Div yield: {q}  |  "
          f"Base vol: {base_vol}  |  Backend: {jax.default_backend()}")

    banner(2, "SVI Calibration")
    tcal = []
    with stopwatch(tcal):
        surface = fit_svi_surface(strikes, forwards, ivs)
    print(f"Calibrated SVI surface in {tcal[0]:.3f}s")
    for T, svi in sorted(surface.slices.items()):
        k = np.log(strikes[T] / forwards[T])
        err = np.asarray(svi.iv(k)) - ivs[T]
        print(f"  T={T:.2f}:  a={svi.a:.4f}  b={svi.b:.4f}  "
              f"rho={svi.rho:+.4f}  RMSE={float(np.sqrt(np.mean(err*err))):.6f}")

    banner(3, "Dupire Local Vol Surface")
    sigma_loc = dupire_local_vol_func(surface, r=r, q=q)
    print_table([("S", 8, 1), ("t", 6, 2), ("σ_loc", 10, 4)],
                [(S_p, t_p,
                  float(np.asarray(sigma_loc(np.array([S_p]), t_p))[0]))
                 for S_p in (85.0, 100.0, 115.0) for t_p in (0.1, 0.5)])

    banner(4, "Barrier Option Pricing (FDM + MC)")
    K, T, barrier, btype = 100.0, 1.0, 130.0, "up-and-out"
    opt = OptionSpec(S0=S0, K=K, T=T, r=r, sigma=base_vol, q=q)
    n_paths, n_steps = 200_000, 500

    times = []
    with stopwatch(times):
        fdm_vanilla = fd_price(opt, CALL)
        fdm_barrier = fd_price_barrier(opt, CALL, barrier, btype)
    with stopwatch(times):
        fdm_lv_vanilla = fd_price_local_vol(S0, K, T, r, q, sigma_loc, CALL)
    with stopwatch(times):
        paths = milstein_local_vol_paths(S0, r, q, T, n_steps, n_paths,
                                         sigma_loc, seed=42)
        mc_barrier, mc_se = barrier_price(paths, K, r, T, CALL, barrier,
                                          btype)
    mc_vanilla = float(np.exp(-r * T)
                       * np.maximum(np.asarray(paths[-1]) - K, 0.0).mean())

    # Fused engine: the Dupire formula evaluated inside the Pallas kernel on
    # TPU (XLA scan elsewhere) — no path matrix, no Python in the loop.
    fused = lambda: exotic_price_mc_dupire(
        "barrier", surface, S0, K, T, r, q, scheme="milstein",
        barrier=barrier, barrier_type=btype, n_steps=n_steps,
        n_paths=n_paths, seed=42)
    fused()  # compile once
    with stopwatch(times):
        fz_barrier, fz_se = fused()
    t_fdm, t_fdm_lv, t_mc, t_fz = times

    bs_vanilla = bs_price(opt, CALL)
    print(f"\nContract:  S0={S0}  K={K}  T={T}  barrier={barrier} ({btype})")
    print_table(
        [("Method", 25, 0), ("Vanilla", 10, 4), ("Barrier", 10, 4),
         ("Time", 9, 3)],
        [("Black-Scholes (const σ)", bs_vanilla, None, None),
         ("FDM (const σ)", fdm_vanilla, fdm_barrier, f"{t_fdm:.3f}s"),
         ("FDM (local vol)", fdm_lv_vanilla, None, f"{t_fdm_lv:.3f}s"),
         ("MC+Milstein (local vol)", mc_vanilla, mc_barrier,
          f"{t_mc:.3f}s"),
         ("Fused kernel (local vol)", None, fz_barrier, f"{t_fz:.3f}s")])
    print(f"\n  MC barrier stderr: {mc_se:.4f} (path matrix) / "
          f"{fz_se:.4f} (fused)  ({n_paths:,} paths, {n_steps} steps)")

    banner(5, "Greeks (FDM Grid vs Bump-and-Reprice)")
    grid_gk = fd_greeks(opt, CALL)
    fdm_engine = lambda S, K, T, r, q, sigma, kind: fd_price(
        OptionSpec(S0=S, K=K, T=T, r=r, sigma=sigma, q=q), kind)
    bump_gk = numerical_greeks(fdm_engine, S0, K, T, r, q, base_vol, CALL)
    print()
    print_table(
        [("Greek", 8, 0), ("FDM Grid", 12, 6), ("Bump&Reprice", 14, 6)],
        [(g, grid_gk.get(g), bump_gk[g])
         for g in ("delta", "gamma", "theta", "vega", "rho")])

    banner(6, "Summary")
    knockdown = 100.0 * (1.0 - fdm_barrier / fdm_vanilla)
    lv_shift = fdm_lv_vanilla - fdm_vanilla
    for label, text in (
        ("Barrier knock-down", f"{knockdown:.1f}% "
                               f"(barrier {btype} at {barrier})"),
        ("Local-vol adjustment", f"{lv_shift:+.4f} "
                                 f"({100*lv_shift/fdm_vanilla:+.2f}% of "
                                 "vanilla)"),
        ("FDM vs MC barrier diff", f"{abs(fdm_barrier - mc_barrier):.4f}"),
        ("BS vs FDM vanilla diff", f"{abs(bs_vanilla - fdm_vanilla):.4f}"),
    ):
        print(f"  {label + ':':<26s}{text}")
    print()


if __name__ == "__main__":
    main()
