#!/usr/bin/env python3
"""Desk-style workflow: local-vol barrier pricing end-to-end on TPU.

Pipeline (reference ``scripts/desk_workflow_localvol_barrier.py``):

    synthetic vol quotes → SVI calibration → Dupire local vol
    → barrier pricing (FDM + Milstein MC) → Greeks → report

The TPU difference: the Dupire σ(S,t) closure is traceable, so the entire
local-vol FDM march and the 200k×500 Milstein simulation each compile to a
single XLA program (the reference calls the surface 1500× from Python).

Usage:
    python scripts/desk_workflow_localvol_barrier.py
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

from optpricer_tpu.core import CALL, OptionSpec  # noqa: E402
from optpricer_tpu.models.calibration import (  # noqa: E402
    dupire_local_vol_func, fit_svi_surface,
)
from optpricer_tpu.models.exotics import barrier_price  # noqa: E402
from optpricer_tpu.models.pde import (  # noqa: E402
    fd_greeks, fd_price, fd_price_barrier, fd_price_local_vol,
)
from optpricer_tpu.models.processes import milstein_local_vol_paths  # noqa: E402
from optpricer_tpu.ops.black_scholes import price as bs_price  # noqa: E402
from optpricer_tpu.risk import numerical_greeks  # noqa: E402

WIDTH = 68


def header(title: str) -> None:
    print(f"\n{'─' * WIDTH}\n  {title}\n{'─' * WIDTH}")


def fmt(x: float, dp: int = 4) -> str:
    return f"{x:>{dp + 6}.{dp}f}"


def main():
    # ── 1. Synthetic market data ──────────────────────────────────────────
    header("Step 1 — Synthetic Market Data")
    S0, r, q = 100.0, 0.05, 0.02
    base_vol = 0.20
    expiries = [0.25, 0.50, 1.00]
    forwards = {T: S0 * np.exp((r - q) * T) for T in expiries}

    strikes_by_T, ivs_by_T = {}, {}
    for T in expiries:
        F = forwards[T]
        K_arr = np.linspace(0.75 * F, 1.25 * F, 21)
        k = np.log(K_arr / F)
        ivs_by_T[T] = base_vol + 0.05 * k**2 - 0.02 * k + 0.005 * np.sqrt(T)
        strikes_by_T[T] = K_arr

    n_quotes = sum(len(v) for v in strikes_by_T.values())
    print(f"Generated {n_quotes} synthetic quotes across "
          f"{len(expiries)} expiries")
    print(f"Spot: {S0}  |  Rate: {r}  |  Div yield: {q}  |  "
          f"Base vol: {base_vol}  |  Backend: {jax.default_backend()}")

    # ── 2. SVI calibration ────────────────────────────────────────────────
    header("Step 2 — SVI Calibration")
    t0 = time.perf_counter()
    surface = fit_svi_surface(strikes_by_T, forwards, ivs_by_T)
    t_cal = time.perf_counter() - t0
    print(f"Calibrated SVI surface in {t_cal:.3f}s")
    for T, svi in sorted(surface.slices.items()):
        k = np.log(strikes_by_T[T] / forwards[T])
        rmse = float(np.sqrt(np.mean(
            (np.asarray(svi.iv(k)) - ivs_by_T[T]) ** 2)))
        print(f"  T={T:.2f}:  a={svi.a:.4f}  b={svi.b:.4f}  "
              f"rho={svi.rho:+.4f}  RMSE={rmse:.6f}")

    # ── 3. Dupire local vol ───────────────────────────────────────────────
    header("Step 3 — Dupire Local Vol Surface")
    sigma_loc = dupire_local_vol_func(surface, r=r, q=q)
    print(f"  {'S':>8s}  {'t':>6s}  {'σ_loc':>10s}")
    for S_probe in (85.0, 100.0, 115.0):
        for t_probe in (0.1, 0.5):
            lv = float(np.asarray(sigma_loc(np.array([S_probe]), t_probe))[0])
            print(f"  {S_probe:>8.1f}  {t_probe:>6.2f}  {lv:>10.4f}")

    # ── 4. Barrier pricing ────────────────────────────────────────────────
    header("Step 4 — Barrier Option Pricing (FDM + MC)")
    K, T, barrier, barrier_type = 100.0, 1.0, 130.0, "up-and-out"
    opt = OptionSpec(S0=S0, K=K, T=T, r=r, sigma=base_vol, q=q)

    t0 = time.perf_counter()
    fdm_vanilla = fd_price(opt, CALL)
    t_fdm_v = time.perf_counter() - t0

    t0 = time.perf_counter()
    fdm_barrier = fd_price_barrier(opt, CALL, barrier, barrier_type)
    t_fdm_b = time.perf_counter() - t0

    t0 = time.perf_counter()
    fdm_lv_vanilla = fd_price_local_vol(S0, K, T, r, q, sigma_loc, CALL)
    t_fdm_lv = time.perf_counter() - t0

    bs_vanilla = bs_price(opt, CALL)

    n_paths, n_steps = 200_000, 500
    t0 = time.perf_counter()
    paths = milstein_local_vol_paths(S0, r, q, T, n_steps, n_paths, sigma_loc,
                                     seed=42)
    mc_barrier, mc_se = barrier_price(paths, K, r, T, CALL, barrier,
                                      barrier_type)
    t_mc = time.perf_counter() - t0
    mc_vanilla = float(np.exp(-r * T)
                       * np.maximum(np.asarray(paths[-1]) - K, 0.0).mean())

    # Fused engine: Dupire σ(S,t) evaluated inside the Pallas kernel on TPU
    # (XLA scan elsewhere) — no path matrix, no Python in the loop.
    from optpricer_tpu.models.mc_fused import exotic_price_mc_dupire

    exotic_price_mc_dupire(  # compile once
        "barrier", surface, S0, K, T, r, q, scheme="milstein",
        barrier=barrier, barrier_type=barrier_type, n_steps=n_steps,
        n_paths=n_paths, seed=42)
    t0 = time.perf_counter()
    fz_barrier, fz_se = exotic_price_mc_dupire(
        "barrier", surface, S0, K, T, r, q, scheme="milstein",
        barrier=barrier, barrier_type=barrier_type, n_steps=n_steps,
        n_paths=n_paths, seed=42)
    t_fz = time.perf_counter() - t0

    print(f"\nContract:  S0={S0}  K={K}  T={T}  barrier={barrier} "
          f"({barrier_type})")
    print(f"{'':>4s}{'Method':>25s} {'Vanilla':>10s} {'Barrier':>10s}  "
          f"{'Time':>8s}")
    print(f"{'':>4s}{'-' * 57}")
    print(f"{'':>4s}{'Black-Scholes (const σ)':>25s} "
          f"{fmt(bs_vanilla):>10s} {'—':>10s}  {'—':>8s}")
    print(f"{'':>4s}{'FDM (const σ)':>25s} {fmt(fdm_vanilla):>10s} "
          f"{fmt(fdm_barrier):>10s}  {t_fdm_v + t_fdm_b:>7.3f}s")
    print(f"{'':>4s}{'FDM (local vol)':>25s} {fmt(fdm_lv_vanilla):>10s} "
          f"{'—':>10s}  {t_fdm_lv:>7.3f}s")
    print(f"{'':>4s}{'MC+Milstein (local vol)':>25s} {fmt(mc_vanilla):>10s} "
          f"{fmt(mc_barrier):>10s}  {t_mc:>7.3f}s")
    print(f"{'':>4s}{'Fused kernel (local vol)':>25s} {'—':>10s} "
          f"{fmt(fz_barrier):>10s}  {t_fz:>7.3f}s")
    print(f"\n  MC barrier stderr: {mc_se:.4f} (path matrix) / "
          f"{fz_se:.4f} (fused)  ({n_paths:,} paths, {n_steps} steps)")

    # ── 5. Greeks ─────────────────────────────────────────────────────────
    header("Step 5 — Greeks (FDM Grid vs Bump-and-Reprice)")
    fdm_gk = fd_greeks(opt, CALL)

    def _fdm_pricer(S, K, T, r, q, sigma, kind):
        return fd_price(OptionSpec(S0=S, K=K, T=T, r=r, sigma=sigma, q=q),
                        kind)

    bump_gk = numerical_greeks(_fdm_pricer, S0, K, T, r, q, base_vol, CALL)
    print(f"\n{'Greek':>8s} {'FDM Grid':>12s} {'Bump&Reprice':>14s}")
    print("─" * 36)
    for g in ("delta", "gamma", "theta"):
        print(f"{g:>8s} {fdm_gk[g]:>12.6f} {bump_gk[g]:>14.6f}")
    for g in ("vega", "rho"):
        print(f"{g:>8s} {'—':>12s} {bump_gk[g]:>14.6f}")

    # ── 6. Summary ────────────────────────────────────────────────────────
    header("Step 6 — Summary")
    knockdown = (1 - fdm_barrier / fdm_vanilla) * 100
    lv_adj = fdm_lv_vanilla - fdm_vanilla
    print(f"  Barrier knock-down:       {knockdown:.1f}% "
          f"(barrier {barrier_type} at {barrier})")
    print(f"  Local-vol adjustment:    {lv_adj:+.4f} "
          f"({lv_adj / fdm_vanilla * 100:+.2f}% of vanilla)")
    print(f"  FDM vs MC barrier diff:   {abs(fdm_barrier - mc_barrier):.4f}")
    print(f"  BS vs FDM vanilla diff:   {abs(bs_vanilla - fdm_vanilla):.4f}")
    print()


if __name__ == "__main__":
    main()
