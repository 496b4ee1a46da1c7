#!/usr/bin/env python3
"""Continuous-limit pricing, cash dividends, arbitrage screens, Bermudans.

Four capabilities past the reference's frontier:

* **Multilevel Monte Carlo** (Giles 2008) — prices the CONTINUOUS-
  monitoring / exact-transition limit at a target RMSE instead of a
  fixed grid's discretisation bias. Coupled coarse/fine paths share
  Brownian increments in one scan per level; barriers ride Brownian-
  bridge survival probabilities, which makes every level exactly
  unbiased under GBM.
* **Closed-form continuous barriers** (Reiner-Rubinstein, all 8 combos)
  — the oracle the MLMC estimator and the in-operator PDE converge to.
* **Discrete cash dividends** — the piecewise-GBM model in BOTH the PDE
  (jump conditions on the marching layer) and the fused MC engine;
  American calls exercise cum-dividend.
* **Static-arbitrage screens** (Gatheral-Jacquier) — butterfly g(k),
  the implied risk-neutral density, and calendar crossing checks over
  fitted SVI surfaces, plus **Bermudan** exercise masks in the LSMC.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from optpricer_tpu import (
    CALL, OptionSpec, SVIParams, VolSurface, arbitrage_report,
    barrier_price_bs, bs_price, check_butterfly, exotic_price_mc,
    fd_price, lsmc_price, mlmc_price, svi_density,
)

S0, K, T, r, sig = 100.0, 100.0, 1.0, 0.05, 0.2
opt = OptionSpec(S0=S0, K=K, T=T, r=r, sigma=sig)

print("=== MLMC: the continuous-monitoring limit at target RMSE ===")
truth = float(barrier_price_bs(S0, K, T, r, sigma=sig, barrier=130.0,
                               barrier_type="up-and-out"))
t0 = time.perf_counter()
px, se, info = mlmc_price("barrier", S0, K, T, r, sigma=sig, eps=5e-3,
                          barrier=130.0, seed=7, return_info=True)
dt_ = time.perf_counter() - t0
print(f"  up-and-out 130 call, eps=5e-3: {px:.4f} ± {se:.1e} "
      f"({dt_:.1f} s)")
print(f"  Reiner-Rubinstein truth:       {truth:.4f}  "
      f"(|err| = {abs(px - truth):.1e})")
print(f"  levels: fine_steps={info['fine_steps']}")
print(f"  paths per level: {info['n']}  (nearly all work on the "
      "coarse grids)")

# a fixed 64-step grid shows the bias MLMC removes
fixed_grid, _ = exotic_price_mc("barrier", S0, K, T, r, sigma=sig,
                                barrier=130.0, n_steps=64,
                                n_paths=1 << 20, seed=7)
print(f"  64-step discrete monitoring:   {fixed_grid:.4f}  "
      f"(+{fixed_grid - truth:.3f} vs continuous — the monitoring bias)")

print()
print("=== Discrete cash dividends (piecewise GBM) ===")
divs = [(0.5, 5.0)]
eu_pde = fd_price(opt, CALL, N_S=400, N_t=400, dividends=divs)
eu_mc, mc_se = exotic_price_mc("vanilla", S0, K, T, r, sigma=sig,
                               n_steps=64, n_paths=1 << 19, seed=3,
                               dividends=divs)
print(f"  call, 5.0 paid at 6m:  PDE {eu_pde:.4f} | MC {eu_mc:.4f} "
      f"± {mc_se:.1e}  (exact quadrature: 7.7740)")
am_div = fd_price(opt, CALL, N_S=400, N_t=400, dividends=[(0.9, 8.0)],
                  american=True)
eu_div = fd_price(opt, CALL, N_S=400, N_t=400, dividends=[(0.9, 8.0)])
print(f"  8.0 paid at 0.9y: American call {am_div:.4f} vs European "
      f"{eu_div:.4f} — exercising cum-dividend is worth "
      f"{am_div - eu_div:.3f}")

print()
print("=== Bermudan exercise masks in the LSMC ===")
kw = dict(n_paths=100_000, n_steps=24, seed=9)
eu = float(bs_price(opt, "put"))
pq, _ = lsmc_price(opt, "put", exercise_dates=[0.25, 0.5, 0.75], **kw)
pm, _ = lsmc_price(opt, "put", exercise_dates=[i / 12 for i in
                                               range(1, 12)], **kw)
pa, _ = lsmc_price(opt, "put", **kw)
print(f"  European put        {eu:.4f}")
print(f"  Bermudan quarterly  {pq:.4f}")
print(f"  Bermudan monthly    {pm:.4f}")
print(f"  American            {pa:.4f}")

print()
print("=== Gatheral-Jacquier static-arbitrage screens ===")
benign = SVIParams(a=0.02, b=0.08, rho=-0.4, m=0.0, sigma=0.3, expiry=0.5)
vogt = SVIParams(a=-0.0410, b=0.1331, rho=0.3060, m=0.3586, sigma=0.4153,
                 expiry=1.0)
for name, p in (("benign fitted smile", benign),
                ("Vogt's counterexample", vogt)):
    rep = check_butterfly(p)
    state = "CLEAN" if rep["ok"] else \
        f"BUTTERFLY ARB (min g = {rep['min_g']:.4f} at k = " \
        f"{rep['k_at_min']:.2f})"
    print(f"  {name:<22} {state}")
k = np.linspace(-6, 6, 20_001)
dens = np.asarray(svi_density(benign, k))
print(f"  benign implied density: ∫p = {np.trapezoid(dens, k):.6f}, "
      f"E[e^k] = {np.trapezoid(np.exp(k) * dens, k):.6f} (martingale)")
good = VolSurface({Te: SVIParams(a=0.02 * Te, b=0.1 * Te, rho=-0.3,
                                 m=0.0, sigma=0.25, expiry=Te)
                   for Te in (0.25, 0.5, 1.0)})
print(f"  full-surface report:    ok = {arbitrage_report(good)['ok']}")
