#!/usr/bin/env python3
"""Dupire local volatility: surface → σ(S,t) → consistent repricing.

Runnable counterpart of reference notebook 06_Dupire_Local_Vol.ipynb.
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from optpricer_tpu import (
    CALL, OptionSpec, bs_price, dupire_local_vol_func, fd_price_local_vol,
    fit_svi_surface,
)
from optpricer_tpu.models.exotics import barrier_price
from optpricer_tpu.models.mc_fused import exotic_price_mc
from optpricer_tpu.models.processes import milstein_local_vol_paths

S0, r, q = 100.0, 0.05, 0.02
expiries = [0.25, 0.5, 1.0]
forwards = {T: S0 * np.exp((r - q) * T) for T in expiries}
strikes, ivs = {}, {}
for T in expiries:
    F = forwards[T]
    K = np.linspace(0.8 * F, 1.2 * F, 17)
    k = np.log(K / F)
    strikes[T] = K
    ivs[T] = 0.2 + 0.06 * k**2 - 0.025 * k + 0.01 * np.sqrt(T)

surface = fit_svi_surface(strikes, forwards, ivs)
sigma_loc = dupire_local_vol_func(surface, r=r, q=q)

print("=== Dupire σ(S,t) probes ===")
print(f"{'S':>8s} {'t':>6s} {'σ_loc':>9s}")
for S in (85.0, 100.0, 115.0):
    for t in (0.1, 0.5, 0.9):
        lv = float(np.asarray(sigma_loc(np.array([S]), t))[0])
        print(f"{S:>8.1f} {t:>6.2f} {lv:>9.4f}")

print("\n=== Pricing under local vol ===")
fd_lv = fd_price_local_vol(S0, 100.0, 1.0, r, q, sigma_loc, CALL,
                           N_S=300, N_t=300)
bs_flat = bs_price(OptionSpec(S0, 100.0, 1.0, r, 0.2, q), CALL)
print(f"FDM local-vol vanilla : {fd_lv:.4f}   (flat-σ BS {bs_flat:.4f})")

# Milstein MC, path-matrix mode (reference protocol)
paths = milstein_local_vol_paths(S0, r, q, 1.0, 200, 50_000, sigma_loc,
                                 seed=42)
mc_b, mc_se = barrier_price(paths, 100.0, r, 1.0, CALL, 130.0, "up-and-out")
print(f"Milstein MC barrier   : {mc_b:.4f} ± {mc_se:.4f} (path matrix)")

# Fused mode (no path matrix in memory)
fz_b, fz_se = exotic_price_mc("barrier", S0, 100.0, 1.0, r, q,
                              sigma_loc=sigma_loc, scheme="milstein",
                              barrier=130.0, barrier_type="up-and-out",
                              n_steps=200, n_paths=50_000, seed=43)
print(f"Fused MC barrier      : {fz_b:.4f} ± {fz_se:.4f} (O(paths) memory)")
