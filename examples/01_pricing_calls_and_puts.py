#!/usr/bin/env python3
"""Pricing calls and puts — closed form, lattice, Monte Carlo, PDE, FEM.

Runnable counterpart of reference notebook 01_Pricing_Calls_and_Puts.ipynb.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from optpricer_tpu import (
    CALL, PUT, OptionSpec, bs_greeks, bs_price, crr, euro_price_mc,
    fd_price, fem_price, implied_vol,
)

opt = OptionSpec(S0=100.0, K=100.0, T=1.0, r=0.05, sigma=0.2)

print("=== European call, S0=100 K=100 T=1y r=5% σ=20% ===")
print(f"Black-Scholes : {bs_price(opt, CALL):.6f}")
print(f"CRR (N=1000)  : {crr(opt, CALL, N=1000):.6f}")
px, se = euro_price_mc(opt, CALL, n_paths=1_000_000, seed=42)
print(f"Monte Carlo   : {px:.6f}  (stderr {se:.2e})")
print(f"FDM CN 400²   : {fd_price(opt, CALL, N_S=400, N_t=400):.6f}")
print(f"FEM 400²      : {fem_price(opt, CALL, N_S=400, N_t=400):.6f}")

print("\n=== Put + American premium ===")
print(f"European put  : {bs_price(opt, PUT):.6f}")
print(f"American put (CRR)  : {crr(opt, PUT, N=1000, american=True):.6f}")
print(f"American put (PSOR) : "
      f"{fd_price(opt, PUT, N_S=400, N_t=400, american=True, american_method='psor'):.6f}")

print("\n=== Greeks and implied vol ===")
g = bs_greeks(opt, CALL)
for k, v in g.items():
    print(f"  {k:>6s}: {v:+.6f}")
target = bs_price(opt, CALL)
print(f"implied_vol(price={target:.4f}) = {implied_vol(opt, target, CALL):.6f}")
