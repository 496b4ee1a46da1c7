#!/usr/bin/env python3
"""FDM θ-scheme tour: schemes, convergence, barriers, Greeks, ladders.

Runnable counterpart of reference notebook 04_PDE_Finite_Difference.ipynb.
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from optpricer_tpu import (
    CALL, PUT, OptionSpec, bs_price, fd_greeks, fd_price, fd_price_barrier,
)
from optpricer_tpu.models.pde import fd_price_batch

opt = OptionSpec(S0=100.0, K=100.0, T=1.0, r=0.05, sigma=0.2)
ref = bs_price(opt, CALL)

print("=== θ-scheme variants (400² grid) ===")
for name, th in (("explicit-ish θ=0.3", 0.3), ("Crank-Nicolson", 0.5),
                 ("implicit", 1.0)):
    px = fd_price(opt, CALL, N_S=400, N_t=400, theta=th)
    print(f"  {name:<18s}: {px:.6f}  (err {px - ref:+.2e})")

print("\n=== Convergence ===")
for n in (50, 100, 200, 400):
    px = fd_price(opt, CALL, N_S=n, N_t=n)
    print(f"  {n:>4d}²: err {abs(px - ref):.2e}")

print("\n=== Barriers (knock-in/out parity) ===")
out_px = fd_price_barrier(opt, CALL, 130.0, "up-and-out", N_S=400, N_t=400)
in_px = fd_price_barrier(opt, CALL, 130.0, "up-and-in", N_S=400, N_t=400)
vanilla = fd_price(opt, CALL, N_S=400, N_t=400)
print(f"  up-and-out {out_px:.4f} + up-and-in {in_px:.4f} "
      f"= {out_px + in_px:.4f}  (vanilla {vanilla:.4f})")

print("\n=== Grid Greeks ===")
print(" ", fd_greeks(opt, CALL, N_S=400, N_t=400))

print("\n=== 1024-strike American ladder (one propagator, one scan) ===")
Ks = np.linspace(50, 150, 1024)
t0 = time.perf_counter()
px = np.asarray(fd_price_batch(100.0, Ks, 1.0, 0.05, 0.0, 0.2, PUT,
                               N_S=512, N_t=512, american=True))
print(f"  {len(Ks)} options in {time.perf_counter() - t0:.2f}s "
      f"(includes compile); ATM ≈ {px[np.abs(Ks - 100).argmin()]:.4f}")
