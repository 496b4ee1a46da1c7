#!/usr/bin/env python3
"""FEM Galerkin solver vs FDM and the closed form.

Runnable counterpart of reference notebook 05_Finite_Element_Method.ipynb.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from optpricer_tpu import CALL, PUT, OptionSpec, bs_price, fd_price, fem_price

opt = OptionSpec(S0=100.0, K=100.0, T=1.0, r=0.05, sigma=0.2)
ref_c = bs_price(opt, CALL)
ref_p = bs_price(opt, PUT)

print("=== FEM vs FDM vs BS (call) ===")
for n in (100, 200, 400):
    fe = fem_price(opt, CALL, N_S=n, N_t=n)
    fd = fd_price(opt, CALL, N_S=n, N_t=n)
    print(f"  {n:>4d}²: FEM {fe:.6f} (err {fe - ref_c:+.2e})   "
          f"FDM {fd:.6f} (err {fd - ref_c:+.2e})")

print("\n=== Put ===")
fe = fem_price(opt, PUT, N_S=400, N_t=400)
print(f"  FEM {fe:.6f}  BS {ref_p:.6f}  err {fe - ref_p:+.2e}")

print("\nNote: FEM uses the consistent mass matrix (2h/3, h/6) with "
      "diffusion + skew convection + reaction stiffness, θ stepping, and "
      "the same dense-propagator redesign as the FDM solver.")
