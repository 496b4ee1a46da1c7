#!/usr/bin/env python3
"""Multi-asset pricing: correlated baskets, spreads, and rainbows.

A model family beyond the single-asset reference. The TPU angle:
correlating the scenario shocks is one ``Z @ L.T`` matmul, so the MXU
absorbs the asset dimension — a 100-asset basket costs barely more than
a 2-asset one. Oracles come along for free: the weighted geometric
average of lognormals is lognormal (``geometric_basket_price``, also the
control variate), and Margrabe's exchange-option formula prices the
2-asset spread exactly.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from optpricer_tpu import (
    basket_greeks_mc, basket_price_mc, geometric_basket_price,
    margrabe_price,
)

corr = np.array([[1.0, 0.5], [0.5, 1.0]])
print("=== 60/40 basket on two correlated names (rho = 0.5) ===")
p_cv, se_cv = basket_price_mc([100.0, 95.0], [0.6, 0.4], 100.0, 1.0, 0.03,
                              sigmas=[0.2, 0.3], corr=corr, seed=0)
p0, se0 = basket_price_mc([100.0, 95.0], [0.6, 0.4], 100.0, 1.0, 0.03,
                          sigmas=[0.2, 0.3], corr=corr, seed=0,
                          control_variate=False)
geo = float(geometric_basket_price([100.0, 95.0], [0.6, 0.4], 100.0, 1.0,
                                   0.03, [0.0, 0.0], [0.2, 0.3], corr))
print(f"plain MC           : {p0:.4f} ± {se0:.1e}")
print(f"geometric-CV MC    : {p_cv:.4f} ± {se_cv:.1e} "
      f"({se0 / se_cv:.0f}x tighter)")
print(f"geometric (exact)  : {geo:.4f}  — the CV's closed-form mean")

print("\n=== Exchange option vs Margrabe's closed form ===")
m = float(margrabe_price(100.0, 95.0, 1.0, 0.01, 0.02, sigma1=0.2,
                         sigma2=0.3, rho=0.5))
pm, sem = basket_price_mc([100.0, 95.0], [1.0, -1.0], 0.0, 1.0, 0.03,
                          qs=[0.01, 0.02], sigmas=[0.2, 0.3], corr=corr,
                          payoff="spread", seed=1, n_paths=1 << 20)
print(f"Margrabe: {m:.4f}   MC spread: {pm:.4f} ± {sem:.1e}")

print("\n=== Best-of / worst-of and the price of dispersion ===")
for rho in (0.1, 0.5, 0.9):
    c = np.array([[1.0, rho], [rho, 1.0]])
    mx, _ = basket_price_mc([100.0, 100.0], [0.5, 0.5], 100.0, 1.0, 0.03,
                            sigmas=[0.2, 0.2], corr=c,
                            payoff="rainbow_max", seed=2)
    mn, _ = basket_price_mc([100.0, 100.0], [0.5, 0.5], 100.0, 1.0, 0.03,
                            sigmas=[0.2, 0.2], corr=c,
                            payoff="rainbow_min", seed=2)
    print(f"  rho={rho:.1f}: best-of {mx:.4f}   worst-of {mn:.4f}")

print("\n=== Per-asset Greeks from one run ===")
g = basket_greeks_mc([100.0, 95.0], [0.6, 0.4], 100.0, 1.0, 0.03,
                     sigmas=[0.2, 0.3], corr=corr, seed=3)
for i in range(2):
    print(f"  asset {i+1}: delta {g['delta'][i]:+.4f} "
          f"(±{g['delta_stderr'][i]:.1e})   vega {g['vega'][i]:+.3f} "
          f"(±{g['vega_stderr'][i]:.1e})")

print("\n=== Scale: a 100-asset index basket ===")
a = 100
rng = np.random.default_rng(0)
c100 = 0.3 * np.ones((a, a)) + 0.7 * np.eye(a)
S0s = rng.uniform(50, 150, a)
sig = rng.uniform(0.15, 0.4, a)
kw = dict(sigmas=sig, corr=c100, n_paths=1 << 19)
basket_price_mc(S0s, np.ones(a) / a, float(S0s.mean()), 1.0, 0.03,
                seed=0, **kw)
t0 = time.perf_counter()
p, se = basket_price_mc(S0s, np.ones(a) / a, float(S0s.mean()), 1.0, 0.03,
                        seed=1, **kw)
print(f"100 assets × 2^20 antithetic scenarios: "
      f"{1e3*(time.perf_counter()-t0):.0f} ms, price {p:.4f} ± {se:.1e}")
