#!/usr/bin/env python3
"""Risk + validation: Greeks (bump vs AD), VaR/CVaR, cross-validation,
convergence, stress cube, delta-hedge backtest.

Runnable counterpart of reference notebook 07_Risk_and_Validation.ipynb.
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from optpricer_tpu import (
    CALL, PUT, OptionSpec, backtest_delta_hedge, bs_price_vec,
    convergence_analysis, cross_validate, cvar_historical, numerical_greeks,
    portfolio_risk, stress_test, var_historical,
)
from optpricer_tpu.models.processes import gbm_paths
from optpricer_tpu.ops.black_scholes import price_core
from optpricer_tpu.risk import ad_greeks

opt = OptionSpec(S0=100.0, K=100.0, T=1.0, r=0.05, sigma=0.2)
bs = lambda S, K, T, r, q, s, kind: float(bs_price_vec(S, K, T, r, q, s, kind))

print("=== Greeks: bump-and-reprice vs automatic differentiation ===")
gb = numerical_greeks(bs, 100, 100, 1.0, 0.05, 0.0, 0.2, CALL)
ga = ad_greeks(price_core, 100.0, 100.0, 1.0, 0.05, 0.0, 0.2, CALL)
print(f"{'greek':>6s} {'bump':>12s} {'AD (exact)':>12s}")
for k in gb:
    print(f"{k:>6s} {gb[k]:>12.6f} {ga[k]:>12.6f}")

print("\n=== Portfolio risk (long call, short 2 puts) ===")
book = [
    dict(S=100.0, K=100.0, T=1.0, r=0.05, q=0.0, sigma=0.2, kind=CALL,
         position=1.0),
    dict(S=100.0, K=95.0, T=0.5, r=0.05, q=0.0, sigma=0.25, kind=PUT,
         position=-2.0),
]
pr = portfolio_risk(book, bs)
print(f"  ΣΔ={pr['total_delta']:+.4f}  ΣΓ={pr['total_gamma']:+.4f}  "
      f"Σvega={pr['total_vega']:+.4f}  value={pr['total_value']:+.4f}")

print("\n=== Historical VaR / CVaR ===")
rets = np.random.default_rng(1).normal(0.0005, 0.012, 2500)
print(f"  99% 1d VaR : {var_historical(rets, 0.99):.4%}")
print(f"  99% 1d CVaR: {cvar_historical(rets, 0.99):.4%}")

print("\n=== Cross-model validation ===")
cv = cross_validate(opt, CALL)
for k in ("bs", "tree", "fdm", "fem"):
    print(f"  {k:>5s}: {cv[k]:.6f}")
print(f"  mc   : {cv['mc'][0]:.6f} ± {cv['mc'][1]:.2e}")
print(f"  max discrepancy vs BS: {cv['max_discrepancy']:.2e}")

print("\n=== Convergence order (CRR tree) ===")
ca = convergence_analysis(opt, CALL, "tree", "N", [50, 100, 200, 400, 800])
print(f"  estimated order: {ca['order']:.2f}")

print("\n=== Stress cube (spot × vol × rate) ===")
cube = stress_test(opt, CALL, np.array([0.8, 1.0, 1.2]),
                   np.array([-0.05, 0.0, 0.05]), np.array([-0.01, 0.0, 0.01]))
print(f"  shape {cube.shape}; base {cube[1, 1, 1]:.4f}; "
      f"worst {cube.min():.4f}; best {cube.max():.4f}")

print("\n=== Delta-hedge backtest (daily rebalancing) ===")
paths = gbm_paths(100.0, 0.05, 0.0, 0.2, 1.0, 252, 2000, seed=11)
bt = backtest_delta_hedge(opt, CALL, paths, rebalance_freq=1)
print(f"  mean P&L {bt['mean_pnl']:+.4f}  σ(P&L) {bt['std_pnl']:.4f}  "
      f"worst {bt['max_drawdown']:+.4f}")
