#!/usr/bin/env python3
"""SVI smile calibration and implied-vol extraction.

Runnable counterpart of reference notebook 03_Volatility_Smile.ipynb.
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from optpricer_tpu import (
    CALL, SVIParams, bs_implied_vol_vec, bs_price_vec, fit_svi,
)

# Synthetic market: generate prices from a skewed SVI smile, recover IVs,
# then calibrate SVI to the recovered smile.
F, T = 100.0, 0.5
true = SVIParams(a=0.02, b=0.25, rho=-0.35, m=0.02, sigma=0.15, expiry=T)
K = np.linspace(75, 130, 23)
k = np.log(K / F)
iv_true = np.asarray(true.iv(k))

# Quote OTM options (calls above the forward, puts below) — the desk
# convention, and where Newton-on-vega is well conditioned. Deep-ITM
# options have tiny vega and their IV inversion is ill-posed.
kinds = np.where(K >= F, "call", "put")
prices = np.asarray(bs_price_vec(F, K, T, 0.0, 0.0, iv_true, kinds))
iv_rec = np.asarray(bs_implied_vol_vec(F, K, T, 0.0, 0.0, prices, kinds))
print(f"IV recovery max err: {np.abs(iv_rec - iv_true).max():.2e}")

fit = fit_svi(K, forward=F, expiry=T, market_ivs=iv_rec)
iv_fit = np.asarray(fit.iv(k))
rmse = float(np.sqrt(np.mean((iv_fit - iv_true) ** 2)))
print(f"SVI fit: a={fit.a:.4f} b={fit.b:.4f} rho={fit.rho:+.4f} "
      f"m={fit.m:+.4f} sigma={fit.sigma:.4f}")
print(f"fit RMSE vs true smile: {rmse:.2e}")
print(f"\n{'K':>8s} {'true IV':>9s} {'fit IV':>9s}")
for i in range(0, len(K), 4):
    print(f"{K[i]:>8.1f} {iv_true[i]:>9.4f} {iv_fit[i]:>9.4f}")
