#!/usr/bin/env python3
"""Analytic American engines: closed(ish) forms next to the oracles.

Three O(1)-per-option engines (``models/american_analytic.py``) against
the package's CRR lattice and LSMC bracket:

* ``bjerksund_stensland_price`` — BS2002 two-step flat exercise boundary,
  pure closed form on Φ and the Genz bivariate normal Φ₂.
* ``baw_price`` — Barone-Adesi-Whaley quadratic approximation (THE desk
  quick quote since 1987).
* ``rgw_price`` — Roll-Geske-Whaley: the EXACT escrowed-model price of
  an American call on a stock paying one cash dividend.

Plus the O(1) de-Americanisation route: ``american_implied_vol`` with
``engine="bs2002"`` inverts a whole listed chain without a lattice.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from optpricer_tpu import (
    CALL, PUT, OptionSpec, american_implied_vol, baw_price,
    bjerksund_stensland_price, bs_price, crr, lsmc_price, rgw_price,
)

S0, T, r, q, sig = 100.0, 1.0, 0.05, 0.03, 0.25

print("=== American put board: approximations vs the CRR oracle ===")
print(f"{'K':>6s} {'CRR-4096':>10s} {'BS2002':>10s} {'BAW':>10s} "
      f"{'Euro':>10s}")
for K in (80.0, 90.0, 100.0, 110.0, 120.0):
    opt = OptionSpec(S0=S0, K=K, T=T, r=r, sigma=sig, q=q)
    ref = crr(opt, PUT, N=4096, american=True)
    v1 = float(bjerksund_stensland_price(S0, K, T, r, q, sigma=sig,
                                         kind="put"))
    v2 = float(baw_price(S0, K, T, r, q, sigma=sig, kind="put"))
    print(f"{K:6.1f} {ref:10.4f} {v1:10.4f} {v2:10.4f} "
          f"{bs_price(opt, PUT):10.4f}")

print("\n=== Throughput: a 2^20-contract American book in one batch ===")
n = 1 << 20
rng = np.random.default_rng(0)
Kb = rng.uniform(60.0, 140.0, n)
Tb = rng.uniform(0.1, 3.0, n)
sb = rng.uniform(0.1, 0.5, n)
book = lambda: np.asarray(bjerksund_stensland_price(
    S0, Kb, Tb, r, q, sigma=sb, kind="put"))
book()                                   # compile
t0 = time.perf_counter()
out = book()
dt = time.perf_counter() - t0
print(f"2^20 BS2002 American puts: {dt*1e3:.1f} ms "
      f"({n/dt:.2e} options/s); mean price {out.mean():.4f}")

print("\n=== American call on a dividend stock (RGW, exact escrowed) ===")
for D in (1.0, 4.0, 8.0):
    v = float(rgw_price(S0, 100.0, T, r, sigma=sig, D=D, t_div=0.5))
    print(f"  D={D:4.1f} at t=0.5 : {v:.4f}")
print("  (larger dividends make exercising just before the drop "
      "increasingly attractive)")

print("\n=== De-Americanisation without a lattice ===")
Ks = np.array([85.0, 95.0, 105.0, 115.0])
true_vols = np.array([0.29, 0.24, 0.21, 0.20])
quotes = np.asarray(bjerksund_stensland_price(S0, Ks, T, r, q,
                                              sigma=true_vols,
                                              kind="put"))
iv = american_implied_vol(quotes, S0, Ks, T, r, q, kind="put",
                          engine="bs2002")
print(f"{'K':>6s} {'quote':>8s} {'true vol':>9s} {'implied':>9s}")
for k, p, tv, v in zip(Ks, quotes, true_vols, iv):
    print(f"{k:6.1f} {p:8.4f} {tv:9.4f} {v:9.4f}")

print("\n=== Where the closed forms sit in the toolbox ===")
opt = OptionSpec(S0=S0, K=110.0, T=2.0, r=r, sigma=0.35, q=q)
br = lsmc_price(opt, PUT, n_paths=100_000, n_steps=50, seed=7,
                bound="both")
lo, lo_se = br["lower"]
up, up_se = br["upper"]
v = float(bjerksund_stensland_price(S0, 110.0, 2.0, r, q, sigma=0.35,
                                    kind="put"))
print(f"LSMC bracket  : [{lo:.4f} ± {lo_se:.4f}, {up:.4f} ± {up_se:.4f}]")
print(f"BS2002        : {v:.4f}  (inside the bracket up to its "
      "documented ~0.1% bias)")
print(f"CRR (N=4096)  : {crr(opt, PUT, N=4096, american=True):.4f}")
