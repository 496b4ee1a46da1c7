#!/usr/bin/env python3
"""Round-3 engines: LSV dynamics, American bias brackets, basket exotics.

Three capabilities past the reference's frontier, built from parts the
framework already had:

* **LSV** — Heston dynamics under a Dupire leverage function, calibrated
  by the particle method in ONE compiled ``lax.scan`` (binned conditional
  expectation via ``segment_sum`` on a fixed grid — no resampling, no
  host round-trips). Gyongy's theorem says the calibrated model must
  reprice the vanilla surface; that check is printed below.
* **LSMC bias bracket** — the Longstaff-Schwartz price is biased by
  in-sample regression; ``bound="both"`` returns a (lower, upper)
  bracket: two-pass out-of-sample pricing + the Andersen-Broadie dual.
* **Path-dependent baskets** — Asian baskets and worst-of barriers with
  the per-step correlation as an MXU matmul inside the scan.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from optpricer_tpu import (
    CALL, OptionSpec, SVIParams, VolSurface, basket_exotic_mc, cev_price,
    crr, lsmc_price, lsv_calibrate, lsv_greeks_mc, lsv_price_mc,
)
from optpricer_tpu.ops.black_scholes import bs_price_vec

S0, r = 100.0, 0.03

# --- an SVI smile surface to calibrate against ---------------------------
slices = {T: SVIParams(a=0.03 * T, b=0.12 * T, rho=-0.4, m=0.0,
                       sigma=0.25, expiry=T) for T in (0.25, 0.5, 1.0)}
surface = VolSurface(slices, forward_curve={T: S0 * np.exp(r * T)
                                            for T in slices})

print("=== LSV: Heston x Dupire leverage (particle calibration) ===")
heston = dict(v0=0.04, kappa=1.5, theta=0.04, xi=0.5, rho=-0.6)
t0 = time.time()
model = lsv_calibrate(surface, heston, S0, r, T=1.0, n_steps=48,
                      n_paths=32_768, n_bins=96, seed=0)
print(f"calibrated {model.leverage.shape} leverage table "
      f"in {time.time() - t0:.1f}s")
F = S0 * np.exp(r * 1.0)
for K in (85.0, 100.0, 115.0):
    iv = float(np.asarray(surface.iv_from_logm(np.log(K / F), 1.0)))
    target = float(np.asarray(bs_price_vec(S0, K, 1.0, r, 0.0, iv, "call")))
    px, se = lsv_price_mc("vanilla", model, K, n_paths=262_144, seed=7)
    print(f"  K={K:5.1f}: LSV {px:7.4f} ± {se:.4f} | surface {target:7.4f}"
          f"  (Gyongy repricing check)")
uo, se = lsv_price_mc("barrier", model, 100.0, barrier=130.0,
                      barrier_type="up-and-out", n_paths=262_144, seed=7)
print(f"  up-and-out 130 barrier under LSV: {uo:.4f} ± {se:.4f}"
      f"  (smile-consistent AND stochastic-vol-consistent)")

print("\n=== American put: LSMC bracket vs converged CRR ===")
opt = OptionSpec(S0=S0, K=110.0, T=1.0, r=0.05, sigma=0.25)
crr_ref = crr(opt, "put", N=2000, american=True)
br = lsmc_price(opt, "put", n_paths=100_000, n_steps=50, seed=1,
                bound="both")
lo, lo_se = br["lower"]
up, up_se = br["upper"]
print(f"two-pass lower bound : {lo:.4f} ± {lo_se:.4f}")
print(f"Andersen-Broadie dual: {up:.4f} ± {up_se:.4f}")
print(f"gap {br['gap']:.4f} ({100 * br['gap'] / lo:.2f}%); "
      f"CRR N=2000 reference {crr_ref:.4f} inside the bracket: "
      f"{lo - 3 * lo_se <= crr_ref <= up + 3 * up_se}")

print("\n=== Path-dependent multi-asset ===")
a = 5
corr = 0.4 * np.ones((a, a)) + 0.6 * np.eye(a)
S0s = np.array([95.0, 100.0, 102.0, 98.0, 105.0])
sig = np.array([0.18, 0.22, 0.25, 0.2, 0.3])
w = np.ones(a) / a
asian, se = basket_exotic_mc(S0s, w, 100.0, 1.0, r, sigmas=sig, corr=corr,
                             payoff="asian_basket", n_steps=64,
                             n_paths=131_072, seed=3)
print(f"5-asset Asian basket   : {asian:.4f} ± {se:.4f}")
wo, se = basket_exotic_mc(S0s, w, 100.0, 1.0, r, sigmas=sig, corr=corr,
                          payoff="worstof_barrier", barrier=80.0,
                          barrier_type="down-and-out", n_steps=64,
                          n_paths=131_072, seed=3)
print(f"worst-of down-and-out  : {wo:.4f} ± {se:.4f}")
import jax

if jax.default_backend() == "tpu":
    # the in-register kernel holds one path tile per asset; auto-selected
    # on TPU for f32 books of <=16 assets (backend="pallas" to force)
    kp, kse = basket_exotic_mc(S0s, w, 100.0, 1.0, r, sigmas=sig,
                               corr=corr, payoff="asian_basket",
                               n_steps=64, n_paths=131_072, seed=3,
                               dtype="float32", backend="pallas")
    print(f"  (Pallas kernel        : {kp:.4f} ± {kse:.4f})")

print("\n=== LSV Greeks: one AD pass, sticky leverage ===")
g = lsv_greeks_mc("vanilla", model, 100.0, n_paths=131_072, seed=9)
print(f"price {g['price']:.4f} ± {g['stderr']:.4f}")
print(f"delta {g['delta']:+.4f}  rho {g['rho']:+.4f}  theta {g['theta']:+.4f}")
print(f"dV/dv0 {g['d_v0']:+.2f}  dV/dxi {g['d_xi']:+.4f}  "
      f"dV/drho {g['d_rho']:+.4f}   (Heston params under frozen leverage)")

print("\n=== CEV closed form: the SABR-backbone oracle ===")
# sigma is the CEV scale (units S^{1-beta}); 25% LN-equivalent vol at S0
beta = 0.5
sig_cev = 0.25 * S0 ** (1.0 - beta)
for K in (90.0, 100.0, 110.0):
    c = float(cev_price(S0, K, 1.0, r, 0.0, sigma=sig_cev, beta=beta))
    print(f"  K={K:5.1f}: CEV call {c:7.4f}"
          f"   (noncentral-chi-square, absorbing boundary)")
