#!/usr/bin/env python3
"""TPU kernel tour: fused terminal MC, path engine, book pricing, Dupire.

Beyond-the-reference capabilities — everything here runs in Pallas kernels
on TPU (XLA fallbacks elsewhere, so the script is CPU-safe).
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

from optpricer_tpu import (  # noqa: E402
    CALL, OptionSpec, SVIParams, VolSurface, euro_greeks_mc, euro_price_mc,
    exotic_price_mc, exotic_price_mc_dupire,
)

on_tpu = jax.default_backend() == "tpu"
scale = 1 if on_tpu else 64  # shrink workloads off-TPU
print(f"backend: {jax.default_backend()}")

# ── fused terminal MC: price + pathwise Greeks from one stats pass ────────
opt = OptionSpec(S0=100.0, K=110.0, T=1.0, r=0.03, sigma=0.2)
n = (1 << 28) // scale
euro_price_mc(opt, CALL, n_paths=n, seed=1)  # compile
t0 = time.perf_counter()
px, se = euro_price_mc(opt, CALL, n_paths=n, seed=1)
dt = time.perf_counter() - t0
print(f"\nterminal MC {2*n:.1e} eff paths: {dt*1e3:.0f} ms "
      f"→ {2*n/dt:.2e} paths/s   price={px:.6f} ± {se:.1e}")
g = euro_greeks_mc(opt, CALL, n_paths=n, seed=1)
print(f"pathwise greeks (same draws): delta={g['delta']:.5f} "
      f"digital={g['digital']:.5f}")

# ── fused path engine: Asian without a path matrix ───────────────────────
na = 1_000_000 // scale
exotic_price_mc("asian", 100.0, 100.0, 1.0, 0.03, sigma=0.2, n_steps=252,
                n_paths=na, seed=2)
t0 = time.perf_counter()
apx, ase = exotic_price_mc("asian", 100.0, 100.0, 1.0, 0.03, sigma=0.2,
                           n_steps=252, n_paths=na, seed=2)
print(f"\nasian {na:,}×252 fused: {(time.perf_counter()-t0)*1e3:.0f} ms  "
      f"price={apx:.4f} ± {ase:.1e}")

# ── Heston in-kernel ──────────────────────────────────────────────────────
hp = dict(v0=0.04, kappa=1.5, theta=0.04, xi=0.3, rho=-0.5)
hpx, hse = exotic_price_mc("barrier", 100.0, 100.0, 1.0, 0.05, heston=hp,
                           barrier=130.0, barrier_type="up-and-out",
                           n_steps=100, n_paths=200_000 // scale, seed=3)
print(f"heston up-and-out barrier: {hpx:.4f} ± {hse:.1e}")

# ── Dupire local vol with the surface evaluated inside the kernel ────────
slices = {T: SVIParams(a=0.02 * T + 0.02, b=0.15, rho=-0.3, m=0.02,
                       sigma=0.12, expiry=T) for T in (0.25, 0.5, 1.0)}
surf = VolSurface(slices, forward_curve={T: 100 * np.exp(0.03 * T)
                                         for T in slices})
lpx, lse = exotic_price_mc_dupire("barrier", surf, 100.0, 100.0, 1.0, 0.05,
                                  0.02, scheme="milstein", barrier=130.0,
                                  barrier_type="up-and-out", n_steps=100,
                                  n_paths=200_000 // scale, seed=4)
print(f"dupire milstein barrier:   {lpx:.4f} ± {lse:.1e}")

# ── heterogeneous book in one kernel (TPU only) ───────────────────────────
if on_tpu:
    from optpricer_tpu.ops.pallas_mc_batch import euro_price_mc_batch

    rng = np.random.default_rng(0)
    B = 256
    px_b, se_b = euro_price_mc_batch(
        rng.uniform(80, 120, B), rng.uniform(70, 140, B),
        rng.uniform(0.1, 2.0, B), rng.uniform(0.0, 0.06, B),
        rng.uniform(0.0, 0.03, B), rng.uniform(0.1, 0.5, B),
        np.where(rng.uniform(size=B) > 0.5, "call", "put"),
        n_paths=1 << 22, seed=5)
    print(f"\nheterogeneous book of {B}: mean px {px_b.mean():.3f}, "
          f"max se {se_b.max():.1e} (one kernel)")
else:
    print("\n(heterogeneous book kernel requires TPU — skipped)")
