#!/usr/bin/env python3
"""Price/Greeks surfaces over spot × vol — one vectorised kernel call.

Runnable counterpart of reference notebook 02_Visualization.ipynb; saves
PNGs when matplotlib is available, prints summary tables otherwise.
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from optpricer_tpu import CALL, bs_greeks_vec, bs_price_vec

S = np.linspace(60.0, 140.0, 81)
vol = np.linspace(0.1, 0.5, 41)
SS, VV = S[:, None], vol[None, :]

prices = np.asarray(bs_price_vec(SS, 100.0, 1.0, 0.05, 0.0, VV, CALL))
greeks = bs_greeks_vec(SS, 100.0, 1.0, 0.05, 0.0, VV, CALL)

print(f"price grid {prices.shape}: min={prices.min():.4f} "
      f"max={prices.max():.4f}")
print(f"delta range: [{np.asarray(greeks['delta']).min():.4f}, "
      f"{np.asarray(greeks['delta']).max():.4f}]")
print(f"gamma peak at S≈{S[np.asarray(greeks['gamma'])[:, 20].argmax()]:.1f} "
      "(below strike by ~(r+3σ²/2)T in log-spot, as expected)")

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    for ax, (name, Z) in zip(
            axes, [("price", prices),
                   ("delta", np.asarray(greeks["delta"])),
                   ("gamma", np.asarray(greeks["gamma"]))]):
        im = ax.contourf(vol, S, Z, levels=25)
        ax.set_xlabel("vol")
        ax.set_ylabel("spot")
        ax.set_title(name)
        fig.colorbar(im, ax=ax)
    out = Path(__file__).with_suffix(".png")
    plt.tight_layout()
    plt.savefig(out, dpi=120)
    print(f"saved {out}")
except ImportError:
    print("matplotlib not available — skipped plots")
