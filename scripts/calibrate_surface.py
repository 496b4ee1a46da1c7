#!/usr/bin/env python3
"""SVI surface calibration: market IV quotes in, fitted slice params out.

Contract parity with reference ``scripts/calibrate_surface.py``: reads a CSV
with columns ``expiry,strike,forward,iv``, writes JSON mapping each expiry
(as a string key) to ``{a, b, rho, m, sigma, rmse}``, and optionally renders
a market-vs-fit smile panel. The solver underneath is the repo's jitted
Levenberg-Marquardt (``models/calibration._lm_fit``); when every expiry
quotes the same number of strikes, all slices fit in ONE batched (vmapped)
LM call instead of a Python loop per expiry.

    python scripts/calibrate_surface.py --input quotes.csv --output fit.json
    python scripts/calibrate_surface.py ... --plot smile.png
"""
from __future__ import annotations

import argparse
import csv
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from optpricer_tpu.models.calibration import (  # noqa: E402
    SVIParams, fit_svi, fit_svi_surface,
)


def load_quote_grid(path):
    """Parse the quote CSV into per-expiry arrays.

    Returns three dicts keyed by expiry (float, ascending): strike arrays,
    forwards (last quoted forward wins, as in the reference), and IV arrays.
    """
    rows = list(csv.DictReader(open(path, newline="")))
    expiries = sorted({float(r["expiry"]) for r in rows})
    strikes, forwards, ivs = {}, {}, {}
    for T in expiries:
        mine = [r for r in rows if float(r["expiry"]) == T]
        strikes[T] = np.array([float(r["strike"]) for r in mine])
        ivs[T] = np.array([float(r["iv"]) for r in mine])
        forwards[T] = float(mine[-1]["forward"])
    return strikes, forwards, ivs


def fit_all_slices(strikes, forwards, ivs):
    """Fit every expiry; one batched LM when the strike grids are uniform."""
    sizes = {len(v) for v in strikes.values()}
    if len(sizes) == 1 and len(strikes) > 1:
        return fit_svi_surface(strikes, forwards, ivs).slices
    return {T: fit_svi(strikes[T], forwards[T], T, ivs[T]) for T in strikes}


def slice_report(svi: SVIParams, strikes, forward, market_iv) -> dict:
    k = np.log(strikes / forward)
    resid = np.asarray(svi.iv(k)) - market_iv
    return {"a": svi.a, "b": svi.b, "rho": svi.rho, "m": svi.m,
            "sigma": svi.sigma,
            "rmse": float(np.sqrt(np.mean(resid * resid)))}


def render_smiles(path, fits, strikes, forwards, ivs):
    """One panel per expiry: market dots + fitted smile curve."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib not installed — skipping plot.")
        return

    expiries = sorted(fits)
    fig, axes = plt.subplots(1, len(expiries), squeeze=False,
                             figsize=(5 * len(expiries), 4))
    for ax, T in zip(axes.ravel(), expiries):
        k_obs = np.log(strikes[T] / forwards[T])
        span = np.linspace(k_obs.min() - 0.1, k_obs.max() + 0.1, 200)
        ax.plot(k_obs, ivs[T], "o", markersize=4, label="Market")
        ax.plot(span, np.asarray(fits[T].iv(span)), "-", label="SVI fit")
        ax.set(title=f"T = {T}", xlabel="log-moneyness k",
               ylabel="Implied Vol")
        ax.legend()
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    print(f"Plot saved to {path}")


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Fit SVI volatility surface to market IV data.")
    ap.add_argument("--input", required=True, help="market data CSV")
    ap.add_argument("--output", required=True, help="output JSON")
    ap.add_argument("--plot", default=None, help="save smile plot PNG")
    ns = ap.parse_args(argv)

    strikes, forwards, ivs = load_quote_grid(ns.input)
    total = sum(map(len, strikes.values()))
    print(f"Loaded {total} quotes across {len(strikes)} expiries.")

    fits = fit_all_slices(strikes, forwards, ivs)
    report = {}
    for T in sorted(fits):
        rep = slice_report(fits[T], strikes[T], forwards[T], ivs[T])
        report[str(T)] = rep
        print("  T={:.4f}: a={a:.4f} b={b:.4f} rho={rho:.4f} m={m:.4f} "
              "sig={sigma:.4f} RMSE={rmse:.6f}".format(T, **rep))

    Path(ns.output).write_text(json.dumps(report, indent=2))
    print(f"\nFitted params written to {ns.output}")

    if ns.plot:
        render_smiles(ns.plot, fits, strikes, forwards, ivs)


if __name__ == "__main__":
    main()
