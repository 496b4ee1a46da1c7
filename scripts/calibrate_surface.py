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


def render_smiles(path, fits, strikes, forwards, ivs, *, model_iv=None,
                  label="SVI fit"):
    """One panel per expiry: market dots + fitted smile curve.

    ``fits`` holds per-expiry SVIParams, or pass ``model_iv(T, F, k)`` for
    a global model (Heston).
    """
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib not installed — skipping plot.")
        return

    expiries = sorted(strikes)
    fig, axes = plt.subplots(1, len(expiries), squeeze=False,
                             figsize=(5 * len(expiries), 4))
    for ax, T in zip(axes.ravel(), expiries):
        k_obs = np.log(strikes[T] / forwards[T])
        span = np.linspace(k_obs.min() - 0.1, k_obs.max() + 0.1, 200)
        if model_iv is not None:
            curve = model_iv(T, forwards[T], span)
        else:
            curve = np.asarray(fits[T].iv(span))
        ax.plot(k_obs, ivs[T], "o", markersize=4, label="Market")
        ax.plot(span, curve, "-", label=label)
        ax.set(title=f"T = {T}", xlabel="log-moneyness k",
               ylabel="Implied Vol")
        ax.legend()
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    print(f"Plot saved to {path}")


def spot_and_carry(forwards, rate):
    """(S0, q) from the forward curve: ln F(T) = ln S0 + (r−q)·T.

    Least-squares over the quoted expiries; a single expiry gets c = 0
    (S0 = F) — document your own carry if that matters.
    """
    Ts = np.array(sorted(forwards))
    lnF = np.log([forwards[T] for T in Ts])
    if len(Ts) < 2:
        return float(np.exp(lnF[0])), rate
    c, ln_s0 = np.polyfit(Ts, lnF, 1)
    return float(np.exp(ln_s0)), rate - float(c)


def fit_heston_surface(strikes, forwards, ivs, rate):
    """One global Heston fit across every quoted expiry."""
    from optpricer_tpu import fit_heston

    S0, q = spot_and_carry(forwards, rate)
    Ks = np.concatenate([strikes[T] for T in sorted(strikes)])
    Ts = np.concatenate([np.full(len(strikes[T]), T)
                         for T in sorted(strikes)])
    vols = np.concatenate([ivs[T] for T in sorted(strikes)])
    fit = fit_heston(Ks, Ts, vols, S0, rate, q)
    return fit, S0, q


def fit_vg_surface(strikes, forwards, ivs, rate):
    """One global Variance-Gamma fit across every quoted expiry."""
    from optpricer_tpu import fit_vg

    S0, q = spot_and_carry(forwards, rate)
    Ks = np.concatenate([strikes[T] for T in sorted(strikes)])
    Ts = np.concatenate([np.full(len(strikes[T]), T)
                         for T in sorted(strikes)])
    vols = np.concatenate([ivs[T] for T in sorted(strikes)])
    fit = fit_vg(Ks, Ts, vols, S0, rate, q)
    return fit, S0, q


def vg_model_iv(fit, S0, rate, q):
    """Per-expiry smile function k -> implied vol from the fitted VG."""
    from optpricer_tpu import bs_implied_vol_vec, vg_price_cos

    def iv_curve(T, forward, k):
        K = forward * np.exp(np.asarray(k))
        px = np.asarray(vg_price_cos(
            S0, K, T, rate, q, sigma=fit["sigma"], theta=fit["theta"],
            nu=fit["nu"]))
        return np.asarray(bs_implied_vol_vec(
            S0, K, np.full_like(K, T), rate, q, px, "call"))

    return iv_curve


def heston_model_iv(fit, S0, rate, q):
    """Per-expiry smile function k ↦ implied vol from the fitted model."""
    from optpricer_tpu import bs_implied_vol_vec, heston_price_cos

    def iv_curve(T, forward, k):
        K = forward * np.exp(np.asarray(k))
        px = np.asarray(heston_price_cos(
            S0, K, T, rate, q, v0=fit["v0"], kappa=fit["kappa"],
            theta=fit["theta"], xi=fit["xi"], rho=fit["rho"]))
        return np.asarray(bs_implied_vol_vec(
            S0, K, np.full_like(K, T), rate, q, px, "call"))

    return iv_curve


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Fit a volatility surface to market IV data.")
    ap.add_argument("--input", required=True, help="market data CSV")
    ap.add_argument("--output", required=True, help="output JSON")
    ap.add_argument("--plot", default=None, help="save smile plot PNG")
    ap.add_argument("--model", default="svi",
                    choices=("svi", "heston", "essvi", "vg"),
                    help="svi: per-slice raw SVI (reference contract); "
                         "heston: one global (v0,kappa,theta,xi,rho) via "
                         "LM through the COS transform; essvi: one "
                         "global arbitrage-free-by-construction surface "
                         "(slices exported as raw SVI)")
    ap.add_argument("--rate", type=float, default=0.0,
                    help="risk-free rate for the heston model (the carry "
                         "r−q is inferred from the forward curve)")
    ns = ap.parse_args(argv)

    strikes, forwards, ivs = load_quote_grid(ns.input)
    total = sum(map(len, strikes.values()))
    print(f"Loaded {total} quotes across {len(strikes)} expiries.")

    if ns.model == "heston":
        fit, S0, q = fit_heston_surface(strikes, forwards, ivs, ns.rate)
        print("  Heston: v0={v0:.4f} kappa={kappa:.4f} theta={theta:.4f} "
              "xi={xi:.4f} rho={rho:.4f} RMSE={rmse:.6f}".format(**fit))
        report = dict(model="heston", S0=S0, r=ns.rate, q=q, **fit)
        Path(ns.output).write_text(json.dumps(report, indent=2))
        print(f"\nFitted params written to {ns.output}")
        if ns.plot:
            render_smiles(ns.plot, None, strikes, forwards, ivs,
                          model_iv=heston_model_iv(fit, S0, ns.rate, q),
                          label="Heston fit")
        return

    if ns.model == "vg":
        fit, S0, q = fit_vg_surface(strikes, forwards, ivs, ns.rate)
        print("  VG: sigma={sigma:.4f} theta={theta:.4f} nu={nu:.4f} "
              "RMSE={rmse:.6f}".format(**fit))
        report = dict(model="vg", S0=S0, r=ns.rate, q=q, **fit)
        Path(ns.output).write_text(json.dumps(report, indent=2))
        print(f"\nFitted params written to {ns.output}")
        if ns.plot:
            render_smiles(ns.plot, None, strikes, forwards, ivs,
                          model_iv=vg_model_iv(fit, S0, ns.rate, q),
                          label="VG fit")
        return

    if ns.model == "essvi":
        from optpricer_tpu import fit_essvi

        surface, info = fit_essvi(strikes, forwards, ivs)
        fits = surface.slices
        print("  eSSVI: rho={rho:.4f} eta={eta:.4f} gamma={gamma:.4f} "
              "RMSE_w={rmse_w:.2e}".format(**info))
        print("  theta:", " ".join(f"{t:.5f}" for t in info["theta"]))
    else:
        fits = fit_all_slices(strikes, forwards, ivs)
    report = {}
    for T in sorted(fits):
        rep = slice_report(fits[T], strikes[T], forwards[T], ivs[T])
        report[str(T)] = rep
        print("  T={:.4f}: a={a:.4f} b={b:.4f} rho={rho:.4f} m={m:.4f} "
              "sig={sigma:.4f} RMSE={rmse:.6f}".format(T, **rep))

    Path(ns.output).write_text(json.dumps(report, indent=2))
    print(f"\nFitted params written to {ns.output}")

    # static-arbitrage screen: a least-squares fit to noisy quotes can
    # embed butterfly/calendar arbitrage without any fitting-loss signal
    from optpricer_tpu import VolSurface, arbitrage_report

    arb = arbitrage_report(VolSurface(fits, forward_curve=forwards))
    if arb["ok"]:
        print("Arbitrage screen: CLEAN (butterfly g>=0 on every slice, "
              "calendar non-crossing)")
    else:
        for T, b in sorted(arb["butterfly"].items()):
            if not b["ok"]:
                print(f"  WARNING butterfly arbitrage at T={T:.4f}: "
                      f"min g = {b['min_g']:.4g} at k={b['k_at_min']:.3f}")
        cal = arb["calendar"]
        if not cal["ok"]:
            print(f"  WARNING calendar arbitrage between T={cal['pair']}: "
                  f"min dw = {cal['min_gap']:.4g} at k={cal['k_at_min']:.3f}")

    if ns.plot:
        render_smiles(ns.plot, fits, strikes, forwards, ivs)


if __name__ == "__main__":
    main()
