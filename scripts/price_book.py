#!/usr/bin/env python3
"""Batch-price an options portfolio (CSV → CSV/JSON).

TPU-native counterpart of reference ``scripts/price_book.py``: same CSV
schema (``id,S0,K,T,r,sigma,q,kind,method[,exotic columns]``), same output
columns, same per-row error capture so one bad position never aborts the
batch. The TPU difference: all vanilla BS rows are priced in ONE fused
vectorised kernel call (the reference loops rows), and Greeks for the whole
book are one batched call.

Methods beyond the reference's (bs/binomial/mc/exotic): ``lsmc``
(American via Longstaff-Schwartz), ``qmc`` (randomised-QMC path pricer,
reuses the exotic columns), ``basket`` (multi-asset — the S0/sigma
cells hold ';'-separated per-asset values, with optional ``weights``,
``rho``, ``basket_payoff``, ``american`` and ``qs`` columns), ``fd`` /
``mlmc`` / ``heston`` (PDE, multilevel and COS/ADI rows), ``quanto``
(``sigma_fx``/``rho_sfx`` columns), ``forward_start`` (``k_ratio``/
``T0``) and ``cliquet`` (``n_periods``/``local_floor``/``local_cap``,
optional ``global_floor`` switching to MC).

Usage:
    python scripts/price_book.py --input portfolio.csv --output prices.csv
    python scripts/price_book.py --input portfolio.csv --output prices.json --greeks
"""
from __future__ import annotations

import argparse
import csv
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from optpricer_tpu.core import OptionSpec  # noqa: E402
from optpricer_tpu.models.binomial import crr  # noqa: E402
from optpricer_tpu.models.exotics import (  # noqa: E402
    asian_price, barrier_price, digital_price, lookback_price,
)
from optpricer_tpu.models.monte_carlo import euro_price_mc  # noqa: E402
from optpricer_tpu.models.processes import gbm_paths  # noqa: E402
from optpricer_tpu.ops.black_scholes import (  # noqa: E402
    bs_greeks_vec, bs_price_vec,
)

GREEK_KEYS = ("delta", "gamma", "vega", "theta", "rho")


def _parse_div_cell(row: dict):
    """[(t, amount), ...] from a ';'-separated 't:amt' dividends cell
    (the piecewise-GBM cash-dividend model); None when absent/empty."""
    cell = (row.get("dividends", "") or "").strip()
    if not cell:
        return None
    return [(float(t), float(d)) for t, d in
            (pair.split(":") for pair in cell.split(";"))]


def _price_row(row: dict, compute_greeks: bool) -> dict:
    rid = row.get("id", "")
    method = row["method"].strip().lower()
    kind = row["kind"].strip().lower()
    # K may be blank for strike-free products (cliquet, forward_start —
    # the latter's strike is k_ratio * S_T0); strike-based methods fail
    # per-row with a clear error via the normal capture path
    k_cell = str(row.get("K", "") or "").strip()
    K = float(k_cell) if k_cell else None
    T, r = float(row["T"]), float(row["r"])
    q = float(row.get("q", 0.0) or 0.0)
    result = {"id": rid, "price": None, "stderr": None}
    if method != "basket":
        # basket rows carry ';'-separated per-asset values in these cells
        S0, sigma = float(row["S0"]), float(row["sigma"])

    if method == "bs":
        result["price"] = float(bs_price_vec(S0, K, T, r, q, sigma, kind))
    elif method == "binomial":
        opt = OptionSpec(S0=S0, K=K, T=T, r=r, sigma=sigma, q=q)
        american = str(row.get("american", "false")).strip().lower() == "true"
        result["price"] = crr(opt, kind, N=500, american=american)
    elif method == "amer_analytic":
        # O(1) analytic American: engine cell bs2002 (default) | baw;
        # a D cell > 0 prices the call via Roll-Geske-Whaley instead
        from optpricer_tpu import (baw_price, bjerksund_stensland_price,
                                   rgw_price)

        D = float(row.get("D", 0.0) or 0.0)
        if D > 0.0:
            result["price"] = float(rgw_price(
                S0, K, T, r, sigma=sigma, D=D,
                t_div=float(row["t_div"])))
        elif (row.get("engine", "") or "").strip().lower() == "baw":
            result["price"] = float(baw_price(S0, K, T, r, q,
                                              sigma=sigma, kind=kind))
        else:
            result["price"] = float(bjerksund_stensland_price(
                S0, K, T, r, q, sigma=sigma, kind=kind))
    elif method == "mc":
        opt = OptionSpec(S0=S0, K=K, T=T, r=r, sigma=sigma, q=q)
        px, se = euro_price_mc(opt, kind, n_paths=100_000, seed=1)
        result["price"], result["stderr"] = px, se
    elif method == "exotic":
        exotic_type = row.get("exotic_type", "").strip().lower()
        n_steps = int(row.get("n_steps", 500) or 500)
        n_paths = int(row.get("n_paths", 100_000) or 100_000)
        paths = gbm_paths(S0, r, q, sigma, T, n_steps, n_paths,
                          antithetic=True, seed=1)
        if exotic_type == "barrier":
            px, se = barrier_price(
                paths, K, r, T, kind, float(row["barrier"]),
                row["barrier_type"].strip().lower(),
                float(row.get("rebate", 0.0) or 0.0))
        elif exotic_type == "asian":
            px, se = asian_price(
                paths, K, r, T, kind,
                row.get("average_type", "arithmetic").strip().lower(),
                row.get("strike_type", "fixed").strip().lower())
        elif exotic_type == "digital":
            px, se = digital_price(paths, K, r, T, kind,
                                   float(row.get("payout", 1.0) or 1.0))
        elif exotic_type == "lookback":
            px, se = lookback_price(
                paths, r, T, kind, K=K,
                strike_type=row.get("strike_type", "floating").strip().lower())
        else:
            raise ValueError(f"Unknown exotic_type: {exotic_type!r}")
        result["price"], result["stderr"] = px, se
    elif method == "lsmc":
        from optpricer_tpu import lsmc_price

        opt = OptionSpec(S0=S0, K=K, T=T, r=r, sigma=sigma, q=q)
        px, se = lsmc_price(
            opt, kind, n_paths=int(row.get("n_paths", 100_000) or 100_000),
            n_steps=int(row.get("n_steps", 50) or 50), seed=1)
        result["price"], result["stderr"] = px, se
    elif method == "qmc":
        from optpricer_tpu import exotic_price_mc

        px, se = exotic_price_mc(
            row.get("exotic_type", "vanilla").strip().lower() or "vanilla",
            S0, K, T, r, q, sigma=sigma, kind=kind, backend="qmc",
            n_paths=int(row.get("n_paths", 65_536) or 65_536),
            n_steps=int(row.get("n_steps", 64) or 64), seed=1,
            barrier=float(row.get("barrier", 0.0) or 0.0),
            barrier_type=(row.get("barrier_type", "up-and-out")
                          or "up-and-out").strip().lower(),
            average_type=(row.get("average_type", "arithmetic")
                          or "arithmetic").strip().lower(),
            strike_type=(row.get("strike_type", "fixed")
                         or "fixed").strip().lower(),
            payout=float(row.get("payout", 1.0) or 1.0))
        result["price"], result["stderr"] = px, se
    elif method == "fd":
        # θ-scheme PDE rows: optional american / dividends columns
        # (dividends cell: 't:amt' pairs, ';'-separated — the
        # piecewise-GBM cash-dividend model, models/pde.py)
        from optpricer_tpu import fd_price

        opt = OptionSpec(S0=S0, K=K, T=T, r=r, sigma=sigma, q=q)
        divs = _parse_div_cell(row)
        result["price"] = fd_price(
            opt, kind, N_S=int(row.get("N_S", 400) or 400),
            N_t=int(row.get("N_t", 400) or 400),
            american=str(row.get("american", "false")).strip().lower()
            == "true", dividends=divs)
    elif method == "mlmc":
        # continuous-monitoring limit at target RMSE (models/mlmc.py):
        # optional eps / payoff-family columns, same conventions as qmc
        from optpricer_tpu import mlmc_price

        px, se = mlmc_price(
            row.get("exotic_type", "vanilla").strip().lower() or "vanilla",
            S0, K, T, r, q, sigma=sigma, kind=kind,
            eps=float(row.get("eps", 0.01) or 0.01), seed=1,
            barrier=float(row.get("barrier", 0.0) or 0.0),
            barrier_type=(row.get("barrier_type", "up-and-out")
                          or "up-and-out").strip().lower(),
            average_type=(row.get("average_type", "arithmetic")
                          or "arithmetic").strip().lower(),
            strike_type=(row.get("strike_type", "fixed")
                         or "fixed").strip().lower(),
            payout=float(row.get("payout", 1.0) or 1.0))
        result["price"], result["stderr"] = px, se
    elif method == "heston":
        # stochastic-vol rows: optional v0/kappa/theta/xi/rho columns
        # (defaults sigma^2-flat); 'american' truthy or a barrier column
        # -> 2-D ADI PDE, else the COS transform (exact European)
        hp = dict(
            v0=float(row.get("v0", 0.0) or sigma * sigma),
            kappa=float(row.get("kappa", 1.5) or 1.5),
            theta=float(row.get("theta", 0.0) or sigma * sigma),
            xi=float(row.get("xi", 0.4) or 0.4),
            rho=float(row.get("rho", -0.6) or -0.6))
        american = str(row.get("american", "")).strip().lower() in (
            "1", "true", "yes")
        barrier = float(row.get("barrier", 0.0) or 0.0)
        divs = _parse_div_cell(row)
        if divs is not None and barrier > 0.0:
            raise ValueError("dividends with barrier not supported on "
                             "heston rows")
        if barrier > 0.0:
            from optpricer_tpu import heston_fd_price_barrier

            result["price"] = heston_fd_price_barrier(
                S0, K, T, r, q, **hp, kind=kind, barrier=barrier,
                barrier_type=(row.get("barrier_type", "up-and-out")
                              or "up-and-out").strip().lower(),
                american=american)
        elif american or divs is not None:
            from optpricer_tpu import heston_fd_price

            result["price"] = heston_fd_price(S0, K, T, r, q, **hp,
                                              kind=kind, american=american,
                                              dividends=divs)
        else:
            from optpricer_tpu import heston_price_cos

            result["price"] = float(heston_price_cos(S0, K, T, r, q, **hp,
                                                     kind=kind))
    elif method == "levy":
        # pure-jump Lévy rows: 'model' column vg|nig|cgmy with the
        # model's parameter columns (VG reads theta_vg/nu and the row's
        # sigma; NIG alpha/beta/delta; CGMY C/G/M/Y), priced by the COS
        # transform with the martingale correction built in
        model = (row.get("model", "vg") or "vg").strip().lower()
        if model == "vg":
            from optpricer_tpu import vg_price_cos

            result["price"] = float(vg_price_cos(
                S0, K, T, r, q, sigma=sigma,
                theta=float(row.get("theta_vg", -0.14) or -0.14),
                nu=float(row.get("nu", 0.2) or 0.2), kind=kind))
        elif model == "nig":
            from optpricer_tpu import nig_price_cos

            result["price"] = float(nig_price_cos(
                S0, K, T, r, q,
                alpha=float(row.get("alpha", 8.0) or 8.0),
                beta=float(row.get("beta", -4.0) or -4.0),
                delta=float(row.get("delta", 0.4) or 0.4), kind=kind))
        elif model == "cgmy":
            from optpricer_tpu import cgmy_price_cos

            result["price"] = float(cgmy_price_cos(
                S0, K, T, r, q,
                C=float(row.get("C", 0.5) or 0.5),
                G=float(row.get("G", 5.0) or 5.0),
                M=float(row.get("M", 9.0) or 9.0),
                Y=float(row.get("Y", 0.8) or 0.8), kind=kind))
        else:
            raise ValueError(f"Unknown levy model: {model!r}")
    elif method == "quanto":
        # foreign asset paid in domestic currency: sigma_fx / rho_sfx
        # columns feed the adjusted-carry closed form
        from optpricer_tpu import quanto_price

        result["price"] = float(np.asarray(quanto_price(
            S0, K, T, r, q, sigma_S=sigma,
            sigma_fx=float(row.get("sigma_fx", 0.0) or 0.0),
            rho_sfx=float(row.get("rho_sfx", 0.0) or 0.0), kind=kind)))
    elif method == "forward_start":
        # strike set at T0 as k x S_T0: 'k_ratio' and 'T0' columns;
        # Rubinstein closed form under GBM
        from optpricer_tpu import forward_start_price

        result["price"] = forward_start_price(
            S0, float(row.get("k_ratio", 1.0) or 1.0),
            float(row["T0"]), T, r, q, sigma=sigma, kind=kind,
            method="closed")
    elif method == "cliquet":
        # capped/floored sum of period returns; optional global_floor
        # column switches the closed-form spread decomposition to MC
        from optpricer_tpu import cliquet_price_bs, cliquet_price_mc

        kwc = dict(sigma=sigma,
                   n_periods=int(row.get("n_periods", 12) or 12),
                   local_floor=float(row.get("local_floor", 0.0) or 0.0),
                   local_cap=float(row.get("local_cap", 0.08) or 0.08))
        gf = (row.get("global_floor", "") or "").strip()
        if gf:
            px, se = cliquet_price_mc(
                S0, T, r, q, global_floor=float(gf),
                n_paths=int(row.get("n_paths", 262_144) or 262_144),
                seed=1, **kwc)
            result["price"], result["stderr"] = px, se
        else:
            result["price"] = cliquet_price_bs(S0, T, r, q, **kwc)
    elif method == "chooser":
        # simple chooser: holder picks call-or-put at 't_choose'
        from optpricer_tpu import chooser_price

        result["price"] = float(np.asarray(chooser_price(
            S0, K, T, r, q, sigma=sigma,
            t_choose=float(row["t_choose"]))))
    elif method == "compound":
        # option-on-option: K is the OUTER strike at 't_choose', the
        # 'K2' column the inner strike to maturity T; 'underlying'
        # column call|put picks the inner option
        from optpricer_tpu import compound_price

        result["price"] = float(np.asarray(compound_price(
            S0, K, float(row["K2"]), float(row["t_choose"]), T, r, q,
            sigma=sigma, kind=kind,
            underlying=(row.get("underlying", "call") or
                        "call").strip().lower())))
    elif method == "basket":
        # multi-asset rows: S0/sigma cells hold ';'-separated per-asset
        # values; optional 'weights' (';'-separated, default equal) and
        # 'rho' (constant pairwise correlation) columns
        import numpy as _np

        from optpricer_tpu import basket_exotic_mc, basket_price_mc

        S0s = [float(x) for x in str(row["S0"]).split(";")]
        sigs = [float(x) for x in str(row["sigma"]).split(";")]
        a = len(S0s)
        wcell = str(row.get("weights", "") or "").strip()
        w = ([float(x) for x in wcell.split(";")] if wcell
             else [1.0 / a] * a)
        rho = float(row.get("rho", 0.3) or 0.3)
        corr = rho * _np.ones((a, a)) + (1.0 - rho) * _np.eye(a)
        bp = (row.get("basket_payoff", "basket") or "basket").strip().lower()
        qcell = str(row.get("qs", "") or "").strip()
        qs_b = [float(x) for x in qcell.split(";")] if qcell else None
        american = str(row.get("american", "")).strip().lower() in (
            "1", "true", "yes")
        common = dict(sigmas=sigs, corr=corr, kind=kind,
                      n_paths=int(row.get("n_paths", 262_144) or 262_144),
                      seed=1)
        if american:
            if bp not in ("basket", "rainbow_max", "rainbow_min"):
                raise ValueError("american basket rows support basket/"
                                 "rainbow payoffs only")
            from optpricer_tpu import lsmc_price_basket

            px, se = lsmc_price_basket(
                S0s, w, K, T, r, qs_b, payoff=bp,
                n_steps=int(row.get("n_steps", 50) or 50), **common)
        elif bp in ("asian_basket", "worstof_barrier", "basket_barrier"):
            px, se = basket_exotic_mc(
                S0s, w, K, T, r, qs_b, payoff=bp,
                barrier=float(row.get("barrier", 0.0) or 0.0),
                barrier_type=(row.get("barrier_type", "down-and-in")
                              or "down-and-in").strip().lower(),
                n_steps=int(row.get("n_steps", 64) or 64), **common)
        else:
            px, se = basket_price_mc(S0s, w, K, T, r, qs_b, payoff=bp,
                                     **common)
        result["price"], result["stderr"] = px, se
    else:
        raise ValueError(f"Unknown method: {method!r}")

    if compute_greeks and method in ("bs", "binomial", "mc"):
        # BS-analytic Greeks for vanilla rows (reference behaviour
        # price_book.py:74-76,84-86); one vectorised call per row here,
        # batched across the book below when possible.
        g = bs_greeks_vec(S0, K, T, r, q, sigma, kind)
        for key in GREEK_KEYS:
            result[key] = float(g[key])
    return result


def main():
    ap = argparse.ArgumentParser(description="Batch-price an options portfolio.")
    ap.add_argument("--input", required=True, help="portfolio CSV")
    ap.add_argument("--output", required=True, help="output path (.csv/.json)")
    ap.add_argument("--greeks", action="store_true", help="compute Greeks")
    args = ap.parse_args()

    with open(args.input, newline="") as f:
        rows = list(csv.DictReader(f))
    print(f"Pricing {len(rows)} positions...")

    # Fused fast path: every MC row in ONE Pallas book kernel on TPU
    # (heterogeneous contracts — each lane carries its own market).
    import jax

    mc_idx = [i for i, row in enumerate(rows)
              if row["method"].strip().lower() == "mc"]
    mc_results = {}
    if len(mc_idx) > 1 and jax.default_backend() == "tpu":
        try:
            from optpricer_tpu.ops.pallas_mc_batch import euro_price_mc_batch

            cols = {c: np.array([float(rows[i][c]) for i in mc_idx])
                    for c in ("S0", "K", "T", "r", "sigma")}
            qv = np.array([float(rows[i].get("q", 0.0) or 0.0)
                           for i in mc_idx])
            kinds = np.array([rows[i]["kind"].strip().lower()
                              for i in mc_idx])
            px, se = euro_price_mc_batch(
                cols["S0"], cols["K"], cols["T"], cols["r"], qv,
                cols["sigma"], kinds, n_paths=100_000, seed=1)
            mc_results = {i: (float(px[j]), float(se[j]))
                          for j, i in enumerate(mc_idx)}
        except Exception:
            mc_results = {}

    # Fused fast path: every vanilla-BS row in one batched kernel call.
    bs_idx = [i for i, row in enumerate(rows)
              if row["method"].strip().lower() == "bs"]
    batch_prices = {}
    batch_greeks = {}
    if len(bs_idx) > 1:
        try:
            cols = {c: np.array([float(rows[i][c]) for i in bs_idx])
                    for c in ("S0", "K", "T", "r", "sigma")}
            qv = np.array([float(rows[i].get("q", 0.0) or 0.0) for i in bs_idx])
            kinds = np.array([rows[i]["kind"].strip().lower() for i in bs_idx])
            px = np.asarray(bs_price_vec(cols["S0"], cols["K"], cols["T"],
                                         cols["r"], qv, cols["sigma"], kinds))
            batch_prices = dict(zip(bs_idx, px))
            if args.greeks:
                g = bs_greeks_vec(cols["S0"], cols["K"], cols["T"], cols["r"],
                                  qv, cols["sigma"], kinds)
                batch_greeks = {
                    i: {k: float(np.asarray(g[k])[j]) for k in GREEK_KEYS}
                    for j, i in enumerate(bs_idx)}
        except Exception:
            batch_prices = {}

    results = []
    for i, row in enumerate(rows):
        try:
            if i in batch_prices:
                res = {"id": row.get("id", ""),
                       "price": float(batch_prices[i]), "stderr": None}
                res.update(batch_greeks.get(i, {}))
            elif i in mc_results:
                res = {"id": row.get("id", ""),
                       "price": mc_results[i][0],
                       "stderr": mc_results[i][1]}
                if args.greeks:
                    from optpricer_tpu.ops.black_scholes import bs_greeks_vec
                    g = bs_greeks_vec(
                        float(row["S0"]), float(row["K"]), float(row["T"]),
                        float(row["r"]), float(row.get("q", 0.0) or 0.0),
                        float(row["sigma"]), row["kind"].strip().lower())
                    for key in GREEK_KEYS:
                        res[key] = float(g[key])
            else:
                res = _price_row(row, args.greeks)
            results.append(res)
        except Exception as e:
            print(f"  Row {i} (id={row.get('id', '?')}): ERROR — {e}")
            results.append({"id": row.get("id", ""), "price": None,
                            "error": str(e)})

    output_path = Path(args.output)
    if output_path.suffix == ".json":
        with open(output_path, "w") as f:
            json.dump(results, f, indent=2, default=str)
    else:
        fieldnames = list(results[0].keys())
        for r in results:
            for k in r:
                if k not in fieldnames:
                    fieldnames.append(k)
        with open(output_path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=fieldnames,
                                    extrasaction="ignore")
            writer.writeheader()
            writer.writerows(results)
    print(f"Results written to {args.output}")

    priced = [r for r in results if r.get("price") is not None]
    print(f"  Priced: {len(priced)}  |  Failed: {len(results) - len(priced)}")


if __name__ == "__main__":
    main()
