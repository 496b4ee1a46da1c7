"""CLI and scripts smoke tests (reference cli.py + scripts/ parity)."""
import csv
import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def _run_cli(*args):
    from optpricer_tpu import cli

    argv = sys.argv
    sys.argv = ["optpricer-tpu", *args]
    try:
        cli.main()
    finally:
        sys.argv = argv


class TestCLI(object):
    COMMON = ["--S0", "100", "--K", "100", "--T", "1", "--r", "0.05",
              "--sigma", "0.2"]

    def test_bs(self, capsys):
        _run_cli("bs", *self.COMMON)
        out = capsys.readouterr().out.strip()
        assert abs(float(out) - 10.4506) < 1e-3

    def test_bs_put_short_kind(self, capsys):
        _run_cli("bs", *self.COMMON, "--kind", "p")
        out = capsys.readouterr().out.strip()
        assert abs(float(out) - 5.5735) < 1e-3

    def test_binomial_american(self, capsys):
        _run_cli("binomial", *self.COMMON, "--kind", "put", "--N", "200",
                 "--american")
        out = capsys.readouterr().out.strip()
        assert float(out) > 5.5735  # American premium

    def test_mc(self, capsys):
        _run_cli("mc", *self.COMMON, "--n-paths", "20000", "--seed", "7")
        out = capsys.readouterr().out.strip()
        px = float(out.split()[0])
        assert abs(px - 10.4506) / 10.4506 < 0.02
        assert "stderr" in out

    def test_bad_kind(self):
        with pytest.raises(SystemExit):
            _run_cli("bs", *self.COMMON, "--kind", "x")

    def test_american_bs2002(self, capsys):
        _run_cli("american", *self.COMMON, "--kind", "put")
        out = capsys.readouterr().out.strip()
        assert abs(float(out) - 6.0158) < 2e-3  # CRR-2000 anchor 6.0902

    def test_american_baw(self, capsys):
        _run_cli("american", *self.COMMON, "--kind", "put",
                 "--engine", "baw")
        out = capsys.readouterr().out.strip()
        assert abs(float(out) - 6.0975) < 2e-3

    def test_american_rgw_dividend(self, capsys):
        _run_cli("american", *self.COMMON, "--D", "3", "--t-div", "0.5")
        out = capsys.readouterr().out.strip()
        assert abs(float(out) - 8.6943) < 2e-3

    def test_american_rgw_put_rejected(self):
        with pytest.raises(SystemExit):
            _run_cli("american", *self.COMMON, "--kind", "put",
                     "--D", "3", "--t-div", "0.5")


class TestPriceBookScript:
    def test_end_to_end(self, tmp_path):
        book = tmp_path / "book.csv"
        with open(book, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=[
                "id", "S0", "K", "T", "r", "sigma", "q", "kind", "method",
                "exotic_type", "barrier", "barrier_type"])
            w.writeheader()
            w.writerow(dict(id=1, S0=100, K=100, T=1, r=0.05, sigma=0.2,
                            q=0, kind="call", method="bs", exotic_type="",
                            barrier="", barrier_type=""))
            w.writerow(dict(id=2, S0=100, K=110, T=1, r=0.05, sigma=0.2,
                            q=0, kind="put", method="bs", exotic_type="",
                            barrier="", barrier_type=""))
            w.writerow(dict(id=3, S0=100, K=100, T=0.5, r=0.05, sigma=0.25,
                            q=0, kind="call", method="binomial",
                            exotic_type="", barrier="", barrier_type=""))
            w.writerow(dict(id=4, S0=100, K=100, T=1, r=0.05, sigma=0.2,
                            q=0, kind="call", method="exotic",
                            exotic_type="barrier", barrier=130,
                            barrier_type="up-and-out"))
            w.writerow(dict(id=5, S0=100, K=100, T=1, r=0.05, sigma=0.2,
                            q=0, kind="call", method="nope",
                            exotic_type="", barrier="", barrier_type=""))
        out = tmp_path / "out.json"
        proc = subprocess.run(
            [sys.executable, str(REPO / "scripts/price_book.py"),
             "--input", str(book), "--output", str(out), "--greeks"],
            capture_output=True, text=True, cwd=REPO,
            env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
                 "PYTHONPATH": str(REPO)},
        )
        assert proc.returncode == 0, proc.stderr
        results = json.loads(out.read_text())
        assert len(results) == 5
        assert abs(results[0]["price"] - 10.4506) < 1e-3
        assert "delta" in results[0]
        # bad method captured per-row, doesn't abort the batch
        assert results[4]["price"] is None and "error" in results[4]

    def test_new_methods(self, tmp_path):
        """lsmc / qmc / basket rows price end-to-end through the book."""
        book = tmp_path / "book.csv"
        fields = ["id", "S0", "K", "T", "r", "sigma", "q", "kind",
                  "method", "exotic_type", "barrier", "barrier_type",
                  "n_paths", "n_steps", "weights", "rho", "basket_payoff",
                  "eps", "dividends", "N_S", "N_t", "american", "qs",
                  "sigma_fx", "rho_sfx", "k_ratio", "T0", "n_periods",
                  "local_floor", "local_cap", "engine", "D", "t_div",
                  "t_choose", "K2", "underlying", "model", "theta_vg",
                  "nu", "alpha", "beta", "delta", "C", "G", "M", "Y"]
        rows = [
            dict(id="f1", S0=100, K=100, T=1, r=0.05, sigma=0.2, q=0,
                 kind="call", method="fd", dividends="0.5:5", N_S=200,
                 N_t=200),
            dict(id="m1", S0=100, K=100, T=1, r=0.05, sigma=0.2, q=0,
                 kind="call", method="mlmc", exotic_type="barrier",
                 barrier=130, barrier_type="up-and-out", eps=0.03),
            dict(id="l1", S0=100, K=100, T=1, r=0.05, sigma=0.2, q=0,
                 kind="put", method="lsmc", n_paths=20000, n_steps=25),
            dict(id="h1", S0=100, K=100, T=1, r=0.05, sigma=0.2, q=0,
                 kind="call", method="heston"),
            dict(id="h2", S0=100, K=100, T=1, r=0.05, sigma=0.2, q=0,
                 kind="call", method="heston", dividends="0.5:5"),
            dict(id="q1", S0=100, K=100, T=1, r=0.05, sigma=0.2, q=0,
                 kind="call", method="qmc", exotic_type="asian",
                 n_paths=4096, n_steps=16),
            dict(id="b1", S0="100;95;105", K=100, T=1, r=0.03,
                 sigma="0.2;0.25;0.18", q=0, kind="call", method="basket",
                 n_paths=32768, rho=0.3, basket_payoff="basket"),
            dict(id="b2", S0="100;95", K=100, T=1, r=0.03,
                 sigma="0.2;0.25", q=0, kind="call", method="basket",
                 n_paths=16384, n_steps=16, rho=0.3,
                 basket_payoff="asian_basket"),
            dict(id="b3", S0="100;100", K=100, T=3, r=0.05,
                 sigma="0.2;0.2", q=0, kind="call", method="basket",
                 n_paths=100000, n_steps=9, rho=0.0, american="true",
                 qs="0.1;0.1", basket_payoff="rainbow_max"),
            dict(id="qx1", S0=100, K=100, T=1, r=0.05, sigma=0.2,
                 q=0.01, kind="call", method="quanto", sigma_fx=0.12,
                 rho_sfx=-0.4),
            dict(id="fs1", S0=100, K="", T=1, r=0.03, sigma=0.25,
                 q=0.01, kind="call", method="forward_start",
                 k_ratio=1.05, T0=0.5),
            dict(id="cq1", S0=100, K="", T=1, r=0.03, sigma=0.2,
                 q=0.01, kind="call", method="cliquet", n_periods=12,
                 local_floor=0.0, local_cap=0.08),
            dict(id="aa1", S0=100, K=100, T=1, r=0.05, sigma=0.2, q=0,
                 kind="put", method="amer_analytic"),
            dict(id="aa2", S0=100, K=100, T=1, r=0.05, sigma=0.2, q=0,
                 kind="call", method="amer_analytic", D=3, t_div=0.5),
            dict(id="ch1", S0=100, K=100, T=1, r=0.05, sigma=0.2, q=0,
                 kind="call", method="chooser", t_choose=0.5),
            dict(id="co1", S0=100, K=10, T=1, r=0.05, sigma=0.2, q=0,
                 kind="call", method="compound", K2=100, t_choose=0.5,
                 underlying="call"),
            dict(id="lv1", S0=100, K=100, T=1, r=0.05, sigma=0.12, q=0,
                 kind="call", method="levy", model="vg", theta_vg=-0.14,
                 nu=0.2),
            dict(id="lv2", S0=100, K=100, T=1, r=0.05, sigma=0.2, q=0,
                 kind="call", method="levy", model="nig", alpha=8,
                 beta=-4, delta=0.4),
        ]
        with open(book, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fields)
            w.writeheader()
            for row in rows:
                w.writerow({k: row.get(k, "") for k in fields})
        out = tmp_path / "out.json"
        proc = subprocess.run(
            [sys.executable, str(REPO / "scripts/price_book.py"),
             "--input", str(book), "--output", str(out)],
            capture_output=True, text=True, cwd=REPO,
            env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
                 "PYTHONPATH": str(REPO)},
        )
        assert proc.returncode == 0, proc.stderr
        results = {r["id"]: r for r in json.loads(out.read_text())}
        assert abs(results["l1"]["price"] - 6.09) < 0.15
        assert abs(results["q1"]["price"] - 6.054) < 0.05
        # fd + discrete dividend row: exact quadrature oracle 7.7740
        assert abs(results["f1"]["price"] - 7.774) < 1e-2
        # mlmc continuous up-and-out row: reflection truth 3.3329
        assert abs(results["m1"]["price"] - 3.3329) < 0.12
        assert results["b1"]["price"] > results["b2"]["price"] > 0
        # american rainbow_max row: Andersen-Broadie anchor 13.902
        assert abs(results["b3"]["price"] - 13.902) < 0.25
        # quanto row: adjusted-carry closed form (library-validated)
        assert abs(results["qx1"]["price"] - 10.4251) < 1e-3
        # forward-start row: Rubinstein closed form
        assert abs(results["fs1"]["price"] - 5.3231) < 1e-3
        # cliquet row: call-spread decomposition closed form
        assert abs(results["cq1"]["price"] - 0.24669) < 1e-4
        # heston row (COS, defaults v0=theta=sigma^2): deterministic,
        # close to the BS price at the same total variance
        assert abs(results["h1"]["price"] - 10.45) < 0.6
        # heston + dividends routes to the ADI; near the BS+div 7.774
        assert abs(results["h2"]["price"] - 7.774) < 0.6
        assert results["h2"]["price"] < results["h1"]["price"]
        # analytic American rows: BS2002 put and RGW dividend call
        assert abs(results["aa1"]["price"] - 6.0158) < 2e-3
        assert abs(results["aa2"]["price"] - 8.6943) < 2e-3
        # two-timescale closed forms (library-validated values)
        assert abs(results["ch1"]["price"] - 13.8512) < 2e-3
        assert abs(results["co1"]["price"] - 4.0215) < 2e-3
        # Lévy COS rows (library-validated f64 values)
        assert abs(results["lv1"]["price"] - 8.04405) < 2e-3
        assert abs(results["lv2"]["price"] - 12.61339) < 2e-3
        deterministic = ("h1", "h2", "f1", "qx1", "fs1", "cq1",
                         "aa1", "aa2", "ch1", "co1", "lv1", "lv2")
        for r in results.values():
            assert "error" not in r
            if r["id"] not in deterministic:
                assert r["stderr"] is not None


class TestCalibrateScript:
    def test_end_to_end(self, tmp_path):
        from optpricer_tpu import SVIParams

        true = SVIParams(a=0.04, b=0.12, rho=-0.2, m=0.0, sigma=0.1,
                         expiry=0.5)
        k = np.linspace(-0.3, 0.3, 15)
        quotes = tmp_path / "quotes.csv"
        with open(quotes, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["expiry", "strike", "forward", "iv"])
            for ki, iv in zip(k, np.asarray(true.iv(k))):
                w.writerow([0.5, 100 * np.exp(ki), 100.0, float(iv)])
        out = tmp_path / "fit.json"
        proc = subprocess.run(
            [sys.executable, str(REPO / "scripts/calibrate_surface.py"),
             "--input", str(quotes), "--output", str(out)],
            capture_output=True, text=True, cwd=REPO,
            env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
                 "PYTHONPATH": str(REPO)},
        )
        assert proc.returncode == 0, proc.stderr
        fit = json.loads(out.read_text())["0.5"]
        assert fit["rmse"] < 1e-4
        assert abs(fit["b"] - 0.12) < 0.02
        # the post-fit static-arbitrage screen runs and is clean here
        assert "Arbitrage screen: CLEAN" in proc.stdout

    def test_essvi_mode(self, tmp_path):
        # quotes generated from an eSSVI truth; the global fit must
        # recover it and report the clean arbitrage screen
        rho_t, eta_t, gam_t = -0.5, 0.9, 0.35
        quotes = tmp_path / "quotes.csv"
        with open(quotes, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["expiry", "strike", "forward", "iv"])
            for T in (0.25, 0.5, 1.0):
                F = 100.0 * np.exp(0.02 * T)
                th = 0.04 * T
                ph = eta_t / th**gam_t
                for k in np.linspace(-0.3, 0.3, 11):
                    wv = 0.5 * th * (1 + rho_t * ph * k + np.sqrt(
                        (ph * k + rho_t) ** 2 + 1 - rho_t**2))
                    w.writerow([T, F * np.exp(k), F,
                                float(np.sqrt(wv / T))])
        out = tmp_path / "fit.json"
        proc = subprocess.run(
            [sys.executable, str(REPO / "scripts/calibrate_surface.py"),
             "--input", str(quotes), "--output", str(out),
             "--model", "essvi"],
            capture_output=True, text=True, cwd=REPO,
            env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
                 "PYTHONPATH": str(REPO)},
        )
        assert proc.returncode == 0, proc.stderr
        assert "eSSVI: rho=-0.5" in proc.stdout
        assert "Arbitrage screen: CLEAN" in proc.stdout
        fit = json.loads(out.read_text())
        assert all(fit[str(T)]["rmse"] < 1e-4 for T in (0.25, 0.5, 1.0))

    def test_heston_mode(self, tmp_path):
        from optpricer_tpu import bs_implied_vol_vec, heston_price_cos

        true = dict(v0=0.04, kappa=1.8, theta=0.05, xi=0.45, rho=-0.55)
        S0, r, q = 100.0, 0.03, 0.01
        quotes = tmp_path / "quotes.csv"
        with open(quotes, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["expiry", "strike", "forward", "iv"])
            for T in (0.5, 1.0):
                F = S0 * np.exp((r - q) * T)
                Ks = np.linspace(85.0, 115.0, 9)
                px = np.array([float(heston_price_cos(S0, k, T, r, q,
                                                      **true)) for k in Ks])
                ivs = np.asarray(bs_implied_vol_vec(
                    S0, Ks, np.full_like(Ks, T), r, q, px, "call"))
                for k, iv in zip(Ks, ivs):
                    w.writerow([T, k, F, float(iv)])
        out = tmp_path / "fit.json"
        proc = subprocess.run(
            [sys.executable, str(REPO / "scripts/calibrate_surface.py"),
             "--input", str(quotes), "--output", str(out),
             "--model", "heston", "--rate", "0.03"],
            capture_output=True, text=True, cwd=REPO,
            env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
                 "PYTHONPATH": str(REPO)},
        )
        assert proc.returncode == 0, proc.stderr
        fit = json.loads(out.read_text())
        assert fit["model"] == "heston" and fit["rmse"] < 1e-4
        assert abs(fit["S0"] - S0) < 0.01 and abs(fit["q"] - q) < 1e-6
        for name, v in true.items():
            assert abs(fit[name] - v) < 5e-3, (name, fit[name], v)

    def test_vg_mode(self, tmp_path):
        from optpricer_tpu import bs_implied_vol_vec, vg_price_cos

        true = dict(sigma=0.15, theta=-0.12, nu=0.25)
        S0, r, q = 100.0, 0.03, 0.01
        quotes = tmp_path / "quotes.csv"
        with open(quotes, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["expiry", "strike", "forward", "iv"])
            for T in (0.5, 1.0):
                F = S0 * np.exp((r - q) * T)
                Ks = np.linspace(85.0, 115.0, 9)
                px = np.asarray(vg_price_cos(S0, Ks, T, r, q, **true))
                ivs = np.asarray(bs_implied_vol_vec(
                    S0, Ks, np.full_like(Ks, T), r, q, px, "call"))
                for k, iv in zip(Ks, ivs):
                    w.writerow([T, k, F, float(iv)])
        out = tmp_path / "fit.json"
        proc = subprocess.run(
            [sys.executable, str(REPO / "scripts/calibrate_surface.py"),
             "--input", str(quotes), "--output", str(out),
             "--model", "vg", "--rate", "0.03"],
            capture_output=True, text=True, cwd=REPO,
            env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
                 "PYTHONPATH": str(REPO)},
        )
        assert proc.returncode == 0, proc.stderr
        fit = json.loads(out.read_text())
        assert fit["model"] == "vg"
        # VG is a Lévy process: one (sigma, theta, nu) generates every
        # expiry consistently, so the noiseless fit recovers the truth
        assert fit["rmse"] < 1e-4
        for name, v in true.items():
            assert abs(fit[name] - v) < 5e-3, (name, fit[name], v)


class TestCLIExtensions:
    COMMON = TestCLI.COMMON

    def test_fd(self, capsys):
        _run_cli("fd", *self.COMMON, "--N-S", "128", "--N-t", "64")
        out = capsys.readouterr().out.strip()
        assert abs(float(out) - 10.4506) < 5e-2

    def test_heston(self, capsys):
        # degenerate Heston (xi→0, v0=theta) must reduce to BS — also a
        # regression guard for the f32 COS phase range reduction
        _run_cli("heston", *self.COMMON, "--v0", "0.04", "--kappa", "1.5",
                 "--theta", "0.04", "--xi", "0.0001", "--rho", "0.0")
        out = capsys.readouterr().out.strip()
        assert abs(float(out) - 10.4506) < 5e-3

    def test_heston_adi_barrier(self, capsys):
        # degenerate xi->0 up-and-out call: the ADI barrier CLI path must
        # land on the analytic reflection price (see test_heston_pde)
        _run_cli("heston", *self.COMMON, "--v0", "0.04", "--kappa", "1.5",
                 "--theta", "0.04", "--xi", "0.0001", "--rho", "0.0",
                 "--r", "0.03", "--barrier", "130",
                 "--barrier-type", "up-and-out")
        out = capsys.readouterr().out.strip()
        assert abs(float(out) - 3.2027) < 0.02

    def test_greeks(self, capsys):
        _run_cli("greeks", *self.COMMON, "--n-paths", "50000", "--seed", "3")
        out = capsys.readouterr().out
        rows = dict(line.split() for line in out.strip().splitlines())
        assert set(rows) == {"price", "delta", "gamma", "vega", "theta",
                             "rho"}
        assert abs(float(rows["delta"]) - 0.6368) < 0.02

    def test_lsmc(self, capsys):
        _run_cli("lsmc", *self.COMMON, "--kind", "put", "--n-paths",
                 "20000", "--n-steps", "25", "--seed", "0")
        out = capsys.readouterr().out.strip()
        px = float(out.split()[0])
        # CRR-converged American put ~6.09; LSMC within MC noise
        assert abs(px - 6.09) < 0.15
        assert "stderr" in out

    def test_lsmc_bound(self, capsys):
        _run_cli("lsmc", *self.COMMON, "--kind", "put", "--n-paths",
                 "10000", "--n-steps", "20", "--seed", "0", "--bound")
        out = capsys.readouterr().out.strip().splitlines()
        rows = {line.split()[0]: line.replace(")", "").split()
                for line in out}
        assert set(rows) == {"lower", "upper", "gap"}
        lo, lo_se = float(rows["lower"][1]), float(rows["lower"][3])
        up, up_se = float(rows["upper"][1]), float(rows["upper"][3])
        gap = float(rows["gap"][1])
        assert abs(gap - (up - lo)) < 1e-6
        # the optional-stopping CV makes the bracket TIGHTER than the
        # lower bound's own MC noise at 10k paths, so lo ≤ up only
        # holds within the noise; both must bracket the Bermudan-20
        # truth 6.0613 (CRR-4000 with exercise_dates) statistically
        assert lo <= up + 3.0 * (lo_se + up_se)
        assert abs(lo - 6.0613) < 3.0 * lo_se + 1e-3
        assert abs(up - 6.0613) < 0.01  # tight upper: |bias+noise| small

    def test_qmc(self, capsys):
        _run_cli("qmc", *self.COMMON, "--payoff", "asian", "--n-paths",
                 "4096", "--n-steps", "16")
        out = capsys.readouterr().out.strip()
        px = float(out.split()[0])
        # 16-step discrete arithmetic Asian call (QMC, tiny stderr)
        assert abs(px - 6.054) < 0.05
        assert "stderr" in out

    def test_basket_terminal(self, capsys):
        _run_cli("basket", "--S0s", "100,95,105", "--sigmas",
                 "0.2,0.25,0.18", "--K", "100", "--T", "1", "--r", "0.03",
                 "--payoff", "basket", "--n-paths", "32768", "--seed", "0")
        out = capsys.readouterr().out.strip()
        px = float(out.split()[0])
        assert 5.0 < px < 10.0

    def test_levy(self, capsys):
        # library-validated COS values (f64): VG 8.044050, NIG 12.613393
        _run_cli("levy", "--S0", "100", "--K", "100", "--T", "1",
                 "--r", "0.05", "--sigma", "0.12", "--model", "vg",
                 "--theta", "-0.14", "--nu", "0.2")
        out = capsys.readouterr().out.strip()
        assert abs(float(out) - 8.04405) < 2e-3
        _run_cli("levy", "--S0", "100", "--K", "100", "--T", "1",
                 "--r", "0.05", "--sigma", "0.2", "--model", "nig",
                 "--alpha", "8", "--beta", "-4", "--delta", "0.4")
        out = capsys.readouterr().out.strip()
        assert abs(float(out) - 12.61339) < 2e-3
        _run_cli("levy", "--S0", "100", "--K", "100", "--T", "1",
                 "--r", "0.05", "--sigma", "0.2", "--model", "cgmy",
                 "--Y", "0.8")
        out = capsys.readouterr().out.strip()
        assert abs(float(out) - 14.3302) < 3e-3

    def test_varswap(self, capsys):
        _run_cli("varswap", "--S0", "100", "--T", "1", "--r", "0.03",
                 "--q", "0.01", "--v0", "0.09", "--kappa", "2",
                 "--theta", "0.04")
        out = capsys.readouterr().out
        # exact Heston integrated variance for these params
        assert abs(float(out.split(":")[1].split()[0]) - 0.0616166) < 1e-5

    def test_basket_american(self, capsys):
        # Andersen-Broadie 2-asset Bermudan max-call anchor (13.902)
        _run_cli("basket", "--S0s", "100,100", "--sigmas", "0.2,0.2",
                 "--rho", "0", "--K", "100", "--T", "3", "--r", "0.05",
                 "--qs", "0.1,0.1", "--payoff", "rainbow_max",
                 "--american", "--n-steps", "9", "--n-paths", "100000",
                 "--seed", "11", "--kind", "call")
        out = capsys.readouterr().out.strip()
        assert abs(float(out.split()[0]) - 13.902) < 0.2

    def test_basket_path_dependent(self, capsys):
        _run_cli("basket", "--S0s", "100,95", "--sigmas", "0.2,0.25",
                 "--K", "100", "--T", "1", "--r", "0.03", "--payoff",
                 "asian_basket", "--n-paths", "16384", "--n-steps", "16",
                 "--seed", "0")
        out = capsys.readouterr().out.strip()
        px_asian = float(out.split()[0])
        _run_cli("basket", "--S0s", "100,95", "--sigmas", "0.2,0.25",
                 "--K", "100", "--T", "1", "--r", "0.03", "--payoff",
                 "basket", "--n-paths", "16384", "--seed", "0")
        px_term = float(capsys.readouterr().out.strip().split()[0])
        # averaging dampens vol: Asian basket below terminal basket
        assert 0.0 < px_asian < px_term

    def test_lsv_flat_surface_and_model_reload(self, capsys, tmp_path):
        # flat smile + xi>0: LSV must stay near the flat-vol BS price
        mdl = str(tmp_path / "lsv.json")
        _run_cli("lsv", *self.COMMON, "--n-steps", "16", "--cal-paths",
                 "8192", "--n-bins", "48", "--n-paths", "32768",
                 "--save-model", mdl)
        out = capsys.readouterr().out.strip()
        px = float(out.split()[0])
        from optpricer_tpu.ops.black_scholes import bs_price_vec
        ref = float(bs_price_vec(100.0, 100.0, 1.0, 0.05, 0.0, 0.2,
                                 "call"))
        assert abs(px - ref) < 0.35
        # reload the persisted model: same seed => identical price
        _run_cli("lsv", *self.COMMON, "--model", mdl, "--n-paths", "32768")
        px2 = float(capsys.readouterr().out.strip().split()[0])
        assert px2 == px

    def test_mlmc(self, capsys):
        # continuously-monitored up-and-out call: the bridge-conditioned
        # MLMC must land on the reflection price (~3.3329 at these params
        # with r=0.05)
        _run_cli("mlmc", *self.COMMON, "--payoff", "barrier", "--barrier",
                 "130", "--eps", "0.02", "--seed", "7")
        out = capsys.readouterr().out.strip()
        px = float(out.split()[0])
        assert abs(px - 3.3329) < 0.08
        assert "stderr" in out

    def test_fd_dividends(self, capsys):
        _run_cli("fd", *self.COMMON, "--N-S", "200", "--N-t", "200",
                 "--dividends", "0.5:5")
        out = capsys.readouterr().out.strip()
        # exact quadrature oracle: 7.7740 (test_pde.TestDiscreteDividends)
        assert abs(float(out) - 7.774) < 1e-2

    def test_heston_dividends_forces_adi(self, capsys):
        _run_cli("heston", *self.COMMON)
        base = float(capsys.readouterr().out.strip())
        _run_cli("heston", *self.COMMON, "--dividends", "0.5:5")
        px = float(capsys.readouterr().out.strip())
        assert 0.0 < px < base  # cash dividend lowers the call

    def test_heston_dividends_with_barrier_rejected(self):
        with pytest.raises(SystemExit, match="not supported"):
            _run_cli("heston", *self.COMMON, "--dividends", "0.5:5",
                     "--barrier", "130")
