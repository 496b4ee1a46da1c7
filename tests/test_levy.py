"""Infinite-activity Lévy models (VG / NIG / CGMY) via the COS machinery.

Correctness strategy follows the suite's oracle pattern: each model is
pinned to its exact degenerate limit (VG ν→0 and NIG α→∞ are
Black-Scholes; CGMY Y→0 is Variance Gamma with the root mapping
ν = 1/C, θν = 1/M − 1/G, σ²ν = 2/(MG)), put-call parity must hold to
machine precision (the call is constructed from the put by parity), the
exact-transition path generators must reprice the COS vanilla within MC
error at ANY step count, and the paths feed the path-matrix exotics API
under its usual no-arbitrage identities.
"""
import numpy as np
import pytest

from optpricer_tpu import (
    bs_price_vec, cgmy_price_cos, nig_paths, nig_price_cos, vg_paths,
    vg_price_cos,
)

S0, R, Q, T = 100.0, 0.05, 0.01, 1.0
VGP = dict(sigma=0.12, theta=-0.14, nu=0.2)      # equity-skew VG
NIGP = dict(alpha=8.0, beta=-4.0, delta=0.4)     # skewed NIG


class TestVarianceGamma:
    def test_bs_limit(self):
        # ν→0 freezes the gamma clock at its mean: plain BS
        vg = float(vg_price_cos(S0, 100.0, T, R, Q, sigma=0.2,
                                theta=0.0, nu=1e-6))
        bs = float(bs_price_vec(S0, 100.0, T, R, Q, 0.2, "call"))
        assert abs(vg - bs) < 1e-5

    def test_put_call_parity(self):
        c = float(vg_price_cos(S0, 110.0, T, R, Q, **VGP, kind="call"))
        p = float(vg_price_cos(S0, 110.0, T, R, Q, **VGP, kind="put"))
        fwd = S0 * np.exp(-Q * T) - 110.0 * np.exp(-R * T)
        assert abs((c - p) - fwd) < 1e-10

    def test_strike_batch_and_monotonicity(self):
        Ks = np.linspace(70.0, 130.0, 13)
        px = np.asarray(vg_price_cos(S0, Ks, T, R, Q, **VGP))
        assert px.shape == (13,)
        assert np.all(np.diff(px) < 0.0)          # calls fall in strike
        # convexity in strike (no butterfly arbitrage)
        assert np.all(px[:-2] - 2.0 * px[1:-1] + px[2:] > -1e-9)

    def test_negative_theta_skews_left(self):
        # θ < 0 fattens the left tail: OTM puts gain value vs θ = 0 at
        # matched total variance c2 = (σ² + νθ²)T
        th = -0.2
        sig0 = np.sqrt(0.12**2 + 0.2 * th * th)
        skew = float(vg_price_cos(S0, 80.0, T, R, Q, sigma=0.12,
                                  theta=th, nu=0.2, kind="put"))
        sym = float(vg_price_cos(S0, 80.0, T, R, Q, sigma=sig0,
                                 theta=0.0, nu=0.2, kind="put"))
        assert skew > sym

    def test_paths_match_cos(self):
        # exact gamma-subordinated transitions: no step-count bias
        paths = vg_paths(S0, T, R, Q, **VGP, n_steps=4,
                         n_paths=200_000, seed=3)
        assert paths.shape == (5, 400_000)
        ST = np.asarray(paths[-1], np.float64)
        assert abs(ST.mean() - S0 * np.exp((R - Q) * T)) < 0.1
        disc = np.exp(-R * T)
        pay = disc * np.maximum(ST - 100.0, 0.0)
        mc, se = pay.mean(), pay.std() / np.sqrt(ST.size)
        cos = float(vg_price_cos(S0, 100.0, T, R, Q, **VGP))
        assert abs(mc - cos) < 4.0 * se + 1e-3, (mc, cos)

    def test_guards(self):
        with pytest.raises(ValueError, match="moment"):
            vg_paths(S0, T, R, Q, sigma=0.5, theta=2.0, nu=2.0,
                     n_steps=2, n_paths=8)
        with pytest.raises(ValueError, match="positive"):
            vg_paths(S0, T, R, Q, **VGP, n_steps=0, n_paths=8)


class TestNIG:
    def test_bs_limit(self):
        # α→∞ at matched variance δ/α = σ² collapses to BS
        alpha = 400.0
        nig = float(nig_price_cos(S0, 100.0, T, R, Q, alpha=alpha,
                                  beta=0.0, delta=0.04 * alpha))
        bs = float(bs_price_vec(S0, 100.0, T, R, Q, 0.2, "call"))
        assert abs(nig - bs) < 2e-3

    def test_put_call_parity(self):
        c = float(nig_price_cos(S0, 90.0, T, R, Q, **NIGP, kind="call"))
        p = float(nig_price_cos(S0, 90.0, T, R, Q, **NIGP, kind="put"))
        fwd = S0 * np.exp(-Q * T) - 90.0 * np.exp(-R * T)
        assert abs((c - p) - fwd) < 1e-10

    def test_paths_match_cos(self):
        paths = nig_paths(S0, T, R, Q, **NIGP, n_steps=4,
                          n_paths=200_000, seed=5)
        ST = np.asarray(paths[-1], np.float64)
        assert abs(ST.mean() - S0 * np.exp((R - Q) * T)) < 0.25
        disc = np.exp(-R * T)
        pay = disc * np.maximum(ST - 100.0, 0.0)
        mc, se = pay.mean(), pay.std() / np.sqrt(ST.size)
        cos = float(nig_price_cos(S0, 100.0, T, R, Q, **NIGP))
        assert abs(mc - cos) < 4.0 * se + 2e-3, (mc, cos)

    def test_step_count_invariance(self):
        # the IG transition is exact, so 2 steps and 64 steps agree
        # statistically (independent draws, shared tolerance)
        disc = np.exp(-R * T)
        out = []
        for n_steps, seed in ((2, 11), (64, 12)):
            ST = np.asarray(nig_paths(S0, T, R, Q, **NIGP,
                                      n_steps=n_steps, n_paths=100_000,
                                      seed=seed)[-1], np.float64)
            pay = disc * np.maximum(ST - 100.0, 0.0)
            out.append((pay.mean(), pay.std() / np.sqrt(ST.size)))
        (m1, s1), (m2, s2) = out
        assert abs(m1 - m2) < 4.0 * (s1 + s2)

    def test_guards(self):
        with pytest.raises(ValueError, match="moment"):
            nig_paths(S0, T, R, Q, alpha=2.0, beta=1.5, delta=0.3,
                      n_steps=2, n_paths=8)
        with pytest.raises(ValueError, match="delta"):
            nig_paths(S0, T, R, Q, alpha=8.0, beta=0.0, delta=-1.0,
                      n_steps=2, n_paths=8)
        # alpha > |beta+1| does NOT imply alpha > |beta| when beta < -0.5
        # — gamma = sqrt(alpha^2 - beta^2) would be NaN
        with pytest.raises(ValueError, match=r"alpha > \|beta\|"):
            nig_paths(S0, T, R, Q, alpha=3.5, beta=-4.0, delta=0.3,
                      n_steps=2, n_paths=8)
        from optpricer_tpu import exotic_price_mc

        with pytest.raises(ValueError, match="alpha"):
            exotic_price_mc("vanilla", S0, 100.0, T, R, Q,
                            nig=dict(alpha=3.5, beta=-4.0, delta=0.3))


class TestCGMY:
    def test_vg_limit(self):
        # Y→0: CGMY(C,G,M,Y) → VG with ν = 1/C, θν = 1/M − 1/G,
        # σ²ν = 2/(MG) (the VG cf's root factorisation)
        C, G, M = 5.0, 10.0, 14.0
        nu = 1.0 / C
        th = (1.0 / M - 1.0 / G) / nu
        sig = np.sqrt(2.0 / (M * G * nu))
        cg = float(cgmy_price_cos(S0, 100.0, T, R, Q, C=C, G=G, M=M,
                                  Y=1e-4))
        vg = float(vg_price_cos(S0, 100.0, T, R, Q, sigma=sig, theta=th,
                                nu=nu))
        assert abs(cg - vg) < 5e-3

    def test_put_call_parity_both_regimes(self):
        for Y in (0.5, 1.5):                      # finite & infinite var.
            c = float(cgmy_price_cos(S0, 105.0, T, R, Q, C=0.5, G=5.0,
                                     M=9.0, Y=Y, kind="call"))
            p = float(cgmy_price_cos(S0, 105.0, T, R, Q, C=0.5, G=5.0,
                                     M=9.0, Y=Y, kind="put"))
            fwd = S0 * np.exp(-Q * T) - 105.0 * np.exp(-R * T)
            assert abs((c - p) - fwd) < 1e-9, Y

    def test_more_activity_more_value(self):
        # OTM value grows with the activity level C (more jumps)
        px = [float(cgmy_price_cos(S0, 120.0, T, R, Q, C=c, G=5.0,
                                   M=9.0, Y=0.5)) for c in (0.1, 0.3, 0.9)]
        assert px[0] < px[1] < px[2]

    def test_strike_batch_convex(self):
        Ks = np.linspace(80.0, 120.0, 9)
        px = np.asarray(cgmy_price_cos(S0, Ks, T, R, Q, C=0.5, G=5.0,
                                       M=9.0, Y=0.8))
        assert np.all(np.diff(px) < 0.0)
        assert np.all(px[:-2] - 2.0 * px[1:-1] + px[2:] > -1e-9)

    def test_parameter_guards_raise_before_tracing(self):
        # Y=1 → Γ(−Y)=±inf, M≤1 → ω complex: both were silent-NaN holes
        with pytest.raises(ValueError, match="Y != 1"):
            cgmy_price_cos(S0, 100.0, T, R, Q, C=0.5, G=5.0, M=9.0, Y=1.0)
        with pytest.raises(ValueError, match="Y in"):
            cgmy_price_cos(S0, 100.0, T, R, Q, C=0.5, G=5.0, M=9.0, Y=2.3)
        with pytest.raises(ValueError, match="M > 1"):
            cgmy_price_cos(S0, 100.0, T, R, Q, C=0.5, G=5.0, M=0.9, Y=0.5)
        with pytest.raises(ValueError, match="G > 0"):
            cgmy_price_cos(S0, 100.0, T, R, Q, C=0.5, G=0.0, M=9.0, Y=0.5)


class TestFitVG:
    def test_parameter_recovery(self):
        # noiseless smile generated by known VG params must round-trip
        # (the suite's SVI-recovery pattern, reference
        # test_calibration.py:38-52)
        from optpricer_tpu import bs_implied_vol_vec, fit_vg

        true = dict(sigma=0.15, theta=-0.12, nu=0.25)
        Ks = np.linspace(80.0, 120.0, 15)
        Ts = np.full_like(Ks, 0.75)
        px = np.asarray(vg_price_cos(S0, Ks, 0.75, R, Q, **true))
        ivs = np.asarray(bs_implied_vol_vec(S0, Ks, Ts, R, Q, px,
                                            "call"))
        fit = fit_vg(Ks, Ts, ivs, S0, R, Q)
        assert fit["rmse"] < 5e-4
        assert abs(fit["sigma"] - true["sigma"]) < 0.01
        assert abs(fit["theta"] - true["theta"]) < 0.02
        assert abs(fit["nu"] - true["nu"]) < 0.04

    def test_guards(self):
        from optpricer_tpu import fit_vg

        with pytest.raises(ValueError, match="same-length"):
            fit_vg([100.0, 105.0], [1.0], [0.2, 0.2], S0, R)


class TestF32Conditioning:
    """The default TPU dtype is f32; the degenerate limits must survive
    it (log1p/expm1 formulations — plain log/power differences round the
    whole correction away below ν ≈ 1e-5 / amplify O(eps) residuals by
    the Γ(−Y) ~ −1/Y prefactor)."""

    def test_vg_nu_limit_f32(self):
        import jax.numpy as jnp

        vg = float(vg_price_cos(S0, 100.0, T, R, Q, sigma=0.2,
                                theta=0.0, nu=1e-6, dtype=jnp.float32))
        bs = float(bs_price_vec(S0, 100.0, T, R, Q, 0.2, "call"))
        assert abs(vg - bs) < 1e-4

    def test_cgmy_y_limit_f32(self):
        import jax.numpy as jnp

        C, G, M = 5.0, 10.0, 14.0
        nu = 1.0 / C
        th = (1.0 / M - 1.0 / G) / nu
        sig = np.sqrt(2.0 / (M * G * nu))
        cg = float(cgmy_price_cos(S0, 100.0, T, R, Q, C=C, G=G, M=M,
                                  Y=1e-4, dtype=jnp.float32))
        vg = float(vg_price_cos(S0, 100.0, T, R, Q, sigma=sig, theta=th,
                                nu=nu, dtype=jnp.float32))
        assert abs(cg - vg) < 5e-3


class TestFusedLevyDynamics:
    """vg=/nig= in the O(1)-memory fused scan engine: exact subordinated
    transitions per step, COS as the vanilla oracle."""

    def test_vg_vanilla_matches_cos(self):
        from optpricer_tpu import exotic_price_mc

        p, se = exotic_price_mc("vanilla", S0, 100.0, T, R, Q, vg=VGP,
                                n_steps=8, n_paths=200_000, seed=3)
        cos = float(vg_price_cos(S0, 100.0, T, R, Q, **VGP))
        assert abs(p - cos) < 4.0 * se + 1e-3, (p, cos)

    def test_nig_vanilla_matches_cos(self):
        from optpricer_tpu import exotic_price_mc

        p, se = exotic_price_mc("vanilla", S0, 100.0, T, R, Q, nig=NIGP,
                                n_steps=8, n_paths=200_000, seed=4)
        cos = float(nig_price_cos(S0, 100.0, T, R, Q, **NIGP))
        assert abs(p - cos) < 4.0 * se + 2e-3, (p, cos)

    def test_vg_barrier_parity(self):
        from optpricer_tpu import exotic_price_mc

        kw = dict(barrier=130.0, n_steps=64, n_paths=100_000, seed=5)
        ko, se_ko = exotic_price_mc("barrier", S0, 100.0, T, R, Q,
                                    vg=VGP, barrier_type="up-and-out",
                                    **kw)
        ki, se_ki = exotic_price_mc("barrier", S0, 100.0, T, R, Q,
                                    vg=VGP, barrier_type="up-and-in",
                                    **kw)
        cos = float(vg_price_cos(S0, 100.0, T, R, Q, **VGP))
        assert abs((ko + ki) - cos) < 4.0 * (se_ko + se_ki) + 2e-3

    def test_nig_asian_below_vanilla_fused(self):
        from optpricer_tpu import exotic_price_mc

        a, _ = exotic_price_mc("asian", S0, 100.0, T, R, Q, nig=NIGP,
                               n_steps=32, n_paths=50_000, seed=6)
        cos = float(nig_price_cos(S0, 100.0, T, R, Q, **NIGP))
        assert a < cos

    def test_mesh_sharded_runs(self):
        from optpricer_tpu import exotic_price_mc
        from optpricer_tpu.parallel.mesh import get_mesh

        p, se = exotic_price_mc("vanilla", S0, 100.0, T, R, Q, vg=VGP,
                                n_steps=8, n_paths=1 << 15, seed=7,
                                mesh=get_mesh(8))
        cos = float(vg_price_cos(S0, 100.0, T, R, Q, **VGP))
        assert se > 0.0
        assert abs(p - cos) < 5.0 * se + 5e-3

    def test_guards(self):
        from optpricer_tpu import exotic_price_mc

        with pytest.raises(ValueError, match="exactly one"):
            exotic_price_mc("vanilla", S0, 100.0, T, R, Q, sigma=0.2,
                            vg=VGP)
        with pytest.raises(ValueError, match="scheme"):
            exotic_price_mc("vanilla", S0, 100.0, T, R, Q, vg=VGP,
                            scheme="milstein")
        # θν + ½σ²ν ≥ 1 makes log1p in vg_step NaN — must raise, not
        # return a silent-NaN price (mirrors the vg_paths guard)
        with pytest.raises(ValueError, match="moment"):
            exotic_price_mc("vanilla", S0, 100.0, T, R, Q,
                            vg=dict(sigma=0.3, theta=2.0, nu=0.6))

    def test_vg_ad_greeks_match_cos_ad(self):
        # pathwise AD through the fused scan (gamma clock differentiable
        # in nu via implicit reparameterisation) vs jax.grad through the
        # COS transform — the deterministic truth
        import jax
        import jax.numpy as jnp

        from optpricer_tpu import exotic_greeks_mc

        g = exotic_greeks_mc("vanilla", S0, 100.0, T, R, Q, vg=VGP,
                             n_steps=8, n_paths=100_000, seed=3)
        truth = {
            "delta": jax.grad(lambda s: vg_price_cos(
                s, 100.0, T, R, Q, **VGP))(jnp.float64(S0)),
            "vega": jax.grad(lambda v: vg_price_cos(
                S0, 100.0, T, R, Q, sigma=v, theta=VGP["theta"],
                nu=VGP["nu"]))(jnp.float64(VGP["sigma"])),
            "d_nu": jax.grad(lambda n: vg_price_cos(
                S0, 100.0, T, R, Q, sigma=VGP["sigma"],
                theta=VGP["theta"], nu=n))(jnp.float64(VGP["nu"])),
        }
        for name, ref in truth.items():
            se = g[f"{name}_stderr"]
            assert abs(g[name] - float(ref)) < 4.0 * se + 5e-3, \
                (name, g[name], float(ref))

    def test_nig_greeks_raise(self):
        from optpricer_tpu import exotic_greeks_mc

        with pytest.raises(ValueError, match="pathwise"):
            exotic_greeks_mc("vanilla", S0, 100.0, T, R, Q, nig=NIGP)


class TestAmericanLevy:
    """lsmc_price(vg=/nig=): early exercise on the exact subordinated
    path matrices (Markov in spot, so the standard basis applies)."""

    def test_vg_american_premium(self):
        from optpricer_tpu import OptionSpec, lsmc_price

        opt = OptionSpec(S0=S0, K=105.0, T=T, r=R, q=Q, sigma=0.2)
        am, se = lsmc_price(opt, "put", vg=VGP, n_paths=50_000,
                            n_steps=50, seed=3)
        eu = float(vg_price_cos(S0, 105.0, T, R, Q, **VGP, kind="put"))
        assert am > eu - 3.0 * se          # early exercise adds value
        assert am >= 5.0 - 1e-9            # >= intrinsic

    def test_vg_gbm_limit_vs_crr(self):
        from optpricer_tpu import OptionSpec, crr, lsmc_price

        opt = OptionSpec(S0=S0, K=110.0, T=T, r=R, sigma=0.2)
        am, se = lsmc_price(opt, "put",
                            vg=dict(sigma=0.2, theta=0.0, nu=1e-5),
                            n_paths=100_000, n_steps=50, seed=4)
        ref = float(crr(opt, "put", N=2000, american=True))
        # LSMC is policy-low-biased; must land just under the lattice
        assert ref - 0.08 - 3.0 * se < am < ref + 3.0 * se + 0.01

    def test_nig_two_pass_and_guards(self):
        from optpricer_tpu import OptionSpec, lsmc_price

        opt = OptionSpec(S0=S0, K=105.0, T=T, r=R, q=Q, sigma=0.2)
        lo, se = lsmc_price(opt, "put", nig=NIGP, n_paths=20_000,
                            n_steps=25, seed=5, bound="lower")
        assert se > 0.0 and lo > 0.0
        with pytest.raises(ValueError, match="dual"):
            lsmc_price(opt, "put", vg=VGP, bound="both")
        with pytest.raises(ValueError, match="at most one"):
            lsmc_price(opt, "put", vg=VGP, nig=NIGP)


class TestExoticsIntegration:
    def test_vg_barrier_parity_through_path_api(self):
        from optpricer_tpu import barrier_price

        paths = vg_paths(S0, T, R, Q, **VGP, n_steps=64,
                         n_paths=50_000, seed=9)
        ko, se_ko = barrier_price(paths, 100.0, R, T, "call", 130.0,
                                  "up-and-out")
        ki, se_ki = barrier_price(paths, 100.0, R, T, "call", 130.0,
                                  "up-and-in")
        vanilla = float(vg_price_cos(S0, 100.0, T, R, Q, **VGP))
        assert abs((ko + ki) - vanilla) < 4.0 * (se_ko + se_ki) + 1e-2

    def test_nig_asian_below_vanilla(self):
        from optpricer_tpu import asian_price

        paths = nig_paths(S0, T, R, Q, **NIGP, n_steps=64,
                          n_paths=50_000, seed=13)
        asian, _ = asian_price(paths, 100.0, R, T, "call")
        vanilla = float(nig_price_cos(S0, 100.0, T, R, Q, **NIGP))
        assert asian < vanilla
