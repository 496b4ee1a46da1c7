"""Longstaff-Schwartz American MC vs the lattice/PDE American engines.

LSMC carries a small low bias (suboptimal exercise from the finite basis),
so the bands are max(5·stderr, ~0.5% of price) against CRR N=2000 — the
same oracle the reference uses for its American engines.
"""
import numpy as np
import pytest

from optpricer_tpu import OptionSpec, lsmc_price, lsmc_price_batch
from optpricer_tpu.models.binomial import crr

KW = dict(n_paths=200_000, n_steps=50, seed=0, dtype="float64")


def _crr(opt, kind):
    return crr(opt, kind, N=2000, american=True)


class TestLsmcVsLattice:
    @pytest.mark.parametrize("K", [90.0, 105.0, 120.0])
    def test_american_put(self, K):
        opt = OptionSpec(S0=100.0, K=K, T=1.0, r=0.05, sigma=0.25)
        px, se = lsmc_price(opt, "put", **KW)
        ref = _crr(opt, "put")
        assert px <= ref + 5 * se          # low-biased estimator
        assert abs(px - ref) < max(5 * se, 0.006 * ref)

    def test_american_call_with_dividends(self):
        # q > 0 makes early exercise of the call genuinely valuable
        opt = OptionSpec(S0=100.0, K=95.0, T=1.0, r=0.03, sigma=0.25, q=0.07)
        px, se = lsmc_price(opt, "call", **KW)
        ref = _crr(opt, "call")
        assert abs(px - ref) < max(5 * se, 0.006 * ref)

    def test_no_dividend_call_equals_european(self):
        from optpricer_tpu.ops.black_scholes import price as bs_price

        opt = OptionSpec(S0=100.0, K=100.0, T=1.0, r=0.05, sigma=0.2)
        px, se = lsmc_price(opt, "call", **KW)
        assert abs(px - bs_price(opt, "call")) < 5 * se + 0.03

    def test_deep_itm_floors_at_intrinsic(self):
        opt = OptionSpec(S0=70.0, K=105.0, T=1.0, r=0.05, sigma=0.25)
        px, _ = lsmc_price(opt, "put", **KW)
        assert px >= 35.0 - 1e-9

    def test_premium_over_european(self):
        from optpricer_tpu.ops.black_scholes import price as bs_price

        opt = OptionSpec(S0=100.0, K=110.0, T=1.0, r=0.06, sigma=0.25)
        px, se = lsmc_price(opt, "put", **KW)
        assert px > bs_price(opt, "put") + 0.1  # clear early-exercise value


class TestLsmcBatch:
    def test_ladder_matches_scalar_calls(self):
        Ks = np.array([90.0, 100.0, 110.0])
        batch = np.asarray(lsmc_price_batch(
            100.0, Ks, 1.0, 0.05, 0.0, 0.25, "put", n_paths=100_000,
            n_steps=50, seed=1, dtype="float64"))
        for k, got in zip(Ks, batch):
            opt = OptionSpec(S0=100.0, K=float(k), T=1.0, r=0.05, sigma=0.25)
            single, se = lsmc_price(opt, "put", n_paths=100_000, n_steps=50,
                                    seed=1, dtype="float64")
            # Same paths; the scalar engine's basis is centred at K, the
            # batch engine's at S0 — identical fits in exact arithmetic,
            # but rounding flips a handful of exercise decisions at the
            # boundary, so agreement is statistical, not bitwise.
            assert abs(got - single) < se, (k, got, single, se)

    def test_mixed_kinds(self):
        Ks = np.array([95.0, 105.0])
        out = np.asarray(lsmc_price_batch(
            100.0, Ks, 1.0, 0.05, 0.02, 0.25, np.array(["call", "put"]),
            n_paths=50_000, n_steps=32, seed=2, dtype="float64"))
        assert out.shape == (2,) and np.all(out > 0)

    def test_reproducible(self):
        kw = dict(n_paths=50_000, n_steps=32, seed=3)
        a = lsmc_price_batch(100.0, [100.0], 1.0, 0.05, 0.0, 0.2, "put", **kw)
        b = lsmc_price_batch(100.0, [100.0], 1.0, 0.05, 0.0, 0.2, "put", **kw)
        assert np.array_equal(np.asarray(a), np.asarray(b))


class TestLsmcSharded:
    """Mesh LSMC: the exercise policy is fit from ALL paths (psum'd normal
    equations), so quality matches single-device at the same path count."""

    def test_matches_single_device_statistically(self):
        from optpricer_tpu.models.american_mc import lsmc_price_sharded
        from optpricer_tpu.parallel import get_mesh

        opt = OptionSpec(S0=100.0, K=105.0, T=1.0, r=0.05, sigma=0.25)
        kw = dict(n_paths=160_000, n_steps=32, seed=5, dtype="float64")
        p8, se8 = lsmc_price_sharded(get_mesh(8), opt, "put", **kw)
        p1, se1 = lsmc_price(opt, "put", **kw)
        assert abs(p8 - p1) < 5 * np.hypot(se8, se1)
        # and both sit just below the lattice oracle
        ref = _crr(opt, "put")
        assert abs(p8 - ref) < max(5 * se8, 0.008 * ref)

    def test_reproducible_and_finite(self):
        from optpricer_tpu.models.american_mc import lsmc_price_sharded
        from optpricer_tpu.parallel import get_mesh

        opt = OptionSpec(S0=100.0, K=100.0, T=0.5, r=0.04, sigma=0.2)
        mesh = get_mesh(8)
        kw = dict(n_paths=40_000, n_steps=16, seed=2)
        a = lsmc_price_sharded(mesh, opt, "put", **kw)
        b = lsmc_price_sharded(mesh, opt, "put", **kw)
        assert a == b and np.isfinite(a[0])


class TestBiasBracket:
    """Two-pass lower bound + Andersen-Broadie dual upper bound
    (lsmc_price(bound=...)): the converged lattice price must sit inside
    the bracket, and the bracket must be ordered and reasonably tight."""

    OPT = OptionSpec(S0=100.0, K=110.0, T=1.0, r=0.05, sigma=0.25)

    def test_lattice_inside_bracket(self):
        # the dual prices the BERMUDAN-16 contract the policy actually
        # has (exercise at the 16 simulation dates); with the optional-
        # stopping BS control variate the upper bound is tight enough
        # (se ~1e-3, E[max] inflation ~4e-3 measured) to resolve
        # Bermudan-16 from the continuous American price (0.057 apart
        # here) — so the oracle is the Bermudan-16 lattice, and the
        # continuous-American lattice must sit strictly ABOVE the upper
        # bound, which the looser pre-CV dual could not assert.
        ref_b16 = crr(self.OPT, "put", N=4000,
                      exercise_dates=[j / 16 for j in range(1, 16)])
        ref_am = crr(self.OPT, "put", N=4000, american=True)
        br = lsmc_price(self.OPT, "put", n_paths=50_000, n_steps=16,
                        seed=0, bound="both", n_inner=128,
                        n_upper_paths=2_000, dtype="float64")
        lo, lo_se = br["lower"]
        up, up_se = br["upper"]
        assert lo - 3 * lo_se < ref_b16 < up + 3 * up_se, (lo, ref_b16, up)
        assert br["gap"] >= -3 * (lo_se + up_se)
        assert br["gap"] < 0.005 * ref_b16     # CV-tight (was 0.02)
        assert up + 3 * up_se < ref_am         # resolves Bermudan < American
        assert lo - 3 * lo_se < ref_am

    def test_crr_bermudan_monotone_in_dates(self):
        eu = crr(self.OPT, "put", N=4000)
        b4 = crr(self.OPT, "put", N=4000,
                 exercise_dates=[j / 4 for j in range(1, 4)])
        b16 = crr(self.OPT, "put", N=4000,
                  exercise_dates=[j / 16 for j in range(1, 16)])
        am = crr(self.OPT, "put", N=4000, american=True)
        assert eu < b4 < b16 < am

    def test_two_pass_is_low_biased_estimator(self):
        # the fixed-policy second pass must agree with single-pass LSMC
        # within noise and sit at/below the lattice price
        ref = crr(self.OPT, "put", N=4000, american=True)
        lo, lo_se = lsmc_price(self.OPT, "put", n_paths=100_000,
                               n_steps=16, seed=1, bound="lower",
                               dtype="float64")
        single, s_se = lsmc_price(self.OPT, "put", n_paths=100_000,
                                  n_steps=16, seed=1, dtype="float64")
        assert abs(lo - single) < 5 * np.hypot(lo_se, s_se)
        assert lo < ref + 3 * lo_se

    def test_invalid_bound_raises(self):
        import pytest

        with pytest.raises(ValueError, match="bound"):
            lsmc_price(self.OPT, "put", bound="upper")


class TestHestonLsmc:
    """American LSMC under Heston dynamics (QE paths, (S, v) regression
    basis). Oracle: the 2-D ADI PDE with American projection — the two
    engines bracket from independent directions (Bermudan-50 LSMC with a
    sub-optimal implementable policy must land slightly BELOW the
    continuous-exercise PDE price, never materially above)."""

    HP = dict(v0=0.04, kappa=1.5, theta=0.04, xi=0.5, rho=-0.6)
    OPT = OptionSpec(S0=100.0, K=110.0, T=1.0, r=0.05, sigma=0.2)

    def test_dual_bracket_contains_adi(self):
        # bound="both": two-pass lower + Andersen-Broadie dual upper via
        # nested QE rollouts with the optional-stopping COS control
        # variate (European value AT the stopping time; corr ≈ 0.99 with
        # the stopped payoff).  The bracket targets the BERMUDAN-9 price
        # — oracle: the ADI march with exercise_dates — and with the CV
        # it is tight enough to resolve Bermudan-9 from the continuous
        # American price (0.11 apart on this fixture).  The ±0.06
        # allowance on top of the MC bands covers the QE weak error at
        # dt=1/9 (the LSMC prices Bermudan-9 under 9-step QE dynamics,
        # the ADI under continuous Heston; measured +0.035 on the
        # European at this dt).
        from optpricer_tpu import heston_fd_price

        ref_am = float(heston_fd_price(100.0, 110.0, 1.0, 0.05, 0.0,
                                       **self.HP, kind="put",
                                       american=True))
        ref_b9 = float(heston_fd_price(
            100.0, 110.0, 1.0, 0.05, 0.0, **self.HP, kind="put",
            n_t=504, exercise_dates=[j / 9 for j in range(1, 9)]))
        br = lsmc_price(self.OPT, "put", heston=self.HP, n_paths=20_000,
                        n_steps=9, seed=2, bound="both", n_inner=64,
                        n_upper_paths=1_024)
        lo, lo_se = br["lower"]
        up, up_se = br["upper"]
        qe_tol = 0.06
        assert lo - 2 * lo_se - qe_tol <= ref_b9 <= up + 2 * up_se \
            + qe_tol, (lo, ref_b9, up)
        assert br["gap"] >= -(lo_se + up_se)
        assert br["gap"] < 0.10                   # CV-tight (was 0.34)
        # the lower bound can never materially exceed the continuous
        # American price
        assert lo - 2 * lo_se <= ref_am

    def test_bermudan_adi_monotone_in_dates(self):
        # more exercise rights can only add value: European ADI ≤
        # Bermudan-3 ≤ Bermudan-9 ≤ American ADI (same grid)
        from optpricer_tpu import heston_fd_price, heston_price_cos

        kw = dict(v0=0.04, kappa=1.5, theta=0.04, xi=0.5, rho=-0.6,
                  kind="put", n_t=504)
        eu = heston_fd_price(100.0, 110.0, 1.0, 0.05, 0.0, **kw)
        b3 = heston_fd_price(100.0, 110.0, 1.0, 0.05, 0.0, **kw,
                             exercise_dates=[1 / 3, 2 / 3])
        b9 = heston_fd_price(100.0, 110.0, 1.0, 0.05, 0.0, **kw,
                             exercise_dates=[j / 9 for j in range(1, 9)])
        am = heston_fd_price(100.0, 110.0, 1.0, 0.05, 0.0, **{
            k: v for k, v in kw.items() if k != "n_t"}, american=True)
        assert eu < b3 < b9 < am
        # and the European ADI agrees with the COS oracle
        cos = float(heston_price_cos(100.0, 110.0, 1.0, 0.05, 0.0,
                                     v0=0.04, kappa=1.5, theta=0.04,
                                     xi=0.5, rho=-0.6, kind="put"))
        assert abs(eu - cos) < 5e-3

    def test_bermudan_adi_rejects_american_flag(self):
        import pytest
        from optpricer_tpu import heston_fd_price

        with pytest.raises(ValueError, match="mutually exclusive"):
            heston_fd_price(100.0, 110.0, 1.0, 0.05, 0.0, v0=0.04,
                            kappa=1.5, theta=0.04, xi=0.5, rho=-0.6,
                            kind="put", american=True,
                            exercise_dates=[0.5])

    def test_brackets_adi_pde(self):
        from optpricer_tpu import heston_fd_price

        ref = heston_fd_price(100.0, 110.0, 1.0, 0.05, 0.0, **self.HP,
                              kind="put", american=True)
        lo, se = lsmc_price(self.OPT, "put", heston=self.HP,
                            n_paths=100_000, n_steps=50, seed=2,
                            bound="lower")
        assert lo < ref + 4 * se + 5e-3, (lo, ref)   # low-biased
        assert lo > ref - 0.15                       # but tight
        # European floor: early exercise must add value
        from optpricer_tpu import heston_price_cos

        eu = float(heston_price_cos(100.0, 110.0, 1.0, 0.05, 0.0,
                                    **self.HP, kind="put"))
        assert lo > eu + 0.5

    def test_call_no_dividend_equals_european(self):
        from optpricer_tpu import heston_price_cos

        eu = float(heston_price_cos(100.0, 100.0, 1.0, 0.05, 0.0,
                                    **self.HP, kind="call"))
        opt = OptionSpec(S0=100.0, K=100.0, T=1.0, r=0.05, sigma=0.2)
        px, se = lsmc_price(opt, "call", heston=self.HP, n_paths=100_000,
                            n_steps=50, seed=4)
        assert abs(px - eu) < 4 * se + 0.02

    def test_degenerate_heston_matches_gbm_lsmc(self):
        # xi→0 with v0 = θ = 0.0625 freezes the variance: the Heston
        # LSMC must agree with plain GBM LSMC at σ = 0.25
        hp0 = dict(v0=0.0625, kappa=1.5, theta=0.0625, xi=1e-6, rho=0.0)
        opt25 = OptionSpec(S0=100.0, K=110.0, T=1.0, r=0.05, sigma=0.25)
        pg, seg = lsmc_price(opt25, "put", n_paths=100_000, n_steps=25,
                             seed=2)
        ph, seh = lsmc_price(opt25, "put", heston=hp0,
                             n_paths=100_000, n_steps=25, seed=2)
        assert abs(ph - pg) < 4 * (seg + seh) + 0.02

    def test_heston_bermudan_limits(self):
        # empty date set = the European COS price; the full grid equals
        # the single-pass American exactly (no binding t=0 floor at
        # K=110); sparse dates land strictly between
        from optpricer_tpu import heston_price_cos

        kw = dict(heston=self.HP, n_paths=100_000, n_steps=20, seed=4)
        pe, se = lsmc_price(self.OPT, "put", exercise_dates=[], **kw)
        eu = float(heston_price_cos(100.0, 110.0, 1.0, 0.05, 0.0,
                                    **self.HP, kind="put"))
        assert abs(pe - eu) < 4.0 * se
        full = list(np.linspace(0.05, 1.0, 20))
        pf, _ = lsmc_price(self.OPT, "put", exercise_dates=full, **kw)
        pa, _ = lsmc_price(self.OPT, "put", **kw)
        assert pf == pa
        pq, _ = lsmc_price(self.OPT, "put",
                           exercise_dates=[0.25, 0.5, 0.75], **kw)
        assert pe - 2 * se < pq < pa + 2 * se

    def test_lsv_bermudan_limits(self):
        # flat unit leverage = plain Heston dynamics; Bermudan masks on
        # the leverage grid must give European <= sparse <= full = the
        # American run exactly
        import jax.numpy as jnp

        from optpricer_tpu import LSVModel

        model = LSVModel(S0=100.0, r=0.05, q=0.0, T=1.0, v0=0.04,
                         kappa=1.5, theta=0.04, xi=0.5, rho=-0.6,
                         x_bins=jnp.linspace(-1.0, 1.0, 9),
                         leverage=jnp.ones((16, 9)))
        kw = dict(lsv=model, n_paths=50_000, seed=4)
        pe, se = lsmc_price(self.OPT, "put", exercise_dates=[], **kw)
        pq, _ = lsmc_price(self.OPT, "put",
                           exercise_dates=[0.25, 0.5, 0.75], **kw)
        pf, _ = lsmc_price(self.OPT, "put",
                           exercise_dates=list(np.linspace(1 / 16, 1.0,
                                                           16)), **kw)
        pa, _ = lsmc_price(self.OPT, "put", **kw)
        assert pe - 2 * se <= pq <= pf + 2 * se
        assert pf == pa

    def test_lsv_dual_bracket_contains_adi(self):
        # bound="both" under lsv=: flat UNIT leverage under the QE scheme
        # is plain Heston, so the leverage-aware Andersen-Broadie dual
        # (_lsmc_dual_upper_lsv) must bracket the deterministic ADI
        # price of the SAME contract — the Bermudan with the 9 grid
        # exercise dates. (With the Black-budget CV the dual is tight
        # enough to resolve the Bermudan-9 vs continuous-American gap
        # (~0.11 here), so the matching-oracle comparison is the honest
        # one; the continuous ADI price stays as an upper sanity line.)
        import jax.numpy as jnp

        from optpricer_tpu import LSVModel, heston_fd_price

        model = LSVModel(S0=100.0, r=0.05, q=0.0, T=1.0, **self.HP,
                         x_bins=jnp.linspace(-1.0, 1.0, 9),
                         leverage=jnp.ones((9, 9)), scheme="qe")
        dates = [j / 9.0 for j in range(1, 10)]
        ref = float(heston_fd_price(100.0, 110.0, 1.0, 0.05, 0.0,
                                    **self.HP, kind="put",
                                    exercise_dates=dates))
        ref_amer = float(heston_fd_price(100.0, 110.0, 1.0, 0.05, 0.0,
                                         **self.HP, kind="put",
                                         american=True))
        br = lsmc_price(self.OPT, "put", lsv=model, n_paths=20_000,
                        seed=2, bound="both", n_inner=64,
                        n_upper_paths=1_024)
        lo, lo_se = br["lower"]
        up, up_se = br["upper"]
        assert lo - 3 * lo_se <= ref <= up + 2 * up_se, (lo, ref, up)
        # an implementable Bermudan-9 policy can never beat the
        # continuous-exercise American price
        assert lo - 2 * lo_se <= ref_amer
        assert br["gap"] >= -(lo_se + up_se)
        assert br["gap"] < 0.05 * ref

    def test_sharded_heston_matches_single(self):
        from optpricer_tpu import lsmc_price_sharded
        from optpricer_tpu.parallel.mesh import get_mesh

        opt = OptionSpec(S0=100.0, K=110.0, T=1.0, r=0.05, sigma=0.2)
        p1, se1 = lsmc_price(opt, "put", heston=self.HP,
                             n_paths=1 << 15, n_steps=16, seed=3)
        pm, sem = lsmc_price_sharded(get_mesh(8), opt, "put",
                                     heston=self.HP, n_paths=1 << 15,
                                     n_steps=16, seed=3)
        # different stream layouts: statistical agreement is the contract
        assert abs(p1 - pm) < 4 * (se1 + sem) + 0.08, (p1, pm)

    def test_basis_dim_above_six(self):
        # regression: k > 6 used to crash with a (6,6)+(k,k) broadcast
        # error (the local basis capped at 6 columns while eye/solve
        # were sized by basis_dim); _sv_basis honours any k >= 3
        px, se = lsmc_price(self.OPT, "put", heston=self.HP,
                            basis_dim=7, n_paths=20_000, n_steps=16,
                            seed=2)
        assert np.isfinite(px) and px > 0 and se > 0


class TestBermudan:
    """exercise_dates= restricts the LSMC policy to given dates: the
    empty set is the European limit, nesting is monotone, the full grid
    reproduces the American run exactly (same paths, same seed)."""

    OPT = OptionSpec(S0=100.0, K=100.0, T=1.0, r=0.05, sigma=0.2)
    KW = dict(n_paths=40_000, n_steps=24, seed=9)

    def test_empty_set_is_european(self):
        from optpricer_tpu import bs_price

        eu = float(bs_price(self.OPT, "put"))
        px, se = lsmc_price(self.OPT, "put", exercise_dates=[], **self.KW)
        assert abs(px - eu) < 4.0 * se + 1e-3, (px, eu)

    def test_monotone_in_exercise_dates(self):
        quarterly = [0.25, 0.5, 0.75]
        monthly = [i / 12 for i in range(1, 12)]
        pq, _ = lsmc_price(self.OPT, "put", exercise_dates=quarterly,
                           **self.KW)
        pm, _ = lsmc_price(self.OPT, "put", exercise_dates=monthly,
                           **self.KW)
        pa, _ = lsmc_price(self.OPT, "put", **self.KW)
        assert pq <= pm + 1e-9
        assert pm <= pa + 0.02  # independent regressions: small noise

    def test_full_grid_equals_american(self):
        n = self.KW["n_steps"]
        full = [i / n for i in range(1, n)]
        pb, _ = lsmc_price(self.OPT, "put", exercise_dates=full, **self.KW)
        pa, _ = lsmc_price(self.OPT, "put", **self.KW)
        assert abs(pb - pa) < 1e-6, (pb, pa)

    def test_guards(self):
        with pytest.raises(ValueError, match="Bermudan"):
            lsmc_price(self.OPT, "put", exercise_dates=[0.5],
                       bound="lower", **self.KW)
        with pytest.raises(ValueError, match="outside"):
            lsmc_price(self.OPT, "put", exercise_dates=[1.5], **self.KW)
        # heston=/lsv= Bermudans landed; Bermudan + bound remains the
        # guarded combination (single-pass estimator only)
        import jax.numpy as jnp

        from optpricer_tpu import LSVModel

        model = LSVModel(S0=100.0, r=0.05, q=0.0, T=1.0, v0=0.04,
                         kappa=1.5, theta=0.04, xi=0.5, rho=-0.6,
                         x_bins=jnp.linspace(-1.0, 1.0, 5),
                         leverage=jnp.ones((4, 5)))
        with pytest.raises(ValueError, match="single-pass"):
            lsmc_price(self.OPT, "put", exercise_dates=[0.5],
                       bound="lower", lsv=model, **self.KW)

    def test_date_rounding_to_zero_clamps_to_first_node(self):
        # a tiny early date must keep its exercise right at node 1, not
        # be silently dropped (review fix)
        p_tiny, _ = lsmc_price(self.OPT, "put", exercise_dates=[1e-3],
                               **self.KW)
        p_none, _ = lsmc_price(self.OPT, "put", exercise_dates=[],
                               **self.KW)
        p_first, _ = lsmc_price(self.OPT, "put",
                                exercise_dates=[1.0 / self.KW["n_steps"]],
                                **self.KW)
        assert abs(p_tiny - p_first) < 1e-9
        assert p_tiny >= p_none - 1e-9
