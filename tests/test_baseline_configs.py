"""CPU-sized versions of the five driver benchmark configs (BASELINE.json).

Each config is exercised end-to-end so the exact benchmark paths stay green
in CI; the full-size runs live in bench.py (TPU).
"""
import numpy as np

from optpricer_tpu import (
    CALL, PUT, OptionSpec, bs_greeks, bs_price, crr_vec, euro_price_mc,
    exotic_price_mc, exotic_price_mc_dupire, fd_greeks, fd_price,
    fd_price_barrier, fd_price_local_vol, fit_svi_surface, implied_vol,
)


def test_config1_bs_price_greeks_iv():
    """BS European call S0=100 K=110 T=1 r=3% σ=20%: price + Greeks + IV."""
    opt = OptionSpec(S0=100.0, K=110.0, T=1.0, r=0.03, sigma=0.2)
    px = bs_price(opt, CALL)
    assert abs(px - 5.2933981) < 1e-5
    g = bs_greeks(opt, CALL)
    assert set(g) == {"delta", "gamma", "vega", "theta", "rho"}
    assert abs(implied_vol(opt, px, CALL) - 0.2) < 1e-6


def test_config2_crr_american_put_strike_batch():
    """CRR American put N=500, vectorised over a 1k-strike batch."""
    Ks = np.linspace(50.0, 150.0, 1000)
    px = np.asarray(crr_vec(100.0, Ks, 1.0, 0.05, 0.0, 0.2, PUT, N=500,
                            american=True))
    assert px.shape == (1000,)
    assert np.all(np.diff(px) > 0)
    # deep-ITM American put = intrinsic
    assert abs(px[-1] - (150.0 - 100.0)) < 0.5


def test_config3_mc_euro_and_asian_seed_reproducible():
    """GBM MC European + arithmetic Asian, antithetic + CV, reproducible."""
    opt = OptionSpec(S0=100.0, K=100.0, T=1.0, r=0.03, sigma=0.2)
    p1, se1 = euro_price_mc(opt, CALL, n_paths=100_000, seed=11)
    p2, se2 = euro_price_mc(opt, CALL, n_paths=100_000, seed=11)
    assert p1 == p2 and se1 == se2
    a1 = exotic_price_mc("asian", 100.0, 100.0, 1.0, 0.03, sigma=0.2,
                         n_steps=64, n_paths=50_000, seed=11)
    a2 = exotic_price_mc("asian", 100.0, 100.0, 1.0, 0.03, sigma=0.2,
                         n_steps=64, n_paths=50_000, seed=11)
    assert a1 == a2
    assert a1[0] < p1  # Asian below vanilla


def test_config4_fdm_512_grid():
    """FDM 512-node grid: European, American put (PSOR), barrier + Greeks."""
    opt = OptionSpec(S0=100.0, K=100.0, T=1.0, r=0.05, sigma=0.2)
    eu = fd_price(opt, CALL, N_S=512, N_t=256)
    assert abs(eu - bs_price(opt, CALL)) / eu < 1e-3
    am = fd_price(opt, PUT, N_S=512, N_t=256, american=True,
                  american_method="psor")
    assert am > fd_price(opt, PUT, N_S=512, N_t=256)
    ko = fd_price_barrier(opt, CALL, 130.0, "up-and-out", N_S=512, N_t=256)
    assert 0 < ko < eu
    g = fd_greeks(opt, CALL, N_S=512, N_t=256)
    assert abs(g["delta"] - bs_greeks(opt, CALL)["delta"]) < 0.005


def test_config5_desk_workflow_pipeline():
    """SVI calibration → Dupire σ(S,t) → local-vol MC vs local-vol FDM."""
    S0, r, q = 100.0, 0.05, 0.02
    expiries = [0.25, 0.5, 1.0]
    forwards = {T: S0 * np.exp((r - q) * T) for T in expiries}
    strikes, ivs = {}, {}
    for T in expiries:
        F = forwards[T]
        K = np.linspace(0.8 * F, 1.2 * F, 15)
        k = np.log(K / F)
        strikes[T] = K
        ivs[T] = 0.2 + 0.05 * k**2 - 0.02 * k + 0.005 * np.sqrt(T)
    surface = fit_svi_surface(strikes, forwards, ivs)

    from optpricer_tpu import dupire_local_vol_func

    sigma_loc = dupire_local_vol_func(surface, r=r, q=q)
    fd_lv = fd_price_local_vol(S0, 100.0, 1.0, r, q, sigma_loc, CALL,
                               N_S=200, N_t=200)
    mc_lv, mc_se = exotic_price_mc_dupire(
        "vanilla", surface, S0, 100.0, 1.0, r, q, scheme="milstein",
        n_steps=100, n_paths=50_000, seed=21)
    assert abs(fd_lv - mc_lv) < 5 * mc_se + 0.15, (fd_lv, mc_lv, mc_se)
    ko, ko_se = exotic_price_mc_dupire(
        "barrier", surface, S0, 100.0, 1.0, r, q, scheme="milstein",
        barrier=130.0, barrier_type="up-and-out", n_steps=100,
        n_paths=50_000, seed=22)
    assert 0 < ko < fd_lv
