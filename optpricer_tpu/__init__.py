# optpricer_tpu — TPU-native options pricing engine (JAX / XLA / Pallas).
#
# A from-scratch re-architecture of the capabilities of
# mengrenman/options-pricing-engine-black-scholes-binomial-monte-carlo
# (reference package `optpricer` 0.3.0, /root/reference/src/optpricer/__init__.py)
# designed TPU-first: every engine is a pure jitted function, time recursions
# are lax.scan, Monte-Carlo uses counter-based keys with fused
# sufficient-statistics reduction, and data parallelism is a jax.sharding.Mesh
# with psum over ICI instead of a process pool.
#
# Public API mirrors the reference's 41 exports
# (reference __init__.py:46-72) for drop-in parity.

import os as _os

import jax as _jax

# The axon TPU plugin ignores JAX_PLATFORMS from the environment; honour the
# user's/driver's explicit platform request via the config (authoritative).
# No-op when unset or when backends are already initialised.
_env_platforms = _os.environ.get("JAX_PLATFORMS")
if _env_platforms and _env_platforms != "axon":
    try:
        _jax.config.update("jax_platforms", _env_platforms)
    except Exception:
        pass

# Legacy scalar interface
from .core import OptionSpec, CALL, PUT
from .ops.black_scholes import (
    price as bs_price,
    greeks as bs_greeks,
    implied_vol,
)
from .models.monte_carlo import euro_greeks_mc, euro_price_mc
from .models.binomial import crr

# Production data model
from .core import Instrument, MarketData, to_instrument_market

# Vectorised pricers
from .ops.black_scholes import (bs_price_vec, bs_greeks_vec,
                                bs_implied_vol_vec, bs_higher_greeks_vec)
from .models.binomial import crr_vec

# Exotic payoffs
from .models.exotics import (
    barrier_price,
    asian_price,
    digital_price,
    lookback_price,
    double_barrier_price,
)

# Calibration & Dupire
from .models.calibration import (
    SVIParams,
    VolSurface,
    fit_svi,
    fit_svi_surface,
    dupire_local_vol,
    dupire_local_vol_func,
    fit_essvi,
    svi_butterfly_g,
    svi_density,
    check_butterfly,
    check_calendar,
    arbitrage_report,
)

# PDE (Finite Difference)
from .models.pde import (fd_price, fd_price_barrier,
                         fd_price_double_barrier, fd_greeks,
                         fd_price_local_vol)

# FEM (Finite Element)
from .models.fem import fem_price

# Stochastic processes — Milstein schemes
from .models.processes import gbm_milstein_paths, milstein_local_vol_paths

# Risk engine
from .risk import (
    numerical_greeks,
    scenario_grid,
    portfolio_risk,
    var_historical,
    cvar_historical,
)

# Model validation
from .validation import (
    cross_validate,
    convergence_analysis,
    stress_test,
    backtest_delta_hedge,
)

# TPU-native extensions beyond the reference API
from .models.mlmc import mlmc_price
from .models.mc_fused import (exotic_price_mc, exotic_price_mc_dupire,
                              exotic_greeks_mc)
from .models.american_mc import (lsmc_price, lsmc_price_basket,
                                 lsmc_price_batch, lsmc_price_sharded)
from .models.pde import fd_price_batch, fd_price_local_vol_batch
from .models.analytic import (merton_price, heston_price_cos,
                              bates_price_cos, quanto_price,
                              quanto_adjusted_carry,
                              sabr_implied_vol, sabr_price_hagan,
                              geometric_asian_price, fit_heston,
                              heston_greeks_cos, cev_price,
                              barrier_price_bs, chooser_price,
                              compound_price, lookback_price_bs,
                              double_barrier_price_bs)
from .models.processes import (bates_paths, gbm_paths,
                               merton_jump_paths, heston_paths,
                               sabr_paths, local_vol_paths)
from .models.levy import (vg_price_cos, nig_price_cos, cgmy_price_cos,
                          vg_paths, nig_paths, fit_vg)
from .models.binomial import american_implied_vol
from .models.american_analytic import (bjerksund_stensland_price,
                                       baw_price, rgw_price)
from .models.heston_pde import (heston_fd_price, heston_fd_grid,
                                heston_fd_greeks, heston_fd_price_batch,
                                heston_fd_price_barrier)
from .models.basket import (basket_price_mc, basket_greeks_mc,
                            basket_exotic_mc, geometric_basket_price,
                            margrabe_price, rainbow_price_stulz)
from .ops.bvn import bvn_cdf
from .models.lsv import (LSVModel, lsv_calibrate, lsv_greeks_mc,
                         lsv_path_matrix, lsv_price_mc)
from .models.forward_pde import (ForwardSurface, dupire_forward_surface,
                                 dupire_forward_price, forward_surface_iv,
                                 reprice_surface_forward)
from .models.varswap import (varswap_strike_replication,
                             varswap_strike_heston, varswap_strike_mc,
                             volswap_strike_mc)
from .models.rough import rbergomi_paths, rbergomi_price
from .models.cliquet import (forward_start_price, cliquet_price_bs,
                             cliquet_price_mc)
from .risk import ad_greeks, exposure_profile, portfolio_risk_fast

__all__ = [
    # Legacy
    "OptionSpec", "CALL", "PUT",
    "bs_price", "bs_greeks", "implied_vol",
    "euro_price_mc", "crr",
    # Production data model
    "Instrument", "MarketData", "to_instrument_market",
    # Vectorised
    "bs_price_vec", "bs_greeks_vec", "bs_implied_vol_vec", "crr_vec",
    "bs_higher_greeks_vec",
    # Exotics
    "barrier_price", "asian_price", "digital_price", "lookback_price",
    "double_barrier_price",
    # Calibration & Dupire
    "SVIParams", "VolSurface", "fit_svi", "fit_svi_surface", "fit_essvi",
    "dupire_local_vol", "dupire_local_vol_func", "svi_butterfly_g",
    "svi_density", "check_butterfly", "check_calendar", "arbitrage_report",
    # PDE (Finite Difference)
    "fd_price", "fd_price_barrier", "fd_price_double_barrier",
    "fd_greeks", "fd_price_local_vol",
    # FEM (Finite Element)
    "fem_price",
    # Milstein
    "gbm_milstein_paths", "milstein_local_vol_paths", "gbm_paths",
    "merton_jump_paths", "heston_paths", "sabr_paths", "local_vol_paths",
    # Risk
    "numerical_greeks", "scenario_grid", "portfolio_risk",
    "var_historical", "cvar_historical",
    # Validation
    "cross_validate", "convergence_analysis", "stress_test",
    "backtest_delta_hedge",
    # TPU-native extensions
    "exotic_price_mc", "exotic_price_mc_dupire", "fd_price_batch",
    "mlmc_price",
    "fd_price_local_vol_batch", "lsmc_price", "lsmc_price_batch",
    "lsmc_price_sharded", "lsmc_price_basket",
    "euro_greeks_mc", "exotic_greeks_mc",
    "merton_price", "heston_price_cos", "cev_price", "barrier_price_bs",
    "lookback_price_bs", "double_barrier_price_bs",
    "bates_price_cos", "bates_paths", "american_implied_vol",
    "vg_price_cos", "nig_price_cos", "cgmy_price_cos",
    "vg_paths", "nig_paths", "fit_vg",
    "quanto_price", "quanto_adjusted_carry",
    "sabr_implied_vol",
    "sabr_price_hagan", "geometric_asian_price", "fit_heston",
    "heston_greeks_cos",
    "heston_fd_price", "heston_fd_grid", "heston_fd_greeks",
    "heston_fd_price_batch", "heston_fd_price_barrier",
    "basket_price_mc", "basket_greeks_mc", "basket_exotic_mc",
    "geometric_basket_price",
    "margrabe_price", "rainbow_price_stulz", "bvn_cdf",
    "chooser_price", "compound_price",
    "bjerksund_stensland_price", "baw_price", "rgw_price",
    "LSVModel", "lsv_calibrate", "lsv_greeks_mc", "lsv_path_matrix",
    "lsv_price_mc",
    "ForwardSurface", "dupire_forward_surface", "dupire_forward_price",
    "forward_surface_iv", "reprice_surface_forward",
    "varswap_strike_replication", "varswap_strike_heston",
    "varswap_strike_mc", "volswap_strike_mc",
    "rbergomi_paths", "rbergomi_price",
    "forward_start_price", "cliquet_price_bs", "cliquet_price_mc",
    "ad_greeks", "portfolio_risk_fast", "exposure_profile",
]

__version__ = "0.1.0"
