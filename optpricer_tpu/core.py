"""Contract and market-data containers.

Re-architecture of the reference data model (reference ``core.py:12-113``):
``OptionSpec`` / ``Instrument`` / ``MarketData`` with construction-time
validation (validation lives *outside* jit; inside jit everything is plain
arrays). ``MarketData.iv`` delegates to a calibrated
:class:`~optpricer_tpu.models.calibration.VolSurface` when present
(reference ``core.py:96-100``).

The containers are registered as JAX pytrees so a spec can be passed through
``jax.tree_util`` transformations, carried in scan/vmap closures, and batched:
array-valued fields broadcast naturally through the vectorised pricers.
"""
from __future__ import annotations

from dataclasses import dataclass, fields
from typing import TYPE_CHECKING

import jax

if TYPE_CHECKING:  # avoid import cycle, same pattern as reference core.py:5-6
    from .models.calibration import VolSurface

CALL = "call"
PUT = "put"


def _register_pytree(cls, data_fields, meta_fields=()):
    def flatten(obj):
        children = tuple(getattr(obj, f) for f in data_fields)
        meta = tuple(getattr(obj, f) for f in meta_fields)
        return children, meta

    def unflatten(meta, children):
        obj = object.__new__(cls)
        for f, v in zip(data_fields, children):
            object.__setattr__(obj, f, v)
        for f, v in zip(meta_fields, meta):
            object.__setattr__(obj, f, v)
        return obj

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)


@dataclass(frozen=True)
class OptionSpec:
    """Single-option container bundling instrument + market data.

    Convenience wrapper for scalar workflows; batch pricing goes through the
    vectorised pricers with explicit arrays (or array-valued fields here).
    Mirrors reference ``core.py:12-34`` including the positivity checks.
    """

    S0: float
    K: float
    T: float          # years
    r: float          # continuous risk-free
    sigma: float
    q: float = 0.0    # continuous dividend yield

    def __post_init__(self):
        for name in ("S0", "K", "T", "sigma"):
            v = getattr(self, name)
            # Skip validation for traced/array values (inside jit/vmap).
            if isinstance(v, (int, float)) and v <= 0:
                raise ValueError(f"{name} must be positive, got {v}")


@dataclass(frozen=True)
class Instrument:
    """What the contract *is* — static terms (reference ``core.py:40-70``)."""

    K: float
    T: float
    kind: str = "call"
    exercise: str = "european"

    def __post_init__(self):
        for name in ("K", "T"):
            v = getattr(self, name)
            if isinstance(v, (int, float)) and v <= 0:
                raise ValueError(f"{name} must be positive, got {v}")
        if self.kind not in (CALL, PUT):
            raise ValueError(f"kind must be 'call' or 'put', got {self.kind!r}")
        if self.exercise not in ("european", "american"):
            raise ValueError(
                f"exercise must be 'european' or 'american', got {self.exercise!r}"
            )


@dataclass
class MarketData:
    """What is *moving* — spot/rate/yield plus an optional calibrated surface
    (reference ``core.py:73-100``)."""

    spot: float
    rate: float
    q: float = 0.0
    vol_surface: "VolSurface | None" = None
    flat_vol: float = 0.0

    def iv(self, K: float, T: float) -> float:
        """Implied vol — from calibrated surface if available, else flat."""
        if self.vol_surface is not None:
            return float(self.vol_surface.iv(K, T))
        return self.flat_vol


def to_instrument_market(opt: OptionSpec, kind: str = CALL):
    """Decompose a legacy ``OptionSpec`` into the production pair
    (reference ``core.py:103-109``)."""
    inst = Instrument(K=opt.K, T=opt.T, kind=kind)
    mkt = MarketData(spot=opt.S0, rate=opt.r, q=opt.q, flat_vol=opt.sigma)
    return inst, mkt


_register_pytree(OptionSpec, ("S0", "K", "T", "r", "sigma", "q"))
_register_pytree(Instrument, ("K", "T"), ("kind", "exercise"))
