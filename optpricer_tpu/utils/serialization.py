"""Checkpoint / persistence for calibration artifacts.

The reference persists calibration results as ad-hoc JSON in a script
(``scripts/calibrate_surface.py:90-93``) with no in-library support. Here
serialization is a first-class utility: SVI slices and whole surfaces
round-trip through JSON (human-readable, diff-able) and, being pytrees,
also work with any JAX checkpointing stack (e.g. orbax) for larger state.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Union

from ..models.calibration import SVIParams, VolSurface

__all__ = [
    "svi_to_dict", "svi_from_dict",
    "surface_to_json", "surface_from_json",
    "save_surface", "load_surface",
    "heston_to_dict", "heston_from_dict", "save_heston", "load_heston",
    "basket_to_dict", "basket_from_dict", "save_basket", "load_basket",
    "lsv_to_dict", "lsv_from_dict", "save_lsv", "load_lsv",
]


def svi_to_dict(p: SVIParams) -> dict:
    return {"a": float(p.a), "b": float(p.b), "rho": float(p.rho),
            "m": float(p.m), "sigma": float(p.sigma),
            "expiry": float(p.expiry)}


def svi_from_dict(d: dict) -> SVIParams:
    return SVIParams(a=float(d["a"]), b=float(d["b"]), rho=float(d["rho"]),
                     m=float(d["m"]), sigma=float(d["sigma"]),
                     expiry=float(d["expiry"]))


def surface_to_json(surface: VolSurface) -> str:
    payload = {
        "slices": {str(T): svi_to_dict(p)
                   for T, p in surface.slices.items()},
        "forward_curve": {str(T): float(F)
                          for T, F in surface._forward_curve.items()},
    }
    return json.dumps(payload, indent=2, sort_keys=True)


def surface_from_json(text: str) -> VolSurface:
    payload = json.loads(text)
    slices = {float(T): svi_from_dict(d)
              for T, d in payload["slices"].items()}
    fwd = {float(T): float(F)
           for T, F in payload.get("forward_curve", {}).items()}
    return VolSurface(slices, forward_curve=fwd or None)


def save_surface(surface: VolSurface, path: Union[str, Path]) -> None:
    Path(path).write_text(surface_to_json(surface))


def load_surface(path: Union[str, Path]) -> VolSurface:
    return surface_from_json(Path(path).read_text())


# ---------------------------------------------------------------------------
# Model-parameter round trips (Heston fits, multi-asset specs)
# ---------------------------------------------------------------------------

_HESTON_KEYS = ("v0", "kappa", "theta", "xi", "rho")


def heston_to_dict(fit: dict) -> dict:
    """Normalise a ``fit_heston`` result (or raw param dict) for JSON."""
    out = {k: float(fit[k]) for k in _HESTON_KEYS}
    for extra in ("rmse", "S0", "r", "q"):
        if extra in fit:
            out[extra] = float(fit[extra])
    return out


def heston_from_dict(d: dict) -> dict:
    """The kwargs dict ``heston_price_cos`` / ``exotic_price_mc(heston=)``
    accept; missing keys raise early rather than price garbage."""
    missing = [k for k in _HESTON_KEYS if k not in d]
    if missing:
        raise KeyError(f"heston params missing {missing}")
    return {k: float(d[k]) for k in _HESTON_KEYS}


def save_heston(fit: dict, path: Union[str, Path]) -> None:
    Path(path).write_text(json.dumps(heston_to_dict(fit), indent=2,
                                     sort_keys=True))


def load_heston(path: Union[str, Path]) -> dict:
    return heston_from_dict(json.loads(Path(path).read_text()))


def basket_to_dict(*, S0s, weights, sigmas, corr, qs=None) -> dict:
    """JSON payload for a multi-asset spec (``models.basket`` inputs)."""
    import numpy as np

    a = len(list(S0s))
    qs = [0.0] * a if qs is None else list(map(float, qs))
    return {"S0s": list(map(float, S0s)),
            "weights": list(map(float, weights)),
            "sigmas": list(map(float, sigmas)), "qs": qs,
            "corr": np.asarray(corr, float).tolist()}


def basket_from_dict(d: dict) -> dict:
    import numpy as np

    out = {k: list(map(float, d[k]))
           for k in ("S0s", "weights", "sigmas", "qs")}
    out["corr"] = np.asarray(d["corr"], float)
    a = len(out["S0s"])
    if out["corr"].shape != (a, a):
        raise ValueError(f"corr must be ({a}, {a})")
    return out


def save_basket(path: Union[str, Path], **spec) -> None:
    Path(path).write_text(json.dumps(basket_to_dict(**spec), indent=2,
                                     sort_keys=True))


def load_basket(path: Union[str, Path]) -> dict:
    return basket_from_dict(json.loads(Path(path).read_text()))


def lsv_to_dict(model) -> dict:
    """JSON payload for a calibrated :class:`~optpricer_tpu.models.lsv.
    LSVModel` — Heston parameters + the (n_steps, n_bins) leverage table.
    The table is the expensive artifact (a particle calibration run);
    persisting it makes the calibrate-once / price-everywhere workflow
    restartable."""
    import numpy as np

    return {
        "S0": float(model.S0), "r": float(model.r), "q": float(model.q),
        "T": float(model.T), "v0": float(model.v0),
        "kappa": float(model.kappa), "theta": float(model.theta),
        "xi": float(model.xi), "rho": float(model.rho),
        "x_bins": np.asarray(model.x_bins, float).tolist(),
        "leverage": np.asarray(model.leverage, float).tolist(),
        "scheme": model.scheme,
    }


def lsv_from_dict(d: dict):
    import jax.numpy as jnp
    import numpy as np

    from ..dtypes import canonical
    from ..models.lsv import LSVModel

    dt = canonical(None)  # repr-exact JSON floats, so the round trip is
    x_bins = jnp.asarray(np.asarray(d["x_bins"]), dt)  # bit-exact at dt
    lev = jnp.asarray(np.asarray(d["leverage"]), dt)
    if lev.ndim != 2 or lev.shape[1] != x_bins.shape[0]:
        raise ValueError(f"leverage {lev.shape} inconsistent with "
                         f"{x_bins.shape[0]} x-bins")
    return LSVModel(S0=float(d["S0"]), r=float(d["r"]), q=float(d["q"]),
                    T=float(d["T"]), v0=float(d["v0"]),
                    kappa=float(d["kappa"]), theta=float(d["theta"]),
                    xi=float(d["xi"]), rho=float(d["rho"]),
                    x_bins=x_bins, leverage=lev,
                    scheme=str(d.get("scheme", "euler")))


def save_lsv(model, path: Union[str, Path]) -> None:
    Path(path).write_text(json.dumps(lsv_to_dict(model), sort_keys=True))


def load_lsv(path: Union[str, Path]):
    return lsv_from_dict(json.loads(Path(path).read_text()))
