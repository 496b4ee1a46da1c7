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
