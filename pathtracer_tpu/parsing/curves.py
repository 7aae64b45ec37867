"""Curve parsing: TOML curve tables + CSV/.spectra loaders.

Capability parity with src/parsing/curves.rs:43-399 — CurveData forms
{Blackbody, Linear, TabulatedCSV, Flat, Cauchy, SimpleSpike} with
domain_mapping, and by-name-or-inline resolution (CurveDataOrReference).
"""

from __future__ import annotations

import csv
from typing import Dict, Optional

import numpy as np

from pathtracer_tpu.core import spectral
from pathtracer_tpu.core.bounds import Bounds1D
from pathtracer_tpu.parsing.paths import resolve


def load_csv_column(path: str, column: int, x_scale: float = 1.0, x_offset: float = 0.0,
                    y_scale: float = 1.0, y_offset: float = 0.0):
    """CSV with header row; column 0 = wavelength, `column` = values.
    domain_mapping x_scale multiplies wavelengths (e.g. µm -> nm uses 1000)."""
    xs, ys = [], []
    with open(path, newline="") as f:
        reader = csv.reader(f)
        for row in reader:
            if not row:
                continue
            try:
                x = float(row[0])
                y = float(row[column])
            except (ValueError, IndexError):
                continue  # header or ragged line
            xs.append(x * x_scale + x_offset)
            ys.append(y * y_scale + y_offset)
    return np.asarray(xs), np.asarray(ys)


def load_spectra(path: str):
    """.spectra format: header line "start_nm, step_nm" then one value per
    line (reference: src/parsing/curves.rs .spectra loader)."""
    with open(path) as f:
        header = f.readline()
        start, step = [float(t) for t in header.replace(",", " ").split()[:2]]
        vals = [float(line) for line in f if line.strip()]
    bounds = Bounds1D(start, start + step * (len(vals) - 1))
    return np.asarray(vals), bounds


def parse_curve(data, curve_lib: Optional[Dict[str, dict]] = None,
                search_paths=None) -> spectral.HostCurve:
    """Parse a curve: either a name string (lib lookup) or an inline table."""
    if isinstance(data, str):
        if curve_lib is None or data not in curve_lib:
            raise KeyError(f"unknown curve reference: {data!r}")
        return parse_curve(curve_lib[data], curve_lib, search_paths)
    typ = data["type"]
    if typ == "Flat":
        return spectral.FlatCurve(float(data["strength"]))
    if typ == "Cauchy":
        return spectral.CauchyCurve(float(data["a"]), float(data["b"]))
    if typ == "Blackbody":
        return spectral.BlackbodyCurve(float(data["temperature"]), float(data.get("strength", 1.0)))
    if typ == "SimpleSpike":
        return spectral.SpikeCurve(
            float(data["lambda"]),
            float(data.get("left_taper", 1.0)),
            float(data.get("right_taper", 1.0)),
            float(data["strength"]),
        )
    if typ == "TabulatedCSV":
        dm = data.get("domain_mapping", {})
        xs, ys = load_csv_column(
            resolve(data["filename"], search_paths),
            int(data.get("column", 1)),
            x_scale=float(dm.get("x_scale", 1.0)),
            x_offset=float(dm.get("x_offset", 0.0)),
            y_scale=float(dm.get("y_scale", 1.0)),
            y_offset=float(dm.get("y_offset", 0.0)),
        )
        mode = data.get("interpolation_mode", "Cubic")
        return spectral.TabulatedCurve(xs, ys, mode)
    if typ == "Linear":
        vals, bounds = load_spectra(resolve(data["filename"], search_paths))
        dm = data.get("domain_mapping", {})
        if dm:
            bounds = Bounds1D(
                bounds.lower * float(dm.get("x_scale", 1.0)) + float(dm.get("x_offset", 0.0)),
                bounds.upper * float(dm.get("x_scale", 1.0)) + float(dm.get("x_offset", 0.0)),
            )
        return spectral.LinearCurve(vals, bounds, data.get("interpolation_mode", "Linear"))
    raise ValueError(f"unknown curve type {typ!r}")
