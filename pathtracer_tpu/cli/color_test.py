"""Spectral->color playground.

Capability parity with the reference's color_test binary (src/bin/
color_test.rs, feature `gui` — an egui spectral playground). Headless
equivalent: render swatch strips for curves (library names or built-ins
like blackbody temperatures), print XYZ/RGB coordinates, and write a PNG.

Usage:
  python -m pathtracer_tpu.cli.color_test --curves D65 cornell_white \\
      --blackbody 3000 5000 6500 --out output/color_test.png
"""

from __future__ import annotations

import argparse
import sys
import tomllib

import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.core import cie, spectral
from pathtracer_tpu.core.bounds import BOUNDED_VISIBLE_RANGE
from pathtracer_tpu.parsing.curves import parse_curve
from pathtracer_tpu.parsing.paths import DEFAULT_SEARCH_PATHS, resolve
from pathtracer_tpu.tonemap import sRGB_oetf, write_png


def curve_to_xyz(curve: spectral.HostCurve, n: int = 512):
    lams = np.linspace(BOUNDED_VISIBLE_RANGE.lower, BOUNDED_VISIBLE_RANGE.upper, n)
    vals = np.maximum(curve.sample(lams), 0.0)
    lamj = jnp.asarray(lams)
    x = float(np.trapezoid(np.asarray(cie.x_bar(lamj)) * vals, lams))
    y = float(np.trapezoid(np.asarray(cie.y_bar(lamj)) * vals, lams))
    z = float(np.trapezoid(np.asarray(cie.z_bar(lamj)) * vals, lams))
    return np.array([x, y, z])


def xyz_to_srgb(xyz: np.ndarray):
    rgb = np.asarray(cie.XYZ_TO_REC709) @ xyz
    m = rgb.max()
    if m > 1.0:
        rgb = rgb / m
    return np.clip(rgb, 0.0, 1.0)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--curves", nargs="*", default=["D65"])
    ap.add_argument("--blackbody", nargs="*", type=float, default=[])
    ap.add_argument("--lib", default="data/lib_curves.toml")
    ap.add_argument("--out", default="output/color_test.png")
    ap.add_argument("--swatch", type=int, default=48)
    args = ap.parse_args(argv)

    with open(resolve(args.lib, DEFAULT_SEARCH_PATHS), "rb") as f:
        lib = tomllib.load(f)

    entries = []
    for name in args.curves:
        entries.append((name, parse_curve(name, lib, DEFAULT_SEARCH_PATHS)))
    for t in args.blackbody:
        entries.append((f"blackbody_{int(t)}K", spectral.BlackbodyCurve(t, 1.0)))

    sw = args.swatch
    img = np.zeros((sw, sw * max(len(entries), 1), 3), np.float32)
    for i, (name, curve) in enumerate(entries):
        xyz = curve_to_xyz(curve)
        rgb = xyz_to_srgb(xyz)
        img[:, i * sw : (i + 1) * sw] = rgb
        print(f"{name:28s} XYZ=({xyz[0]:.4f}, {xyz[1]:.4f}, {xyz[2]:.4f}) "
              f"sRGB=({rgb[0]:.3f}, {rgb[1]:.3f}, {rgb[2]:.3f})")
    write_png(args.out, np.asarray(sRGB_oetf(jnp.asarray(img))))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
