"""Film output: premultiply, tonemap, write EXR (linear) + PNG (display).

Capability parity with output_film (src/renderer/mod.rs:24-80) +
write_to_files (src/tonemap/mod.rs:207-338): EXR carries linear RGB in the
chosen primaries with a chromaticities attribute; PNG is tonemapped + OETF'd
8-bit with gamma + chromaticity chunks.
"""

from __future__ import annotations

import os

import numpy as np

from pathtracer_tpu.core.cie import CHROMATICITIES
from pathtracer_tpu.tonemap import tonemap_to_rgb, write_exr, write_png


def output_film(
    film_xyz,
    name: str,
    tonemapper,
    colorspace: str = "Rec709",
    premultiply: float = 1.0,
    output_dir: str = "output",
):
    """Write output/{name}.exr + .png. Returns (exr_path, png_path)."""
    os.makedirs(output_dir, exist_ok=True)
    display, linear = tonemap_to_rgb(film_xyz, tonemapper, colorspace, premultiply)
    chroma = CHROMATICITIES.get(colorspace)
    exr_path = os.path.join(output_dir, f"{name}.exr")
    png_path = os.path.join(output_dir, f"{name}.png")
    write_exr(exr_path, np.asarray(linear, np.float32), chromaticities=chroma)
    write_png(png_path, np.asarray(display), chromaticities=chroma)
    return exr_path, png_path
