"""Environment importance map: bake + cache.

Capability parity with src/world/importance_map.rs:32-357: per-row
conditional CDFs + a marginal CDF over rows of the luminance of
`luminance_curve × texel spectrum`, sampled by 2-level inverse transform
(done on device in world/environment.py); disk cache keyed by a content
hash (npz replacing the reference's bincode, cache path logic per
src/parsing/environment.rs:126-168).

The bake itself is a dense numpy/CIE quadrature — the reference rayon-izes
rows; here it is one vectorised einsum over (texels × λ-samples).
"""

from __future__ import annotations

import hashlib
import os
from typing import List, Optional, Tuple

import numpy as np

from pathtracer_tpu.core import spectral
from pathtracer_tpu.core.bounds import Bounds1D, BOUNDED_VISIBLE_RANGE


def bake_importance_tables(
    layers: List[Tuple[np.ndarray, int]],
    curves: List[spectral.HostCurve],
    width: int,
    height: int,
    luminance_curve: Optional[spectral.HostCurve] = None,
    bounds: Bounds1D = BOUNDED_VISIBLE_RANGE,
    n_lambda: int = 100,
):
    """layers: texture layers (weight map, curve index). Returns
    (marginal_cdf f32[H+1], row_cdf f32[H, W+1], pdf f32[H,W] — joint pdf
    over the uv unit square)."""
    lams = np.linspace(bounds.lower, bounds.upper, n_lambda)
    lum_w = luminance_curve.sample(lams) if luminance_curve is not None else np.ones_like(lams)
    # integrate Σ_layer weight(uv)·curve(λ)·lum(λ) dλ, downsampled to (H, W)
    lum = np.zeros((height, width), np.float64)
    for weights, curve_idx in layers:
        cw = float(np.trapezoid(np.maximum(curves[curve_idx].sample(lams), 0.0) * lum_w, lams))
        lum += _resample(weights, height, width) * cw
    # account for the equirect area element so sampling favours true radiance
    v = (np.arange(height) + 0.5) / height
    lum *= np.sin(np.pi * v)[:, None]
    lum = np.maximum(lum, 0.0)
    total = lum.sum()
    if total <= 0:
        lum = np.ones_like(lum)
        total = lum.sum()
    # joint pdf over uv (integrates to 1 over the unit square)
    pdf = lum / total * (width * height)
    row_sum = lum.sum(axis=1)
    marginal_cdf = np.concatenate([[0.0], np.cumsum(row_sum / total)])
    with np.errstate(invalid="ignore", divide="ignore"):
        row_cdf = np.concatenate(
            [np.zeros((height, 1)), np.cumsum(lum / np.maximum(row_sum[:, None], 1e-30), axis=1)],
            axis=1,
        )
    return (
        marginal_cdf.astype(np.float32),
        row_cdf.astype(np.float32),
        pdf.astype(np.float32),
    )


def _resample(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbour resample of a weight plane to the bake resolution."""
    ys = np.minimum((np.arange(h) * img.shape[0]) // h, img.shape[0] - 1)
    xs = np.minimum((np.arange(w) * img.shape[1]) // w, img.shape[1] - 1)
    return img[np.ix_(ys, xs)].astype(np.float64)


def cache_key(texture_name: str, width: int, height: int, lum_tag: str = "y_bar") -> str:
    h = hashlib.sha256(f"{texture_name}|{width}x{height}|{lum_tag}".encode()).hexdigest()[:24]
    return h


def load_or_bake(
    cache_dir: str,
    texture_name: str,
    layers,
    curves,
    width: int,
    height: int,
    use_cache: bool = True,
):
    """Disk-cached bake (cache/importance_maps/<hash>.npz like the
    reference's bincode cache)."""
    key = cache_key(texture_name, width, height)
    path = os.path.join(cache_dir, "importance_maps", f"{key}.npz")
    if use_cache and os.path.exists(path):
        z = np.load(path)
        return z["marginal"], z["row"], z["pdf"]
    marginal, row, pdf = bake_importance_tables(layers, curves, width, height)
    if use_cache:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.savez_compressed(path, marginal=marginal, row=row, pdf=pdf)
    return marginal, row, pdf
