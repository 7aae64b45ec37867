"""Spectral curves, TPU-native.

Reference capability: rust_cg_math's `Curve` enum (Linear / Tabulated /
Cauchy / Exponential / InverseExponential / Blackbody / Machine / Const) and
`CurveWithCDF::sample_power_and_pdf` spectral inverse-transform sampling, as
used across the reference (e.g. src/materials/diffuse_light.rs:112-114,
src/texture.rs, src/curves.rs).

TPU design: every curve is *baked on the host* onto a shared uniform
wavelength grid -> one `[n_curves, RES]` device LUT (`CurveBank`), plus a
matching CDF table for emission-spectrum sampling. On device, evaluation is a
gather + lerp and sampling is an inverse-transform over the CDF row — both
fully vectorised over a ray wavefront. Closed-form curves (Cauchy,
blackbody) are also available as jnp functions for λ-differentiable paths.
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.core.bounds import Bounds1D, EXTENDED_VISIBLE_RANGE

SPECTRAL_RES = 512  # LUT knots over the bank's wavelength domain


# ------------------------------------------------------------------ host IR
#
# Host-side curve description objects. Each knows how to evaluate itself on a
# numpy wavelength grid (nm). These exist only during scene construction;
# the device only ever sees the baked CurveBank.


class HostCurve:
    def sample(self, lams: np.ndarray) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError

    def integral(self, bounds: Bounds1D, n: int = 1024) -> float:
        lams = np.linspace(bounds.lower, bounds.upper, n)
        return float(np.trapezoid(self.sample(lams), lams))


@dataclasses.dataclass
class FlatCurve(HostCurve):
    strength: float

    def sample(self, lams):
        return np.full_like(lams, self.strength, dtype=np.float64)


@dataclasses.dataclass
class CauchyCurve(HostCurve):
    """Cauchy dispersion relation n(λ) = a + b/λ² (λ in nm).

    reference: src/curves.rs `cauchy(a, b)`; drives dispersive dielectrics
    (ggx_glass_dispersive / ggx_moissanite in data/lib_materials.toml).
    """

    a: float
    b: float

    def sample(self, lams):
        return self.a + self.b / (lams * lams)


@dataclasses.dataclass
class BlackbodyCurve(HostCurve):
    """Planck blackbody SPD, peak-normalised then scaled by `strength`
    (reference: src/curves.rs `blackbody_curve(temperature, strength)`)."""

    temperature: float
    strength: float = 1.0

    def sample(self, lams):
        val = planck_np(lams, self.temperature)
        # normalise by the Wien-peak radiance so strength ~ peak energy
        lam_peak = 2.8977721e6 / self.temperature  # nm
        peak = planck_np(np.array([lam_peak]), self.temperature)[0]
        return self.strength * val / max(peak, 1e-30)


def planck_np(lams_nm: np.ndarray, t: float) -> np.ndarray:
    lam = lams_nm * 1e-9
    h, c, kb = 6.62607015e-34, 2.99792458e8, 1.380649e-23
    with np.errstate(over="ignore"):
        return (2.0 * h * c * c / lam**5) / np.expm1(h * c / (lam * kb * t))


@dataclasses.dataclass
class TabulatedCurve(HostCurve):
    """Piecewise (x, y) samples, Linear or Cubic (Catmull-Rom) interpolation,
    zero outside the tabulated domain (signal curves are measurements; there
    is no information beyond them). reference: CurveData::TabulatedCSV
    (src/parsing/curves.rs)."""

    xs: np.ndarray
    ys: np.ndarray
    mode: str = "Cubic"  # "Linear" | "Cubic"

    def sample(self, lams):
        xs, ys = np.asarray(self.xs, np.float64), np.asarray(self.ys, np.float64)
        order = np.argsort(xs)
        xs, ys = xs[order], ys[order]
        if self.mode == "Linear" or len(xs) < 3:
            out = np.interp(lams, xs, ys, left=0.0, right=0.0)
        else:
            out = _catmull_rom(lams, xs, ys)
        inside = (lams >= xs[0]) & (lams <= xs[-1])
        return np.where(inside, out, 0.0)


def _catmull_rom(q, xs, ys):
    """Catmull-Rom through non-uniform knots with clamped ends."""
    idx = np.clip(np.searchsorted(xs, q) - 1, 0, len(xs) - 2)
    x0 = xs[np.maximum(idx - 1, 0)]
    x1, x2 = xs[idx], xs[idx + 1]
    x3 = xs[np.minimum(idx + 2, len(xs) - 1)]
    y0 = ys[np.maximum(idx - 1, 0)]
    y1, y2 = ys[idx], ys[idx + 1]
    y3 = ys[np.minimum(idx + 2, len(xs) - 1)]
    t = np.clip((q - x1) / np.maximum(x2 - x1, 1e-12), 0.0, 1.0)
    # finite-difference tangents (handles non-uniform spacing)
    m1 = np.where(x2 > x0, (y2 - y0) / np.maximum(x2 - x0, 1e-12), 0.0) * (x2 - x1)
    m2 = np.where(x3 > x1, (y3 - y1) / np.maximum(x3 - x1, 1e-12), 0.0) * (x2 - x1)
    t2, t3 = t * t, t * t * t
    return (
        (2 * t3 - 3 * t2 + 1) * y1
        + (t3 - 2 * t2 + t) * m1
        + (-2 * t3 + 3 * t2) * y2
        + (t3 - t2) * m2
    )


@dataclasses.dataclass
class LinearCurve(HostCurve):
    """Evenly spaced signal over [lower, upper]
    (reference: CurveData::Linear from .spectra files)."""

    signal: np.ndarray
    bounds: Bounds1D
    mode: str = "Linear"

    def sample(self, lams):
        xs = np.linspace(self.bounds.lower, self.bounds.upper, len(self.signal))
        return TabulatedCurve(xs, np.asarray(self.signal), self.mode).sample(lams)


@dataclasses.dataclass
class SpikeCurve(HostCurve):
    """Exponential spike at `lam0` with per-side decay widths (nm):
    f(λ) = strength · exp(−|λ−λ0|/taper_side).
    reference: CurveData::SimpleSpike (src/parsing/curves.rs:43-75)."""

    lam0: float
    left_taper: float
    right_taper: float
    strength: float

    def sample(self, lams):
        d = lams - self.lam0
        left = np.exp(d / max(self.left_taper, 1e-6))
        right = np.exp(-d / max(self.right_taper, 1e-6))
        return self.strength * np.where(d < 0.0, left, right)


@dataclasses.dataclass
class MachineCurve(HostCurve):
    """Algebraic combination: start from `seed`, then fold Add/Mul of curves
    (reference: Curve::Machine, used by textures' `curve_at` and
    src/curves.rs `add_pigment`)."""

    seed: float
    ops: List[Tuple[str, HostCurve]]  # ("add"|"mul", curve)

    def sample(self, lams):
        acc = np.full_like(lams, self.seed, dtype=np.float64)
        for op, c in self.ops:
            v = c.sample(lams)
            acc = acc + v if op == "add" else acc * v
        return acc


# ------------------------------------------------------------- device bank


class CurveBank(NamedTuple):
    """All scene curves baked to one LUT block (a pytree of device arrays).

    `pairs` holds (value[k], value[k+1]) interleaved so a lerp needs ONE
    flat gather of 2 floats — the naive `values[idx]` row gather
    materializes an [N, RES] block (gigabytes at wavefront widths) and was
    the single largest cost of the whole renderer on TPU."""

    values: jnp.ndarray  # [C, RES] f32 — curve value at each grid knot
    pairs: jnp.ndarray  # [C*RES, 2] f32 — (v[k], v[k+1]) per flat knot
    cdf: jnp.ndarray  # [C, RES] f32 — normalised CDF over the grid
    cdf_pairs: jnp.ndarray  # [C*RES, 2] f32 — (cdf[k], cdf[k+1])
    integral: jnp.ndarray  # [C] f32 — ∫ curve dλ over the grid domain
    lam_lo: float
    lam_hi: float

    @property
    def n_curves(self):
        return self.values.shape[0]


def bake_curves(
    curves: Sequence[HostCurve],
    bounds: Bounds1D = EXTENDED_VISIBLE_RANGE,
    res: int = SPECTRAL_RES,
) -> CurveBank:
    grid = np.linspace(bounds.lower, bounds.upper, res)
    vals = np.stack([np.maximum(c.sample(grid), 0.0) for c in curves]) if curves else np.zeros((0, res))
    dx = grid[1] - grid[0]
    # trapezoid cumulative integral -> CDF
    seg = 0.5 * (vals[:, 1:] + vals[:, :-1]) * dx
    cum = np.concatenate([np.zeros((vals.shape[0], 1)), np.cumsum(seg, axis=1)], axis=1)
    total = cum[:, -1:]
    cdf = np.where(total > 0.0, cum / np.maximum(total, 1e-30), np.linspace(0, 1, res)[None, :])

    def pair_pack(a):
        nxt = np.concatenate([a[:, 1:], a[:, -1:]], axis=1)
        return np.stack([a, nxt], axis=-1).reshape(-1, 2)

    return CurveBank(
        values=jnp.asarray(vals, jnp.float32),
        pairs=jnp.asarray(pair_pack(vals), jnp.float32),
        cdf=jnp.asarray(cdf, jnp.float32),
        cdf_pairs=jnp.asarray(pair_pack(cdf), jnp.float32),
        integral=jnp.asarray(total[:, 0], jnp.float32),
        lam_lo=float(bounds.lower),
        lam_hi=float(bounds.upper),
    )


def bake_raw_values(curves: Sequence[HostCurve], bounds: Bounds1D, res: int) -> np.ndarray:
    grid = np.linspace(bounds.lower, bounds.upper, res)
    return np.stack([c.sample(grid) for c in curves])


def evaluate(bank: CurveBank, idx, lam):
    """bank curve `idx` at wavelength(s) `lam` — ONE flat pair-gather + lerp.

    idx: int array [...]; lam: f32 array broadcastable to idx.
    Equivalent of Curve::evaluate_power (clamped to >= 0 at bake time).
    NEVER materialize `values[idx]` rows here: an [N, RES] block is
    gigabytes at wavefront widths and dominated the whole render."""
    res = bank.values.shape[1]
    idx, lam = jnp.broadcast_arrays(jnp.asarray(idx), jnp.asarray(lam))
    u = (lam - bank.lam_lo) / (bank.lam_hi - bank.lam_lo) * (res - 1)
    u = jnp.clip(u, 0.0, res - 1 - 1e-4)
    i0 = u.astype(jnp.int32)
    frac = u - i0
    vp = bank.pairs[idx * res + i0]  # [..., 2] single gather
    return vp[..., 0] * (1.0 - frac) + vp[..., 1] * frac


def cdf_at(bank: CurveBank, idx, lam):
    res = bank.cdf.shape[1]
    idx, lam = jnp.broadcast_arrays(jnp.asarray(idx), jnp.asarray(lam))
    u = (lam - bank.lam_lo) / (bank.lam_hi - bank.lam_lo) * (res - 1)
    u = jnp.clip(u, 0.0, res - 1 - 1e-4)
    i0 = u.astype(jnp.int32)
    frac = u - i0
    vp = bank.cdf_pairs[idx * res + i0]  # [..., 2] single gather
    return vp[..., 0] * (1.0 - frac) + vp[..., 1] * frac


def sample_power_and_pdf(bank: CurveBank, idx, u, bounds: Bounds1D):
    """Inverse-transform sample a wavelength from curve `idx`'s SPD restricted
    to `bounds`. Returns (lam, power, pdf_per_nm).

    Equivalent of CurveWithCDF::sample_power_and_pdf
    (used at e.g. src/materials/diffuse_light.rs:112-114).
    """
    res = bank.cdf.shape[1]
    idx, u = jnp.broadcast_arrays(jnp.asarray(idx), jnp.asarray(u))
    cdf_lo = cdf_at(bank, idx, jnp.full_like(u, bounds.lower))
    cdf_hi = cdf_at(bank, idx, jnp.full_like(u, bounds.upper))
    span = jnp.maximum(cdf_hi - cdf_lo, 1e-9)
    target = cdf_lo + u * span
    # count of knots with cdf < target, by branchless binary search: 9
    # dependent 1-element gathers per lane instead of gathering the whole
    # [RES]=512 row per lane (the row gather moved ~2 GB at 1M lanes and
    # dominated the LT megakernel's spawn feed — PARITY.md round 4).
    # Identical i1 to the row-scan by CDF monotonicity, so bit-identical λ.
    cdf_flat = bank.cdf.reshape(-1)
    base = idx * res
    if res & (res - 1) == 0:
        i1 = jnp.zeros_like(base)
        s = res >> 1
        while s:
            probe = i1 + s
            c = cdf_flat[base + probe - 1]
            i1 = jnp.where(c < target, probe, i1)
            s >>= 1
    else:
        # to_bank(res=...) is public and need not be a power of two: fall
        # back to the row-scan count (same i1 by CDF monotonicity)
        row = bank.cdf[idx]
        i1 = jnp.sum((row < target[..., None]).astype(jnp.int32), axis=-1)
    i1 = jnp.clip(i1, 1, res - 1)
    cp = bank.cdf_pairs[idx * res + (i1 - 1)]
    c0, c1 = cp[..., 0], cp[..., 1]
    frac = jnp.clip((target - c0) / jnp.maximum(c1 - c0, 1e-12), 0.0, 1.0)
    step = (bank.lam_hi - bank.lam_lo) / (res - 1)
    lam = bank.lam_lo + ((i1 - 1).astype(jnp.float32) + frac) * step
    lam = jnp.clip(lam, bounds.lower, bounds.upper)
    power = evaluate(bank, idx, lam)
    # pdf over λ restricted to bounds: value / ∫_bounds value dλ
    restricted_integral = bank.integral[idx] * span
    pdf = power / jnp.maximum(restricted_integral, 1e-20)
    return lam, power, pdf


# ----------------------------------------------------- closed-form variants


def cauchy_jnp(a, b, lam):
    return a + b / (lam * lam)
