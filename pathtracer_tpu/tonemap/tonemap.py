"""Tonemapping + OETFs on the XYZ film.

Capability parity with src/tonemap/: two-phase Tonemapper (initialize scans
film statistics, map converts pixels — mod.rs:42-50), Clamp
(clamp.rs:23-106), Reinhard0/0x3 (reinhard0.rs), Reinhard1/1x3
(reinhard1.rs), sRGB/Rec709/Rec2020 OETFs (mod.rs:141-205), NaN pixels
flagged MAUVE (lib.rs MAUVE).

All operators are pure jnp: `initialize(film)` returns a small stats pytree,
`map(stats, film)` the tonemapped XYZ film.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from pathtracer_tpu.core import cie
from pathtracer_tpu.prelude import MAUVE_XYZ


def _luminance_stats(film_xyz):
    y = film_xyz[..., 1]
    finite = jnp.isfinite(y) & (y > 0.0)
    y_safe = jnp.where(finite, y, 1e-9)
    log_avg = jnp.exp(jnp.mean(jnp.where(finite, jnp.log(1e-9 + y_safe), 0.0)))
    return dict(
        max_lum=jnp.max(jnp.where(finite, y_safe, 0.0)),
        min_lum=jnp.min(jnp.where(finite, y_safe, jnp.inf)),
        avg_lum=jnp.mean(y_safe),
        log_avg_lum=log_avg,
    )


def _flag_nan(film_xyz):
    bad = ~jnp.all(jnp.isfinite(film_xyz), axis=-1, keepdims=True)
    return jnp.where(bad, jnp.asarray(MAUVE_XYZ, film_xyz.dtype), film_xyz)


@dataclasses.dataclass(frozen=True)
class Clamp:
    exposure: float = 0.0
    luminance_only: bool = True
    silenced: bool = True

    def initialize(self, film_xyz, factor: float = 1.0):
        return dict(factor=jnp.float32(factor * 2.0**self.exposure), **_luminance_stats(film_xyz))

    def map(self, stats, film_xyz):
        film = _flag_nan(film_xyz) * stats["factor"]
        if self.luminance_only:
            y = film[..., 1:2]
            scale = jnp.where(y > 1.0, 1.0 / jnp.maximum(y, 1e-9), 1.0)
            return film * scale
        return jnp.clip(film, 0.0, 1.0)


@dataclasses.dataclass(frozen=True)
class Reinhard0:
    """L/(1+L) with key value on luminance (reinhard0.rs:23-216)."""

    key_value: float = 0.18
    luminance_only: bool = True

    def initialize(self, film_xyz, factor: float = 1.0):
        stats = _luminance_stats(film_xyz * factor)
        return dict(factor=jnp.float32(factor), scale=self.key_value / jnp.maximum(stats["log_avg_lum"], 1e-9), **stats)

    def map(self, stats, film_xyz):
        film = _flag_nan(film_xyz) * stats["factor"]
        y = film[..., 1:2]
        l = stats["scale"] * y
        l_out = l / (1.0 + l)
        return film * jnp.where(y > 0, l_out / jnp.maximum(y, 1e-9), 0.0)


@dataclasses.dataclass(frozen=True)
class Reinhard0x3(Reinhard0):
    """Per-XYZ-channel variant (the reference's f32x4 ...x3 operator)."""

    luminance_only: bool = False

    def map(self, stats, film_xyz):
        film = _flag_nan(film_xyz) * stats["factor"]
        l = stats["scale"] * film
        return l / (1.0 + l)


@dataclasses.dataclass(frozen=True)
class Reinhard1:
    """Extended Reinhard with white point (reinhard1.rs)."""

    key_value: float = 0.18
    white_point: float = 1.0
    luminance_only: bool = True

    def initialize(self, film_xyz, factor: float = 1.0):
        stats = _luminance_stats(film_xyz * factor)
        return dict(factor=jnp.float32(factor), scale=self.key_value / jnp.maximum(stats["log_avg_lum"], 1e-9), **stats)

    def _curve(self, l):
        w2 = self.white_point * self.white_point
        return l * (1.0 + l / w2) / (1.0 + l)

    def map(self, stats, film_xyz):
        film = _flag_nan(film_xyz) * stats["factor"]
        y = film[..., 1:2]
        l = stats["scale"] * y
        l_out = self._curve(l)
        return film * jnp.where(y > 0, l_out / jnp.maximum(y, 1e-9), 0.0)


@dataclasses.dataclass(frozen=True)
class Reinhard1x3(Reinhard1):
    luminance_only: bool = False

    def map(self, stats, film_xyz):
        film = _flag_nan(film_xyz) * stats["factor"]
        l = stats["scale"] * film
        return self._curve(l)


# --------------------------------------------------------------------- OETF


def sRGB_oetf(x):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.0031308, 12.92 * x, 1.055 * x ** (1.0 / 2.4) - 0.055)


def rec709_oetf(x):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x < 0.018, 4.5 * x, 1.099 * x**0.45 - 0.099)


def rec2020_oetf(x):
    x = jnp.clip(x, 0.0, 1.0)
    a, b = 1.09929682680944, 0.018053968510807
    return jnp.where(x < b, 4.5 * x, a * x**0.45 - (a - 1.0))


OETFS = {"sRGB": sRGB_oetf, "Rec709": rec709_oetf, "Rec2020": rec2020_oetf}
RGB_MATRICES = {
    "sRGB": cie.XYZ_TO_REC709,
    "Rec709": cie.XYZ_TO_REC709,
    "Rec2020": cie.XYZ_TO_REC2020,
}


def tonemap_to_rgb(film_xyz, tonemapper, colorspace: str = "Rec709", factor: float = 1.0):
    """Full pipeline: stats -> tonemap -> XYZ-to-RGB -> OETF.
    Returns (display_rgb in [0,1], linear_rgb) like write_to_files'
    PNG/EXR pair (src/tonemap/mod.rs:207-338)."""
    stats = tonemapper.initialize(film_xyz, factor)
    mapped = tonemapper.map(stats, film_xyz)
    linear_rgb = cie.xyz_to_rgb(_flag_nan(film_xyz) * factor, RGB_MATRICES[colorspace])
    mapped_rgb = jnp.clip(cie.xyz_to_rgb(mapped, RGB_MATRICES[colorspace]), 0.0, 1.0)
    display = OETFS[colorspace](mapped_rgb)
    return display, linear_rgb
