"""Render config parsing (TOML).

Capability parity with TOMLConfig/Config/RenderSettings
(src/parsing/config.rs:10-164): renderer kind + tile size, per-settings
resolution/integrator/bounce bounds/sampling/tonemap/colorspace, with the
same defaults. Unknown fields are rejected (the reference uses
#[serde(deny_unknown_fields)]).
"""

from __future__ import annotations

import dataclasses
import tomllib
from typing import List, Optional, Tuple

from pathtracer_tpu.core.bounds import Bounds1D, BOUNDED_VISIBLE_RANGE


_KNOWN_RS_KEYS = {
    "threads", "filename", "min_samples", "max_samples", "min_bounces",
    "max_bounces", "hwss", "camera_id", "russian_roulette", "only_direct",
    "premultiply", "wavelength_bounds", "colorspace_settings",
    "tonemap_settings", "integrator", "resolution", "tile_size",
}


@dataclasses.dataclass(frozen=True)
class IntegratorConfig:
    kind: str = "PT"  # PT | LT | BDPT
    light_samples: int = 4
    medium_aware: bool = False
    camera_samples: int = 4
    selected_pair: Optional[Tuple[int, int]] = None


@dataclasses.dataclass(frozen=True)
class TonemapConfig:
    kind: str = "Clamp"  # Clamp | Reinhard0 | Reinhard0x3 | Reinhard1 | Reinhard1x3
    exposure: float = 0.0
    key_value: float = 0.18
    white_point: float = 1.0
    luminance_only: bool = True
    silenced: bool = False


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    filename: str = "output"
    width: int = 512
    height: int = 512
    min_samples: int = 16
    max_samples: Optional[int] = None
    min_bounces: int = 1
    max_bounces: int = 8
    hwss: bool = False
    threads: Optional[int] = None
    camera_id: str = "main"
    russian_roulette: bool = True
    only_direct: bool = False
    premultiply: float = 1.0
    wavelength_bounds: Bounds1D = BOUNDED_VISIBLE_RANGE
    colorspace: str = "Rec709"
    tonemap: TonemapConfig = TonemapConfig()
    integrator: IntegratorConfig = IntegratorConfig()


@dataclasses.dataclass(frozen=True)
class Config:
    default_scene_file: str = "data/scenes/cornell_box.toml"
    renderer_kind: str = "Naive"  # Naive | Tiled | Preview
    tile_size: Tuple[int, int] = (32, 32)
    render_settings: List[RenderSettings] = dataclasses.field(default_factory=list)


def _parse_render_settings(rs: dict) -> RenderSettings:
    unknown = set(rs) - _KNOWN_RS_KEYS
    if unknown:
        raise ValueError(f"unknown render_settings fields: {sorted(unknown)}")
    res = rs.get("resolution", {})
    integ = rs.get("integrator", {"type": "PT"})
    ic = IntegratorConfig(
        kind=integ.get("type", "PT"),
        light_samples=int(integ.get("light_samples", 4)),
        medium_aware=bool(integ.get("medium_aware", False)),
        camera_samples=int(integ.get("camera_samples", 4)),
        selected_pair=tuple(integ["selected_pair"]) if "selected_pair" in integ else None,
    )
    tm = rs.get("tonemap_settings", {"type": "Clamp"})
    tc = TonemapConfig(
        kind=tm.get("type", "Clamp"),
        exposure=float(tm.get("exposure", 0.0)),
        key_value=float(tm.get("key_value", 0.18)),
        white_point=float(tm.get("white_point", 1.0)),
        luminance_only=bool(tm.get("luminance_only", True)),
        silenced=bool(tm.get("silenced", False)),
    )
    cs = rs.get("colorspace_settings", {"type": "Rec709"}).get("type", "Rec709")
    wb = rs.get("wavelength_bounds")
    return RenderSettings(
        filename=rs.get("filename", "output"),
        width=int(res.get("width", 512)),
        height=int(res.get("height", 512)),
        min_samples=int(rs.get("min_samples", 16)),
        max_samples=rs.get("max_samples"),
        min_bounces=int(rs.get("min_bounces", 1)),
        max_bounces=int(rs.get("max_bounces", 8)),
        hwss=bool(rs.get("hwss", False)),
        threads=rs.get("threads"),
        camera_id=str(rs.get("camera_id", "main")),
        russian_roulette=bool(rs.get("russian_roulette", True)),
        only_direct=bool(rs.get("only_direct", False)),
        premultiply=float(rs.get("premultiply", 1.0)),
        wavelength_bounds=Bounds1D(*wb) if wb else BOUNDED_VISIBLE_RANGE,
        colorspace=cs,
        tonemap=tc,
        integrator=ic,
    )


def parse_config(path: str) -> Config:
    """get_config equivalent (src/parsing/mod.rs:565-581)."""
    with open(path, "rb") as f:
        raw = tomllib.load(f)
    renderer = raw.get("renderer", {"type": "Naive"})
    return Config(
        default_scene_file=raw.get("default_scene_file", "data/scenes/cornell_box.toml"),
        renderer_kind=renderer.get("type", "Naive"),
        tile_size=tuple(renderer.get("tile_size", (32, 32))),
        render_settings=[_parse_render_settings(rs) for rs in raw.get("render_settings", [])],
    )


def calculate_widest_wavelength_bounds(settings: List[RenderSettings]) -> Bounds1D:
    """Union of per-settings λ bounds (src/renderer/mod.rs:82-105 — without
    reproducing its max/min bug on the upper bound)."""
    if not settings:
        return BOUNDED_VISIBLE_RANGE
    lo = min(s.wavelength_bounds.lower for s in settings)
    hi = max(s.wavelength_bounds.upper for s in settings)
    return Bounds1D(lo, hi)
