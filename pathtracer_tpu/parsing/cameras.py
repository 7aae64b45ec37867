"""Camera spec -> device camera materialisation.

Capability parity with src/parsing/cameras.rs:21-204: SimpleCamera /
PanoramaCamera / RealisticCamera data, instantiated per render-settings
with the film aspect ratio (with_aspect_ratio semantics).
"""

from __future__ import annotations

from pathtracer_tpu.camera.projective import make_projective_camera
from pathtracer_tpu.camera.panorama import make_panorama_camera


def build_camera(spec, aspect_ratio: float):
    """spec: parsing.construct.CameraSpec."""
    d = spec.data
    if spec.kind == "SimpleCamera":
        ap = d.get("aperture", {"type": "Circular"})
        bladed = ap.get("type") == "Bladed"
        return make_projective_camera(
            look_from=d["look_from"],
            look_at=d["look_at"],
            v_up=d.get("v_up", (0.0, 0.0, 1.0)),
            vfov_degrees=float(d.get("vfov", 45.0)),
            focal_distance=float(d.get("focal_distance", 1.0)),
            aperture_diameter=float(d.get("aperture_diameter", 0.0)),
            aspect_ratio=aspect_ratio,
            blades=int(ap.get("blades", 6)) if bladed else 0,
            blade_sharpness=float(ap.get("sharpness", 1.0)) if bladed else 1.0,
        )
    if spec.kind == "PanoramaCamera":
        return make_panorama_camera(
            look_from=d["look_from"],
            look_at=d["look_at"],
            v_up=d.get("v_up", (0.0, 0.0, 1.0)),
            fov_degrees=tuple(d.get("fov", (360.0, 180.0))),
        )
    if spec.kind == "RealisticCamera":
        from pathtracer_tpu.camera.realistic import make_realistic_camera

        return make_realistic_camera(d, aspect_ratio)
    raise ValueError(f"unknown camera type {spec.kind!r}")
