"""Projective thin-lens camera.

Capability parity with the reference's ProjectiveCamera
(src/camera/projective_camera.rs:101-180): look_from/look_at + vfov +
focal_distance + aperture; `get_ray` samples the lens disk and aims at the
focal plane; `get_pixel_for_ray` inverts a lens-space ray back to film uv
(for light-tracing splats).

Camera data is a NamedTuple of device scalars/vecs — a pytree, so the
camera rides through jit/shard_map untouched.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.core import vecmath
from pathtracer_tpu.camera.aperture import sample_aperture


class ProjectiveCamera(NamedTuple):
    origin: jnp.ndarray  # f32[3] lens center
    w: jnp.ndarray  # f32[3] forward (unit, towards scene)
    u: jnp.ndarray  # f32[3] right (unit)
    v: jnp.ndarray  # f32[3] up (unit)
    half_width: jnp.ndarray  # f32 focal-plane half extent (world units)
    half_height: jnp.ndarray
    focal_distance: jnp.ndarray  # f32
    lens_radius: jnp.ndarray  # f32 (aperture_diameter / 2)
    blades: jnp.ndarray  # i32; 0 = circular aperture
    blade_sharpness: jnp.ndarray  # f32

    def get_ray(self, film_u, film_v, lens_u1, lens_u2):
        """Film (u,v) in [0,1)² (v=0 = top row) + lens samples -> (o, d, tau).
        Equivalent of Camera::get_ray (src/camera/mod.rs:19-48); tau is the
        ray weight (1 for thin lens; realistic cameras use 0 = vignetted)."""
        lens_xy = sample_aperture(
            lens_u1, lens_u2, self.lens_radius, self.blades, self.blade_sharpness
        )
        o = (
            self.origin
            + lens_xy[..., 0:1] * self.u
            + lens_xy[..., 1:2] * self.v
        )
        focal_pt = (
            self.origin
            + self.focal_distance * self.w
            + ((film_u * 2.0 - 1.0) * self.half_width)[..., None] * self.u
            + ((1.0 - film_v * 2.0) * self.half_height)[..., None] * self.v
        )
        d = vecmath.normalize(focal_pt - o)
        return o, d, jnp.ones(film_u.shape, jnp.float32)

    def get_pixel_for_ray(self, o, d, lam=None):
        """Inverse of get_ray for splatting: ray (from a lens point, into the
        scene) -> film (u, v) + validity mask
        (reference: src/camera/projective_camera.rs:135-180)."""
        # intersect the focal plane at distance focal_distance along w
        cos_f = vecmath.dot(d, self.w)
        valid = cos_f > 1e-6
        t = self.focal_distance / jnp.where(valid, cos_f, 1.0)
        p = o + t[..., None] * d
        rel = p - self.origin - self.focal_distance * self.w
        fu = vecmath.dot(rel, self.u) / jnp.maximum(self.half_width, 1e-9)
        fv = vecmath.dot(rel, self.v) / jnp.maximum(self.half_height, 1e-9)
        film_u = (fu + 1.0) * 0.5
        film_v = (1.0 - fv) * 0.5
        inside = (film_u >= 0.0) & (film_u < 1.0) & (film_v >= 0.0) & (film_v < 1.0)
        return film_u, film_v, valid & inside

    def eval_we(self, o, d):
        """Importance of a ray arriving at the lens — hemisphere gate
        (enum-level eval_we returns (1,1), src/camera/mod.rs:99-110)."""
        return (vecmath.dot(d, self.w) > 0.0).astype(jnp.float32)

    # ---- LT/BDPT lens-connection protocol (shared with RealisticCamera):
    # connection point sampled on the lens disk; W_e uses the focal-plane
    # map r = focal·tanθ, so we_focal/we_film_area parameterize
    # W_e = focal²/(cos³θ·A_film) in the integrators.
    def sample_lens_point(self, u1, u2):
        from pathtracer_tpu.core import sampling

        lens_xy = sampling.random_in_unit_disk(u1, u2) * self.lens_radius
        return (self.origin + lens_xy[..., 0:1] * self.u
                + lens_xy[..., 1:2] * self.v)

    def lens_area(self):
        return jnp.pi * self.lens_radius * self.lens_radius

    def we_focal(self):
        return self.focal_distance

    def we_film_area(self):
        return (2.0 * self.half_width) * (2.0 * self.half_height)


def make_projective_camera(
    look_from,
    look_at,
    v_up=(0.0, 0.0, 1.0),
    vfov_degrees: float = 45.0,
    focal_distance: float = 1.0,
    aperture_diameter: float = 0.0,
    aspect_ratio: float = 1.0,
    blades: int = 0,
    blade_sharpness: float = 1.0,
) -> ProjectiveCamera:
    lf = np.asarray(look_from, np.float64)
    la = np.asarray(look_at, np.float64)
    w = la - lf
    w = w / np.linalg.norm(w)
    up = np.asarray(v_up, np.float64)
    u = np.cross(w, up)
    if np.linalg.norm(u) < 1e-9:
        up = np.array([0.0, 1.0, 0.0])
        u = np.cross(w, up)
    u = u / np.linalg.norm(u)
    v = np.cross(u, w)
    half_height = np.tan(np.deg2rad(vfov_degrees) / 2.0) * focal_distance
    half_width = half_height * aspect_ratio
    return ProjectiveCamera(
        origin=jnp.asarray(lf, jnp.float32),
        w=jnp.asarray(w, jnp.float32),
        u=jnp.asarray(u, jnp.float32),
        v=jnp.asarray(v, jnp.float32),
        half_width=jnp.float32(half_width),
        half_height=jnp.float32(half_height),
        focal_distance=jnp.float32(focal_distance),
        lens_radius=jnp.float32(aperture_diameter / 2.0),
        blades=jnp.int32(blades),
        blade_sharpness=jnp.float32(blade_sharpness),
    )
