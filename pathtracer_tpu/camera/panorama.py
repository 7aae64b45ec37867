"""Panorama (equirect angular-span) camera.

Capability parity with src/camera/panorama_camera.rs:67-124: film uv maps to
(azimuth, polar) angles spanning `fov` about the view direction; rays leave
from the camera origin.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.core import vecmath


class PanoramaCamera(NamedTuple):
    origin: jnp.ndarray  # f32[3]
    w: jnp.ndarray  # forward
    u: jnp.ndarray  # right
    v: jnp.ndarray  # up
    fov_x: jnp.ndarray  # radians
    fov_y: jnp.ndarray

    def get_ray(self, film_u, film_v, lens_u1=None, lens_u2=None):
        phi = (film_u - 0.5) * self.fov_x
        theta = (0.5 - film_v) * self.fov_y
        ct = jnp.cos(theta)
        d = (
            (ct * jnp.cos(phi))[..., None] * self.w
            + (ct * jnp.sin(phi))[..., None] * self.u
            + jnp.sin(theta)[..., None] * self.v
        )
        o = jnp.broadcast_to(self.origin, d.shape)
        return o, vecmath.normalize(d), jnp.ones(film_u.shape, jnp.float32)

    def get_pixel_for_ray(self, o, d):
        phi = jnp.arctan2(vecmath.dot(d, self.u), vecmath.dot(d, self.w))
        theta = jnp.arcsin(jnp.clip(vecmath.dot(d, self.v), -1.0, 1.0))
        film_u = phi / self.fov_x + 0.5
        film_v = 0.5 - theta / self.fov_y
        ok = (film_u >= 0) & (film_u < 1) & (film_v >= 0) & (film_v < 1)
        return film_u, film_v, ok

    def eval_we(self, o, d):
        return (vecmath.dot(d, self.w) > 0.0).astype(jnp.float32)


def make_panorama_camera(look_from, look_at, v_up=(0.0, 0.0, 1.0), fov_degrees=(360.0, 180.0)):
    lf = np.asarray(look_from, np.float64)
    la = np.asarray(look_at, np.float64)
    w = la - lf
    w = w / np.linalg.norm(w)
    up = np.asarray(v_up, np.float64)
    u = np.cross(w, up)
    if np.linalg.norm(u) < 1e-9:
        u = np.cross(w, np.array([0.0, 1.0, 0.0]))
    u = u / np.linalg.norm(u)
    v = np.cross(u, w)
    return PanoramaCamera(
        origin=jnp.asarray(lf, jnp.float32),
        w=jnp.asarray(w, jnp.float32),
        u=jnp.asarray(u, jnp.float32),
        v=jnp.asarray(v, jnp.float32),
        fov_x=jnp.float32(np.deg2rad(fov_degrees[0])),
        fov_y=jnp.float32(np.deg2rad(fov_degrees[1])),
    )
