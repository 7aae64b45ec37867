"""Realistic camera: full lens-assembly imaging.

Capability parity with src/camera/realistic_camera.rs:77-194: rays start on
the sensor, pass through the parsed lens assembly (aperture/housing
rejection, λ-dependent refraction -> real chromatic aberration), and exit
into the scene. The reference's 100-try rejection loop + RadialSampler
cache becomes a host-precomputed exit-pupil radius table (per film radius)
so the wavefront samples the rear pupil directly; rays that still miss
carry weight 0 (physical vignetting).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.camera.lens import LensStack, build_lens_stack, parse_lenses_from, trace_from_film
from pathtracer_tpu.core import sampling, vecmath
from pathtracer_tpu.parsing.paths import resolve


class RealisticCamera(NamedTuple):
    origin: jnp.ndarray  # f32[3] assembly front vertex in world space
    w: jnp.ndarray  # forward unit
    u: jnp.ndarray  # right
    v: jnp.ndarray  # up
    stack: LensStack
    sensor_half: jnp.ndarray  # f32 sensor half-size (m)
    aspect: jnp.ndarray  # f32
    film_z_offset: jnp.ndarray  # f32 focus adjustment (shifts the sensor)
    pupil_radii: jnp.ndarray  # f32[K] exit-pupil radius per film radius bin
    rear_z: jnp.ndarray  # f32 z of the rear interface vertex
    rear_aperture: jnp.ndarray  # f32

    def get_ray(self, film_u, film_v, lens_u1, lens_u2):
        """Returns (o_world, d_world, tau) — tau==0 marks vignetted rays."""
        # sensor point (camera space, z slightly negative of 0 for focus)
        sx = (film_u * 2.0 - 1.0) * self.sensor_half * self.aspect
        sy = (1.0 - film_v * 2.0) * self.sensor_half
        film_r = jnp.sqrt(sx * sx + sy * sy)
        k = self.pupil_radii.shape[0]
        rmax = self.sensor_half * jnp.sqrt(self.aspect**2 + 1.0)
        bin_idx = jnp.clip((film_r / rmax * k).astype(jnp.int32), 0, k - 1)
        pupil_r = self.pupil_radii[bin_idx]
        o_cam = jnp.stack([sx, sy, jnp.broadcast_to(self.film_z_offset, sx.shape)], -1)
        disk = sampling.random_in_unit_disk(lens_u1, lens_u2) * pupil_r[..., None]
        target = jnp.stack([disk[..., 0], disk[..., 1], jnp.broadcast_to(self.rear_z, sx.shape)], -1)
        d_cam = vecmath.normalize(target - o_cam)
        lam = jnp.full(sx.shape, 550.0)  # pupil geometry is λ-insensitive enough
        o_out, d_out, valid = trace_from_film(self.stack, o_cam, d_cam, lam)
        # to world: camera space z+ = forward
        o_world = (
            self.origin
            + o_out[..., 0:1] * self.u
            + o_out[..., 1:2] * self.v
            + (o_out[..., 2:3] - self.stack.total_thickness) * self.w
        )
        d_world = vecmath.normalize(
            d_out[..., 0:1] * self.u + d_out[..., 1:2] * self.v + d_out[..., 2:3] * self.w
        )
        tau = valid.astype(jnp.float32)
        return o_world, d_world, tau

    def get_ray_spectral(self, film_u, film_v, lens_u1, lens_u2, lam):
        """λ-aware variant: real chromatic aberration."""
        sx = (film_u * 2.0 - 1.0) * self.sensor_half * self.aspect
        sy = (1.0 - film_v * 2.0) * self.sensor_half
        film_r = jnp.sqrt(sx * sx + sy * sy)
        k = self.pupil_radii.shape[0]
        rmax = self.sensor_half * jnp.sqrt(self.aspect**2 + 1.0)
        bin_idx = jnp.clip((film_r / rmax * k).astype(jnp.int32), 0, k - 1)
        pupil_r = self.pupil_radii[bin_idx]
        o_cam = jnp.stack([sx, sy, jnp.broadcast_to(self.film_z_offset, sx.shape)], -1)
        disk = sampling.random_in_unit_disk(lens_u1, lens_u2) * pupil_r[..., None]
        target = jnp.stack([disk[..., 0], disk[..., 1], jnp.broadcast_to(self.rear_z, sx.shape)], -1)
        d_cam = vecmath.normalize(target - o_cam)
        o_out, d_out, valid = trace_from_film(self.stack, o_cam, d_cam, lam)
        o_world = (
            self.origin
            + o_out[..., 0:1] * self.u
            + o_out[..., 1:2] * self.v
            + (o_out[..., 2:3] - self.stack.total_thickness) * self.w
        )
        d_world = vecmath.normalize(
            d_out[..., 0:1] * self.u + d_out[..., 1:2] * self.v + d_out[..., 2:3] * self.w
        )
        return o_world, d_world, valid.astype(jnp.float32)

    def get_pixel_for_ray(self, o, d):
        """Splatting support is not yet implemented for lens assemblies
        (the reference's panorama camera has the same todo)."""
        z = jnp.zeros(o.shape[:-1])
        return z, z, z > 1.0

    def eval_we(self, o, d):
        return (vecmath.dot(d, self.w) > 0.0).astype(jnp.float32)


def _bake_pupil_radii(stack: LensStack, sensor_half: float, film_z: float,
                      k_bins: int = 16, probes: int = 4096, seed: int = 0):
    """Host-side exit-pupil bake (RadialSampler-cache equivalent,
    realistic_camera.rs radial×λ bins): for each film radius bin, MC-probe
    the rear aperture disk and record the max radius that traces through."""
    rng = np.random.default_rng(seed)
    rear_ap = float(stack.aperture[-1])
    rear_z = float(stack.z_front[-1])
    radii = np.zeros(k_bins, np.float32)
    rmax = sensor_half * np.sqrt(2.0)
    for b in range(k_bins):
        film_r = (b + 0.5) / k_bins * rmax
        o = np.zeros((probes, 3), np.float32)
        o[:, 0] = film_r
        o[:, 2] = film_z
        rr = np.sqrt(rng.uniform(size=probes)) * rear_ap
        phi = rng.uniform(0, 2 * np.pi, size=probes)
        target = np.stack([rr * np.cos(phi), rr * np.sin(phi), np.full(probes, rear_z)], -1)
        d = target - o
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        _, _, valid = trace_from_film(
            stack, jnp.asarray(o), jnp.asarray(d), jnp.full((probes,), 550.0)
        )
        valid = np.asarray(valid)
        radii[b] = rr[valid].max() * 1.05 if valid.any() else rear_ap
    return jnp.asarray(radii)


def make_realistic_camera(data: dict, aspect_ratio: float = 1.0,
                          search_paths=None) -> RealisticCamera:
    """Build from CameraData::RealisticCamera fields
    (src/parsing/cameras.rs:21-114): lens_spec file, fstop, sensor_size,
    focal_adjustment, radial_bins."""
    spec = resolve(data.get("lens_spec", data.get("lens", "data/cameras/petzval_kodak.txt")), search_paths)
    elements = parse_lenses_from(spec)
    fstop = float(data.get("fstop", 4.0))
    # reference semantics: the stop element's housing radius is divided by
    # the f-stop (realistic_camera.rs:44-46)
    stop_housing = next((e.aperture_radius for e in elements if e.is_stop), 10.0)
    iris_radius = stop_housing * 1e-3 / max(fstop, 0.1)
    stack = build_lens_stack(elements, scale=1e-3, iris_radius=iris_radius)
    sensor_mm = float(data.get("sensor_size", 35.0))
    sensor_half = sensor_mm * 1e-3 / 2.0
    film_z = -float(data.get("focal_adjustment", 0.0)) * 1e-3
    pupil = _bake_pupil_radii(stack, sensor_half, film_z,
                              k_bins=int(data.get("radial_bins", 16)))
    lf = np.asarray(data.get("look_from", [0, 0, 0]), np.float64)
    la = np.asarray(data.get("look_at", [1, 0, 0]), np.float64)
    w = la - lf
    w /= np.linalg.norm(w)
    up = np.asarray(data.get("v_up", [0.0, 0.0, 1.0]), np.float64)
    u = np.cross(w, up)
    if np.linalg.norm(u) < 1e-9:
        u = np.cross(w, np.array([0.0, 1.0, 0.0]))
    u /= np.linalg.norm(u)
    v = np.cross(u, w)
    return RealisticCamera(
        origin=jnp.asarray(lf, jnp.float32),
        w=jnp.asarray(w, jnp.float32),
        u=jnp.asarray(u, jnp.float32),
        v=jnp.asarray(v, jnp.float32),
        stack=stack,
        sensor_half=jnp.float32(sensor_half),
        aspect=jnp.float32(aspect_ratio),
        film_z_offset=jnp.float32(film_z),
        pupil_radii=pupil,
        rear_z=stack.z_front[-1],
        rear_aperture=stack.aperture[-1],
    )
