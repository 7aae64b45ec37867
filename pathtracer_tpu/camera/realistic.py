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

from pathtracer_tpu.camera.lens import (
    LensStack,
    build_lens_stack,
    parse_lenses_from,
    trace_from_film,
    trace_to_film,
)
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
    # exit-pupil radius per (film radius, λ) bin — the reference's
    # RadialSampler caches radial×wavelength bins
    # (src/camera/realistic_camera.rs:146-181); λ-binning keeps the pupil
    # chromatic (short-λ rays refract harder, shifting the usable pupil)
    pupil_radii: jnp.ndarray  # f32[K_r, K_l]
    lam_lo: jnp.ndarray  # f32 λ-bin range
    lam_hi: jnp.ndarray
    rear_z: jnp.ndarray  # f32 z of the rear interface vertex
    rear_aperture: jnp.ndarray  # f32
    front_aperture: jnp.ndarray  # f32 front-element housing radius (m)
    f_eff: jnp.ndarray  # f32 effective focal length (chief-ray probe)

    # ---- LT/BDPT lens-connection protocol (shared with ProjectiveCamera).
    # Light paths connect to a point sampled on the FRONT element aperture
    # (the reference's lens proxy Instance, realistic_camera.rs get_surface)
    # and the importance weight uses the assembly's measured effective focal
    # length: the front-vertex→sensor map is r_s ≈ f_eff·tanθ (chief-ray
    # probe at build, _estimate_f_eff), so the thin-lens importance
    # W_e = f_eff²/(cos³θ·A_sensor) carries over with vignetting handled
    # exactly by the reverse trace's validity mask (get_pixel_for_ray).
    # Residual error is the assembly's distortion from the paraxial map —
    # validated ≤15% vs PT in tests/test_render_lt.py.
    def sample_lens_point(self, u1, u2):
        lens_xy = sampling.random_in_unit_disk(u1, u2) * self.front_aperture
        return (self.origin + lens_xy[..., 0:1] * self.u
                + lens_xy[..., 1:2] * self.v)

    def lens_area(self):
        return jnp.pi * self.front_aperture * self.front_aperture

    def we_focal(self):
        return self.f_eff

    def we_film_area(self):
        return (2.0 * self.sensor_half * self.aspect) * (2.0 * self.sensor_half)

    def _pupil_radius(self, film_r, lam):
        k_r, k_l = self.pupil_radii.shape
        rmax = self.sensor_half * jnp.sqrt(self.aspect**2 + 1.0)
        bin_r = jnp.clip((film_r / rmax * k_r).astype(jnp.int32), 0, k_r - 1)
        lt = (lam - self.lam_lo) / jnp.maximum(self.lam_hi - self.lam_lo, 1e-6)
        bin_l = jnp.clip((lt * k_l).astype(jnp.int32), 0, k_l - 1)
        return self.pupil_radii[bin_r, bin_l]

    def get_ray(self, film_u, film_v, lens_u1, lens_u2):
        """Returns (o_world, d_world, tau) — tau==0 marks vignetted rays."""
        return self.get_ray_spectral(film_u, film_v, lens_u1, lens_u2,
                                     jnp.full(jnp.shape(film_u), 550.0))

    def get_ray_spectral(self, film_u, film_v, lens_u1, lens_u2, lam):
        """λ-aware imaging: the exit pupil AND the trace are chromatic."""
        sx = (film_u * 2.0 - 1.0) * self.sensor_half * self.aspect
        sy = (1.0 - film_v * 2.0) * self.sensor_half
        film_r = jnp.sqrt(sx * sx + sy * sy)
        pupil_r = self._pupil_radius(film_r, lam)
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

    def get_ray_hwss(self, film_u, film_v, lens_u1, lens_u2, lam):
        """HWSS imaging (lam f32[N, C], lane 0 = hero): the GEOMETRIC ray is
        the hero's chromatic trace, and every companion λ is ALSO traced
        through the assembly from the same (film point, lens point) —
        vectorizing the per-element march over the C axis — so companions
        get their exact chromatic vignetting (lane weight W_e(λ_c) = the
        companion trace's validity) and their exact sampling density of the
        shared lens point for the Wilkie spectral-MIS ratios (the exit
        pupil radius is λ-dependent: p_c/p_0 = (r_0/r_c)² inside the
        companion pupil, 0 outside). Residual approximation: companion
        radiance is still evaluated along the hero's exit direction (the
        assembly's angular dispersion); energy and vignetting are λ-exact.
        Reference per-sample single-λ trace: realistic_camera.rs:77-194.

        Returns (o_world, d_world, tau_hero, lane_w f32[N, C],
        pdfr0 f32[N, C]) with lane 0 of lane_w/pdfr0 ≡ 1."""
        C = lam.shape[-1]
        sx = (film_u * 2.0 - 1.0) * self.sensor_half * self.aspect
        sy = (1.0 - film_v * 2.0) * self.sensor_half
        film_r = jnp.sqrt(sx * sx + sy * sy)
        r_lanes = [self._pupil_radius(film_r, lam[..., ci])
                   for ci in range(C)]
        r0 = r_lanes[0]
        o_cam = jnp.stack(
            [sx, sy, jnp.broadcast_to(self.film_z_offset, sx.shape)], -1)
        disk = sampling.random_in_unit_disk(lens_u1, lens_u2) * r0[..., None]
        disk_r = jnp.sqrt(disk[..., 0] ** 2 + disk[..., 1] ** 2)
        target = jnp.stack(
            [disk[..., 0], disk[..., 1],
             jnp.broadcast_to(self.rear_z, sx.shape)], -1)
        d_cam = vecmath.normalize(target - o_cam)
        o_out, d_out, valid0 = trace_from_film(self.stack, o_cam, d_cam,
                                               lam[..., 0])
        o_world = (
            self.origin
            + o_out[..., 0:1] * self.u
            + o_out[..., 1:2] * self.v
            + (o_out[..., 2:3] - self.stack.total_thickness) * self.w
        )
        d_world = vecmath.normalize(
            d_out[..., 0:1] * self.u + d_out[..., 1:2] * self.v
            + d_out[..., 2:3] * self.w
        )
        lane_w = [jnp.ones_like(r0)]
        pdfr0 = [jnp.ones_like(r0)]
        for ci in range(1, C):
            _, _, valid_c = trace_from_film(self.stack, o_cam, d_cam,
                                            lam[..., ci])
            lane_w.append(valid_c.astype(jnp.float32))
            rc = jnp.maximum(r_lanes[ci], 1e-9)
            ratio = (r0 / rc) ** 2
            pdfr0.append(jnp.where(disk_r <= rc, ratio, 0.0))
        return (o_world, d_world, valid0.astype(jnp.float32),
                jnp.stack(lane_w, -1), jnp.stack(pdfr0, -1))

    def get_pixel_for_ray(self, o, d, lam=None):
        """Film (u, v) for a ray arriving at the front of the assembly:
        reverse-trace scene->film through every interface (lens.trace_to_film)
        and intersect the sensor plane. Unlocks LT/BDPT splatting through
        lens assemblies — the reference leaves this todo!()
        (src/camera/realistic_camera.rs:201-205). `o`: world point on/near
        the front element; `d`: direction INTO the scene (projective.py
        convention — the arriving particle travels -d)."""
        rel = o - self.origin
        o_cam = jnp.stack([
            vecmath.dot(rel, self.u),
            vecmath.dot(rel, self.v),
            vecmath.dot(rel, self.w) + self.stack.total_thickness,
        ], -1)
        # the ray travels TOWARD the film: flip d into camera space
        d_cam = jnp.stack([
            -vecmath.dot(d, self.u),
            -vecmath.dot(d, self.v),
            -vecmath.dot(d, self.w),
        ], -1)
        going_in = d_cam[..., 2] < 0.0  # must head from scene toward film
        if lam is None:
            lam = jnp.full(o_cam.shape[:-1], 550.0)
        # start slightly in front of the first interface so the first
        # intersection is the front element
        o_start = o_cam.at[..., 2].set(
            jnp.maximum(o_cam[..., 2], self.stack.total_thickness + 1e-6))
        p, d_exit, valid = trace_to_film(self.stack, o_start, d_cam, lam)
        t = (self.film_z_offset - p[..., 2]) / jnp.where(
            jnp.abs(d_exit[..., 2]) > 1e-9, d_exit[..., 2], 1.0)
        sensor = p + t[..., None] * d_exit
        film_u = (sensor[..., 0] / (self.sensor_half * self.aspect) + 1.0) * 0.5
        film_v = (1.0 - sensor[..., 1] / self.sensor_half) * 0.5
        inside = ((film_u >= 0.0) & (film_u < 1.0)
                  & (film_v >= 0.0) & (film_v < 1.0))
        ok = valid & going_in & (t > 0.0) & inside
        return film_u, film_v, ok

    def eval_we(self, o, d):
        return (vecmath.dot(d, self.w) > 0.0).astype(jnp.float32)


LAM_BIN_LO, LAM_BIN_HI = 380.0, 780.0


def _bake_pupil_radii(stack: LensStack, sensor_half: float, film_z: float,
                      k_bins: int = 16, lam_bins: int = 8,
                      probes: int = 4096, seed: int = 0):
    """Host-side exit-pupil bake (RadialSampler-cache equivalent,
    src/camera/realistic_camera.rs:146-181 — radial×WAVELENGTH bins): for
    each (film radius, λ) bin, MC-probe the rear aperture disk and record
    the max radius that traces through. One batched trace per radius bin
    (probes × λ-bins rays)."""
    rng = np.random.default_rng(seed)
    rear_ap = float(stack.aperture[-1])
    rear_z = float(stack.z_front[-1])
    radii = np.zeros((k_bins, lam_bins), np.float32)
    rmax = sensor_half * np.sqrt(2.0)
    lams = LAM_BIN_LO + (np.arange(lam_bins) + 0.5) / lam_bins * (
        LAM_BIN_HI - LAM_BIN_LO)
    for b in range(k_bins):
        film_r = (b + 0.5) / k_bins * rmax
        n = probes * lam_bins
        o = np.zeros((n, 3), np.float32)
        o[:, 0] = film_r
        o[:, 2] = film_z
        rr = np.sqrt(rng.uniform(size=n)) * rear_ap
        phi = rng.uniform(0, 2 * np.pi, size=n)
        target = np.stack([rr * np.cos(phi), rr * np.sin(phi), np.full(n, rear_z)], -1)
        d = target - o
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        lam = np.repeat(lams, probes).astype(np.float32)
        _, _, valid = trace_from_film(
            stack, jnp.asarray(o), jnp.asarray(d), jnp.asarray(lam)
        )
        valid = np.asarray(valid).reshape(lam_bins, probes)
        rr2 = rr.reshape(lam_bins, probes)
        for l in range(lam_bins):
            radii[b, l] = (rr2[l][valid[l]].max() * 1.05
                           if valid[l].any() else rear_ap)
    return jnp.asarray(radii)


def _estimate_f_eff(stack: LensStack, film_z: float, lam: float = 550.0):
    """Effective focal length by chief-ray probe: reverse-trace rays that
    hit the front vertex at small field angles θ and fit r_sensor/tanθ.
    This is the paraxial focal length of the assembled system — the
    quantity the thin-lens importance W_e = f²/(cos³θ·A_film) needs for
    LT/BDPT lens connections (reference leaves eval_we at the hemisphere
    test, src/camera/mod.rs:99-110)."""
    zf = float(stack.total_thickness)
    thetas = np.radians(np.array([1.0, 2.0, 3.0, 4.0, 6.0], np.float64))
    o = np.zeros((len(thetas), 3), np.float32)
    o[:, 2] = zf + 1e-6
    d = np.stack([np.sin(thetas), np.zeros_like(thetas), -np.cos(thetas)],
                 -1).astype(np.float32)
    p, d_exit, valid = trace_to_film(
        stack, jnp.asarray(o), jnp.asarray(d),
        jnp.full((len(thetas),), lam, jnp.float32))
    p, d_exit, valid = np.asarray(p), np.asarray(d_exit), np.asarray(valid)
    t = (film_z - p[:, 2]) / np.where(np.abs(d_exit[:, 2]) > 1e-9,
                                      d_exit[:, 2], 1.0)
    sensor = p + t[:, None] * d_exit
    r_s = np.abs(sensor[:, 0])
    f = r_s / np.tan(thetas)
    f = f[valid & (t > 0)]
    return float(np.median(f)) if f.size else float(zf)


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
                              k_bins=int(data.get("radial_bins", 16)),
                              lam_bins=int(data.get("wavelength_bins", 8)))
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
        lam_lo=jnp.float32(LAM_BIN_LO),
        lam_hi=jnp.float32(LAM_BIN_HI),
        rear_z=stack.z_front[-1],
        rear_aperture=stack.aperture[-1],
        front_aperture=stack.aperture[0],
        f_eff=jnp.float32(_estimate_f_eff(stack, film_z)),
    )
