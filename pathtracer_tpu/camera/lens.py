"""Lens assembly: spec parsing + vectorised element-by-element ray tracing.

Capability parity with the reference's rust_optics crate
(LensAssembly::trace_forward, LensInterface, parse_lenses_from — used by
src/camera/realistic_camera.rs:4-5,42-89). The spec files
(data/cameras/*.txt) are PBRT-style tables: radius, thickness,
material (air / iris / abbe n vd / glass-name n vd), housing diameter.

TPU design: the per-element loop is a static unrolled sequence of
sphere-intersect + Snell refractions over the whole ray wavefront —
embarrassingly parallel, XLA-fuses into one kernel (SURVEY §2.13 "TPU
plan"). Dispersion: each element's Abbe number is converted to a Cauchy
pair so n(λ) is evaluated per-ray wavelength.
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple

import jax.numpy as jnp

from pathtracer_tpu.core import vecmath

_LAM_D, _LAM_F, _LAM_C = 587.6, 486.1, 656.3  # Fraunhofer lines (nm)


@dataclasses.dataclass
class LensElement:
    radius: float  # signed curvature radius; huge => planar
    thickness: float  # distance to the next interface (toward the film)
    ior_d: float  # d-line index (1.0 = air)
    abbe: float  # Abbe number (0 => non-dispersive)
    aperture_radius: float  # housing radius
    is_stop: bool  # iris?


class LensStack(NamedTuple):
    """Device SoA of the assembly, ordered FRONT (scene) -> REAR (film)."""

    z_front: jnp.ndarray  # [E] z of each interface vertex on the axis
    radius: jnp.ndarray  # [E] signed radius (0 => planar)
    cauchy_a: jnp.ndarray  # [E] n(λ) = A + B/λ² of the medium BEHIND (film side)
    cauchy_b: jnp.ndarray
    aperture: jnp.ndarray  # [E]
    is_stop: jnp.ndarray  # bool[E]
    total_thickness: jnp.ndarray  # scalar


def parse_lenses_from(path: str) -> List[LensElement]:
    """Parse a lens spec table (rust_optics parse_lenses_from equivalent)."""
    elements = []
    with open(path) as f:
        for line in f:
            line = line.split("#")[0].strip()
            if not line:
                continue
            tok = line.split()
            radius = float(tok[0])
            thickness = float(tok[1])
            mat = tok[2].lower() if len(tok) > 2 else "air"
            if mat == "air":
                ior, abbe = 1.0, 0.0
                ap = float(tok[-1]) / 2.0
            elif mat == "iris":
                ior, abbe = 1.0, 0.0
                ap = float(tok[-1]) / 2.0
            else:
                # "abbe n vd housing" or "GLASSNAME n vd housing"
                ior = float(tok[3])
                abbe = float(tok[4])
                ap = float(tok[5]) / 2.0
            elements.append(
                LensElement(
                    radius=radius,
                    thickness=thickness,
                    ior_d=ior,
                    abbe=abbe,
                    aperture_radius=ap,
                    is_stop=(mat == "iris"),
                )
            )
    return elements


def abbe_to_cauchy(n_d: float, vd: float):
    """(n_d, Abbe) -> Cauchy A + B/λ² (λ nm) matching n at the d-line and the
    F–C dispersion n_F − n_C = (n_d − 1)/vd."""
    if vd <= 0.0 or n_d <= 1.0:
        return n_d, 0.0
    b = (n_d - 1.0) / (vd * (1.0 / _LAM_F**2 - 1.0 / _LAM_C**2))
    a = n_d - b / _LAM_D**2
    return a, b


def build_lens_stack(elements: List[LensElement], scale: float = 1e-3, iris_radius: float | None = None) -> LensStack:
    """Flatten elements to device arrays. `scale` converts spec units (mm)
    to metres (reference mm↔m transform, realistic_camera.rs:69-74);
    `iris_radius` (already scaled) overrides the stop radius (f-stop,
    realistic_camera.rs:44-46). z axis: film at z=0, scene at z>0; the
    FIRST spec row is the scene-side interface."""
    total = sum(e.thickness for e in elements) * scale
    z = total
    zs, rads, cas, cbs, aps, stops = [], [], [], [], [], []
    for e in elements:
        a, b = abbe_to_cauchy(e.ior_d, e.abbe)
        zs.append(z)
        rads.append(e.radius * scale if abs(e.radius) < 9e4 else 0.0)
        cas.append(a)
        cbs.append(b)
        ap = e.aperture_radius * scale
        if e.is_stop and iris_radius is not None:
            ap = min(ap, iris_radius)
        aps.append(ap)
        stops.append(e.is_stop)
        z -= e.thickness * scale
    return LensStack(
        z_front=jnp.asarray(zs, jnp.float32),
        radius=jnp.asarray(rads, jnp.float32),
        cauchy_a=jnp.asarray(cas, jnp.float32),
        cauchy_b=jnp.asarray(cbs, jnp.float32),
        aperture=jnp.asarray(aps, jnp.float32),
        is_stop=jnp.asarray(stops),
        total_thickness=jnp.float32(total),
    )


def _intersect_interface(o, d, z_vertex, radius):
    """Intersect rays with a spherical (or planar) interface whose vertex is
    at (0,0,z_vertex), curvature radius `radius` (center at z_vertex+radius).
    Returns (t, normal oriented against d)."""
    planar = jnp.abs(radius) < 1e-12
    # planar
    t_plane = (z_vertex - o[..., 2]) / jnp.where(jnp.abs(d[..., 2]) > 1e-12, d[..., 2], 1e-12)
    n_plane = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), o.shape)
    # spherical: spec positive radius = surface convex toward the scene, so
    # (scene at +z) the center sits at z_vertex - radius
    center = jnp.stack([jnp.zeros_like(z_vertex), jnp.zeros_like(z_vertex), z_vertex - radius], -1)
    oc = o - center
    b_half = vecmath.dot(oc, d)
    c = vecmath.dot(oc, oc) - radius * radius
    disc = b_half * b_half - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    # the lens cap lies around the vertex: far root when curvature and travel
    # agree (R>0 puts the vertex at the sphere top for +z travel)
    use_far = (radius * d[..., 2]) > 0.0
    t_sph = jnp.where(use_far, -b_half + sq, -b_half - sq)
    p = o + t_sph[..., None] * d
    n_sph = vecmath.normalize(p - center) * jnp.sign(radius)
    ok_sph = disc > 0.0
    t = jnp.where(planar, t_plane, t_sph)
    n = jnp.where(planar[..., None] | jnp.zeros_like(o, bool), n_plane, n_sph)
    ok = jnp.where(planar, t_plane > 0.0, ok_sph & (t_sph > 0.0))
    return t, n, ok


def trace_from_film(stack: LensStack, o, d, lam):
    """Trace rays starting at the film plane (z=0, travelling +z toward the
    scene) through all interfaces REAR -> FRONT. Returns (o_out, d_out,
    valid). Matches trace_forward's role (film-side input, scene-side
    output) in the reference's get_ray path."""
    n_elems = stack.z_front.shape[0]
    valid = jnp.ones(o.shape[:-1], bool)
    # current medium ior: start in air (film side)
    cur_ior = jnp.ones(o.shape[:-1])
    for i in range(n_elems - 1, -1, -1):
        z_v = stack.z_front[i]
        radius = stack.radius[i]
        t, n_i, ok = _intersect_interface(o, d, z_v, radius)
        p = o + t[..., None] * d
        r2 = p[..., 0] ** 2 + p[..., 1] ** 2
        within = r2 <= stack.aperture[i] ** 2
        # medium in FRONT of interface i (scene side) = medium behind i-1;
        # front of the first element is air
        if i == 0:
            n_front = jnp.ones_like(cur_ior)
        else:
            n_front = stack.cauchy_a[i - 1] + stack.cauchy_b[i - 1] / (lam * lam)
        is_stop = stack.is_stop[i]
        # refract from cur_ior -> n_front about the interface normal
        n_oriented = jnp.where(
            (vecmath.dot(n_i, d) > 0.0)[..., None], -n_i, n_i
        )
        eta_rel = cur_ior / jnp.maximum(n_front, 1e-6)
        wt, tir = vecmath.refract(-d, n_oriented, eta_rel)
        d_new = jnp.where(is_stop[..., None] | jnp.zeros_like(d, bool), d, vecmath.normalize(wt))
        valid = valid & ok & within & ~(jnp.where(is_stop, False, tir))
        o = p
        d = jnp.where(valid[..., None], d_new, d)
        cur_ior = jnp.where(is_stop, cur_ior, n_front)
    return o, d, valid


def trace_to_film(stack: LensStack, o, d, lam):
    """Reverse trace: rays entering the FRONT of the assembly (travelling -z
    toward the film) through all interfaces FRONT -> REAR. Returns
    (o_out, d_out, valid) with o_out on the rear-most interface; intersect
    the film plane from there. Inverse of trace_from_film — enables
    film-side splatting (LT/BDPT get_pixel_for_ray) through real lens
    assemblies, which the reference leaves todo!()
    (src/camera/realistic_camera.rs:201-205)."""
    n_elems = stack.z_front.shape[0]
    valid = jnp.ones(o.shape[:-1], bool)
    cur_ior = jnp.ones(o.shape[:-1])  # air on the scene side
    for i in range(n_elems):
        z_v = stack.z_front[i]
        radius = stack.radius[i]
        t, n_i, ok = _intersect_interface(o, d, z_v, radius)
        p = o + t[..., None] * d
        r2 = p[..., 0] ** 2 + p[..., 1] ** 2
        within = r2 <= stack.aperture[i] ** 2
        # medium BEHIND interface i (film side) = glass of element i; behind
        # the rear-most interface is air (sensor chamber)
        if i == n_elems - 1:
            n_behind = jnp.ones_like(cur_ior)
        else:
            n_behind = stack.cauchy_a[i] + stack.cauchy_b[i] / (lam * lam)
        is_stop = stack.is_stop[i]
        n_oriented = jnp.where(
            (vecmath.dot(n_i, d) > 0.0)[..., None], -n_i, n_i
        )
        eta_rel = cur_ior / jnp.maximum(n_behind, 1e-6)
        wt, tir = vecmath.refract(-d, n_oriented, eta_rel)
        d_new = jnp.where(is_stop[..., None] | jnp.zeros_like(d, bool), d,
                          vecmath.normalize(wt))
        valid = valid & ok & within & ~(jnp.where(is_stop, False, tir))
        o = p
        d = jnp.where(valid[..., None], d_new, d)
        cur_ior = jnp.where(is_stop, cur_ior, n_behind)
    return o, d, valid
