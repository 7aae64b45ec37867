"""Aperture shapes: circular and bladed.

Capability parity with rust_optics' aperture module (ApertureEnum,
CircularAperture, SimpleBladedAperture{blades, sharpness}; used via
src/parsing/cameras.rs ApertureData). The reference rejection-samples; the
wavefront version warps the unit-disk sample by the polygon's radial
profile — rejection-free, so no lane ever idles.
"""

from __future__ import annotations

import jax.numpy as jnp

from pathtracer_tpu.core import sampling


def polygon_radius(phi, blades):
    """Inradius-normalised radius of a regular `blades`-gon at angle phi."""
    n = blades
    seg = 2.0 * jnp.pi / n
    a = jnp.mod(phi, seg) - seg / 2.0
    return jnp.cos(jnp.pi / n) / jnp.cos(a)


def sample_aperture(u1, u2, radius, blades, sharpness):
    """Point on the aperture: unit disk warp -> polygon blend.
    blades < 3 -> circular. `sharpness` in [0,1]: how strongly the polygon
    silhouette is pulled in (1 = exact polygon edge). Fully traced (blades
    may be a device scalar)."""
    disk = sampling.random_in_unit_disk(u1, u2)
    blades_f = jnp.maximum(jnp.asarray(blades, jnp.float32), 3.0)
    phi = jnp.arctan2(disk[..., 1], disk[..., 0])
    seg = 2.0 * jnp.pi / blades_f
    a = jnp.mod(phi, seg) - seg / 2.0
    poly = jnp.cos(jnp.pi / blades_f) / jnp.cos(a)
    t = jnp.where(jnp.asarray(blades) >= 3, jnp.clip(sharpness, 0.0, 1.0), 0.0)
    r_scale = (1.0 - t) + t * poly
    return disk * (r_scale * radius)[..., None]
