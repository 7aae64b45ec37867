"""Diffuse area light: lambertian bounce + spectral diffuse emission.

reference: src/materials/diffuse_light.rs — emission = spd(λ)/π gated by
Sidedness {Forward, Reverse, Dual}; sample_emission = cosine hemisphere +
spectral CDF inverse transform (:77-133).
"""

from __future__ import annotations

import jax.numpy as jnp

SIDE_FORWARD = 0  # emits on the +normal side
SIDE_REVERSE = 1  # emits on the -normal side
SIDE_DUAL = 2  # emits both sides


def sidedness_gate(sidedness, cos_theta):
    """1.0 where direction cos (w.r.t. geometric normal) is on an emitting
    side, else 0.0."""
    fwd = cos_theta > 0.0
    rev = cos_theta < 0.0
    return jnp.where(
        sidedness == SIDE_DUAL,
        (cos_theta != 0.0).astype(jnp.float32),
        jnp.where(
            sidedness == SIDE_FORWARD,
            fwd.astype(jnp.float32),
            rev.astype(jnp.float32),
        ),
    )


def emission_diffuse(spd_value, sidedness, cos_theta):
    """Radiance toward direction with cosine `cos_theta` to the normal."""
    return spd_value / jnp.pi * sidedness_gate(sidedness, cos_theta)


def emission_pdf_diffuse(sidedness, cos_theta):
    """Directional (solid-angle) pdf of sample_emission for MIS/BDPT:
    cosine-hemisphere on the emitting side. Dual-sided lights split the
    sample between hemispheres, so each direction's density halves — this
    MUST match _sample_emission_direction's pdf exactly or BDPT/LT MIS
    weights stop summing to 1 (a real ~10% veach-scene deficit)."""
    pdf = jnp.abs(cos_theta) / jnp.pi * sidedness_gate(sidedness, cos_theta)
    return jnp.where(sidedness == SIDE_DUAL, pdf * 0.5, pdf)
