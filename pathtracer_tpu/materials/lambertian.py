"""Textured Lambertian diffuse BSDF.

reference: src/materials/lambertian.rs:15-66 — f = min(tex(λ,uv), 1)/π on
wi's hemisphere, pdf = |wo.z|/π, cosine-hemisphere sampling mirrored to wi's
side.
"""

from __future__ import annotations

import jax.numpy as jnp

from pathtracer_tpu.core import sampling


def eval_lambertian(reflectance, wi, wo):
    """(f, pdf) in local frame. reflectance = texture value at (λ, uv)."""
    same_hemi = wi[..., 2] * wo[..., 2] > 0.0
    f = jnp.where(same_hemi, jnp.minimum(reflectance, 1.0) / jnp.pi, 0.0)
    pdf = jnp.where(same_hemi, jnp.abs(wo[..., 2]) / jnp.pi, 0.0)
    return f, pdf


def sample_lambertian(reflectance, wi, u1, u2):
    """Cosine-sample wo on wi's hemisphere. Returns (wo, f, pdf)."""
    wo = sampling.random_cosine_direction(u1, u2)
    wo = jnp.where((wi[..., 2] < 0.0)[..., None], wo * jnp.array([1.0, 1.0, -1.0]), wo)
    f, pdf = eval_lambertian(reflectance, wi, wo)
    return wo, f, pdf
