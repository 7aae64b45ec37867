"""Henyey-Greenstein homogeneous participating medium.

reference: src/mediums/hg.rs — spectral g / sigma_a / sigma_s curves; HG
phase (:5-15), inverse-CDF cosθ sampling (:59-85), exponential free flight
(:86-101), Beer-Lambert transmittance (:102-105).
"""

from __future__ import annotations

import jax.numpy as jnp

from pathtracer_tpu.core import vecmath


def hg_phase(g, cos_theta):
    """HG phase p(cosθ), θ between incoming and outgoing propagation
    directions; forward peak at cosθ=+1 for g>0. Normalised over the
    sphere."""
    g2 = g * g
    denom = 1.0 + g2 - 2.0 * g * cos_theta
    return (1.0 - g2) / jnp.maximum(4.0 * jnp.pi * denom * jnp.sqrt(jnp.maximum(denom, 1e-12)), 1e-12)


def hg_sample_cos(g, u):
    """Inverse-CDF sample of cosθ for HG (isotropic fallback at g≈0):
    c(u) = (1+g² − ((1−g²)/(1−g+2gu))²)/(2g); u=0 → backward (−1),
    u=1 → forward (+1)."""
    iso = 2.0 * u - 1.0
    sq = (1.0 - g * g) / jnp.where(jnp.abs(g) > 1e-6, 1.0 - g + 2.0 * g * u, 1.0)
    aniso = (1.0 + g * g - sq * sq) / jnp.where(jnp.abs(g) > 1e-6, 2.0 * g, 1.0)
    return jnp.clip(jnp.where(jnp.abs(g) < 1e-4, iso, aniso), -1.0, 1.0)


def hg_sample_direction(g, wi, u1, u2):
    """Sample scattered direction about incoming direction wi.
    Returns (wo, phase_pdf) — for HG, pdf == phase value."""
    cos_t = hg_sample_cos(g, u1)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * jnp.pi * u2
    t_ax, b_ax = vecmath.orthonormal_basis(wi)
    wo = (
        (sin_t * jnp.cos(phi))[..., None] * t_ax
        + (sin_t * jnp.sin(phi))[..., None] * b_ax
        + cos_t[..., None] * wi
    )
    return wo, hg_phase(g, cos_t)


def beer_lambert_tr(sigma_t, dist):
    return jnp.exp(-sigma_t * dist)


def sample_free_flight(sigma_s, u):
    """Exponential distance sampling from scattering coefficient.
    Returns distance (inf when sigma_s == 0)."""
    return jnp.where(sigma_s > 1e-12, -jnp.log(jnp.maximum(1.0 - u, 1e-12)) / jnp.maximum(sigma_s, 1e-12), jnp.inf)
