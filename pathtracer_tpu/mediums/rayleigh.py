"""Rayleigh scattering medium.

reference: src/mediums/rayleigh.rs — λ⁻⁴ scattering coefficient derived from
an IOR curve with a corrective factor (:32-39); phase (1+cos²θ)·3/(16π) with
cubic-root inverse-transform sampling (:59-96).
"""

from __future__ import annotations

import jax.numpy as jnp

from pathtracer_tpu.core import vecmath


def rayleigh_sigma_s(ior, lam_nm, number_density_factor):
    """Rayleigh scattering coefficient ∝ (n²-1)²/λ⁴ with a scene-tunable
    corrective factor standing in for number density."""
    lam_m = lam_nm * 1e-9
    n2m1 = ior * ior - 1.0
    return number_density_factor * (n2m1 * n2m1) / jnp.maximum(lam_m**4, 1e-40) * 1e-32


def rayleigh_phase(cos_theta):
    return 3.0 / (16.0 * jnp.pi) * (1.0 + cos_theta * cos_theta)


def rayleigh_sample_cos(u):
    """Inverse-CDF for the Rayleigh phase: solve the cubic
    F(c) = (3c + c³ + 4)/8 = u via Cardano (real root)."""
    z = 2.0 * (2.0 * u - 1.0)
    w = jnp.cbrt(z + jnp.sqrt(z * z + 1.0))
    return jnp.clip(w - 1.0 / w, -1.0, 1.0)


def rayleigh_sample_direction(wi, u1, u2):
    cos_t = rayleigh_sample_cos(u1)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * jnp.pi * u2
    t_ax, b_ax = vecmath.orthonormal_basis(wi)
    wo = (
        (sin_t * jnp.cos(phi))[..., None] * t_ax
        + (sin_t * jnp.sin(phi))[..., None] * b_ax
        + cos_t[..., None] * wi
    )
    return wo, rayleigh_phase(cos_t)
