"""Sharp (cosine-power) directional emitter.

reference: src/materials/sharp_light.rs — emission lobe
(n+1)·|cosθ|^n / (2π) with `sharpness` = n, gated by sidedness; the bounce
BSDF is lambertian; sampling via cosine-power hemisphere
(random_weighted_cosine, :32-40; evaluate_inner (n+1)|z|^n/2π, :202-204).
"""

from __future__ import annotations

import jax.numpy as jnp

from pathtracer_tpu.materials.diffuse_light import sidedness_gate


def emission_sharp(spd_value, sharpness, sidedness, cos_theta):
    n = sharpness
    lobe = (n + 1.0) * jnp.abs(cos_theta) ** n / (2.0 * jnp.pi)
    return spd_value * lobe * sidedness_gate(sidedness, cos_theta)


def emission_pdf_sharp(sharpness, sidedness, cos_theta):
    """Directional pdf of the cosine-power emission sampler (Dual-sided
    lights halve the per-direction density — must match the sampler)."""
    from pathtracer_tpu.materials.diffuse_light import SIDE_DUAL

    n = sharpness
    pdf = (n + 1.0) * jnp.abs(cos_theta) ** n / (2.0 * jnp.pi)
    pdf = pdf * sidedness_gate(sidedness, cos_theta)
    return jnp.where(sidedness == SIDE_DUAL, pdf * 0.5, pdf)
