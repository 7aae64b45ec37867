"""Stateless sampling primitives.

The reference draws from a stateful `Box<dyn Sampler>` per pixel
(rust_cg_math Sampler/RandomSampler/StratifiedSampler). The TPU-native
replacement is counter-based: every random draw is a pure function of a
threefry key folded with (pixel, sample, bounce, purpose) — fully
reproducible and order-independent across the wavefront.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fold(key, *ints):
    for i in ints:
        key = jax.random.fold_in(key, i)
    return key


def uniform(key, shape=()):
    return jax.random.uniform(key, shape, dtype=jnp.float32)


def sample_2d(key, shape=()):
    u = jax.random.uniform(key, shape + (2,), dtype=jnp.float32)
    return u[..., 0], u[..., 1]


def choose(u, p):
    """Branch on u < p and rescale u to [0,1) within the chosen branch —
    equivalent of rust_cg_math Sample1D::choose (src/integrator/pt.rs:350-353).
    Returns (picked_below_mask, rescaled_u)."""
    below_mask = u < p
    u_new = jnp.where(below_mask, u / jnp.maximum(p, 1e-12), (u - p) / jnp.maximum(1.0 - p, 1e-12))
    return below_mask, jnp.clip(u_new, 0.0, 1.0 - 1e-7)


def random_cosine_direction(u, v):
    """Cosine-weighted hemisphere direction about +z (pdf = z/pi)."""
    r = jnp.sqrt(u)
    phi = 2.0 * jnp.pi * v
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u))
    return jnp.stack([x, y, z], axis=-1)


def random_on_unit_sphere(u, v):
    z = 1.0 - 2.0 * u
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * v
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def random_in_unit_disk(u, v):
    """Concentric-free polar mapping: radius sqrt(u), angle 2πv."""
    r = jnp.sqrt(u)
    phi = 2.0 * jnp.pi * v
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def power_cosine_direction(u, v, n):
    """Sample direction with pdf ∝ cos^n(θ) about +z
    (reference: src/materials/sharp_light.rs random_weighted_cosine)."""
    cos_t = u ** (1.0 / (n + 1.0))
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * jnp.pi * v
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)
