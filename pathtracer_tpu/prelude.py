"""Shared constants & tiny helpers.

Capability parity with the reference's prelude/lib
(reference: src/lib.rs:46-56,114-119, src/prelude.rs:1-31).
"""

from __future__ import annotations

import enum

import jax.numpy as jnp

# Visually-loud error color used to flag NaN/invalid pixels
# (reference: src/lib.rs:45-46 "MAUVE").
MAUVE_XYZ = (0.5199467, 0.3772858, 0.7161815)

# Geometric offsets to avoid self-intersection
# (reference: src/lib.rs: NORMAL_OFFSET / INTERSECTION_TIME_OFFSET).
NORMAL_OFFSET = 1e-3
INTERSECTION_TIME_OFFSET = 1e-6

# Default ray tmax ("infinity")
RAY_TMAX = 1e9


class TransportMode(enum.IntEnum):
    """Radiance (light -> camera transport) vs Importance (camera -> light).

    reference: src/lib.rs TransportMode; used for the Veach 5.2.2.1 eta^2
    factor in refractive BSDFs.
    """

    Importance = 0
    Radiance = 1


def power_heuristic(a, b):
    """Balance heuristic a/(a+b).

    Despite the name this is the *balance* heuristic, matching the
    reference's `power_heuristic_generic` (src/lib.rs:114-119).
    """
    return a / (a + b)


def safe_div(num, den, default=0.0):
    """num/den with den==0 mapped to `default` (jit-safe, no NaN/inf)."""
    den_ok = den != 0.0
    return jnp.where(den_ok, num / jnp.where(den_ok, den, 1.0), default)
