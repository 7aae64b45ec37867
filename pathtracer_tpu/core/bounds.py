"""1-D interval type used for wavelength ranges and parametric ray spans.

Capability parity with rust_cg_math's `Bounds1D` (used throughout the
reference, e.g. src/parsing/config.rs wavelength_bounds).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Bounds1D(NamedTuple):
    lower: float
    upper: float

    @property
    def span(self):
        return self.upper - self.lower

    def sample(self, u):
        """Map u in [0,1) into the interval."""
        return self.lower + u * (self.upper - self.lower)

    def contains(self, x):
        return jnp.logical_and(x >= self.lower, x < self.upper)

    def intersection(self, other: "Bounds1D") -> "Bounds1D":
        return Bounds1D(max(self.lower, other.lower), min(self.upper, other.upper))

    def union(self, other: "Bounds1D") -> "Bounds1D":
        return Bounds1D(min(self.lower, other.lower), max(self.upper, other.upper))


# Visible-spectrum wavelength ranges in nanometres (matching rust_cg_math's
# BOUNDED_VISIBLE_RANGE / EXTENDED_VISIBLE_RANGE as used by the reference).
BOUNDED_VISIBLE_RANGE = Bounds1D(380.0, 780.0)
EXTENDED_VISIBLE_RANGE = Bounds1D(370.0, 790.0)
