from pathtracer_tpu.core.bounds import (
    Bounds1D,
    BOUNDED_VISIBLE_RANGE,
    EXTENDED_VISIBLE_RANGE,
)
from pathtracer_tpu.core import vecmath, spectral, cie, sampling, transform

__all__ = [
    "Bounds1D",
    "BOUNDED_VISIBLE_RANGE",
    "EXTENDED_VISIBLE_RANGE",
    "vecmath",
    "spectral",
    "cie",
    "sampling",
    "transform",
]
