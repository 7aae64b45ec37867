from pathtracer_tpu.geometry.soa import (
    Primitives,
    HitRecord,
    PRIM_TRIANGLE,
    PRIM_SPHERE,
    PRIM_RECT,
    PRIM_DISK,
    intersect_dense,
    intersect_any_dense,
    sample_surface,
    primitive_area,
)

__all__ = [
    "Primitives",
    "HitRecord",
    "PRIM_TRIANGLE",
    "PRIM_SPHERE",
    "PRIM_RECT",
    "PRIM_DISK",
    "intersect_dense",
    "intersect_any_dense",
    "sample_surface",
    "primitive_area",
]
