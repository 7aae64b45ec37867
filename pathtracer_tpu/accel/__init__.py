from pathtracer_tpu.accel.sah import build_sah_bvh
from pathtracer_tpu.accel.flatten import BVH, flatten_bvh, build_bvh_arrays
from pathtracer_tpu.accel.traverse import intersect_bvh, intersect_any_bvh

__all__ = [
    "build_sah_bvh",
    "BVH",
    "flatten_bvh",
    "build_bvh_arrays",
    "intersect_bvh",
    "intersect_any_bvh",
]
