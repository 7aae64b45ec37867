"""World: the complete flattened scene as one pytree of device arrays.

Capability parity with src/world/mod.rs:18-168 (accelerator + light list +
material/medium tables + environment + bounding radius), re-designed as a
NamedTuple so the whole scene rides through jit/shard_map as arrays.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from pathtracer_tpu.accel.flatten import BVH
from pathtracer_tpu.accel.traverse import intersect_any_bvh, intersect_bvh
from pathtracer_tpu.accel.two_level import (
    TwoLevel,
    intersect_any_two_level,
    intersect_two_level,
)
from pathtracer_tpu.core.spectral import CurveBank
from pathtracer_tpu.geometry import Primitives, intersect_any_dense, intersect_dense
from pathtracer_tpu.materials import Materials
from pathtracer_tpu.mediums.tables import Mediums
from pathtracer_tpu.textures import Textures
from pathtracer_tpu.world.environment import Environment

# below this primitive count the dense rays×prims sweep beats divergent
# traversal on TPU (VPU-saturating, no gathers); above it, the stackless BVH.
# Measured on v5e (1M-ray wavefronts, diamond-gem scene): dense 320 prims
# ≈ 0.4 s/Mray vs per-ray traversal ≈ 13 s/Mray — the lockstep traversal's
# per-step gathers dominate until scenes get several thousand prims.
DENSE_MAX_PRIMS = 1024


class World(NamedTuple):
    prims: Primitives
    mats: Materials
    tex: Textures
    bank: CurveBank
    mediums: Mediums
    env: Environment
    lights: jnp.ndarray  # i32[L_pad] prim indices tagged MaterialId::Light
    n_lights: jnp.ndarray  # i32 actual count (L_pad is padded)
    env_sampling_probability: jnp.ndarray  # f32
    center: jnp.ndarray  # f32[3] scene bound center
    radius: jnp.ndarray  # f32 scene bound radius
    bvh: BVH  # stackless accelerator (accel/); unused when accel2 is set
    accel2: Optional[TwoLevel] = None  # TLAS/BLAS for instanced-mesh scenes

    def intersect(self, o, d, t_min, t_max):
        """Closest-hit dispatch (Accelerator::hit equivalent,
        src/accelerator/mod.rs:86-178): two-level TLAS/BLAS when the scene
        has shared mesh instances, dense sweep for small scenes, stackless
        single-level BVH otherwise — chosen statically by pytree structure /
        array shape, so each compiled render uses exactly one."""
        if self.accel2 is not None:
            return intersect_two_level(self.prims, self.accel2, o, d, t_min, t_max)
        if self.prims.count <= DENSE_MAX_PRIMS:
            return intersect_dense(self.prims, o, d, t_min, t_max)
        return intersect_bvh(self.prims, self.bvh, o, d, t_min, t_max)

    def intersect_any(self, o, d, t_min, t_max):
        if self.accel2 is not None:
            return intersect_any_two_level(self.prims, self.accel2, o, d, t_min, t_max)
        if self.prims.count <= DENSE_MAX_PRIMS:
            return intersect_any_dense(self.prims, o, d, t_min, t_max)
        return intersect_any_bvh(self.prims, self.bvh, o, d, t_min, t_max)

    def pick_random_light(self, u):
        """Uniform light pick (src/world/mod.rs:100-124).
        Returns (prim_index, pick_pdf)."""
        nl = jnp.maximum(self.n_lights, 1)
        idx = jnp.minimum((u * nl).astype(jnp.int32), nl - 1)
        return self.lights[idx], 1.0 / nl.astype(jnp.float32)
