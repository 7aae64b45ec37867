"""World: the complete flattened scene as one pytree of device arrays.

Capability parity with src/world/mod.rs:18-168 (accelerator + light list +
material/medium tables + environment + bounding radius), re-designed as a
NamedTuple so the whole scene rides through jit/shard_map as arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from pathtracer_tpu.core.spectral import CurveBank
from pathtracer_tpu.geometry import Primitives
from pathtracer_tpu.materials import Materials
from pathtracer_tpu.mediums.tables import Mediums
from pathtracer_tpu.textures import Textures
from pathtracer_tpu.world.environment import Environment


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

    def pick_random_light(self, u):
        """Uniform light pick (src/world/mod.rs:100-124).
        Returns (prim_index, pick_pdf)."""
        nl = jnp.maximum(self.n_lights, 1)
        idx = jnp.minimum((u * nl).astype(jnp.int32), nl - 1)
        return self.lights[idx], 1.0 / nl.astype(jnp.float32)
