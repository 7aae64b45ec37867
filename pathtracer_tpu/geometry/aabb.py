"""AABB slab test, vectorised.

Reference capability: src/aabb.rs:37-65 (SIMD slab test returning (t0, t1)).
On TPU the f32x4 trick is unnecessary — the VPU vectorises over the ray
batch axis instead.
"""

from __future__ import annotations

import jax.numpy as jnp


def slab_test(lo, hi, o, inv_d, t_min, t_max):
    """Returns (t0, t1, hit) for rays o + t*d against boxes [lo, hi].

    Shapes broadcast: lo/hi [...,3], o/inv_d [...,3]. inv_d = 1/d with ±inf
    for zero components (IEEE semantics give correct slab behaviour).
    """
    ta = (lo - o) * inv_d
    tb = (hi - o) * inv_d
    t0 = jnp.max(jnp.minimum(ta, tb), axis=-1)
    t1 = jnp.min(jnp.maximum(ta, tb), axis=-1)
    hit = jnp.logical_and(t0 <= t1, jnp.logical_and(t1 >= t_min, t0 <= t_max))
    return t0, t1, hit
