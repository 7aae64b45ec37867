"""Vector math on trailing-axis-3 jnp arrays.

The reference keeps Vec3/Point3 as f32x4 SIMD structs in rust_cg_math; the
TPU-native representation is simply `[..., 3]` float32 arrays so every op
vectorises over an arbitrary wavefront of rays on the VPU.

Includes TangentFrame (reference: rust_cg_math TangentFrame, used e.g. at
src/materials/lambertian.rs / src/integrator/utils.rs) and the equirect
uv<->direction mapping (rust_cg_math `uv_to_direction`/`direction_to_uv`,
used by src/world/environment.rs).
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def length(a):
    return jnp.sqrt(jnp.sum(a * a, axis=-1))


def length_squared(a):
    return jnp.sum(a * a, axis=-1)


def normalize(a, eps: float = 1e-20):
    return a * jnp.sqrt(jnp.clip(1.0 / jnp.maximum(length_squared(a), eps), 0.0, None))[
        ..., None
    ]


def vec(x, y, z):
    return jnp.stack(jnp.broadcast_arrays(jnp.asarray(x, jnp.float32),
                                          jnp.asarray(y, jnp.float32),
                                          jnp.asarray(z, jnp.float32)), axis=-1)


def reflect(w, n):
    """Mirror w about normal n (both unit). Convention: w points away from
    the surface (same as the reference's BSDF-local `reflect`,
    src/materials/ggx.rs helpers)."""
    return -w + 2.0 * dot(w, n)[..., None] * n


def refract(w, n, eta_rel):
    """Refract direction w (pointing away from surface, unit) about n with
    relative IOR eta_rel = eta_i/eta_t. Returns (wt, total_internal_reflection
    mask)."""
    cos_i = dot(w, n)
    sin2_i = jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    sin2_t = eta_rel * eta_rel * sin2_i
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    wt = -w * eta_rel[..., None] + (eta_rel * cos_i - cos_t)[..., None] * n
    return wt, tir


def orthonormal_basis(n):
    """Build (tangent, bitangent) for unit normal n — branchless Frisvad/
    Duff et al. construction (TPU-friendly: no data-dependent branches)."""
    sign = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b, -sign * n[..., 0]], axis=-1
    )
    bt = jnp.stack([b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return t, bt


class TangentFrame:
    """Local shading frame with +z = normal.

    to_local/to_world mirror rust_cg_math's TangentFrame API used across the
    reference's BSDF code.
    """

    def __init__(self, tangent, bitangent, normal):
        self.tangent = tangent
        self.bitangent = bitangent
        self.normal = normal

    @staticmethod
    def from_normal(n):
        t, b = orthonormal_basis(n)
        return TangentFrame(t, b, n)

    def to_local(self, v):
        return jnp.stack(
            [dot(v, self.tangent), dot(v, self.bitangent), dot(v, self.normal)],
            axis=-1,
        )

    def to_world(self, v):
        return (
            v[..., 0:1] * self.tangent
            + v[..., 1:2] * self.bitangent
            + v[..., 2:3] * self.normal
        )


def direction_to_uv(d):
    """Unit direction -> equirect (u, v), u in [0,1) from atan2, v = acos(z)/pi.

    Matches rust_cg_math's direction_to_uv as used by the environment map
    (reference: src/world/environment.rs emission/pdf paths).
    """
    u = (jnp.arctan2(d[..., 1], d[..., 0]) / (2.0 * jnp.pi)) % 1.0
    v = jnp.arccos(jnp.clip(d[..., 2], -1.0, 1.0)) / jnp.pi
    return u, v


def uv_to_direction(u, v):
    phi = 2.0 * jnp.pi * u
    theta = jnp.pi * v
    st = jnp.sin(theta)
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), jnp.cos(theta)], axis=-1)
