"""Affine transforms as packed forward+inverse 4x4 matrices.

Reference capability: rust_cg_math `Transform3` built from
scale -> axis-angle rotations -> translation stacks
(reference: src/parsing/instance.rs:40-70, src/geometry/instance.rs:89-178).

TPU design: a Transform is a pair of jnp 4x4 matrices (forward, inverse);
normals transform by the inverse-transpose. Batches broadcast naturally.
Host-side construction uses numpy for scene building.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np
import jax.numpy as jnp


class Transform(NamedTuple):
    m: jnp.ndarray  # [...,4,4] local -> world
    m_inv: jnp.ndarray  # [...,4,4] world -> local

    @staticmethod
    def identity():
        return Transform(jnp.eye(4, dtype=jnp.float32), jnp.eye(4, dtype=jnp.float32))

    def apply_point(self, p):
        r = jnp.einsum("...ij,...j->...i", self.m[..., :3, :3], p)
        return r + self.m[..., :3, 3]

    def apply_vector(self, v):
        return jnp.einsum("...ij,...j->...i", self.m[..., :3, :3], v)

    def apply_normal(self, n):
        # inverse-transpose (reference: src/geometry/instance.rs:89-133)
        return jnp.einsum("...ji,...j->...i", self.m_inv[..., :3, :3], n)

    def inverse_point(self, p):
        r = jnp.einsum("...ij,...j->...i", self.m_inv[..., :3, :3], p)
        return r + self.m_inv[..., :3, 3]

    def inverse_vector(self, v):
        return jnp.einsum("...ij,...j->...i", self.m_inv[..., :3, :3], v)

    def compose(self, other: "Transform") -> "Transform":
        """self ∘ other (apply `other` first)."""
        return Transform(self.m @ other.m, other.m_inv @ self.m_inv)


# ---------------------------------------------------------------- host-side


def _np_scale(s) -> np.ndarray:
    m = np.eye(4, dtype=np.float64)
    m[0, 0], m[1, 1], m[2, 2] = s[0], s[1], s[2]
    return m


def _np_translate(t) -> np.ndarray:
    m = np.eye(4, dtype=np.float64)
    m[:3, 3] = t
    return m


def _np_axis_angle(axis, angle_rad: float) -> np.ndarray:
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    x, y, z = axis
    c, s = np.cos(angle_rad), np.sin(angle_rad)
    C = 1.0 - c
    r = np.array(
        [
            [x * x * C + c, x * y * C - z * s, x * z * C + y * s],
            [y * x * C + z * s, y * y * C + c, y * z * C - x * s],
            [z * x * C - y * s, z * y * C + x * s, z * z * C + c],
        ]
    )
    m = np.eye(4, dtype=np.float64)
    m[:3, :3] = r
    return m


def from_stack(
    scale=None, rotations: Sequence = (), translate=None
) -> np.ndarray:
    """Build a forward matrix applying scale, then each (axis, angle_degrees)
    rotation in order, then translation — matching the reference's
    Transform3Data semantics (src/parsing/instance.rs:40-70)."""
    m = np.eye(4, dtype=np.float64)
    if scale is not None:
        m = _np_scale(scale) @ m
    for axis, angle_deg in rotations:
        m = _np_axis_angle(axis, np.deg2rad(angle_deg)) @ m
    if translate is not None:
        m = _np_translate(translate) @ m
    return m


def transform_from_matrix(m: np.ndarray) -> Transform:
    return Transform(
        jnp.asarray(m, dtype=jnp.float32),
        jnp.asarray(np.linalg.inv(m), dtype=jnp.float32),
    )


def transform_aabb(m: np.ndarray, lo: np.ndarray, hi: np.ndarray):
    """Transform an AABB by transforming its 8 corners
    (reference: src/aabb.rs `Matrix4x4 * AABB`)."""
    corners = np.array(
        [[x, y, z] for x in (lo[0], hi[0]) for y in (lo[1], hi[1]) for z in (lo[2], hi[2])]
    )
    tc = corners @ m[:3, :3].T + m[:3, 3]
    return tc.min(axis=0), tc.max(axis=0)
