"""Environment maps: Constant / Sun / HDR (equirect + importance map).

Capability parity with src/world/environment.rs:7-353. The HDR variant's
texel weights live in the shared texture atlas; its importance map is a
separate table (world/importance_map.py). Rotation is a 3x3 applied to the
query direction before the equirect mapping.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from pathtracer_tpu.core import spectral, vecmath
from pathtracer_tpu.textures import Textures, eval_texture

ENV_CONSTANT = 0
ENV_SUN = 1
ENV_HDR = 2


class Environment(NamedTuple):
    kind: jnp.ndarray  # i32
    strength: jnp.ndarray  # f32
    curve_idx: jnp.ndarray  # i32 — SPD for Constant/Sun
    sun_direction: jnp.ndarray  # f32[3]
    sun_cos_angle: jnp.ndarray  # f32 cos(angular_diameter/2)
    tex_id: jnp.ndarray  # i32 — HDR texture id
    rotation: jnp.ndarray  # f32[3,3] world->env
    rotation_inv: jnp.ndarray  # f32[3,3] env->world
    # importance map (Baked): row-conditional CDFs + marginal CDF
    imp_marginal_cdf: jnp.ndarray  # f32[H+1]
    imp_row_cdf: jnp.ndarray  # f32[H, W+1]
    imp_pdf: jnp.ndarray  # f32[H, W] joint pdf over uv
    imp_baked: jnp.ndarray  # bool

    @staticmethod
    def constant(curve_idx: int, strength: float) -> "Environment":
        eye = jnp.eye(3, dtype=jnp.float32)
        z1 = jnp.zeros((2,), jnp.float32)
        return Environment(
            kind=jnp.int32(ENV_CONSTANT),
            strength=jnp.float32(strength),
            curve_idx=jnp.int32(curve_idx),
            sun_direction=jnp.array([0.0, 0.0, 1.0], jnp.float32),
            sun_cos_angle=jnp.float32(0.0),
            tex_id=jnp.int32(0),
            rotation=eye,
            rotation_inv=eye,
            imp_marginal_cdf=z1,
            imp_row_cdf=jnp.zeros((1, 2), jnp.float32),
            imp_pdf=jnp.ones((1, 1), jnp.float32),
            imp_baked=jnp.bool_(False),
        )


def env_emission(env: Environment, bank: spectral.CurveBank, tex: Textures, d, lam):
    """Radiance arriving from direction d (unit, world space) at wavelength
    lam — emission(uv, λ) equivalent (src/world/environment.rs:56-98)."""
    d_env = jnp.einsum("ij,...j->...i", env.rotation, d)
    u, v = vecmath.direction_to_uv(d_env)
    uv = jnp.stack([u, v], axis=-1)
    const_e = spectral.evaluate(bank, env.curve_idx, lam)
    sun_in = vecmath.dot(d, env.sun_direction) >= env.sun_cos_angle
    sun_e = jnp.where(sun_in, const_e, 0.0)
    hdr_e = eval_texture(tex, bank, env.tex_id, lam, uv)
    e = jnp.where(
        env.kind == ENV_CONSTANT,
        const_e,
        jnp.where(env.kind == ENV_SUN, sun_e, hdr_e),
    )
    return env.strength * e


def _uv_solid_angle_jacobian(v):
    """|d(uv)/dω|⁻¹ for the equirect map: 2π² sin(πv), regularised like the
    reference (+0.001 terms, src/world/environment.rs:245-251)."""
    return 2.0 * jnp.pi * jnp.pi * jnp.sin(jnp.pi * v) + 0.001


def env_pdf_for(env: Environment, d):
    """Solid-angle pdf that env_sample_uv would have produced direction d
    (pdf_for equivalent, src/world/environment.rs:198-258)."""
    d_env = jnp.einsum("ij,...j->...i", env.rotation, d)
    u, v = vecmath.direction_to_uv(d_env)
    # uniform uv sampling over the sphere
    uniform_pdf = 1.0 / _uv_solid_angle_jacobian(v)
    h, w = env.imp_pdf.shape
    if (h, w) == (1, 1):
        # static placeholder table (Constant/Sun) — branch value unused
        imp_pdf = uniform_pdf
    else:
        yi = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
        xi = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
        imp_uv_pdf = env.imp_pdf[yi, xi]
        imp_pdf = imp_uv_pdf / _uv_solid_angle_jacobian(v)
    # sun: uniform over the cap
    cap_area = 2.0 * jnp.pi * (1.0 - env.sun_cos_angle)
    sun_in = vecmath.dot(d, env.sun_direction) >= env.sun_cos_angle
    sun_pdf = jnp.where(sun_in, 1.0 / jnp.maximum(cap_area, 1e-9), 0.0)
    hdr_pdf = jnp.where(env.imp_baked, imp_pdf, uniform_pdf)
    return jnp.where(
        env.kind == ENV_SUN,
        sun_pdf,
        jnp.where(env.kind == ENV_HDR, hdr_pdf, uniform_pdf),
    )


def env_sample_uv(env: Environment, u1, u2):
    """Sample a world-space direction from the environment (sample_env_uv
    equivalent, src/world/environment.rs:303-353).
    Returns (direction, solid_angle_pdf)."""
    # uniform-uv branch
    v_uni = u2
    u_uni = u1
    h, w = env.imp_pdf.shape
    if (h, w) == (1, 1):
        # STATIC fast path: Constant/Sun environments carry 1x1 placeholder
        # importance tables and never take the importance branch — compiling
        # the 2-level inverse transform anyway measurably bloats and slows
        # every render (the masked branch still executes per NEE sample)
        uu, vv = u_uni, v_uni
    else:
        # importance-map branch: 2-level inverse transform with intra-texel
        # CDF interpolation (the reference lerps inside the texel,
        # src/world/importance_map.rs:325-357 — avoids direction banding).
        # EVERYTHING here is gather-free: per-lane dynamic indexing
        # (searchsorted row gathers, take_along_axis) lowers to catastrophic
        # scalar code on the TPU VPU. Selection is sum-of-less-than +
        # one-hot contractions instead (fine for the ≤64x32 importance maps
        # used here; O(N·H·W) overall).
        mcdf = env.imp_marginal_cdf  # [H+1]
        yi = jnp.sum((mcdf[None, :] <= u1[:, None]).astype(jnp.int32), axis=-1) - 1
        yi = jnp.clip(yi, 0, h - 1)
        oh_y = (jnp.arange(h, dtype=jnp.int32)[None, :] == yi[:, None]).astype(jnp.float32)
        row = oh_y @ env.imp_row_cdf  # [N, W+1] — MXU one-hot row select
        xi = jax_searchsorted_rows(row, u2) - 1
        xi = jnp.clip(xi, 0, w - 1)
        m0 = jnp.sum(jnp.where(jnp.arange(h + 1)[None, :] == yi[:, None], mcdf[None, :], 0.0), axis=-1)
        m1 = jnp.sum(jnp.where(jnp.arange(h + 1)[None, :] == yi[:, None] + 1, mcdf[None, :], 0.0), axis=-1)
        fy = jnp.clip(safe_cdf_frac(u1 - m0, m1 - m0), 0.0, 1.0)
        cols = jnp.arange(row.shape[-1], dtype=jnp.int32)[None, :]
        r0 = jnp.sum(jnp.where(cols == xi[..., None], row, 0.0), axis=-1)
        r1 = jnp.sum(jnp.where(cols == xi[..., None] + 1, row, 0.0), axis=-1)
        fx = jnp.clip(safe_cdf_frac(u2 - r0, r1 - r0), 0.0, 1.0)
        u_imp = (xi.astype(jnp.float32) + fx) / w
        v_imp = (yi.astype(jnp.float32) + fy) / h
        use_imp = (env.kind == ENV_HDR) & env.imp_baked
        uu = jnp.where(use_imp, u_imp, u_uni)
        vv = jnp.where(use_imp, v_imp, v_uni)
    # sun branch: uniform in the cap
    d_uv = vecmath.uv_to_direction(uu, vv)
    d_world = jnp.einsum("ij,...j->...i", env.rotation_inv, d_uv)
    cos_t = 1.0 - u1 * (1.0 - env.sun_cos_angle)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * jnp.pi * u2
    t_ax, b_ax = vecmath.orthonormal_basis(env.sun_direction)
    d_sun = (
        (sin_t * jnp.cos(phi))[..., None] * t_ax
        + (sin_t * jnp.sin(phi))[..., None] * b_ax
        + cos_t[..., None] * env.sun_direction
    )
    d = jnp.where((env.kind == ENV_SUN)[..., None] | jnp.zeros_like(d_world, bool), d_sun, d_world)
    pdf = env_pdf_for(env, d)
    return d, pdf


def safe_cdf_frac(num, den):
    return num / jnp.where(den > 1e-12, den, 1.0) * (den > 1e-12)


def jax_searchsorted_rows(rows, u):
    """searchsorted along the last axis for batched rows [..., K] vs scalar
    per-batch u [...] -> indices [...] (sum-of-less-than trick; K is small)."""
    return jnp.sum((rows <= u[..., None]).astype(jnp.int32), axis=-1)
