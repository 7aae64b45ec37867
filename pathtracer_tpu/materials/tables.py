"""Material table: SoA parameters + masked wavefront dispatch.

TPU-first replacement for the reference's `MaterialEnum` + `MaterialTable`
trait-object dispatch (src/materials/mod.rs:54-297): material parameters live
in structure-of-arrays device tables indexed by material id; the wavefront
evaluates each material archetype's closed-form math on all lanes and
selects by type id. With 4 archetypes (lambertian / ggx / diffuse light /
sharp light) the masked-all-paths strategy beats `lax.switch` re-gathering
for coherent ray batches.

MaterialId kinds (Material / Light / Camera, src/materials/mod.rs:23-27) are
carried per-primitive as `mat_kind` in the geometry SoA.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from pathtracer_tpu.core import spectral
from pathtracer_tpu.materials import ggx as ggx_mod
from pathtracer_tpu.materials import lambertian as lam_mod
from pathtracer_tpu.materials.diffuse_light import (
    SIDE_FORWARD,
    SIDE_REVERSE,
    SIDE_DUAL,
    emission_diffuse,
    emission_pdf_diffuse,
)
from pathtracer_tpu.materials.sharp_light import emission_sharp, emission_pdf_sharp
from pathtracer_tpu.textures import Textures, eval_texture

MAT_LAMBERTIAN = 0
MAT_GGX = 1
MAT_DIFFUSE_LIGHT = 2
MAT_SHARP_LIGHT = 3
MAT_PASSTHROUGH = 4


class Materials(NamedTuple):
    mtype: jnp.ndarray  # i32[M]
    tex_id: jnp.ndarray  # i32[M] lambertian reflectance texture (-1 unused)
    alpha: jnp.ndarray  # f32[M] ggx roughness
    eta_idx: jnp.ndarray  # i32[M] inner IOR curve
    eta_o_idx: jnp.ndarray  # i32[M] outer IOR curve
    kappa_idx: jnp.ndarray  # i32[M] extinction curve
    permeability: jnp.ndarray  # f32[M]
    metallic: jnp.ndarray  # bool[M] (kappa integral > 0, host precomputed)
    inner_medium: jnp.ndarray  # i32[M]
    outer_medium: jnp.ndarray  # i32[M]
    emit_idx: jnp.ndarray  # i32[M] emission SPD curve (has CDF)
    bounce_idx: jnp.ndarray  # i32[M] light bounce-color curve
    sharpness: jnp.ndarray  # f32[M]
    sidedness: jnp.ndarray  # i32[M]

    @property
    def count(self):
        return self.mtype.shape[0]


def _reflectance(mats: Materials, bank, tex: Textures, mat_id, lam, uv):
    """Diffuse reflectance for lambertian (texture) or light bounce (curve)."""
    mtype = mats.mtype[mat_id]
    tex_val = eval_texture(tex, bank, jnp.maximum(mats.tex_id[mat_id], 0), lam, uv)
    curve_val = spectral.evaluate(bank, jnp.maximum(mats.bounce_idx[mat_id], 0), lam)
    return jnp.where(mtype == MAT_LAMBERTIAN, tex_val, curve_val)


def _ggx_params(mats: Materials, bank, mat_id, lam):
    alpha = jnp.maximum(mats.alpha[mat_id], 1e-4)
    eta_i = spectral.evaluate(bank, jnp.maximum(mats.eta_idx[mat_id], 0), lam)
    eta_o = spectral.evaluate(bank, jnp.maximum(mats.eta_o_idx[mat_id], 0), lam)
    kappa = spectral.evaluate(bank, jnp.maximum(mats.kappa_idx[mat_id], 0), lam)
    eta_i = jnp.maximum(eta_i, 1e-3)
    eta_o = jnp.maximum(eta_o, 1e-3)
    return alpha, eta_i, eta_o, kappa


def bsdf_eval(mats: Materials, bank, tex: Textures, mat_id, lam, uv, wi, wo, mode):
    """(f, pdf_solid_angle) — Material::bsdf equivalent
    (src/materials/mod.rs:54-138), vectorised over the wavefront."""
    mtype = mats.mtype[mat_id]
    refl = _reflectance(mats, bank, tex, mat_id, lam, uv)
    f_lam, pdf_lam = lam_mod.eval_lambertian(refl, wi, wo)
    alpha, eta_i, eta_o, kappa = _ggx_params(mats, bank, mat_id, lam)
    f_ggx, pdf_ggx = ggx_mod.eval_ggx(
        alpha, eta_i, eta_o, kappa, mats.metallic[mat_id],
        mats.permeability[mat_id], wi, wo, mode,
    )
    is_ggx = mtype == MAT_GGX
    f = jnp.where(is_ggx, f_ggx, f_lam)
    pdf = jnp.where(is_ggx, pdf_ggx, pdf_lam)
    # passthrough contributes nothing to scattering here (compiled out in the
    # reference too, src/materials/mod.rs:11,17)
    is_pass = mtype == MAT_PASSTHROUGH
    return jnp.where(is_pass, 0.0, f), jnp.where(is_pass, 0.0, pdf)


def bsdf_sample(mats: Materials, bank, tex: Textures, mat_id, lam, uv, wi, u1, u2, u_lobe, mode):
    """Sample wo and evaluate — generate_and_evaluate equivalent.
    Returns (wo, f, pdf_solid_angle, weight) where weight is the exact
    throughput multiplier f·|cosθ_o|/pdf of the sampled lobe, computed in
    closed form (numerically stable for near-delta lobes)."""
    mtype = mats.mtype[mat_id]
    refl = _reflectance(mats, bank, tex, mat_id, lam, uv)
    wo_lam, f_lam, pdf_lam = lam_mod.sample_lambertian(refl, wi, u1, u2)
    # cosine sampling: f·cos/pdf == reflectance, exactly
    w_lam = jnp.minimum(refl, 1.0)
    alpha, eta_i, eta_o, kappa = _ggx_params(mats, bank, mat_id, lam)
    wo_ggx, f_ggx, pdf_ggx, w_ggx = ggx_mod.sample_ggx(
        alpha, eta_i, eta_o, kappa, mats.metallic[mat_id],
        mats.permeability[mat_id], wi, u1, u2, u_lobe, mode,
    )
    is_ggx = (mtype == MAT_GGX)[..., None]
    wo = jnp.where(is_ggx, wo_ggx, wo_lam)
    f = jnp.where(mtype == MAT_GGX, f_ggx, f_lam)
    pdf = jnp.where(mtype == MAT_GGX, pdf_ggx, pdf_lam)
    weight = jnp.where(mtype == MAT_GGX, w_ggx, w_lam)
    is_pass = mtype == MAT_PASSTHROUGH
    return wo, f, jnp.where(is_pass, 0.0, pdf), jnp.where(is_pass, 0.0, weight)


def emission(mats: Materials, bank, mat_id, lam, uv, cos_theta):
    """Emitted radiance toward a direction with cosine `cos_theta` to the
    surface normal — Material::emission equivalent."""
    mtype = mats.mtype[mat_id]
    spd = spectral.evaluate(bank, jnp.maximum(mats.emit_idx[mat_id], 0), lam)
    side = mats.sidedness[mat_id]
    e_diff = emission_diffuse(spd, side, cos_theta)
    e_sharp = emission_sharp(spd, mats.sharpness[mat_id], side, cos_theta)
    is_light = (mtype == MAT_DIFFUSE_LIGHT) | (mtype == MAT_SHARP_LIGHT)
    e = jnp.where(mtype == MAT_SHARP_LIGHT, e_sharp, e_diff)
    return jnp.where(is_light, e, 0.0)


def emission_direction_pdf(mats: Materials, mat_id, cos_theta):
    """Solid-angle pdf the light's own emission sampler would have assigned
    to this direction (Material::emission_pdf equivalent; used by LT/BDPT)."""
    mtype = mats.mtype[mat_id]
    side = mats.sidedness[mat_id]
    p_diff = emission_pdf_diffuse(side, cos_theta)
    p_sharp = emission_pdf_sharp(mats.sharpness[mat_id], side, cos_theta)
    is_light = (mtype == MAT_DIFFUSE_LIGHT) | (mtype == MAT_SHARP_LIGHT)
    return jnp.where(is_light, jnp.where(mtype == MAT_SHARP_LIGHT, p_sharp, p_diff), 0.0)


def sample_emission_spectrum(mats: Materials, bank, mat_id, u, bounds):
    """Draw λ from the light's emission SPD (CurveWithCDF inverse transform,
    reference: src/materials/diffuse_light.rs:112-114).
    Returns (lam, power, pdf_per_nm)."""
    idx = jnp.maximum(mats.emit_idx[mat_id], 0)
    return spectral.sample_power_and_pdf(bank, idx, u, bounds)
