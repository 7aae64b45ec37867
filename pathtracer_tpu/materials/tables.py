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


class MatRec(NamedTuple):
    """A wavefront's material parameters, fetched ONCE per dispatch call.

    Per-lane gathers cost ~4ms each at 1M-lane wavefronts on TPU; fetching
    14 SoA columns separately per bsdf call dominated the render. The packed
    fetch contracts a one-hot [N, M] against one [M, 16] matrix on the MXU
    (or one row gather for large tables) — a single fused op."""

    mtype: jnp.ndarray
    tex_id: jnp.ndarray
    alpha: jnp.ndarray
    eta_idx: jnp.ndarray
    eta_o_idx: jnp.ndarray
    kappa_idx: jnp.ndarray
    permeability: jnp.ndarray
    metallic: jnp.ndarray
    inner_medium: jnp.ndarray
    outer_medium: jnp.ndarray
    emit_idx: jnp.ndarray
    bounce_idx: jnp.ndarray
    sharpness: jnp.ndarray
    sidedness: jnp.ndarray


def _mat_packed(mats: Materials):
    """[M, 14] f32 packed parameter matrix (ints ride as exact f32)."""
    cols = [
        mats.mtype, mats.tex_id, mats.alpha, mats.eta_idx, mats.eta_o_idx,
        mats.kappa_idx, mats.permeability, mats.metallic, mats.inner_medium,
        mats.outer_medium, mats.emit_idx, mats.bounce_idx, mats.sharpness,
        mats.sidedness,
    ]
    return jnp.stack([c.astype(jnp.float32) for c in cols], axis=1)


def fetch_material(mats: Materials, mat_id) -> MatRec:
    packed = _mat_packed(mats)  # loop-invariant; XLA hoists it
    m = packed.shape[0]
    if m <= 1024:
        oh = (
            jnp.arange(m, dtype=jnp.int32)[None, :] == mat_id[..., None]
        ).astype(jnp.float32)
        rows = oh @ packed  # [N, 14] via MXU
    else:
        rows = packed[mat_id]
    i32 = lambda k: rows[..., k].astype(jnp.int32)
    return MatRec(
        mtype=i32(0), tex_id=i32(1), alpha=rows[..., 2], eta_idx=i32(3),
        eta_o_idx=i32(4), kappa_idx=i32(5), permeability=rows[..., 6],
        metallic=rows[..., 7] > 0.5, inner_medium=i32(8), outer_medium=i32(9),
        emit_idx=i32(10), bounce_idx=i32(11), sharpness=rows[..., 12],
        sidedness=i32(13),
    )


def _mat_spectral_block(mats: Materials, bank):
    """[M*RES, 8] per-material spectral LUT: interleaved (v[k], v[k+1])
    pairs for (eta_i, eta_o, kappa, bounce) at every knot. ONE gather at
    (mat_id, λ-knot) then yields every per-material curve a bsdf dispatch
    needs — separate curve gathers cost ~4ms each at 1M-lane wavefronts and
    dominated shading. Loop-invariant: XLA hoists the build out of render
    loops (cost ~M×RES×8 gathers once per compiled program)."""
    res = bank.values.shape[1]
    knots = jnp.arange(res, dtype=jnp.int32)[None, :]  # [1, RES]

    def curve_pairs(idx):
        flat = jnp.maximum(idx, 0)[:, None] * res + knots  # [M, RES]
        return bank.pairs[flat]  # [M, RES, 2]

    block = jnp.concatenate(
        [
            curve_pairs(mats.eta_idx),
            curve_pairs(mats.eta_o_idx),
            curve_pairs(mats.kappa_idx),
            curve_pairs(mats.bounce_idx),
        ],
        axis=-1,
    )  # [M, RES, 8]
    return block.reshape(-1, 8), res


def _fetch_spectral(mats: Materials, bank, mat_id, lam):
    """(eta_i, eta_o, kappa, bounce) at λ — one gather + shared lerp."""
    block, res = _mat_spectral_block(mats, bank)
    u = (lam - bank.lam_lo) / (bank.lam_hi - bank.lam_lo) * (res - 1)
    u = jnp.clip(u, 0.0, res - 1 - 1e-4)
    i0 = u.astype(jnp.int32)
    frac = (u - i0)[..., None]
    rows = block[mat_id * res + i0]  # [N, 8] — the single gather
    v = rows[..., 0::2] * (1.0 - frac) + rows[..., 1::2] * frac  # [N, 4]
    return v[..., 0], v[..., 1], v[..., 2], v[..., 3]


def _reflectance_from(curve_val, rec: MatRec, bank, tex: Textures, lam, uv):
    """Diffuse reflectance for lambertian (texture) or light bounce (curve,
    pre-fetched from the material spectral block)."""
    tex_val = eval_texture(tex, bank, jnp.maximum(rec.tex_id, 0), lam, uv)
    return jnp.where(rec.mtype == MAT_LAMBERTIAN, tex_val, curve_val)


def _ggx_from(rec: MatRec, eta_i, eta_o, kappa):
    alpha = jnp.maximum(rec.alpha, 1e-4)
    eta_i = jnp.maximum(eta_i, 1e-3)
    eta_o = jnp.maximum(eta_o, 1e-3)
    return alpha, eta_i, eta_o, kappa


def bsdf_eval(mats: Materials, bank, tex: Textures, mat_id, lam, uv, wi, wo, mode):
    """(f, pdf_solid_angle) — Material::bsdf equivalent
    (src/materials/mod.rs:54-138), vectorised over the wavefront."""
    rec = fetch_material(mats, mat_id)
    mtype = rec.mtype
    s_eta_i, s_eta_o, s_kappa, s_bounce = _fetch_spectral(mats, bank, mat_id, lam)
    refl = _reflectance_from(s_bounce, rec, bank, tex, lam, uv)
    f_lam, pdf_lam = lam_mod.eval_lambertian(refl, wi, wo)
    alpha, eta_i, eta_o, kappa = _ggx_from(rec, s_eta_i, s_eta_o, s_kappa)
    f_ggx, pdf_ggx = ggx_mod.eval_ggx(
        alpha, eta_i, eta_o, kappa, rec.metallic,
        rec.permeability, wi, wo, mode,
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
    rec = fetch_material(mats, mat_id)
    mtype = rec.mtype
    s_eta_i, s_eta_o, s_kappa, s_bounce = _fetch_spectral(mats, bank, mat_id, lam)
    refl = _reflectance_from(s_bounce, rec, bank, tex, lam, uv)
    wo_lam, f_lam, pdf_lam = lam_mod.sample_lambertian(refl, wi, u1, u2)
    # cosine sampling: f·cos/pdf == reflectance, exactly
    w_lam = jnp.minimum(refl, 1.0)
    alpha, eta_i, eta_o, kappa = _ggx_from(rec, s_eta_i, s_eta_o, s_kappa)
    wo_ggx, f_ggx, pdf_ggx, w_ggx = ggx_mod.sample_ggx(
        alpha, eta_i, eta_o, kappa, rec.metallic,
        rec.permeability, wi, u1, u2, u_lobe, mode,
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
    rec = fetch_material(mats, mat_id)
    mtype = rec.mtype
    spd = spectral.evaluate(bank, jnp.maximum(rec.emit_idx, 0), lam)
    side = rec.sidedness
    e_diff = emission_diffuse(spd, side, cos_theta)
    e_sharp = emission_sharp(spd, rec.sharpness, side, cos_theta)
    is_light = (mtype == MAT_DIFFUSE_LIGHT) | (mtype == MAT_SHARP_LIGHT)
    e = jnp.where(mtype == MAT_SHARP_LIGHT, e_sharp, e_diff)
    return jnp.where(is_light, e, 0.0)


def emission_direction_pdf(mats: Materials, mat_id, cos_theta):
    """Solid-angle pdf the light's own emission sampler would have assigned
    to this direction (Material::emission_pdf equivalent; used by LT/BDPT)."""
    rec = fetch_material(mats, mat_id)
    mtype = rec.mtype
    side = rec.sidedness
    p_diff = emission_pdf_diffuse(side, cos_theta)
    p_sharp = emission_pdf_sharp(rec.sharpness, side, cos_theta)
    is_light = (mtype == MAT_DIFFUSE_LIGHT) | (mtype == MAT_SHARP_LIGHT)
    return jnp.where(is_light, jnp.where(mtype == MAT_SHARP_LIGHT, p_sharp, p_diff), 0.0)


def sample_emission_spectrum(mats: Materials, bank, mat_id, u, bounds):
    """Draw λ from the light's emission SPD (CurveWithCDF inverse transform,
    reference: src/materials/diffuse_light.rs:112-114).
    Returns (lam, power, pdf_per_nm)."""
    idx = jnp.maximum(mats.emit_idx[mat_id], 0)
    return spectral.sample_power_and_pdf(bank, idx, u, bounds)
