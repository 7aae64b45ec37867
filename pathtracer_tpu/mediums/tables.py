"""Medium table: SoA parameters + wavefront dispatch.

Capability parity with MediumEnum/MediumTable (src/mediums/mod.rs:14-115).
Medium id 0 is vacuum (no medium); ids are carried on materials as
inner/outer_medium_id and tracked per-ray during the medium-aware walk.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from pathtracer_tpu.core import spectral
from pathtracer_tpu.mediums import hg as hg_mod
from pathtracer_tpu.mediums import rayleigh as ray_mod

MED_VACUUM = 0
MED_HG = 1
MED_RAYLEIGH = 2


class Mediums(NamedTuple):
    mtype: jnp.ndarray  # i32[K] (index 0 = vacuum)
    g_idx: jnp.ndarray  # i32[K] HG asymmetry curve (stored with the -1 offset applied)
    sigma_s_idx: jnp.ndarray  # i32[K]
    sigma_a_idx: jnp.ndarray  # i32[K]
    ior_idx: jnp.ndarray  # i32[K] Rayleigh IOR curve
    corrective: jnp.ndarray  # f32[K] Rayleigh corrective factor

    @property
    def count(self):
        return self.mtype.shape[0]

    @staticmethod
    def vacuum_only() -> "Mediums":
        z = jnp.zeros((1,), jnp.int32)
        return Mediums(z, z, z, z, z, jnp.zeros((1,), jnp.float32))


def medium_coefficients(meds: Mediums, bank: spectral.CurveBank, med_id, lam):
    """(sigma_s, sigma_a, g) at wavelength lam for medium id (0 = vacuum)."""
    mtype = meds.mtype[med_id]
    g = spectral.evaluate(bank, meds.g_idx[med_id], lam)
    ss_hg = spectral.evaluate(bank, meds.sigma_s_idx[med_id], lam)
    sa_hg = spectral.evaluate(bank, meds.sigma_a_idx[med_id], lam)
    ior = spectral.evaluate(bank, meds.ior_idx[med_id], lam)
    ss_ray = ray_mod.rayleigh_sigma_s(ior, lam, meds.corrective[med_id])
    is_hg = mtype == MED_HG
    is_ray = mtype == MED_RAYLEIGH
    sigma_s = jnp.where(is_hg, ss_hg, jnp.where(is_ray, ss_ray, 0.0))
    sigma_a = jnp.where(is_hg, sa_hg, 0.0)
    return sigma_s, sigma_a, jnp.where(is_hg, g, 0.0)


def phase_eval(meds: Mediums, bank, med_id, lam, cos_theta):
    mtype = meds.mtype[med_id]
    g = spectral.evaluate(bank, meds.g_idx[med_id], lam)
    p_hg = hg_mod.hg_phase(g, cos_theta)
    p_ray = ray_mod.rayleigh_phase(cos_theta)
    return jnp.where(mtype == MED_RAYLEIGH, p_ray, p_hg)


def phase_sample(meds: Mediums, bank, med_id, lam, wi, u1, u2):
    """Sample scattered direction; returns (wo, pdf == phase value)."""
    mtype = meds.mtype[med_id]
    g = spectral.evaluate(bank, meds.g_idx[med_id], lam)
    wo_hg, p_hg = hg_mod.hg_sample_direction(g, wi, u1, u2)
    wo_ray, p_ray = ray_mod.rayleigh_sample_direction(wi, u1, u2)
    is_ray = (mtype == MED_RAYLEIGH)[..., None]
    wo = jnp.where(is_ray, wo_ray, wo_hg)
    pdf = jnp.where(mtype == MED_RAYLEIGH, p_ray, p_hg)
    return wo, pdf


def transmittance(meds: Mediums, bank, med_id, lam, dist):
    """Beer-Lambert transmittance over `dist` in medium `med_id`."""
    sigma_s, sigma_a, _ = medium_coefficients(meds, bank, med_id, lam)
    return jnp.exp(-(sigma_s + sigma_a) * jnp.minimum(dist, 1e8))
