"""Spectral GGX microfacet BSDF: glossy dielectric (reflect+refract, with
wavelength-dependent IOR -> dispersion) and conductor (spectral n+k).

Capability parity with the reference's workhorse material
(src/materials/ggx.rs): VNDF sampling (Heitz), Smith height-correlated
shadowing, dielectric & conductor Fresnel, Veach 5.2.2.1 radiance/importance
eta^2 factor, reflect/refract branch chosen by Fresnel with TIR fallback.

All functions operate in the local shading frame (+z = normal) on batched
arrays — every lane of the wavefront evaluates in parallel on the VPU.
Directions point AWAY from the surface point. `wi` is the incoming
(towards the previous path vertex), `wo` the outgoing/sampled direction.
"""

from __future__ import annotations

import jax.numpy as jnp

from pathtracer_tpu.core import vecmath
from pathtracer_tpu.prelude import TransportMode, safe_div


# ------------------------------------------------------------ distributions


def ggx_d(alpha, wh):
    """GGX normal distribution D(wh), isotropic.

    The denominator is a2*cos2 + sin2 with sin2 taken from the x/y
    components: for near-delta lobes (alpha ~ 1e-4, wh_z ~ 1) the textbook
    form nz2*(a2-1)+1 cancels catastrophically in f32 — the result swings
    orders of magnitude on the last ulp of wh_z, collapsing claimed pdfs
    below the integrators' sample_ok gates and destabilising MIS weights."""
    a2 = alpha * alpha
    nz2 = wh[..., 2] * wh[..., 2]
    sx2 = wh[..., 0] * wh[..., 0] + wh[..., 1] * wh[..., 1]
    denom = nz2 * a2 + sx2
    return a2 / jnp.maximum(jnp.pi * denom * denom, 1e-20)


def smith_lambda(alpha, w):
    """Smith Λ(w) for GGX."""
    cos2 = w[..., 2] * w[..., 2]
    tan2 = jnp.maximum(0.0, 1.0 - cos2) / jnp.maximum(cos2, 1e-12)
    return 0.5 * (jnp.sqrt(1.0 + alpha * alpha * tan2) - 1.0)


def smith_g1(alpha, w):
    return 1.0 / (1.0 + smith_lambda(alpha, w))


def smith_g2(alpha, wi, wo):
    """Height-correlated Smith masking-shadowing."""
    return 1.0 / (1.0 + smith_lambda(alpha, wi) + smith_lambda(alpha, wo))


def sample_vndf(alpha, wi, u1, u2):
    """Sample the GGX visible-normal distribution (Heitz 2018) for viewer
    direction wi (any hemisphere). Returns half-vector wh in wi's hemisphere.
    reference: src/materials/ggx.rs sample_vndf (:129-169)."""
    # mirror to upper hemisphere
    flip = wi[..., 2] < 0.0
    wi_u = jnp.where(flip[..., None], -wi, wi)
    # stretch
    v = vecmath.normalize(
        jnp.stack([alpha * wi_u[..., 0], alpha * wi_u[..., 1], wi_u[..., 2]], axis=-1)
    )
    # orthonormal basis around v
    lensq = v[..., 0] ** 2 + v[..., 1] ** 2
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-20))
    t1 = jnp.where(
        (lensq > 1e-12)[..., None],
        jnp.stack([-v[..., 1] * inv_len, v[..., 0] * inv_len, jnp.zeros_like(inv_len)], axis=-1),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], v.dtype), v.shape),
    )
    t2 = jnp.cross(v, t1)
    # parabolic cap sample
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + v[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1)) + s * p2
    p3 = jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1 - p2 * p2))
    n_h = p1[..., None] * t1 + p2[..., None] * t2 + p3[..., None] * v
    # unstretch
    wh = vecmath.normalize(
        jnp.stack(
            [alpha * n_h[..., 0], alpha * n_h[..., 1], jnp.maximum(n_h[..., 2], 1e-6)],
            axis=-1,
        )
    )
    return jnp.where(flip[..., None], -wh, wh)


def vndf_pdf(alpha, wi, wh):
    """pdf of sample_vndf in half-vector measure: G1(wi) D(wh) |wi.wh| / |wi.z|."""
    g1 = smith_g1(alpha, jnp.where((wi[..., 2] < 0)[..., None], -wi, wi))
    d = ggx_d(alpha, jnp.where((wh[..., 2] < 0)[..., None], -wh, wh))
    return safe_div(g1 * d * jnp.abs(vecmath.dot(wi, wh)), jnp.abs(wi[..., 2]))


# ----------------------------------------------------------------- fresnel


def fresnel_dielectric(eta_i, eta_t, cos_i):
    """Unpolarised dielectric Fresnel reflectance; cos_i in [-1,1]
    (negative = inside). reference: src/materials/ggx.rs:19-48."""
    cos_i = jnp.clip(cos_i, -1.0, 1.0)
    entering = cos_i > 0.0
    ei = jnp.where(entering, eta_i, eta_t)
    et = jnp.where(entering, eta_t, eta_i)
    ci = jnp.abs(cos_i)
    sin_t2 = (ei / et) ** 2 * jnp.maximum(0.0, 1.0 - ci * ci)
    tir = sin_t2 >= 1.0
    ct = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_t2))
    r_par = safe_div(et * ci - ei * ct, et * ci + ei * ct)
    r_perp = safe_div(ei * ci - et * ct, ei * ci + et * ct)
    f = 0.5 * (r_par * r_par + r_perp * r_perp)
    return jnp.where(tir, 1.0, jnp.clip(f, 0.0, 1.0))


def fresnel_conductor(eta_rel, k_rel, cos_i):
    """Conductor Fresnel (exact unpolarised form) with complex IOR
    (eta + i·k) relative to the outside medium.
    reference: src/materials/ggx.rs:50-85."""
    ci = jnp.abs(jnp.clip(cos_i, -1.0, 1.0))
    ci2 = ci * ci
    si2 = 1.0 - ci2
    e2, k2 = eta_rel * eta_rel, k_rel * k_rel
    t0 = e2 - k2 - si2
    a2b2 = jnp.sqrt(jnp.maximum(0.0, t0 * t0 + 4.0 * e2 * k2))
    t1 = a2b2 + ci2
    a = jnp.sqrt(jnp.maximum(0.0, 0.5 * (a2b2 + t0)))
    t2 = 2.0 * a * ci
    rs = safe_div(t1 - t2, t1 + t2)
    t3 = ci2 * a2b2 + si2 * si2
    t4 = t2 * si2
    rp = rs * safe_div(t3 - t4, t3 + t4)
    return jnp.clip(0.5 * (rs + rp), 0.0, 1.0)


# ------------------------------------------------------------------- eval


def eval_ggx(alpha, eta_i, eta_o, kappa, metallic, permeability, wi, wo, transport_mode):
    """BSDF value f and solid-angle pdf for the GGX material.

    eta_i: inner IOR at λ; eta_o: outer IOR at λ; kappa: extinction at λ
    (metallic lanes use conductor Fresnel and have no transmission).
    permeability in [0,1] scales the transmission lobe (0 = opaque).

    Returns (f, pdf). Both per-lane; reciprocity in the dielectric case is
    handled via the eta^2 transport factor (Veach 5.2.2.1,
    reference src/materials/ggx.rs:344-350,515-519).
    """
    same_hemi = wi[..., 2] * wo[..., 2] > 0.0
    cos_i = wi[..., 2]
    cos_o = wo[..., 2]
    abs_ci = jnp.maximum(jnp.abs(cos_i), 1e-7)
    abs_co = jnp.maximum(jnp.abs(cos_o), 1e-7)

    # relative IORs as seen travelling from wi's side:
    outside = cos_i > 0.0  # wi on the +normal (outer medium) side
    eta_from = jnp.where(outside, eta_o, eta_i)
    eta_to = jnp.where(outside, eta_i, eta_o)

    # ---- reflection lobe
    wh_r = vecmath.normalize(wi + wo)
    # orient wh to wi hemisphere for D/G evaluation
    wh_r = jnp.where((wh_r[..., 2] * cos_i < 0.0)[..., None], -wh_r, wh_r)
    d_r = ggx_d(alpha, jnp.where((wh_r[..., 2] < 0)[..., None], -wh_r, wh_r))
    g_r = smith_g2(alpha, wi, wo)
    cos_ih_r = vecmath.dot(wi, wh_r)
    f_diel = fresnel_dielectric(eta_from, eta_to, cos_ih_r)
    f_cond = fresnel_conductor(
        safe_div(eta_to, eta_from, 1.0), safe_div(kappa, eta_from), cos_ih_r
    )
    fres_r = jnp.where(metallic, f_cond, f_diel)
    refl_f = fres_r * d_r * g_r / (4.0 * abs_ci * abs_co)
    refl_pdf = vndf_pdf(alpha, wi, wh_r) / jnp.maximum(
        4.0 * jnp.abs(cos_ih_r), 1e-7
    )

    # ---- transmission lobe (Walter et al. 2007 eq. 21)
    ht = -(eta_from[..., None] * wi + eta_to[..., None] * wo)
    ht = vecmath.normalize(ht)
    # orient to upper hemisphere for D
    ht_u = jnp.where((ht[..., 2] < 0.0)[..., None], -ht, ht)
    d_t = ggx_d(alpha, ht_u)
    g_t = smith_g2(alpha, wi, wo)
    cos_ih_t = vecmath.dot(wi, ht)
    cos_oh_t = vecmath.dot(wo, ht)
    fres_t = fresnel_dielectric(eta_from, eta_to, cos_ih_t)
    denom_t = eta_from * cos_ih_t + eta_to * cos_oh_t
    jac_t = safe_div(eta_to * eta_to * jnp.abs(cos_oh_t), denom_t * denom_t)
    trans_f = (
        jnp.abs(cos_ih_t * cos_oh_t)
        * (1.0 - fres_t)
        * d_t
        * g_t
        * safe_div(eta_to * eta_to, denom_t * denom_t)
        / (abs_ci * abs_co)
    )
    # radiance transport carries the eta^2 scaling (Veach 5.2.2.1)
    eta_scale = jnp.where(
        transport_mode == TransportMode.Radiance,
        safe_div(eta_from * eta_from, eta_to * eta_to, 1.0),
        1.0,
    )
    trans_f = trans_f * eta_scale * permeability
    trans_pdf = vndf_pdf(alpha, wi, ht_u) * jac_t

    # fresnel-based lobe-selection probability (must match bsdf_sample)
    refl_prob = _reflect_probability(fres_r, metallic, permeability)
    f_out = jnp.where(same_hemi, refl_f, trans_f)
    pdf_out = jnp.where(
        same_hemi,
        refl_pdf * refl_prob,
        trans_pdf * (1.0 - _reflect_probability(fres_t, metallic, permeability)),
    )
    f_out = jnp.where(jnp.isfinite(f_out) & (f_out >= 0.0), f_out, 0.0)
    pdf_out = jnp.where(jnp.isfinite(pdf_out) & (pdf_out >= 0.0), pdf_out, 0.0)
    return f_out, pdf_out


def _reflect_probability(fres, metallic, permeability):
    """Probability of choosing the reflection lobe: Fresnel for dielectrics
    blended with opacity; metals always reflect."""
    p = 1.0 - permeability * (1.0 - fres)
    return jnp.where(metallic, 1.0, jnp.clip(p, 0.0, 1.0))


def sample_ggx(alpha, eta_i, eta_o, kappa, metallic, permeability, wi, u1, u2, u_lobe, transport_mode):
    """Sample wo from wi (generate_and_evaluate equivalent,
    reference src/materials/ggx.rs:401-590).

    Returns (wo, f, pdf). Strategy: sample wh ~ VNDF; compute Fresnel at wh;
    reflect with prob = reflect_probability, else refract (TIR falls back to
    reflection).
    """
    wh = sample_vndf(alpha, wi, u1, u2)
    cos_ih = vecmath.dot(wi, wh)
    outside = wi[..., 2] > 0.0
    eta_from = jnp.where(outside, eta_o, eta_i)
    eta_to = jnp.where(outside, eta_i, eta_o)
    f_diel = fresnel_dielectric(eta_from, eta_to, cos_ih)
    f_cond = fresnel_conductor(
        safe_div(eta_to, eta_from, 1.0), safe_div(kappa, eta_from), cos_ih
    )
    fres = jnp.where(metallic, f_cond, f_diel)
    refl_prob = _reflect_probability(fres, metallic, permeability)

    # reflection about wh
    wo_r = vecmath.reflect(wi, wh)
    # refraction through wh (normal oriented towards wi side)
    wh_towards = jnp.where((cos_ih < 0.0)[..., None], -wh, wh)
    wo_t, tir = vecmath.refract(wi, wh_towards, eta_from / jnp.maximum(eta_to, 1e-7))
    choose_reflect = (u_lobe < refl_prob) | tir | metallic
    wo = jnp.where(choose_reflect[..., None], wo_r, wo_t)
    f, pdf = eval_ggx(
        alpha, eta_i, eta_o, kappa, metallic, permeability, wi, wo, transport_mode
    )
    # Closed-form throughput weight f·|cosθ|/pdf for the sampled lobe —
    # the standard VNDF estimator F·G2/G1 (reflection) and
    # (1−F)·G2/G1·η_scale/(1−p_r) (transmission). Recomputing f/pdf for
    # near-delta lobes cancels ~1e8-scale quantities and is numerically
    # unstable; this form is exact and O(1).
    g2 = smith_g2(alpha, wi, wo)
    g1 = smith_g1(alpha, jnp.where((wi[..., 2] < 0)[..., None], -wi, wi))
    g_ratio = safe_div(g2, g1)
    eta_scale = jnp.where(
        transport_mode == TransportMode.Radiance,
        safe_div(eta_from * eta_from, eta_to * eta_to, 1.0),
        1.0,
    )
    w_reflect = safe_div(fres * g_ratio, refl_prob)
    w_trans = g_ratio * eta_scale
    same_hemi = wi[..., 2] * wo[..., 2] > 0.0
    weight = jnp.where(
        choose_reflect,
        jnp.where(same_hemi, w_reflect, 0.0),
        jnp.where(same_hemi, 0.0, w_trans),
    )
    weight = jnp.where(jnp.isfinite(weight) & (weight >= 0.0), weight, 0.0)
    return wo, f, pdf, weight
