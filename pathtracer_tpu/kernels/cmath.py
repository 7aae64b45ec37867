"""Componentwise (structure-of-arrays) vector & BSDF math for Pallas kernels.

Inside a Mosaic TPU kernel every array's last dim rides the 128-lane VPU, so
the [..., 3] direction layout used by the XLA wavefront (core/vecmath.py,
materials/*.py) is poison — a trailing 3 wastes 125 of 128 lanes per op.
This module re-expresses the hot math over `V3` = a tuple of three
same-shaped component arrays, so kernels keep every op a full-width tile.

Everything here is PURE jnp (no pallas imports): the functions are unit-
tested head-to-head against the [..., 3] implementations on the CPU, then
called from inside kernel bodies where the component arrays are [S, 128]
tiles.

Ports (same math, same guards, per-function citations):
  core/vecmath.py           -> dot/cross/normalize/reflect/refract/basis
  core/sampling.py          -> cosine/power-cosine/unit-disk samplers
  materials/lambertian.py   -> eval/sample
  materials/ggx.py          -> full GGX (VNDF, dielectric+conductor, eta^2)
  (materials/diffuse_light.py and sharp_light.py are already scalar
   elementwise — kernels import them directly.)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from pathtracer_tpu.prelude import TransportMode, safe_div


class V3(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    def __add__(self, o):
        return V3(self.x + o.x, self.y + o.y, self.z + o.z)

    def __sub__(self, o):
        return V3(self.x - o.x, self.y - o.y, self.z - o.z)

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)

    def scale(self, s):
        return V3(self.x * s, self.y * s, self.z * s)


def dot(a: V3, b: V3):
    return a.x * b.x + a.y * b.y + a.z * b.z


def cross(a: V3, b: V3) -> V3:
    return V3(a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x)


def length_squared(a: V3):
    return dot(a, a)


def normalize(a: V3) -> V3:
    inv = 1.0 / jnp.sqrt(jnp.maximum(dot(a, a), 1e-20))
    return a.scale(inv)


def where(m, a: V3, b: V3) -> V3:
    return V3(jnp.where(m, a.x, b.x), jnp.where(m, a.y, b.y), jnp.where(m, a.z, b.z))


def reflect(w: V3, n: V3) -> V3:
    """core/vecmath.py:46-50."""
    return (-w) + n.scale(2.0 * dot(w, n))


def refract(w: V3, n: V3, eta_rel):
    """core/vecmath.py:53-63. Returns (wt, tir_mask)."""
    cos_i = dot(w, n)
    sin2_i = jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    sin2_t = eta_rel * eta_rel * sin2_i
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    wt = (-w).scale(eta_rel) + n.scale(eta_rel * cos_i - cos_t)
    return wt, tir


def orthonormal_basis(n: V3):
    """Branchless Frisvad/Duff (core/vecmath.py:66-76)."""
    sign = jnp.where(n.z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n.z)
    b = n.x * n.y * a
    t = V3(1.0 + sign * n.x * n.x * a, sign * b, -sign * n.x)
    bt = V3(b, sign + n.y * n.y * a, -n.y)
    return t, bt


def to_local(t: V3, b: V3, n: V3, w: V3) -> V3:
    return V3(dot(w, t), dot(w, b), dot(w, n))


def to_world(t: V3, b: V3, n: V3, wl: V3) -> V3:
    return V3(
        t.x * wl.x + b.x * wl.y + n.x * wl.z,
        t.y * wl.x + b.y * wl.y + n.y * wl.z,
        t.z * wl.x + b.z * wl.y + n.z * wl.z,
    )


def uv_to_direction(u, v) -> V3:
    """core/vecmath.py:121-125 equirect."""
    phi = 2.0 * jnp.pi * u
    theta = jnp.pi * v
    st = jnp.sin(theta)
    return V3(st * jnp.cos(phi), st * jnp.sin(phi), jnp.cos(theta))


def direction_to_uv(d: V3):
    """core/vecmath.py:110-118."""
    u = (jnp.arctan2(d.y, d.x) / (2.0 * jnp.pi)) % 1.0
    v = jnp.arccos(jnp.clip(d.z, -1.0, 1.0)) / jnp.pi
    return u, v


# ------------------------------------------------------------------ sampling


def random_cosine_direction(u, v) -> V3:
    """core/sampling.py:40-47."""
    r = jnp.sqrt(u)
    phi = 2.0 * jnp.pi * v
    return V3(r * jnp.cos(phi), r * jnp.sin(phi),
              jnp.sqrt(jnp.maximum(0.0, 1.0 - u)))


def random_in_unit_disk(u, v):
    """core/sampling.py:57-61 -> (x, y)."""
    r = jnp.sqrt(u)
    phi = 2.0 * jnp.pi * v
    return r * jnp.cos(phi), r * jnp.sin(phi)


# ---------------------------------------------------------------- lambertian


def eval_lambertian(reflectance, wi: V3, wo: V3):
    """materials/lambertian.py eval."""
    same_hemi = wi.z * wo.z > 0.0
    f = jnp.where(same_hemi, jnp.minimum(reflectance, 1.0) / jnp.pi, 0.0)
    pdf = jnp.where(same_hemi, jnp.abs(wo.z) / jnp.pi, 0.0)
    return f, pdf


def sample_lambertian(reflectance, wi: V3, u1, u2):
    """materials/lambertian.py sample."""
    wo = random_cosine_direction(u1, u2)
    wo = V3(wo.x, wo.y, jnp.where(wi.z < 0.0, -wo.z, wo.z))
    f, pdf = eval_lambertian(reflectance, wi, wo)
    return wo, f, pdf


# ----------------------------------------------------------------------- ggx


def ggx_d(alpha, wh: V3):
    """materials/ggx.py ggx_d — stable a2*cos2 + sin2 denominator (the
    nz2*(a2-1)+1 form cancels catastrophically for near-delta lobes)."""
    a2 = alpha * alpha
    nz2 = wh.z * wh.z
    sx2 = wh.x * wh.x + wh.y * wh.y
    denom = nz2 * a2 + sx2
    return a2 / jnp.maximum(jnp.pi * denom * denom, 1e-20)


def smith_lambda(alpha, w_z):
    cos2 = w_z * w_z
    tan2 = jnp.maximum(0.0, 1.0 - cos2) / jnp.maximum(cos2, 1e-12)
    return 0.5 * (jnp.sqrt(1.0 + alpha * alpha * tan2) - 1.0)


def smith_g1(alpha, w_z):
    return 1.0 / (1.0 + smith_lambda(alpha, w_z))


def smith_g2(alpha, wi_z, wo_z):
    return 1.0 / (1.0 + smith_lambda(alpha, wi_z) + smith_lambda(alpha, wo_z))


def sample_vndf(alpha, wi: V3, u1, u2) -> V3:
    """materials/ggx.py:50-86 (Heitz VNDF)."""
    flip = wi.z < 0.0
    wi_u = where(flip, -wi, wi)
    v = normalize(V3(alpha * wi_u.x, alpha * wi_u.y, wi_u.z))
    lensq = v.x * v.x + v.y * v.y
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-20))
    big = lensq > 1e-12
    t1 = V3(
        jnp.where(big, -v.y * inv_len, 1.0),
        jnp.where(big, v.x * inv_len, 0.0),
        jnp.zeros_like(v.z),
    )
    t2 = cross(v, t1)
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + v.z)
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1)) + s * p2
    p3 = jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1 - p2 * p2))
    n_h = t1.scale(p1) + t2.scale(p2) + v.scale(p3)
    wh = normalize(V3(alpha * n_h.x, alpha * n_h.y, jnp.maximum(n_h.z, 1e-6)))
    return where(flip, -wh, wh)


def vndf_pdf(alpha, wi: V3, wh: V3):
    """materials/ggx.py:89-93."""
    g1 = smith_g1(alpha, jnp.abs(wi.z))
    d = ggx_d(alpha, wh)
    return safe_div(g1 * d * jnp.abs(dot(wi, wh)), jnp.abs(wi.z))


def fresnel_dielectric(eta_i, eta_t, cos_i):
    """materials/ggx.py:99-113."""
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
    """materials/ggx.py:116-133."""
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


def _reflect_probability(fres, metallic, permeability):
    p = 1.0 - permeability * (1.0 - fres)
    return jnp.where(metallic, 1.0, jnp.clip(p, 0.0, 1.0))


def eval_ggx_lanes(alpha, metallic, permeability, wi: V3, wo: V3,
                   transport_mode, lanes, has_metal=True):
    """materials/ggx.py:139-217 for several spectral lanes that share
    (wi, wo, alpha): the λ-INDEPENDENT geometry — reflection half-vector,
    GGX D, Smith G, VNDF pdf — is computed ONCE and reused by every lane,
    which is where a hero-wavelength eval spends ~a third of its VPU ops.
    `lanes` is a list of (eta_i, eta_o, kappa); `has_metal` is a STATIC
    scene property — conductor-free scenes compile out fresnel_conductor.
    Returns [(f, pdf)] per lane, bit-identical to per-lane eval_ggx."""
    same_hemi = wi.z * wo.z > 0.0
    cos_i = wi.z
    abs_ci = jnp.maximum(jnp.abs(cos_i), 1e-7)
    abs_co = jnp.maximum(jnp.abs(wo.z), 1e-7)
    outside = cos_i > 0.0

    # λ-independent reflection geometry
    wh_r = normalize(wi + wo)
    wh_r = where(wh_r.z * cos_i < 0.0, -wh_r, wh_r)
    d_r = ggx_d(alpha, wh_r)
    g_r = smith_g2(alpha, wi.z, wo.z)
    cos_ih_r = dot(wi, wh_r)
    refl_fac = d_r * g_r / (4.0 * abs_ci * abs_co)
    g1_i = smith_g1(alpha, jnp.abs(wi.z))
    # vndf_pdf(alpha, wi, wh_r) with d_r/g1 reused
    refl_pdf = (safe_div(g1_i * d_r * jnp.abs(cos_ih_r), jnp.abs(wi.z))
                / jnp.maximum(4.0 * jnp.abs(cos_ih_r), 1e-7))
    eta_sc_on = transport_mode == TransportMode.Radiance

    out = []
    for eta_i, eta_o, kappa in lanes:
        eta_from = jnp.where(outside, eta_o, eta_i)
        eta_to = jnp.where(outside, eta_i, eta_o)
        f_diel = fresnel_dielectric(eta_from, eta_to, cos_ih_r)
        if has_metal:
            f_cond = fresnel_conductor(
                safe_div(eta_to, eta_from, 1.0), safe_div(kappa, eta_from),
                cos_ih_r)
            fres_r = jnp.where(metallic, f_cond, f_diel)
        else:
            fres_r = f_diel
        refl_f = fres_r * refl_fac

        # transmission lobe (Walter 2007 eq. 21) — ht is λ-dependent
        ht = normalize(-(wi.scale(eta_from) + wo.scale(eta_to)))
        ht_u = where(ht.z < 0.0, -ht, ht)
        d_t = ggx_d(alpha, ht_u)
        cos_ih_t = dot(wi, ht)
        cos_oh_t = dot(wo, ht)
        fres_t = fresnel_dielectric(eta_from, eta_to, cos_ih_t)
        denom_t = eta_from * cos_ih_t + eta_to * cos_oh_t
        trans_f = (
            jnp.abs(cos_ih_t * cos_oh_t) * (1.0 - fres_t) * d_t * g_r
            * safe_div(eta_to * eta_to, denom_t * denom_t)
            / (abs_ci * abs_co)
        )
        eta_scale = jnp.where(
            eta_sc_on, safe_div(eta_from * eta_from, eta_to * eta_to, 1.0),
            1.0)
        jac_t = safe_div(eta_to * eta_to * jnp.abs(cos_oh_t),
                         denom_t * denom_t)
        trans_f = trans_f * eta_scale * permeability
        trans_pdf = (safe_div(g1_i * d_t * jnp.abs(dot(wi, ht_u)),
                              jnp.abs(wi.z)) * jac_t)

        refl_prob = _reflect_probability(fres_r, metallic, permeability)
        f_out = jnp.where(same_hemi, refl_f, trans_f)
        pdf_out = jnp.where(
            same_hemi, refl_pdf * refl_prob,
            trans_pdf
            * (1.0 - _reflect_probability(fres_t, metallic, permeability)))
        f_out = jnp.where(jnp.isfinite(f_out) & (f_out >= 0.0), f_out, 0.0)
        pdf_out = jnp.where(jnp.isfinite(pdf_out) & (pdf_out >= 0.0),
                            pdf_out, 0.0)
        out.append((f_out, pdf_out))
    return out


def eval_ggx(alpha, eta_i, eta_o, kappa, metallic, permeability,
             wi: V3, wo: V3, transport_mode, has_metal=True):
    """materials/ggx.py:139-217, componentwise. Returns (f, pdf)."""
    return eval_ggx_lanes(alpha, metallic, permeability, wi, wo,
                          transport_mode, [(eta_i, eta_o, kappa)],
                          has_metal=has_metal)[0]


def sample_ggx(alpha, eta_i, eta_o, kappa, metallic, permeability,
               wi: V3, u1, u2, u_lobe, transport_mode, has_metal=True):
    """materials/ggx.py:227-279. Returns (wo, f, pdf, weight)."""
    wh = sample_vndf(alpha, wi, u1, u2)
    cos_ih = dot(wi, wh)
    outside = wi.z > 0.0
    eta_from = jnp.where(outside, eta_o, eta_i)
    eta_to = jnp.where(outside, eta_i, eta_o)
    f_diel = fresnel_dielectric(eta_from, eta_to, cos_ih)
    if has_metal:
        f_cond = fresnel_conductor(
            safe_div(eta_to, eta_from, 1.0), safe_div(kappa, eta_from), cos_ih)
        fres = jnp.where(metallic, f_cond, f_diel)
    else:
        fres = f_diel
    refl_prob = _reflect_probability(fres, metallic, permeability)

    wo_r = reflect(wi, wh)
    wh_towards = where(cos_ih < 0.0, -wh, wh)
    wo_t, tir = refract(wi, wh_towards, eta_from / jnp.maximum(eta_to, 1e-7))
    choose_reflect = (u_lobe < refl_prob) | tir | metallic
    wo = where(choose_reflect, wo_r, wo_t)
    f, pdf = eval_ggx(alpha, eta_i, eta_o, kappa, metallic, permeability,
                      wi, wo, transport_mode, has_metal=has_metal)
    g2 = smith_g2(alpha, wi.z, wo.z)
    g1 = smith_g1(alpha, jnp.abs(wi.z))
    g_ratio = safe_div(g2, g1)
    eta_scale = jnp.where(
        transport_mode == TransportMode.Radiance,
        safe_div(eta_from * eta_from, eta_to * eta_to, 1.0), 1.0)
    w_reflect = safe_div(fres * g_ratio, refl_prob)
    w_trans = g_ratio * eta_scale
    same_hemi = wi.z * wo.z > 0.0
    weight = jnp.where(
        choose_reflect,
        jnp.where(same_hemi, w_reflect, 0.0),
        jnp.where(same_hemi, 0.0, w_trans))
    weight = jnp.where(jnp.isfinite(weight) & (weight >= 0.0), weight, 0.0)
    return wo, f, pdf, weight
