"""Pallas light-tracing megakernel: the whole LT bounce round on-chip.

The XLA LT wavefront (integrator/lt.py — the wavefront re-design of the
reference's LightTracingIntegrator, src/integrator/lt.rs) runs each bounce
as one giant XLA program; measured steady state is ~118 ns/lane-round vs
the PT megakernel's 8.4 ns (PARITY.md round-4 forensics). This module
applies the PT megakernel's proven architecture (kernels/megakernel.py) to
light tracing:

  K12-LT  closest-hit sweep INLINE + LT shade: direct lens-hit splat
          (thin-lens get_pixel_for_ray componentwise), camera connections
          (lens sample, W_e, bsdf eval toward the lens, MIS vs the direct
          hit), BSDF sample for continuation — one pallas call.
  K34-LT  connection shadow sweeps INLINE + the light-vertex-connection
          sweep + finalize (RR, death, respawn-from-feed, budget) — one
          pallas call — then the film scatter-adds run in XLA inside the
          SAME dispatched program.

Particle RESPAWN rides an XLA feed exactly like the PT medium/env feeds:
emission sampling (source pick, light-surface + spectral-CDF + direction
sampling, env branch) depends only on the round's uniforms, so the tested
integrator.lt.spawn_particles runs OUTSIDE the pallas calls in the same
program and K4 just copies candidate rows into respawning lanes. The s=1
light-vertex connection (lt.py light_vertex_connect) is likewise computed
in the feed (it needs only spawn values); its shadow ray is swept in-kernel
and the splat is gated by the respawn indicator. LT lanes have no
occupancy drain tail at all: any dead lane immediately becomes a new
particle while its budget lasts.

Scope (lt_mega_available): projective thin-lens camera, identity
transforms, ≤8192 prims, ≤24 materials, 1×1 surface textures; ANY
environment kind (spawns are fed). Estimator-identical to the XLA LT
wavefront (same spawn machinery by construction, same per-vertex math);
validated by interpret-mode equal-path comparisons vs lt_trace and the
LT-vs-PT consistency suite.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtracer_tpu.kernels import cmath
from pathtracer_tpu.kernels.cmath import V3
from pathtracer_tpu.kernels.megakernel import (
    MEGA_MAX_PRIMS,
    _bsdf_eval_lane,
    _full_block_spec,
    _hit_attributes,
    _mat_param,
    _mega_jit,
    _prim_attr_fetch,
    _sel_rows,
    _spectral_fetch,
    _sweep_tiles,
    _tile,
    _flatrow,
    _row_spec,
    _freeze,
    build_mega_scene,
    _M_ALPHA,
    _M_METAL,
    _M_PERM,
    _M_TYPE,
    MAT_GGX,
)
from pathtracer_tpu.prelude import (
    INTERSECTION_TIME_OFFSET,
    NORMAL_OFFSET,
    RAY_TMAX,
    TransportMode,
)
from pathtracer_tpu.utils import profile as prof

import pathtracer_tpu.kernels.megakernel as _mk

# ---- LT state rows [NS_LT, n_pad]
LS_O = 0          # 3
LS_D = 3          # 3
LS_LAM = 6        # single wavelength per particle (lt.rs convention)
LS_BETA = 7
LS_PREV = 8       # solid-angle pdf of the sampling that produced d
LS_ALIVE = 9
LS_BOUNCE = 10
LS_BUDGET = 11    # particles this lane may still spawn
LS_ENV = 12       # particle came from the environment branch
NS_LT = 16

# ---- K2-LT output rows
Q_HIT_PID = 0     # direct lens-hit splat: film pixel id (f32)
Q_HIT_XYZ = 1     # 3
Q_ALIVE = 4       # still walking after the camera-hit absorption
Q_FPDF = 5
Q_RATIO = 6
Q_SOK = 7
Q_ONEW = 8        # 3
Q_DNEW = 11       # 3
Q_CONN = 14       # per camera sample: so(3) dir(3) tmax pid xyz(3) valid = 12


def _q2_rows(camera_samples):
    return -(-(Q_CONN + 12 * camera_samples) // 8) * 8


# ---- respawn feed rows (integrator.lt.spawn_particles outputs + the
# light-vertex connection task)
F_O = 0           # 3
F_D = 3           # 3
F_LAM = 6
F_BETA = 7
F_PREV = 8
F_ALIVE = 9
F_ENV = 10
F_LV = 11         # light-vertex connection: so(3) dir(3) tmax pid xyz(3)
F_LV_VALID = F_LV + 11
NF = -(-(F_LV_VALID + 1) // 8) * 8

# ---- K4-LT output rows: new state + per-connection resolved splats
K4_CONN = NS_LT   # per camera sample: pid(1) xyz(3) = 4
def _k4_rows(camera_samples):
    base = K4_CONN + 4 * camera_samples
    # + lv_ok, resp_ind, bounce_ind, conn_ok_ct
    return -(-(base + 4) // 8) * 8


def _k4_aux(camera_samples):
    base = K4_CONN + 4 * camera_samples
    return dict(lv_ok=base, resp=base + 1, bounce=base + 2, conn_ct=base + 3)


# ---- v2 (in-kernel spawn) K4 output rows: state + conn splats + resolved
# light-vertex splat (pid + xyz) + indicators
def _k4_rows_v2(camera_samples):
    base = K4_CONN + 4 * camera_samples
    return -(-(base + 4 + 4) // 8) * 8


def _k4_aux_v2(camera_samples):
    base = K4_CONN + 4 * camera_samples
    return dict(lv_pid=base, lv_xyz=base + 1, resp=base + 4, bounce=base + 5,
                conn_ct=base + 6, lv_ct=base + 7)


# ---- v2 spawn uniform rows (spawn_particles' 9 u0 columns + 2 lens)
NUSP = 16


def _nu_lt(camera_samples):
    # K2: 2 per connection (lens sample) + 3 (bsdf) ; K4: 1 (RR) appended
    return -(-(2 * camera_samples + 3 + 1) // 8) * 8


def lt_mega_available(world, camera, settings) -> bool:
    """Static preconditions (subset of the PT megakernel's gate; any
    environment kind works — spawning rides the XLA feed)."""
    from pathtracer_tpu.camera.projective import ProjectiveCamera
    from pathtracer_tpu.kernels.megakernel import SPEC_RES

    if not isinstance(camera, ProjectiveCamera):
        return False
    w = world
    if w.accel2 is not None:
        return False
    if int(w.prims.xf_inv.shape[0]) != 1:
        return False
    if w.prims.count > MEGA_MAX_PRIMS:
        return False
    if int(w.mats.count) > 24:
        return False
    # all surface textures must be single-layer 1x1 (no tex feed in LT yet);
    # an HDR ENV texture is exempt (env eval lives in the spawn feed)
    t = w.tex
    lc = np.asarray(t.layer_count)
    lstart = np.asarray(t.layer_start)
    lw = np.asarray(t.layer_w)
    lh = np.asarray(t.layer_h)
    tex_ok = np.ones(lc.shape[0], bool)
    layer_ok = np.ones(lw.shape[0], bool)
    from pathtracer_tpu.world.environment import ENV_HDR

    if int(w.env.kind) == ENV_HDR:
        tid = int(w.env.tex_id)
        tex_ok[tid] = False
        layer_ok[int(lstart[tid]):int(lstart[tid]) + int(lc[tid])] = False
    if not (lc[tex_ok] == 1).all():
        return False
    if not ((lw[layer_ok] == 1).all() and (lh[layer_ok] == 1).all()):
        return False
    if int(w.bank.values.shape[1]) != SPEC_RES:
        return False
    return True


# ---------------------------------------------------------- shared helpers


def _film_pid_for(c, width, height, o_pt, dneg):
    """Thin-lens get_pixel_for_ray (camera/projective.py:57-72),
    componentwise: ray from lens point o_pt travelling dneg into the scene
    -> (film pixel id f32, ok). Shared by K12 (direct hits, connections)
    and the v2 finalize kernel (light-vertex splats)."""
    cw, cu, cv, co = c["cam_w"], c["cam_u"], c["cam_v"], c["cam_origin"]
    focal = c["cam_focal"]
    cos_f = dneg.x * cw[0] + dneg.y * cw[1] + dneg.z * cw[2]
    valid = cos_f > 1e-6
    tt = focal / jnp.where(valid, cos_f, 1.0)
    px = o_pt.x + tt * dneg.x - co[0] - focal * cw[0]
    py = o_pt.y + tt * dneg.y - co[1] - focal * cw[1]
    pz = o_pt.z + tt * dneg.z - co[2] - focal * cw[2]
    fu = (px * cu[0] + py * cu[1] + pz * cu[2]) / max(c["cam_half_w"], 1e-9)
    fv = (px * cv[0] + py * cv[1] + pz * cv[2]) / max(c["cam_half_h"], 1e-9)
    film_u = (fu + 1.0) * 0.5
    film_v = (1.0 - fv) * 0.5
    inside = ((film_u >= 0.0) & (film_u < 1.0)
              & (film_v >= 0.0) & (film_v < 1.0))
    pxi = jnp.minimum(jnp.floor(film_u * width), width - 1.0)
    pyi = jnp.minimum(jnp.floor(film_v * height), height - 1.0)
    return pyi * width + pxi, valid & inside


def _lens_point_for(c, u1, u2):
    """Sample the thin-lens aperture disk componentwise (camera
    sample_lens_point)."""
    cu, cv, co = c["cam_u"], c["cam_v"], c["cam_origin"]
    r_d = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    lx = r_d * jnp.cos(phi) * c["cam_lens_r"]
    ly = r_d * jnp.sin(phi) * c["cam_lens_r"]
    return V3(co[0] + lx * cu[0] + ly * cv[0],
              co[1] + lx * cu[1] + ly * cv[1],
              co[2] + lx * cu[2] + ly * cv[2])


def _xyz_rows(lam_t, e):
    from pathtracer_tpu.core import cie

    return [e * cie.x_bar(lam_t), e * cie.y_bar(lam_t), e * cie.z_bar(lam_t)]


# ------------------------------------------------------------------ feeds


def _lt_spawn_feed(world, settings, key, it_dev, n_pad, camera, width,
                   height):
    """Respawn candidates + the s=1 light-vertex-connection task, computed
    by the TESTED XLA machinery (integrator.lt.spawn_particles /
    _connect_to_camera_values) inside the same dispatched program."""
    import jax.random as jrandom

    from pathtracer_tpu.core import cie
    from pathtracer_tpu.integrator.lt import (
        _connect_to_camera_values,
        spawn_particles,
        stratify_u0,
    )

    kf = jrandom.fold_in(jrandom.fold_in(key, it_dev), 2)
    u0 = jrandom.uniform(kf, (n_pad, 9))
    if settings.stratified:
        u0 = stratify_u0(settings, u0, kf)
    sp = spawn_particles(world, settings, u0)
    # ---- light-vertex connection (lt.py light_vertex_connect): energy and
    # film uv toward a sampled lens point; the shadow ray sweeps in-kernel
    uc = jrandom.uniform(jrandom.fold_in(kf, 1), (n_pad, 2))
    lv = _connect_to_camera_values(world, camera, sp, uc)
    xyz = cie.wavelength_to_xyz(sp["lam_i"], lv["energy"])
    valid = lv["valid"] & ~sp["pick_env"] & (world.n_lights > 0)
    xyz = jnp.where(valid[:, None], xyz, 0.0)
    px = jnp.clip((lv["film_u"] * width).astype(jnp.int32), 0, width - 1)
    py = jnp.clip((lv["film_v"] * height).astype(jnp.int32), 0, height - 1)
    pid = (py * width + px).astype(jnp.float32)
    rows = [sp["o"][:, 0], sp["o"][:, 1], sp["o"][:, 2],
            sp["d"][:, 0], sp["d"][:, 1], sp["d"][:, 2],
            sp["lam"], sp["beta"], sp["prev_pdf0"],
            sp["alive"].astype(jnp.float32),
            sp["pick_env"].astype(jnp.float32),
            lv["so"][:, 0], lv["so"][:, 1], lv["so"][:, 2],
            lv["dir"][:, 0], lv["dir"][:, 1], lv["dir"][:, 2],
            lv["tmax"], pid,
            xyz[:, 0], xyz[:, 1], xyz[:, 2],
            valid.astype(jnp.float32)]
    f = jnp.stack(rows).astype(jnp.float32)
    pad = NF - f.shape[0]
    if pad:
        f = jnp.concatenate([f, jnp.zeros((pad, n_pad), jnp.float32)])
    return f


# -------------------------------------------------- v2: in-kernel spawning

# spawn-table rows: 0..SPEC_RES-1 = per-light emission-CDF knots (knots on
# sublanes, lights on lanes), then per-light scalars
_SP_CDFLO = 512   # cdf at wavelength_bounds.lower
_SP_CDFHI = 513   # cdf at wavelength_bounds.upper
_SP_INTEG = 514   # full-band SPD integral
_NSP_ROWS = 520   # pad to 8-mult sublanes


def bake_lt_spawn_tab(world, wb):
    """[520, 128] f32 host bake for the in-kernel emission-λ CDF inversion
    (core/spectral.sample_power_and_pdf): column l = light l's emission
    curve CDF knots + restriction scalars. n_lights ≤ 128 enforced by the
    caller's gate."""
    from pathtracer_tpu.kernels.megakernel import SPEC_RES

    bank = world.bank
    cdf = np.asarray(bank.cdf)
    integral = np.asarray(bank.integral)
    lam_lo = float(np.asarray(bank.lam_lo))
    lam_hi = float(np.asarray(bank.lam_hi))
    res = cdf.shape[1]
    assert res == SPEC_RES
    lights = np.asarray(world.lights)
    mat_id = np.asarray(world.prims.material_id)
    emit_idx = np.asarray(world.mats.emit_idx)
    tab = np.zeros((_NSP_ROWS, 128), np.float32)

    def cdf_at_np(row, lam):
        u = (lam - lam_lo) / (lam_hi - lam_lo) * (res - 1)
        u = min(max(u, 0.0), res - 1 - 1e-4)
        i0 = int(u)
        frac = u - i0
        return row[i0] * (1.0 - frac) + row[min(i0 + 1, res - 1)] * frac

    for l, prim in enumerate(lights[:128]):
        e = max(int(emit_idx[int(mat_id[int(prim)])]), 0)
        row = cdf[e]
        tab[:res, l] = row
        tab[_SP_CDFLO, l] = cdf_at_np(row, float(wb.lower))
        tab[_SP_CDFHI, l] = cdf_at_np(row, float(wb.upper))
        tab[_SP_INTEG, l] = float(integral[e])
    return tab


def _emission_dir_pdf_lane(mtype, side, sharp, cos_t, has_sharp):
    """materials.tables.emission_direction_pdf componentwise."""
    fwd = (cos_t > 0.0).astype(jnp.float32)
    rev = (cos_t < 0.0).astype(jnp.float32)
    dual = (cos_t != 0.0).astype(jnp.float32)
    gate = jnp.where(side == 2, dual, jnp.where(side == 0, fwd, rev))
    p_diff = jnp.abs(cos_t) / jnp.pi * gate
    if has_sharp:
        n = sharp
        p_sharp = (n + 1.0) * jnp.abs(cos_t) ** n / (2.0 * jnp.pi) * gate
        p = jnp.where(mtype == 3.0, p_sharp, p_diff)
    else:
        p = p_diff
    p = jnp.where(side == 2, p * 0.5, p)
    is_light = (mtype == 2.0) | (mtype == 3.0)
    return jnp.where(is_light, p, 0.0)


def _spawn_inkernel(consts, settings, usp, light_ref, spec_ref, lcdf_ref):
    """integrator.lt.spawn_particles + _connect_to_camera_values computed
    entirely in-kernel (instance lights + constant environments): light
    pick, surface sample, emission-λ CDF inversion on the λ-knot compare
    machinery, cosine/cosine-power direction, particle weight, and the s=1
    light-vertex lens connection. Returns the same per-lane values the XLA
    spawn feed carried (VERDICT r4 #4: the feed was ~180 of 226 ms/round at
    1M lanes)."""
    from pathtracer_tpu.kernels.megakernel import (
        KNOT_CHUNK,
        SPEC_RES,
        _emission_value,
        _sample_surface_light,
        _spectral_fetch,
    )

    c = consts
    n_lights = c["n_lights"]
    n_mats = c["n_mats"]
    p_env = c["p_env"]
    wb_lo = settings["wb_lo"]
    wb_span = settings["wb_span"]
    lam_lo, lam_hi = c["lam_lo"], c["lam_hi"]
    width = settings["width"]
    height = settings["height"]
    prec = (jax.lax.Precision.HIGHEST if c.get("spec_f32", False)
            else jax.lax.Precision.DEFAULT)
    u0 = usp

    # ---- instance-light pick + surface sample (lt.py:207-209)
    nl = max(n_lights, 1)
    li = jnp.minimum(jnp.floor(u0[0] * nl), float(nl - 1))

    def lrow(row):
        acc = jnp.zeros(li.shape, jnp.float32)
        for l in range(nl):
            acc = acc + jnp.where(li == l, light_ref[row, l], 0.0)
        return acc

    lpa = V3(lrow(_mk._L_PA), lrow(_mk._L_PA + 1), lrow(_mk._L_PA + 2))
    lpb = V3(lrow(_mk._L_PB), lrow(_mk._L_PB + 1), lrow(_mk._L_PB + 2))
    lpc = V3(lrow(_mk._L_PC), lrow(_mk._L_PC + 1), lrow(_mk._L_PC + 2))
    lp_type = lrow(_mk._L_PTYPE)
    l_area = lrow(_mk._L_AREA)
    l_mat = lrow(_mk._L_MAT)
    l_mtype = lrow(_mk._L_MTYPE)
    l_side = lrow(_mk._L_SIDE)
    l_sharp = lrow(_mk._L_SHARP)
    lp, ln = _sample_surface_light(lp_type, lpa, lpb, lpc, u0[1], u0[2])
    area_pdf = 1.0 / jnp.maximum(l_area, 1e-20)
    pick_pdf = 1.0 / float(nl)

    def lsc(row):
        acc = jnp.zeros(li.shape, jnp.float32)
        for l in range(nl):
            acc = acc + jnp.where(li == l, lcdf_ref[row, l], 0.0)
        return acc

    # ---- emission-λ CDF inversion (spectral.sample_power_and_pdf): i1 =
    # count of knots below the target, via chunked [K, TILE] compares —
    # identical λ to the XLA binary search by CDF monotonicity
    cdf_lo = lsc(_SP_CDFLO)
    cdf_hi = lsc(_SP_CDFHI)
    span = jnp.maximum(cdf_hi - cdf_lo, 1e-9)
    target = cdf_lo + u0[3] * span
    li_row = _flatrow(li)[None, :]
    tgt_row = _flatrow(target)[None, :]
    tile_n = tgt_row.shape[1]
    i1_row = jnp.zeros((1, tile_n), jnp.float32)
    for k0 in range(0, SPEC_RES, KNOT_CHUNK):
        ck = None
        for l in range(nl):
            part = (lcdf_ref[k0:k0 + KNOT_CHUNK, l:l + 1]
                    * (li_row == float(l)).astype(jnp.float32))
            ck = part if ck is None else ck + part
        i1_row = i1_row + jnp.sum(
            (ck < tgt_row).astype(jnp.float32), axis=0, keepdims=True)
    i1_row = jnp.clip(i1_row, 1.0, float(SPEC_RES - 1))
    c0_row = jnp.zeros((1, tile_n), jnp.float32)
    c1_row = jnp.zeros((1, tile_n), jnp.float32)
    for k0 in range(0, SPEC_RES, KNOT_CHUNK):
        ck = None
        for l in range(nl):
            part = (lcdf_ref[k0:k0 + KNOT_CHUNK, l:l + 1]
                    * (li_row == float(l)).astype(jnp.float32))
            ck = part if ck is None else ck + part
        kio = (jax.lax.broadcasted_iota(jnp.int32, (KNOT_CHUNK, tile_n), 0)
               .astype(jnp.float32) + float(k0))
        c0_row = c0_row + jnp.sum(
            jnp.where(kio == i1_row - 1.0, ck, 0.0), axis=0, keepdims=True)
        c1_row = c1_row + jnp.sum(
            jnp.where(kio == i1_row, ck, 0.0), axis=0, keepdims=True)
    frac = jnp.clip((tgt_row - c0_row)
                    / jnp.maximum(c1_row - c0_row, 1e-12), 0.0, 1.0)
    step = (lam_hi - lam_lo) / (SPEC_RES - 1)
    lam_i = _tile((lam_lo + ((i1_row - 1.0) + frac) * step)[0])
    lam_i = jnp.clip(lam_i, wb_lo, wb_lo + wb_span)

    # ---- environment branch λ (uniform over the bounds)
    env_on = p_env > 0.0
    lam_e = wb_lo + u0[3] * wb_span
    pick_env = (u0[8] < p_env) if env_on else jnp.zeros(li.shape, bool)
    lam = jnp.where(pick_env, lam_e, lam_i) if env_on else lam_i

    # ONE spectral fetch at the merged spawn λ serves the emission SPD
    # (instance lanes) and the constant-env radiance (env lanes)
    R_new = _spectral_fetch(spec_ref[:, :], lam, lam_lo, lam_hi, prec)
    spd = _sel_rows(R_new, l_mat, 4, n_mats, stride=5)
    integ = lsc(_SP_INTEG)
    lam_pdf = spd / jnp.maximum(integ * span, 1e-20)

    # ---- emission direction (lt.py _sample_emission_direction)
    has_sharp = bool(c["has_sharp"])
    nexp = jnp.where(l_mtype == 3.0, l_sharp, 1.0) if has_sharp \
        else jnp.ones(li.shape, jnp.float32)
    cos_t = u0[4] ** (1.0 / (nexp + 1.0))
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi_d = 2.0 * jnp.pi * u0[5]
    # boolean algebra, not jnp.where with python bools: Mosaic rejects the
    # i8->i1 truncation the literal branches lower to
    pick_rev = (l_side == 1) | ((l_side == 2) & (u0[6] < 0.5))
    t_ax, b_ax = cmath.orthonormal_basis(ln)
    fn = cmath.where(pick_rev, V3(-ln.x, -ln.y, -ln.z), ln)
    lx = sin_t * jnp.cos(phi_d)
    ly = sin_t * jnp.sin(phi_d)
    d0_i = V3(lx * t_ax.x + ly * b_ax.x + cos_t * fn.x,
              lx * t_ax.y + ly * b_ax.y + cos_t * fn.y,
              lx * t_ax.z + ly * b_ax.z + cos_t * fn.z)
    dir_pdf = (nexp + 1.0) * cos_t ** nexp / (2.0 * jnp.pi)
    dir_pdf = jnp.where(l_side == 2, dir_pdf * 0.5, dir_pdf)
    cos0 = jnp.abs(cos_t)
    le = _emission_value(spd, l_mtype, l_side, l_sharp,
                         cmath.dot(ln, d0_i), has_sharp=has_sharp)
    den_i = (max(1.0 - p_env, 1e-6) * pick_pdf * area_pdf * dir_pdf
             * lam_pdf)
    beta_i = jnp.where(den_i != 0.0,
                       le * cos0 / jnp.where(den_i != 0.0, den_i, 1.0), 0.0)
    have_lights = n_lights > 0
    alive_i = (beta_i > 0.0) if have_lights \
        else jnp.zeros(li.shape, bool)
    o_i = lp + ln.scale(
        NORMAL_OFFSET * jnp.sign(cmath.dot(ln, d0_i)))

    # ---- constant-environment branch (env_sample_uv const path +
    # world-disk origin; lt.py:224-242). Static: env_kind == 0 only.
    if env_on:
        env_row = 5 * n_mats
        d_uv = cmath.uv_to_direction(u0[1], u0[2])
        ri = c["env_rot_inv"]
        d_out = V3(
            ri[0] * d_uv.x + ri[1] * d_uv.y + ri[2] * d_uv.z,
            ri[3] * d_uv.x + ri[4] * d_uv.y + ri[5] * d_uv.z,
            ri[6] * d_uv.x + ri[7] * d_uv.y + ri[8] * d_uv.z,
        )
        jac_s = 2.0 * jnp.pi * jnp.pi * jnp.sin(jnp.pi * u0[2]) + 0.001
        dir_pdf_env = 1.0 / jac_s
        le_env = _tile(R_new[env_row, :])
        radius = c["lt_world_radius"]
        ctr = c["lt_world_center"]
        te, be = cmath.orthonormal_basis(d_out)
        dx, dy = cmath.random_in_unit_disk(u0[4], u0[5])
        dx = dx * radius
        dy = dy * radius
        lp_e = V3(ctr[0] + d_out.x * radius + dx * te.x + dy * be.x,
                  ctr[1] + d_out.y * radius + dx * te.y + dy * be.y,
                  ctr[2] + d_out.z * radius + dx * te.z + dy * be.z)
        pos_pdf = 1.0 / (jnp.pi * radius * radius)
        den_e = p_env * dir_pdf_env * pos_pdf * (1.0 / wb_span)
        beta_e = jnp.where(den_e != 0.0,
                           le_env / jnp.where(den_e != 0.0, den_e, 1.0), 0.0)
        alive_e = beta_e > 0.0
        beta = jnp.where(pick_env, beta_e, beta_i)
        o_sp = cmath.where(pick_env, lp_e, o_i)
        d_sp = cmath.where(pick_env, V3(-d_out.x, -d_out.y, -d_out.z), d0_i)
        alive = jnp.where(pick_env, alive_e, alive_i)
        prev0 = jnp.where(pick_env, dir_pdf_env, dir_pdf)
    else:
        beta = beta_i
        o_sp, d_sp = o_i, d0_i
        alive = alive_i
        prev0 = dir_pdf
    beta = jnp.where(jnp.isfinite(beta) & (beta > 0.0), beta, 0.0)
    alive = alive & (beta > 0.0)

    # ---- s=1 light-vertex lens connection (_connect_to_camera_values)
    a_lens = c["lt_a_lens"]
    a_film = c["lt_a_film"]
    focal = c["cam_focal"]
    cw = c["cam_w"]
    lens = _lens_point_for(c, u0[9], u0[10])
    to_cam = lens - lp
    dist2 = jnp.maximum(cmath.length_squared(to_cam), 1e-12)
    dist = jnp.sqrt(dist2)
    dir_c = to_cam.scale(1.0 / dist)
    lv_pid, on_film = _film_pid_for(consts, width, height, lens,
                                    V3(-dir_c.x, -dir_c.y, -dir_c.z))
    cos_cam = jnp.abs(dir_c.x * cw[0] + dir_c.y * cw[1] + dir_c.z * cw[2])
    we = focal * focal / (jnp.maximum(cos_cam, 1e-6) ** 3 * a_film)
    den_f = max(1.0 - p_env, 1e-6) * pick_pdf * area_pdf * lam_pdf
    beta_f = jnp.where(den_f != 0.0,
                       1.0 / jnp.where(den_f != 0.0, den_f, 1.0), 0.0)
    cos_lc = cmath.dot(ln, dir_c)
    le_c = _emission_value(spd, l_mtype, l_side, l_sharp, cos_lc,
                           has_sharp=has_sharp)
    energy = beta_f / dist2 * we * le_c * jnp.abs(cos_lc)
    if bool(c["lt_has_proxy"]) and a_lens > 0.0:
        p_conn = 1.0 / max(a_lens, 1e-30)
        p_hit = (_emission_dir_pdf_lane(l_mtype, l_side, l_sharp, cos_lc,
                                        has_sharp) * cos_cam / dist2)
        den = p_conn + p_hit
        energy = energy * jnp.where(
            den > 0.0, p_conn / jnp.where(den > 0.0, den, 1.0), 1.0)
    lv_valid = (on_film & (energy > 0.0) & jnp.isfinite(energy)
                & ~pick_env) if have_lights else jnp.zeros(li.shape, bool)
    so_lv = lp + ln.scale(
        NORMAL_OFFSET * jnp.sign(cos_lc + 1e-9))
    lv_xyz = _xyz_rows(lam_i, jnp.where(lv_valid, energy, 0.0))
    return dict(o=o_sp, d=d_sp, lam=lam, beta=beta, alive=alive,
                prev0=prev0, pick_env=pick_env, so_lv=so_lv, dir_lv=dir_c,
                tmax_lv=dist * 0.99, lv_pid=lv_pid, lv_xyz=lv_xyz,
                lv_valid=lv_valid)


# ------------------------------------------------------------------ kernels


def _lt_shade_kernel(consts, settings, u_ref, state_ref, dense_ref, prim_ref,
                     mat_ref, spec_ref, out_ref):
    """K12-LT: closest-hit sweep inline + LT shading."""
    c = consts
    cs = settings["camera_samples"]

    s = lambda i: _tile(state_ref[i, :])
    o = V3(s(LS_O), s(LS_O + 1), s(LS_O + 2))
    d = V3(s(LS_D), s(LS_D + 1), s(LS_D + 2))
    lam = s(LS_LAM)
    beta = s(LS_BETA)
    prev_pdf = s(LS_PREV)
    alive = s(LS_ALIVE) > 0.5
    bounce_ct = s(LS_BOUNCE)
    from_env = s(LS_ENV) > 0.5

    t_hit, pid = _sweep_tiles(dense_ref, o, d, None, closest=True,
                              present_list=c.get("ct32"),
                              aabb_base=c.get("aabb_base"))
    hit = pid >= 0.0
    pid_c = jnp.maximum(pid, 0.0)
    attr = _prim_attr_fetch(prim_ref, pid_c)
    point, normal, gn, mat_id, kind, area = _hit_attributes(attr, o, d, t_hit)

    mat_tab = mat_ref[:]
    n_mats = c["n_mats"]
    prec = (jax.lax.Precision.HIGHEST if c.get("spec_f32", False)
            else jax.lax.Precision.DEFAULT)
    R = _spectral_fetch(spec_ref[:, :], lam, c["lam_lo"], c["lam_hi"], prec)

    cw = c["cam_w"]
    cu = c["cam_u"]
    cv = c["cam_v"]
    co = c["cam_origin"]
    a_lens = c["lt_a_lens"]
    a_film = c["lt_a_film"]
    focal = c["cam_focal"]
    width = settings["width"]
    height = settings["height"]

    def film_uv_for(o_pt, dneg):
        return _film_pid_for(c, width, height, o_pt, dneg)

    xyz_rows = _xyz_rows

    # ---- direct light→lens hit (lt.py body: reference lt.rs:253-301)
    d_dot_w = d.x * cw[0] + d.y * cw[1] + d.z * cw[2]
    hit_cam = alive & hit & (kind == 2.0) & (d_dot_w < 0.0)
    fpid_h, on_film_h = film_uv_for(point, V3(-d.x, -d.y, -d.z))
    cos_cam_h = jnp.abs(d_dot_w)
    we_area = jnp.where(
        a_lens > 0.0,
        focal * focal / (max(a_lens, 1e-30)
                         * jnp.maximum(cos_cam_h, 1e-6) ** 4 * a_film),
        0.0)
    p_hit_area = prev_pdf * cos_cam_h / jnp.maximum(t_hit, 1e-6) ** 2
    n_comp = jnp.where(bounce_ct < 0.5, 1.0, float(cs))
    denom = p_hit_area + n_comp / max(a_lens, 1e-30)
    w_hit = jnp.where(denom > 0.0, p_hit_area / jnp.where(denom > 0.0, denom, 1.0), 0.0)
    w_hit = jnp.where((bounce_ct < 0.5) & from_env, 1.0, w_hit)
    e_hit = beta * we_area * w_hit
    hit_ok = hit_cam & on_film_h & jnp.isfinite(e_hit) & (e_hit > 0.0)
    out_ref[Q_HIT_PID, :] = _flatrow(jnp.where(hit_ok, fpid_h, 0.0))
    for i, r in enumerate(xyz_rows(lam, jnp.where(hit_ok, e_hit, 0.0))):
        out_ref[Q_HIT_XYZ + i, :] = _flatrow(r)

    alive = alive & hit & (kind != 2.0)

    # ---- shading frame + material params
    tgt, btg = cmath.orthonormal_basis(normal)
    wi_world = V3(-d.x, -d.y, -d.z)
    wi_local = cmath.to_local(tgt, btg, normal, wi_world)
    mtype = _mat_param(mat_tab, _M_TYPE, mat_id, n_mats)
    alpha = _mat_param(mat_tab, _M_ALPHA, mat_id, n_mats)
    metal = _mat_param(mat_tab, _M_METAL, mat_id, n_mats)
    perm = _mat_param(mat_tab, _M_PERM, mat_id, n_mats)
    rscale = _mat_param(mat_tab, _mk._M_RSCALE, mat_id, n_mats)
    eta_i = _sel_rows(R, mat_id, 0, n_mats, stride=5)
    eta_o = _sel_rows(R, mat_id, 1, n_mats, stride=5)
    kappa = _sel_rows(R, mat_id, 2, n_mats, stride=5)
    refl = rscale * _sel_rows(R, mat_id, 3, n_mats, stride=5)

    # ---- camera connections (lt.py body / _connect_to_camera)
    has_proxy = bool(c["lt_has_proxy"])
    inv_cs = 1.0 / cs
    for ci in range(cs):
        u1 = _tile(u_ref[2 * ci, :])
        u2 = _tile(u_ref[2 * ci + 1, :])
        lens = _lens_point_for(c, u1, u2)
        to_cam = lens - point
        dist2 = jnp.maximum(cmath.length_squared(to_cam), 1e-12)
        dist = jnp.sqrt(dist2)
        dir_c = to_cam.scale(1.0 / dist)
        fpid, on_film = film_uv_for(lens, V3(-dir_c.x, -dir_c.y, -dir_c.z))
        cos_cam = jnp.abs(dir_c.x * cw[0] + dir_c.y * cw[1] + dir_c.z * cw[2])
        we = focal * focal / (jnp.maximum(cos_cam, 1e-6) ** 3 * a_film)
        wo_l = cmath.to_local(tgt, btg, normal, dir_c)
        f_c, pdf_c = _bsdf_eval_lane(
            mtype, alpha, metal, perm, eta_i, eta_o, kappa, refl,
            wi_local, wo_l, TransportMode.Importance, has_ggx=c["has_ggx"])
        energy = beta * inv_cs / dist2 * we * f_c * jnp.abs(wo_l.z)
        if has_proxy and a_lens > 0.0:
            p_conn = cs / max(a_lens, 1e-30)
            p_hit = pdf_c * cos_cam / dist2
            den = p_conn + p_hit
            energy = energy * jnp.where(
                den > 0.0, p_conn / jnp.where(den > 0.0, den, 1.0), 1.0)
        so = point + gn.scale(
            NORMAL_OFFSET * jnp.sign(cmath.dot(gn, dir_c) + 1e-9))
        valid = (alive & on_film & (energy > 0.0) & jnp.isfinite(energy))
        base = Q_CONN + 12 * ci
        out_ref[base + 0, :] = _flatrow(so.x)
        out_ref[base + 1, :] = _flatrow(so.y)
        out_ref[base + 2, :] = _flatrow(so.z)
        out_ref[base + 3, :] = _flatrow(dir_c.x)
        out_ref[base + 4, :] = _flatrow(dir_c.y)
        out_ref[base + 5, :] = _flatrow(dir_c.z)
        out_ref[base + 6, :] = _flatrow(dist * 0.99)
        out_ref[base + 7, :] = _flatrow(jnp.where(valid, fpid, 0.0))
        for i, r in enumerate(xyz_rows(lam, jnp.where(valid, energy, 0.0))):
            out_ref[base + 8 + i, :] = _flatrow(r)
        out_ref[base + 11, :] = _flatrow(valid.astype(jnp.float32))

    # ---- continuation sample (Importance transport; lt.py:374-391)
    u_b = [_tile(u_ref[2 * cs + i, :]) for i in range(3)]
    wo_lam_s, f_lam_s, pdf_lam_s = cmath.sample_lambertian(refl, wi_local,
                                                           u_b[0], u_b[1])
    w_lam_s = jnp.minimum(refl, 1.0)
    if c["has_ggx"]:
        a_g = jnp.maximum(alpha, 1e-4)
        wo_ggx_s, f_ggx_s, pdf_ggx_s, w_ggx_s = cmath.sample_ggx(
            a_g, jnp.maximum(eta_i, 1e-3), jnp.maximum(eta_o, 1e-3),
            kappa, metal > 0.5, perm, wi_local, u_b[0], u_b[1], u_b[2],
            TransportMode.Importance)
        is_ggx = mtype == MAT_GGX
        wo_local_s = cmath.where(is_ggx, wo_ggx_s, wo_lam_s)
        f_pdf = jnp.where(is_ggx, pdf_ggx_s, pdf_lam_s)
        ratio = jnp.where(is_ggx, w_ggx_s, w_lam_s)
    else:
        wo_local_s = wo_lam_s
        f_pdf = pdf_lam_s
        ratio = w_lam_s
    is_pass = mtype == 4.0
    f_pdf = jnp.where(is_pass, 0.0, f_pdf)
    ratio = jnp.where(is_pass, 0.0, ratio)
    sample_ok = (f_pdf > 1e-12) & (ratio > 0.0)
    d_new = cmath.normalize(cmath.to_world(tgt, btg, normal, wo_local_s))
    o_new = point + gn.scale(NORMAL_OFFSET * jnp.sign(cmath.dot(gn, d_new)))

    out_ref[Q_ALIVE, :] = _flatrow(alive.astype(jnp.float32))
    out_ref[Q_FPDF, :] = _flatrow(f_pdf)
    out_ref[Q_RATIO, :] = _flatrow(ratio)
    out_ref[Q_SOK, :] = _flatrow(sample_ok.astype(jnp.float32))
    out_ref[Q_ONEW + 0, :] = _flatrow(o_new.x)
    out_ref[Q_ONEW + 1, :] = _flatrow(o_new.y)
    out_ref[Q_ONEW + 2, :] = _flatrow(o_new.z)
    out_ref[Q_DNEW + 0, :] = _flatrow(d_new.x)
    out_ref[Q_DNEW + 1, :] = _flatrow(d_new.y)
    out_ref[Q_DNEW + 2, :] = _flatrow(d_new.z)
    nq = _q2_rows(cs)
    for row in range(Q_CONN + 12 * cs, nq):
        out_ref[row, :] = jnp.zeros((out_ref.shape[1],), jnp.float32)


def _lt_finalize_kernel(consts, settings, u_ref, state_ref, k2_ref, feed_ref,
                        dense_ref, out_ref):
    """K34-LT: connection + light-vertex shadow sweeps inline, then RR +
    death + respawn-from-feed + budget."""
    c = consts
    cs = settings["camera_samples"]
    max_bounces = settings["max_bounces"]
    min_bounces = settings["min_bounces"]
    rr_enabled = settings["russian_roulette"]
    aux = _k4_aux(cs)

    s = lambda i: _tile(state_ref[i, :])
    k2 = lambda i: _tile(k2_ref[i, :])
    fd = lambda i: _tile(feed_ref[i, :])

    o = V3(s(LS_O), s(LS_O + 1), s(LS_O + 2))
    d = V3(s(LS_D), s(LS_D + 1), s(LS_D + 2))
    lam = s(LS_LAM)
    beta = s(LS_BETA)
    alive0 = s(LS_ALIVE) > 0.5
    bounce_ct = s(LS_BOUNCE)
    budget = s(LS_BUDGET)

    alive = k2(Q_ALIVE) > 0.5
    f_pdf = k2(Q_FPDF)
    ratio = k2(Q_RATIO)
    sample_ok = k2(Q_SOK) > 0.5
    o_new = V3(k2(Q_ONEW), k2(Q_ONEW + 1), k2(Q_ONEW + 2))
    d_new = V3(k2(Q_DNEW), k2(Q_DNEW + 1), k2(Q_DNEW + 2))

    # ---- shadow sweeps: cs connections + the light-vertex task
    conn_ct = jnp.zeros(alive.shape, jnp.float32)
    for ci in range(cs):
        base = Q_CONN + 12 * ci
        so = V3(k2(base), k2(base + 1), k2(base + 2))
        sd = V3(k2(base + 3), k2(base + 4), k2(base + 5))
        blocked = _sweep_tiles(dense_ref, so, sd, k2(base + 6),
                               closest=False, present_list=c.get("ct32"),
                               aabb_base=c.get("aabb_base"))
        ok = (k2(base + 11) > 0.5) & ~blocked
        # count only live-lane connection rays (dead-round sweeps are
        # wasted compute, not measured throughput)
        conn_ct = conn_ct + (alive0 & ~blocked).astype(jnp.float32)
        out_ref[K4_CONN + 4 * ci, :] = _flatrow(
            jnp.where(ok, k2(base + 7), 0.0))
        for i in range(3):
            out_ref[K4_CONN + 4 * ci + 1 + i, :] = _flatrow(
                jnp.where(ok, k2(base + 8 + i), 0.0))
    so_lv = V3(fd(F_LV), fd(F_LV + 1), fd(F_LV + 2))
    sd_lv = V3(fd(F_LV + 3), fd(F_LV + 4), fd(F_LV + 5))
    lv_blocked = _sweep_tiles(dense_ref, so_lv, sd_lv, fd(F_LV + 6),
                              closest=False, present_list=c.get("ct32"),
                              aabb_base=c.get("aabb_base"))
    lv_ok = (fd(F_LV_VALID) > 0.5) & ~lv_blocked

    # ---- RR + continuation (lt.py:379-392)
    u_rr = _tile(u_ref[2 * cs + 3, :])
    if rr_enabled:
        rr_on = bounce_ct >= min_bounces
        p_cont = jnp.where(rr_on, jnp.clip(ratio, 0.05, 1.0), 1.0)
    else:
        p_cont = jnp.ones(ratio.shape, jnp.float32)
    survive = u_rr < p_cont
    beta_next = beta * jnp.where(sample_ok, ratio / jnp.maximum(p_cont, 1e-6), 0.0)
    hit_depth_cap = (bounce_ct + 1.0) >= max_bounces
    continue_path = (alive & sample_ok & survive & ~hit_depth_cap
                     & jnp.isfinite(beta_next))

    died = ~continue_path  # dead OR just-exhausted walks; spawn if budgeted
    has_work = died & (budget >= 0.5)
    resp_ok = has_work & (fd(F_ALIVE) > 0.5)

    cp = continue_path
    hw = has_work
    o_s = V3(fd(F_O), fd(F_O + 1), fd(F_O + 2))
    d_s = V3(fd(F_D), fd(F_D + 1), fd(F_D + 2))
    o_out = cmath.where(cp, o_new, cmath.where(hw, o_s, o))
    d_out = cmath.where(cp, d_new, cmath.where(hw, d_s, d))
    out_ref[LS_O + 0, :] = _flatrow(o_out.x)
    out_ref[LS_O + 1, :] = _flatrow(o_out.y)
    out_ref[LS_O + 2, :] = _flatrow(o_out.z)
    out_ref[LS_D + 0, :] = _flatrow(d_out.x)
    out_ref[LS_D + 1, :] = _flatrow(d_out.y)
    out_ref[LS_D + 2, :] = _flatrow(d_out.z)
    out_ref[LS_LAM, :] = _flatrow(jnp.where(hw, fd(F_LAM), lam))
    out_ref[LS_BETA, :] = _flatrow(
        jnp.where(cp, beta_next, jnp.where(hw, fd(F_BETA), beta)))
    out_ref[LS_PREV, :] = _flatrow(
        jnp.where(cp, f_pdf, jnp.where(hw, fd(F_PREV), s(LS_PREV))))
    out_ref[LS_ALIVE, :] = _flatrow(
        (cp | resp_ok).astype(jnp.float32))
    out_ref[LS_BOUNCE, :] = _flatrow(
        jnp.where(cp, bounce_ct + 1.0, jnp.where(hw, 0.0, bounce_ct)))
    out_ref[LS_BUDGET, :] = _flatrow(jnp.where(hw, budget - 1.0, budget))
    out_ref[LS_ENV, :] = _flatrow(jnp.where(hw, fd(F_ENV), s(LS_ENV)))
    for row in range(LS_ENV + 1, NS_LT):
        out_ref[row, :] = state_ref[row, :]
    out_ref[aux["lv_ok"], :] = _flatrow((lv_ok & hw).astype(jnp.float32))
    out_ref[aux["resp"], :] = _flatrow(hw.astype(jnp.float32))
    out_ref[aux["bounce"], :] = _flatrow(cp.astype(jnp.float32))
    out_ref[aux["conn_ct"], :] = _flatrow(conn_ct)
    for row in range(aux["conn_ct"] + 1, _k4_rows(cs)):
        out_ref[row, :] = jnp.zeros((out_ref.shape[1],), jnp.float32)


def _lt_finalize_spawn_kernel(consts, settings, u_ref, usp_ref, state_ref,
                              k2_ref, dense_ref, light_ref, spec_ref,
                              lcdf_ref, out_ref):
    """K34-LT v2: connection shadow sweeps inline + IN-KERNEL respawn
    (_spawn_inkernel) + the light-vertex connection's sweep and resolved
    splat rows — no XLA feed in the program at all."""
    c = consts
    cs = settings["camera_samples"]
    max_bounces = settings["max_bounces"]
    min_bounces = settings["min_bounces"]
    rr_enabled = settings["russian_roulette"]
    aux = _k4_aux_v2(cs)

    s = lambda i: _tile(state_ref[i, :])
    k2 = lambda i: _tile(k2_ref[i, :])

    o = V3(s(LS_O), s(LS_O + 1), s(LS_O + 2))
    d = V3(s(LS_D), s(LS_D + 1), s(LS_D + 2))
    lam = s(LS_LAM)
    beta = s(LS_BETA)
    alive0 = s(LS_ALIVE) > 0.5
    bounce_ct = s(LS_BOUNCE)
    budget = s(LS_BUDGET)

    alive = k2(Q_ALIVE) > 0.5
    f_pdf = k2(Q_FPDF)
    ratio = k2(Q_RATIO)
    sample_ok = k2(Q_SOK) > 0.5
    o_new = V3(k2(Q_ONEW), k2(Q_ONEW + 1), k2(Q_ONEW + 2))
    d_new = V3(k2(Q_DNEW), k2(Q_DNEW + 1), k2(Q_DNEW + 2))

    # ---- connection shadow sweeps
    conn_ct = jnp.zeros(alive.shape, jnp.float32)
    for ci in range(cs):
        base = Q_CONN + 12 * ci
        so = V3(k2(base), k2(base + 1), k2(base + 2))
        sd = V3(k2(base + 3), k2(base + 4), k2(base + 5))
        blocked = _sweep_tiles(dense_ref, so, sd, k2(base + 6),
                               closest=False, present_list=c.get("ct32"),
                               aabb_base=c.get("aabb_base"))
        ok = (k2(base + 11) > 0.5) & ~blocked
        conn_ct = conn_ct + (alive0 & ~blocked).astype(jnp.float32)
        out_ref[K4_CONN + 4 * ci, :] = _flatrow(
            jnp.where(ok, k2(base + 7), 0.0))
        for i in range(3):
            out_ref[K4_CONN + 4 * ci + 1 + i, :] = _flatrow(
                jnp.where(ok, k2(base + 8 + i), 0.0))

    # ---- in-kernel spawn + light-vertex connection
    usp = [_tile(usp_ref[i, :]) for i in range(11)]
    sp = _spawn_inkernel(c, settings, usp, light_ref, spec_ref, lcdf_ref)
    lv_blocked = _sweep_tiles(dense_ref, sp["so_lv"], sp["dir_lv"],
                              sp["tmax_lv"], closest=False,
                              present_list=c.get("ct32"),
                              aabb_base=c.get("aabb_base"))
    lv_ok = sp["lv_valid"] & ~lv_blocked

    # ---- RR + continuation (lt.py:379-392)
    u_rr = _tile(u_ref[2 * cs + 3, :])
    if rr_enabled:
        rr_on = bounce_ct >= min_bounces
        p_cont = jnp.where(rr_on, jnp.clip(ratio, 0.05, 1.0), 1.0)
    else:
        p_cont = jnp.ones(ratio.shape, jnp.float32)
    survive = u_rr < p_cont
    beta_next = beta * jnp.where(sample_ok,
                                 ratio / jnp.maximum(p_cont, 1e-6), 0.0)
    hit_depth_cap = (bounce_ct + 1.0) >= max_bounces
    continue_path = (alive & sample_ok & survive & ~hit_depth_cap
                     & jnp.isfinite(beta_next))

    died = ~continue_path
    has_work = died & (budget >= 0.5)
    resp_ok = has_work & sp["alive"]

    cp = continue_path
    hw = has_work
    o_out = cmath.where(cp, o_new, cmath.where(hw, sp["o"], o))
    d_out = cmath.where(cp, d_new, cmath.where(hw, sp["d"], d))
    out_ref[LS_O + 0, :] = _flatrow(o_out.x)
    out_ref[LS_O + 1, :] = _flatrow(o_out.y)
    out_ref[LS_O + 2, :] = _flatrow(o_out.z)
    out_ref[LS_D + 0, :] = _flatrow(d_out.x)
    out_ref[LS_D + 1, :] = _flatrow(d_out.y)
    out_ref[LS_D + 2, :] = _flatrow(d_out.z)
    out_ref[LS_LAM, :] = _flatrow(jnp.where(hw, sp["lam"], lam))
    out_ref[LS_BETA, :] = _flatrow(
        jnp.where(cp, beta_next, jnp.where(hw, sp["beta"], beta)))
    out_ref[LS_PREV, :] = _flatrow(
        jnp.where(cp, f_pdf, jnp.where(hw, sp["prev0"], s(LS_PREV))))
    out_ref[LS_ALIVE, :] = _flatrow((cp | resp_ok).astype(jnp.float32))
    out_ref[LS_BOUNCE, :] = _flatrow(
        jnp.where(cp, bounce_ct + 1.0, jnp.where(hw, 0.0, bounce_ct)))
    out_ref[LS_BUDGET, :] = _flatrow(jnp.where(hw, budget - 1.0, budget))
    out_ref[LS_ENV, :] = _flatrow(
        jnp.where(hw, sp["pick_env"].astype(jnp.float32), s(LS_ENV)))
    for row in range(LS_ENV + 1, NS_LT):
        out_ref[row, :] = state_ref[row, :]
    lv_gate = lv_ok & hw
    out_ref[aux["lv_pid"], :] = _flatrow(
        jnp.where(lv_gate, sp["lv_pid"], 0.0))
    for i in range(3):
        out_ref[aux["lv_xyz"] + i, :] = _flatrow(
            jnp.where(lv_gate, sp["lv_xyz"][i], 0.0))
    out_ref[aux["resp"], :] = _flatrow(hw.astype(jnp.float32))
    out_ref[aux["bounce"], :] = _flatrow(cp.astype(jnp.float32))
    out_ref[aux["conn_ct"], :] = _flatrow(conn_ct)
    out_ref[aux["lv_ct"], :] = _flatrow(lv_gate.astype(jnp.float32))
    for row in range(aux["lv_ct"] + 1, _k4_rows_v2(cs)):
        out_ref[row, :] = jnp.zeros((out_ref.shape[1],), jnp.float32)


# ------------------------------------------------------------------ driver


@_mega_jit(static_argnames=("settings_t", "consts_t", "interpret",
                            "lt_settings"))
def _lt_step(film, state, counters, it_dev, tabs, world, camera, lt_settings,
             key, settings_t, consts_t, interpret):
    """One LT bounce round = ONE dispatched program: K12-LT pallas call,
    the XLA spawn feed, K34-LT pallas call, then the film scatter-adds."""
    import jax.random as jrandom

    settings = dict(settings_t)
    consts = dict(consts_t)
    interp = pltpu.InterpretParams() if interpret else False
    prim_tab, dense_tab, mat_tab, spec_tab = tabs
    n_pad = state.shape[1]
    cs = settings["camera_samples"]
    nu = _nu_lt(cs)
    nq = _q2_rows(cs)
    u = jrandom.uniform(jrandom.fold_in(jrandom.fold_in(key, it_dev), 0),
                        (nu, n_pad))
    k2 = pl.pallas_call(
        functools.partial(_lt_shade_kernel, consts, settings),
        grid=(n_pad // _mk.TILE,),
        in_specs=[
            _row_spec(nu),
            _row_spec(NS_LT),
            _full_block_spec(dense_tab),
            _full_block_spec(prim_tab),
            _full_block_spec(mat_tab),
            _full_block_spec(spec_tab),
        ],
        out_specs=_row_spec(nq),
        out_shape=jax.ShapeDtypeStruct((nq, n_pad), jnp.float32),
        interpret=interp,
    )(u, state, dense_tab, prim_tab, mat_tab, spec_tab)

    feed = _lt_spawn_feed(world, lt_settings, key, it_dev, n_pad, camera,
                          int(settings["width"]), int(settings["height"]))
    nk4 = _k4_rows(cs)
    out4 = pl.pallas_call(
        functools.partial(_lt_finalize_kernel, consts, settings),
        grid=(n_pad // _mk.TILE,),
        in_specs=[
            _row_spec(nu),
            _row_spec(NS_LT),
            _row_spec(nq),
            _row_spec(NF),
            _full_block_spec(dense_tab),
        ],
        out_specs=_row_spec(nk4),
        out_shape=jax.ShapeDtypeStruct((nk4, n_pad), jnp.float32),
        interpret=interp,
    )(u, state, k2, feed, dense_tab)
    state_out = out4[:NS_LT]
    aux = _k4_aux(cs)

    # ---- film scatter-adds (the crossbeam splat channel equivalent):
    # direct lens hits, resolved camera connections, light-vertex splats
    def scat(film, pid_row, xyz_rows):
        pid = pid_row.astype(jnp.int32)
        xyz = jnp.stack(xyz_rows, axis=-1)
        return film.at[pid].add(xyz)

    film = scat(film, k2[Q_HIT_PID], [k2[Q_HIT_XYZ + i] for i in range(3)])
    for ci in range(cs):
        b = K4_CONN + 4 * ci
        film = scat(film, out4[b], [out4[b + 1 + i] for i in range(3)])
    lv_gate = out4[aux["lv_ok"]]
    film = scat(film, feed[F_LV + 7] * lv_gate,
                [feed[F_LV + 8 + i] * lv_gate for i in range(3)])

    counters = counters.at[prof.BOUNCE_RAYS].add(jnp.sum(out4[aux["bounce"]]))
    counters = counters.at[prof.CAMERA_RAYS].add(jnp.sum(out4[aux["conn_ct"]])
                                                 + jnp.sum(lv_gate))
    counters = counters.at[prof.LIGHT_RAYS].add(jnp.sum(out4[aux["resp"]]))
    return film, state_out, counters, it_dev + 1


def _stratify_usp(lt_settings, usp, kf):
    """integrator.lt.stratify_u0 on row-oriented spawn uniforms
    (StratifiedSampler(20,20,10) port; rows 1, 2 = emitter surface uv,
    row 3 = λ stratum; per-render random cell permutation)."""
    import jax.random as jrandom

    from pathtracer_tpu.core import sampling

    n = usp.shape[1]
    suv = lt_settings.strata_uv
    slam = lt_settings.strata_lam
    cells = suv * suv * slam
    perm = jrandom.permutation(sampling.fold(kf, 7), cells)
    cid = perm[jnp.arange(n, dtype=jnp.int32) % cells]
    cu = (cid % suv).astype(jnp.float32)
    cv = ((cid // suv) % suv).astype(jnp.float32)
    cl = (cid // (suv * suv)).astype(jnp.float32)
    usp = usp.at[1].set((cu + usp[1]) / suv)
    usp = usp.at[2].set((cv + usp[2]) / suv)
    usp = usp.at[3].set((cl + usp[3]) / slam)
    return usp


def _lt_round_v2(film, state, counters, it_dev, tabs, lt_settings,
                 key, settings, consts, interp):
    """One LT bounce round, v2: K12-LT pallas call + K34-LT pallas call
    with IN-KERNEL spawning (no XLA feed — the v1 feed was ~180 of the
    226 ms/round at 1M lanes), then the film scatter-adds. Raw body —
    jitted alone (_lt_step_v2) or chained K× per dispatched program
    (_lt_step_v2_multi: LT has no occupancy drain, so every round is
    full-width and the ~8.8 ms/program tunnel pacing floor is pure
    per-round overhead that chaining divides by K)."""
    import jax.random as jrandom

    prim_tab, dense_tab, mat_tab, spec_tab, light_tab, lcdf_tab = tabs
    n_pad = state.shape[1]
    cs = settings["camera_samples"]
    nu = _nu_lt(cs)
    nq = _q2_rows(cs)
    u = jrandom.uniform(jrandom.fold_in(jrandom.fold_in(key, it_dev), 0),
                        (nu, n_pad))
    kf = jrandom.fold_in(jrandom.fold_in(key, it_dev), 2)
    usp = jrandom.uniform(kf, (NUSP, n_pad))
    if lt_settings.stratified:
        usp = _stratify_usp(lt_settings, usp, kf)
    k2 = pl.pallas_call(
        functools.partial(_lt_shade_kernel, consts, settings),
        grid=(n_pad // _mk.TILE,),
        in_specs=[
            _row_spec(nu),
            _row_spec(NS_LT),
            _full_block_spec(dense_tab),
            _full_block_spec(prim_tab),
            _full_block_spec(mat_tab),
            _full_block_spec(spec_tab),
        ],
        out_specs=_row_spec(nq),
        out_shape=jax.ShapeDtypeStruct((nq, n_pad), jnp.float32),
        interpret=interp,
    )(u, state, dense_tab, prim_tab, mat_tab, spec_tab)

    nk4 = _k4_rows_v2(cs)
    out4 = pl.pallas_call(
        functools.partial(_lt_finalize_spawn_kernel, consts, settings),
        grid=(n_pad // _mk.TILE,),
        in_specs=[
            _row_spec(nu),
            _row_spec(NUSP),
            _row_spec(NS_LT),
            _row_spec(nq),
            _full_block_spec(dense_tab),
            _full_block_spec(light_tab),
            _full_block_spec(spec_tab),
            _full_block_spec(lcdf_tab),
        ],
        out_specs=_row_spec(nk4),
        out_shape=jax.ShapeDtypeStruct((nk4, n_pad), jnp.float32),
        interpret=interp,
    )(u, usp, state, k2, dense_tab, light_tab, spec_tab, lcdf_tab)
    state_out = out4[:NS_LT]
    aux = _k4_aux_v2(cs)

    # ONE fused scatter-add per round: the 2+cs splat families (direct
    # lens hits, per-cs resolved connections, light-vertex) concatenate
    # into a single index/update pair — TPU scatters pay a large per-op
    # cost (sort/serialize on duplicate indices), so call count matters.
    # PT_LT_NO_SPLAT=1 (probe only, wrong film) skips them entirely to
    # bound the scatter share of the round.
    import os as _os2

    pid_rows = [k2[Q_HIT_PID]]
    xyz_rows_all = [[k2[Q_HIT_XYZ + i] for i in range(3)]]
    for ci in range(cs):
        b = K4_CONN + 4 * ci
        pid_rows.append(out4[b])
        xyz_rows_all.append([out4[b + 1 + i] for i in range(3)])
    pid_rows.append(out4[aux["lv_pid"]])
    xyz_rows_all.append([out4[aux["lv_xyz"] + i] for i in range(3)])
    if not _os2.environ.get("PT_LT_NO_SPLAT"):
        pid = jnp.concatenate(pid_rows).astype(jnp.int32)
        xyz = jnp.stack([jnp.concatenate([r[i] for r in xyz_rows_all])
                         for i in range(3)], axis=-1)
        film = film.at[pid].add(xyz)

    counters = counters.at[prof.BOUNCE_RAYS].add(jnp.sum(out4[aux["bounce"]]))
    counters = counters.at[prof.CAMERA_RAYS].add(
        jnp.sum(out4[aux["conn_ct"]]) + jnp.sum(out4[aux["lv_ct"]]))
    counters = counters.at[prof.LIGHT_RAYS].add(jnp.sum(out4[aux["resp"]]))
    return film, state_out, counters, it_dev + 1


@_mega_jit(static_argnames=("settings_t", "consts_t", "interpret",
                            "lt_settings"))
def _lt_step_v2(film, state, counters, it_dev, tabs, lt_settings, key,
                settings_t, consts_t, interpret):
    interp = pltpu.InterpretParams() if interpret else False
    return _lt_round_v2(film, state, counters, it_dev, tabs, lt_settings,
                        key, dict(settings_t), dict(consts_t), interp)


@_mega_jit(static_argnames=("settings_t", "consts_t", "interpret",
                            "lt_settings", "rounds"))
def _lt_step_v2_multi(film, state, counters, it_dev, tabs, lt_settings, key,
                      settings_t, consts_t, interpret, rounds):
    """`rounds` v2 LT rounds chained in ONE dispatched program (2·rounds
    pallas calls + in-program scatter-adds): identical per-round ops and
    uniform streams (keyed by it_dev), just fewer dispatches."""
    interp = pltpu.InterpretParams() if interpret else False
    settings = dict(settings_t)
    consts = dict(consts_t)
    for _ in range(rounds):
        film, state, counters, it_dev = _lt_round_v2(
            film, state, counters, it_dev, tabs, lt_settings, key, settings,
            consts, interp)
    return film, state, counters, it_dev


def lt_mega_spawn_inkernel(world) -> bool:
    """v2 gate: in-kernel spawning covers instance lights + CONSTANT
    environments (HDR/Sun spawning keeps the XLA feed) with ≤128 lights."""
    from pathtracer_tpu.world.environment import ENV_CONSTANT

    return (int(world.env.kind) == int(ENV_CONSTANT)
            and int(np.asarray(world.n_lights)) <= 128)


def lt_trace_mega(world, camera, settings, width: int, height: int,
                  n_paths: int, key, interpret=False):
    """Megakernel drop-in for integrator.lt.lt_trace: same contract —
    returns (light_film [H*W, 3] xyz splat sum, counters[5]). Spawns
    exactly n_paths particles (per-lane budgets; remainder spread over the
    first lanes)."""
    from pathtracer_tpu.core import sampling

    scene_key = (world, camera)
    cached = _LT_SCENE_CACHE.get("entry")
    if cached is not None and cached[0] is world and cached[1] is camera:
        scene = cached[2]
    else:
        scene = build_mega_scene(world, camera, _PTShim())
        _LT_SCENE_CACHE["entry"] = (world, camera, scene)
    assert width * height < (1 << 24), "film pixel ids ride f32 rows"

    step = max(_mk.TILE, 512)
    n_lanes = min(n_paths, int(1 << 20))
    n_pad = -(-n_lanes // step) * step
    budget_np = np.zeros(n_pad, np.float32)
    b_each, rem = divmod(n_paths, n_lanes)
    budget_np[:n_lanes] = b_each
    budget_np[:rem] += 1.0

    consts = dict(scene.consts)
    # LT-specific consts (host floats; frozen into the kernel closures)
    import os as _os
    import numpy as _np
    consts["lt_a_lens"] = float(_np.pi) * float(camera.lens_radius) ** 2
    consts["lt_a_film"] = float(
        (2.0 * camera.half_width) * (2.0 * camera.half_height))
    consts["lt_has_proxy"] = bool(
        (np.asarray(world.prims.mat_kind) == 2).any())
    consts.pop("tex_feed", None)
    consts.pop("medium", None)
    wb = settings.wavelength_bounds
    # v2 (in-kernel spawn) unless the scene needs the HDR/Sun feed or
    # PT_LT_MEGA_V1=1 pins the v1 feed path for A/B
    spawn_inkernel = (lt_mega_spawn_inkernel(world)
                      and not _os.environ.get("PT_LT_MEGA_V1"))
    lcdf_tab = None
    if spawn_inkernel:
        consts["lt_world_radius"] = float(np.asarray(world.radius))
        consts["lt_world_center"] = tuple(
            float(x) for x in np.asarray(world.center))
        lcdf_tab = jnp.asarray(bake_lt_spawn_tab(world, wb))
    settings_d = dict(
        camera_samples=int(settings.camera_samples),
        max_bounces=float(settings.max_bounces),
        min_bounces=float(settings.min_bounces),
        russian_roulette=bool(settings.russian_roulette),
        width=float(width),
        height=float(height),
        wb_lo=float(wb.lower),
        wb_span=float(wb.span),
        tile=_mk.TILE,
    )
    settings_t = _freeze(settings_d)
    consts_t = _freeze(consts)
    tabs = (scene.prim_tab, scene.dense_tab, scene.mat_tab, scene.spec_tab)
    tabs_v2 = (scene.prim_tab, scene.dense_tab, scene.mat_tab,
               scene.spec_tab, scene.light_tab, lcdf_tab)

    state = jnp.zeros((NS_LT, n_pad), jnp.float32)
    state = state.at[LS_BUDGET].set(jnp.asarray(budget_np))
    film = jnp.zeros((width * height, 3), jnp.float32)
    counters = prof.zeros()
    it_dev = jnp.int32(0)
    it = 0
    max_iters = int((b_each + 1) * settings.max_bounces * 4 + 64)

    # round chaining (v2 only; PT_LT_MEGA_ROUNDS, default 4): LT lanes
    # respawn immediately, so every round is full-width and the tunnel's
    # ~8.8 ms/program pacing floor is pure per-round overhead — chaining K
    # rounds per dispatched program divides it by K at the cost of K×2
    # pallas calls of compile
    k_chain = max(int(_os.environ.get("PT_LT_MEGA_ROUNDS", "4")), 1) \
        if spawn_inkernel else 1
    # pipelined termination checks (PARITY rule 8: blocking scalar fetches
    # stall a full tunnel RTT; issue the count program every interval and
    # read it one interval later)
    check_every = max(4 // k_chain, 1)
    pending = []
    stop = False
    while it < max_iters and not stop:
        for _ in range(check_every):
            if spawn_inkernel and k_chain > 1:
                film, state, counters, it_dev = _lt_step_v2_multi(
                    film, state, counters, it_dev, tabs_v2, settings,
                    key, settings_t, consts_t, interpret, k_chain)
            elif spawn_inkernel:
                film, state, counters, it_dev = _lt_step_v2(
                    film, state, counters, it_dev, tabs_v2, settings,
                    key, settings_t, consts_t, interpret)
            else:
                film, state, counters, it_dev = _lt_step(
                    film, state, counters, it_dev, tabs, world, camera,
                    settings, key, settings_t, consts_t, interpret)
            it += k_chain
        pending.append((it, _lt_work_count(state)))
        while pending and (it - pending[0][0] >= check_every * k_chain
                           or len(pending) > 3):
            _, fut = pending.pop(0)
            if float(np.asarray(fut)) == 0.0:
                stop = True
                break
    return film, counters


class _PTShim:
    """Minimal PTSettings stand-in for build_mega_scene (it reads only
    medium_aware/hwss-adjacent fields via getattr with defaults)."""
    medium_aware = False
    hwss = False


_LT_SCENE_CACHE: dict = {}


@jax.jit
def _lt_work_count(state):
    return jnp.sum(state[LS_ALIVE]) + jnp.sum(state[LS_BUDGET])
