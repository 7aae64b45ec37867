"""Pallas regen-PT megakernel: the whole per-bounce body on-chip.

The production XLA regen integrator (integrator/pt_regen.py — itself the
wavefront re-design of the reference's random_walk + PT NEE loop,
/root/reference/src/integrator/utils.rs:152-376 + src/integrator/pt.rs) runs
each bounce as one giant XLA program whose intermediates ([N] and [N,4]
arrays, plus ~10 per-lane gathers at ~4 ms each) all round-trip HBM;
measured cost ~75 ms per 2M-lane iteration. This module replaces one
iteration with a 4-kernel Mosaic pipeline whose HBM traffic is just the
packed ray state:

  K1 closest-hit   (kernels/dense.py — rays in sublanes, prims in lanes)
  K2 shade-pre     (this file — hit attrs, emission/env adds, NEE ray
                    setup + contributions, BSDF sample, all [S,128] tiles)
  K3 shadow any-hit (kernels/dense.py, one per light sample)
  K4 finalize      (this file — NEE resolve, RR, death/XYZ, respawn)

Table lookups never gather: primitive/material/light records are contracted
against one-hot masks on the MXU; spectral curve evaluation builds a
SOFT one-hot over the 512 λ-knots (lerp weights at i0/i0+1) and rides ONE
[C,512]x[512,TILE] matmul per hero lane — every curve the bounce needs
(η_i, η_o, κ, reflectance, emission SPD, env) falls out of that product.
CIE x̄ȳz̄ use the closed-form Wyman fits (core/cie.py) directly.

Scope (gated by mega_available): projective thin-lens camera, identity
transforms, ≤8192 prims, ≤16 lights, ≤24 materials. Constant, Sun AND HDR
environments are covered: non-constant env emission / pdf_for / NEE
sampling run in XLA inside the same dispatched program (they depend only
on state rows + the bounce's uniforms — see _env_feed) and are fed to the
kernel as per-lane rows. Uv-dependent surface textures ride the same
pattern between K1 and K2 (_tex_feed), and MEDIUM-AWARE transport
(tracked-medium stack, HG/Rayleigh free flight + phase sampling + NEE
transmittance, utils.rs:708-1103) rides _med_feed: the flight distance,
σ sums, σ-share scatterer pick and phase-sampled direction depend only on
state rows + the bounce's uniforms, so they compute in XLA and the kernels
handle only the hit-dependent parts (scatter classification, Beer–Lambert
weights, closed-form NEE phase eval, stack transitions). Everything else
falls back to the XLA path.
RNG is the on-chip Mosaic PRNG (seeded per (seed, kernel, iteration,
program)), so films agree with the XLA integrator statistically (same
estimator, different sample sequence) — validated by white-furnace unity
and equal-spp RMSE tests, not bit-identity.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtracer_tpu.kernels import cmath
from pathtracer_tpu.kernels.cmath import V3
from pathtracer_tpu.kernels.dense import (
    RAY_TILE,
    _sweep_any,
    _sweep_closest,
    pack_prims_np,
)
from pathtracer_tpu.geometry.soa import (
    PRIM_DISK,
    PRIM_RECT,
    PRIM_SPHERE,
    PRIM_TRIANGLE,
)
from pathtracer_tpu.materials.tables import (
    MAT_DIFFUSE_LIGHT,
    MAT_GGX,
    MAT_LAMBERTIAN,
    MAT_SHARP_LIGHT,
)
from pathtracer_tpu.prelude import (
    INTERSECTION_TIME_OFFSET,
    NORMAL_OFFSET,
    RAY_TMAX,
    TransportMode,
)
from pathtracer_tpu.utils import profile as prof

import os as _os_top

TILE = int(_os_top.environ.get("PT_MEGA_TILE", "4096"))
# lanes per K2/K4 grid step. 2048 was the VMEM-bounded pick under the old
# 16 MiB scoped budget (the λ soft-onehot is [512, TILE] f32); with the
# budget raised (see _mega_jit) 4096 halves the grid-step count and
# measures +3% alone, +14% with the fused round (on-chip A/B 2026-08-18:
# 107.3 / 110.4 / 121.9 Mrays/s for 2048 / 4096 / 4096+fused, 8192 flat).


def _mega_jit(**jit_kw):
    """jax.jit for the pallas-bearing mega programs, with a raised
    xla_tpu_scoped_vmem_limit_kib on TPU backends.

    The 2026-08-18 tunnel AOT compiler enforces a 16 MiB scoped-vmem
    budget on Mosaic kernel stack frames; the inline-sweep shade kernel's
    unrolled per-chunk temporaries exceed it on multi-chunk scenes (gem:
    26.3 MiB at 10 chunks -> "Ran out of memory in memory space vmem ...
    allocating on stack"). v5e has 128 MiB of physical VMEM; the budget is
    a compiler knob, not a hardware limit, so raise it for these programs
    only (PT_SCOPED_VMEM_KIB overrides; CPU/interpret builds must not see
    TPU-only options, hence the lazy backend check)."""
    def deco(fn):
        cache: dict = {}

        @functools.wraps(fn)
        def wrapper(*a, **k):
            jitted = cache.get("f")
            if jitted is None:
                opts = None
                try:
                    if jax.default_backend() != "cpu":
                        import os as _os
                        kib = _os.environ.get("PT_SCOPED_VMEM_KIB", "98304")
                        opts = {"xla_tpu_scoped_vmem_limit_kib": kib}
                except Exception:
                    opts = None
                jitted = jax.jit(fn, compiler_options=opts, **jit_kw)
                cache["f"] = jitted
            return jitted(*a, **k)

        # compiler_options is only legal on TOP-LEVEL jits: variants that
        # pack several kernels into one program (_mega_step_1prog,
        # _mega_step_multi) must inline the undecorated body instead.
        wrapper.raw = fn
        return wrapper

    return deco
SUB = TILE // 128  # sublane count of a [SUB, 128] full-tile op
C_LANES = 4  # HWSS lanes

SPEC_RES = 512

# ---- state rows [NS, N]
S_O, S_D = 0, 3
S_LAM, S_BETA, S_RAD = 6, 10, 14
S_ACC = 18
S_DONE, S_ALIVE, S_BOUNCE, S_PREV_PDF = 21, 22, 23, 24
S_PIX = 25  # owning pixel index (f32; lanes survive compaction permutations)
S_PDFR = 26  # C_LANES rows: spectral-MIS pdf-ratio products Π p_c/p_0 (lane0 ≡ 1)
# tracked-medium stack (medium-aware scenes; utils.rs:940-1005): 4 medium
# ids packed 2-per-row as id_even + 256·id_odd — ids are u8 so the packed
# value stays < 2^16, exact in f32. Zero rows = vacuum (non-medium scenes
# never touch them).
S_MSTK0, S_MSTK1 = 30, 31
NS = 32
assert S_PDFR + C_LANES <= S_MSTK0
# Megakernel scene-size ceiling. The dense sweeps loop homogeneous chunk
# runs (dense.sweep_rowgroup) and the prim record fetch blocks its one-hot
# (_prim_attr_fetch), so compute scales O(P) with flat compile time; at 8k
# prims the VMEM-resident tables are ~4.5 MB (dense [P,128] + prim [24,P]).
# Beyond this, scenes ride the XLA BVH wavefront.
# (Round-3 note: the "+50% bright arrangement" that held this at 1024 was a
# compound of MC seed noise on a caustic-heavy scene — XLA seeds swing 65%
# at the probe settings — and the near-delta GGX D-denominator collapse
# fixed in cmath/ggx; the sweep/fetch paths probe exact and the dispersive
# furnace is conserving through the full large-P kernel.)
MEGA_MAX_PRIMS = 8192

# ---- K2 output rows [NK2, N]
O_RAD = 0          # 4: path_rad after emission/env adds
O_AT_SURF = 4
O_ENV_CT = 5
O_SHADOW_CT = 6
O_FPDF = 7
O_SAMPLE_OK = 8
O_RATIO = 9        # 4
O_ONEW = 13        # 3
O_DNEW = 16        # 3
O_PSCALE = 19      # 4: per-lane pdf ratio p_c/p_0 at the sampled direction
O_SCAT = 23        # medium scatter event flag (medium-aware scenes only)
O_MEDW = 24        # 4: per-lane medium weight (free-flight w_exp / w_scat)
O_MSTK = 28        # 2: transitioned packed medium stack (utils.rs:940-1005)
O_NEE = 30         # per light sample: so(3) dir(3) tmax(1) worth(1) contrib(4) = 12


def _k2_rows(light_samples):
    return -(-(O_NEE + 12 * light_samples) // 8) * 8


# ---- K4 output rows: new state + counter indicators
O4_BOUNCE_CT = NS
O4_CAMERA_CT = NS + 1
NK4 = NS + 8


class MegaScene(NamedTuple):
    """Device tables + host constants for the megakernel (built once per
    (world, camera, settings) by build_mega_scene)."""

    prim_tab: jnp.ndarray   # f32[24, P_pad] row-major attr table (MXU fetch)
    dense_tab: jnp.ndarray  # dense.pack_prims transposed table for K1/K3
    mat_tab: jnp.ndarray    # f32[8, M_pad]
    light_tab: jnp.ndarray  # f32[16, L_pad]
    spec_tab: jnp.ndarray   # f32[C_pad, 512] rows m*5+{ηi,ηo,κ,refl,emit}, env last
    consts: dict            # host-side scalars baked into kernel closures
    env_args: object        # None (constant env) or (Environment, CurveBank,
                            # Textures) pytree for the XLA env feed (_env_feed)
    tex_args: object = None  # None (all 1x1 textures) or (Textures,
                            # CurveBank, mat2tex f32[128], uvtab f32[P,16])
                            # pytree for the XLA surface-texture feed
                            # (_tex_feed; reference src/texture.rs:204-276)
    med_args: object = None  # None (surface-only transport) or (Mediums,
                            # CurveBank, radius) pytree for the XLA medium
                            # feed (_med_feed; utils.rs:708-1103)
    fetch_tab: object = None  # None (small scenes: brute chunk sweep) or
                            # f32[11*32, n_chunks_pad128] attr-major chunk
                            # fetch table for the per-lane front-to-back
                            # traversal (dense.sweep_rowgroup_bvh1)


# prim_tab extra rows (0..10 are dense.py's)
_R_NA, _R_NB, _R_NC = 11, 14, 17
_R_MAT, _R_KIND, _R_AREA = 20, 21, 22
_NP_ROWS = 24

# mat_tab rows
_M_TYPE, _M_ALPHA, _M_METAL, _M_PERM, _M_SIDE, _M_SHARP, _M_RSCALE = range(7)
_M_TEXF = 7  # 1.0 where lambertian reflectance rides the XLA texture feed
_M_INNER, _M_OUTER = 8, 9  # medium ids (utils.rs:940-1005 transitions)
_NM_ROWS = 16

# light_tab rows
_L_PA, _L_PB, _L_PC = 0, 3, 6
_L_PTYPE, _L_AREA, _L_MAT, _L_MTYPE, _L_SIDE, _L_SHARP = 9, 10, 11, 12, 13, 14
_NL_ROWS = 16


def mega_available(world, camera, settings) -> bool:
    """Static scene/settings preconditions for the megakernel."""
    from pathtracer_tpu.camera.projective import ProjectiveCamera
    from pathtracer_tpu.world.environment import ENV_CONSTANT, ENV_HDR

    if not isinstance(camera, ProjectiveCamera):
        return False
    w = world
    if settings.medium_aware and int(w.mediums.count) > 16:
        # medium-aware transport rides the XLA medium feed (_med_feed);
        # per-medium σ/g LUT gathers scale with the medium count
        return False
    if w.accel2 is not None:
        return False
    if int(w.prims.xf_inv.shape[0]) != 1:
        return False
    if w.prims.count > MEGA_MAX_PRIMS:
        return False
    if int(w.mats.count) > 24:
        return False
    if int(w.n_lights) > 16:
        return False
    # surface textures: multi-texel/multi-layer textures are supported
    # when referenced via LAMBERTIAN reflectance (mats.tex_id) — their
    # per-hit eval rides the XLA texture feed (_tex_feed), never in-kernel
    # texel gathers. An HDR environment's equirect texture is likewise
    # exempt (_env_feed). Any OTHER texture must stay single-layer 1x1
    # (flat spectral color baked into mat/spec tables).
    t = w.tex
    lc = np.asarray(t.layer_count)
    lstart = np.asarray(t.layer_start)
    lw = np.asarray(t.layer_w)
    lh = np.asarray(t.layer_h)
    tex_ok = np.ones(lc.shape[0], bool)
    layer_ok = np.ones(lw.shape[0], bool)

    def _exempt(tid):
        tex_ok[tid] = False
        layer_ok[int(lstart[tid]):int(lstart[tid]) + int(lc[tid])] = False

    if int(w.env.kind) == ENV_HDR:
        _exempt(int(w.env.tex_id))
    mtype_h = np.asarray(w.mats.mtype)
    texid_h = np.asarray(w.mats.tex_id)
    for i in range(int(w.mats.count)):
        if mtype_h[i] == MAT_LAMBERTIAN and texid_h[i] >= 0:
            _exempt(int(texid_h[i]))
    if not (lc[tex_ok] == 1).all():
        return False
    if not ((lw[layer_ok] == 1).all() and (lh[layer_ok] == 1).all()):
        return False
    if int(w.bank.values.shape[1]) != SPEC_RES:
        return False
    return True


def build_mega_scene(world, camera, settings) -> MegaScene:
    """Host-side table bake. EVERY device array is fetched exactly once
    (np.asarray) and all packing happens in NumPy — on the axon tunnel each
    eager jnp op is its own 20-40 s remote compile, which made the first
    version of this bake look like a Mosaic hang."""
    from pathtracer_tpu.kernels.dense import chunk_type_presence

    w = world
    prims = w.prims
    p = prims.count
    p_pad = -(-p // 128) * 128
    h = {name: np.asarray(getattr(prims, name))
         for name in ("ptype", "valid", "pa", "pb", "pc", "na", "nb", "nc",
                      "material_id", "mat_kind", "area")}
    # sort prims by (type, morton): the sweep kernels compile per-chunk
    # intersection routines only for types PRESENT in a chunk
    # (dense._chunk_t), so the primary type key keeps chunks homogeneous;
    # the Morton secondary key packs each chunk spatially TIGHT, which is
    # what makes per-chunk AABBs selective (the round-3 zero-win chunk-AABB
    # measurement was on scanline/OBJ-order chunks whose boxes spanned the
    # scene). Prim ids are self-consistent within the megakernel (sweep ids
    # index the identically-permuted prim_tab); lights store values, not ids.
    cen = np.where((h["ptype"][:p] == 0)[:, None],
                   (h["pa"][:p] + h["pb"][:p] + h["pc"][:p]) / 3.0,
                   h["pa"][:p])  # PRIM_TRIANGLE=0: centroid; else pa=center
    lo_c = cen.min(axis=0)
    span_c = np.maximum(cen.max(axis=0) - lo_c, 1e-12)
    q = np.clip(((cen - lo_c) / span_c * 1023.0), 0, 1023).astype(np.uint64)

    def _spread(v):
        v = (v | (v << 16)) & np.uint64(0x030000FF)
        v = (v | (v << 8)) & np.uint64(0x0300F00F)
        v = (v | (v << 4)) & np.uint64(0x030C30C3)
        v = (v | (v << 2)) & np.uint64(0x09249249)
        return v

    morton = (_spread(q[:, 0]) | (_spread(q[:, 1]) << np.uint64(1))
              | (_spread(q[:, 2]) << np.uint64(2)))
    order = np.lexsort((morton, h["ptype"][:p]))
    inv_order = np.empty(p, np.int64)
    inv_order[order] = np.arange(p)
    h = {k: v[order] for k, v in h.items()}
    p_dense = -(-p // 32) * 32
    pt_d = np.zeros(p_dense, np.float32)
    vd_d = np.zeros(p_dense, np.float32)
    pt_d[:p] = h["ptype"]
    vd_d[:p] = h["valid"]
    ct8 = chunk_type_presence(pt_d, vd_d, 8)
    ct32 = chunk_type_presence(pt_d, vd_d, 32)
    tab = np.zeros((_NP_ROWS, p_pad), np.float32)
    tab[0, :p] = h["ptype"]
    tab[1, :p] = h["valid"]
    for i in range(3):
        tab[2 + i, :p] = h["pa"][:, i]
        tab[5 + i, :p] = h["pb"][:, i]
        tab[8 + i, :p] = h["pc"][:, i]
        tab[_R_NA + i, :p] = h["na"][:, i]
        tab[_R_NB + i, :p] = h["nb"][:, i]
        tab[_R_NC + i, :p] = h["nc"][:, i]
    tab[_R_MAT, :p] = h["material_id"]
    tab[_R_KIND, :p] = h["mat_kind"]
    tab[_R_AREA, :p] = h["area"]

    mats = w.mats
    m = int(mats.count)
    m_pad = 128
    hm = {name: np.asarray(getattr(mats, name))
          for name in ("mtype", "alpha", "metallic", "permeability",
                       "sidedness", "sharpness", "tex_id", "bounce_idx",
                       "eta_idx", "eta_o_idx", "kappa_idx", "emit_idx",
                       "inner_medium", "outer_medium")}
    mt = np.zeros((_NM_ROWS, m_pad), np.float32)
    mt[_M_TYPE, :m] = hm["mtype"]
    mt[_M_ALPHA, :m] = hm["alpha"]
    mt[_M_METAL, :m] = hm["metallic"].astype(np.float32)
    mt[_M_PERM, :m] = hm["permeability"]
    mt[_M_SIDE, :m] = hm["sidedness"]
    mt[_M_SHARP, :m] = hm["sharpness"]
    mt[_M_INNER, :m] = hm["inner_medium"]
    mt[_M_OUTER, :m] = hm["outer_medium"]
    # lambertian reflectance = tex layer weight x layer curve (1x1 textures);
    # light bounce colors use the bounce curve with weight 1
    tex = w.tex
    layer_curve = np.asarray(tex.layer_curve)
    layer_start = np.asarray(tex.layer_start)
    atlas = np.asarray(tex.atlas)
    layer_offset = np.asarray(tex.layer_offset)
    mtype = hm["mtype"]
    tex_id = np.maximum(hm["tex_id"], 0)
    layer_count = np.asarray(tex.layer_count)
    layer_w = np.asarray(tex.layer_w)
    layer_h = np.asarray(tex.layer_h)
    refl_curve = np.zeros(m, np.int64)
    refl_scale = np.ones(m, np.float32)
    texf = np.zeros(m, np.float32)
    for i in range(m):
        if mtype[i] == MAT_LAMBERTIAN:
            ti = int(tex_id[i])
            li = int(layer_start[ti])
            multi = (int(layer_count[ti]) > 1
                     or int(layer_w[li]) * int(layer_h[li]) > 1)
            if multi:
                # uv-dependent reflectance: evaluated per hit by the XLA
                # texture feed (_tex_feed); the in-kernel curve row is
                # masked out by _M_TEXF (kept = layer 0's curve for a
                # harmless value on never-selected lanes)
                texf[i] = 1.0
                refl_curve[i] = int(layer_curve[li])
                refl_scale[i] = 1.0
            else:
                refl_curve[i] = int(layer_curve[li])
                refl_scale[i] = float(atlas[int(layer_offset[li])])
        else:
            refl_curve[i] = int(hm["bounce_idx"][i])
    mt[_M_RSCALE, :m] = refl_scale
    mt[_M_TEXF, :m] = texf

    # spectral rows: per-material (eta_i, eta_o, kappa, refl, emit) + env
    bank_vals = np.asarray(w.bank.values)  # [K, 512]
    c_rows = 5 * m + 1
    c_pad = -(-c_rows // 8) * 8
    st = np.zeros((c_pad, SPEC_RES), np.float32)

    def curve(idx):
        return bank_vals[int(max(idx, 0))]

    eta_idx = hm["eta_idx"]
    eta_o_idx = hm["eta_o_idx"]
    kappa_idx = hm["kappa_idx"]
    emit_idx = hm["emit_idx"]
    for i in range(m):
        st[5 * i + 0] = curve(eta_idx[i])
        st[5 * i + 1] = curve(eta_o_idx[i])
        st[5 * i + 2] = curve(kappa_idx[i])
        st[5 * i + 3] = curve(refl_curve[i])
        st[5 * i + 4] = curve(emit_idx[i])
    st[5 * m] = curve(int(w.env.curve_idx)) * float(w.env.strength)

    # lights
    lights = np.asarray(w.lights)
    nl = int(w.n_lights)
    lt = np.zeros((_NL_ROWS, 128), np.float32)
    for l in range(nl):
        pid = int(inv_order[int(lights[l])])  # world ids are pre-sort
        for i in range(3):
            lt[_L_PA + i, l] = h["pa"][pid, i]
            lt[_L_PB + i, l] = h["pb"][pid, i]
            lt[_L_PC + i, l] = h["pc"][pid, i]
        lt[_L_PTYPE, l] = float(h["ptype"][pid])
        lt[_L_AREA, l] = float(h["area"][pid])
        mid = int(h["material_id"][pid])
        lt[_L_MAT, l] = mid
        lt[_L_MTYPE, l] = float(mtype[mid])
        lt[_L_SIDE, l] = float(hm["sidedness"][mid])
        lt[_L_SHARP, l] = float(hm["sharpness"][mid])

    rot_inv = np.asarray(w.env.rotation_inv, np.float32)
    rot_fwd = np.asarray(w.env.rotation, np.float32)
    p_env = float(np.clip(np.asarray(w.env_sampling_probability), 0.0, 1.0))
    if nl == 0:
        p_env = 1.0  # pt_regen.py:49 — no instance lights -> env-only NEE
    import os as _os_

    from pathtracer_tpu.world.environment import ENV_CONSTANT as _ENV_CONST

    env_kind = int(w.env.kind)
    consts = dict(
        env_kind=env_kind,
        spec_f32=bool(_os_.environ.get("PT_MEGA_SPEC_F32")),
        ct8=ct8,
        ct32=ct32,
        n_mats=m,
        n_lights=nl,
        p_env=p_env,
        # static per-scene specialization: archetypes absent from the
        # material table compile out of the kernel entirely
        has_ggx=bool((mtype == MAT_GGX).any()),
        # conductor-free scenes compile fresnel_conductor out of every
        # GGX eval (kappa gates `metallic` at construction, ggx.rs:205)
        has_metal=bool(hm["metallic"].any()),
        has_sharp=bool((mtype == MAT_SHARP_LIGHT).any()),
        env_rot=tuple(float(x) for x in rot_fwd.reshape(-1)),
        lam_lo=float(w.bank.lam_lo),
        lam_hi=float(w.bank.lam_hi),
        env_rot_inv=tuple(float(x) for x in rot_inv.reshape(-1)),
        cam_origin=tuple(float(x) for x in np.asarray(camera.origin)),
        cam_w=tuple(float(x) for x in np.asarray(camera.w)),
        cam_u=tuple(float(x) for x in np.asarray(camera.u)),
        cam_v=tuple(float(x) for x in np.asarray(camera.v)),
        cam_half_w=float(camera.half_width),
        cam_half_h=float(camera.half_height),
        cam_focal=float(camera.focal_distance),
        cam_lens_r=float(camera.lens_radius),
        cam_blades=int(camera.blades),
        cam_sharp=float(camera.blade_sharpness),
        tex_feed=bool(texf.any()),
        medium=bool(getattr(settings, "medium_aware", False)),
        radius=float(np.asarray(w.radius)),
    )
    tex_args = None
    if texf.any():
        # XLA surface-texture feed tables: per-lane uv needs the hit prim's
        # vertices/type (one packed row gather) and the hit material's
        # texture id (one [128] gather); the texture eval itself rides the
        # tested textures/texture.py machinery on w.tex
        uvtab = np.zeros((p_pad, 16), np.float32)
        uvtab[:p, 0:3] = h["pa"]
        uvtab[:p, 3:6] = h["pb"]
        uvtab[:p, 6:9] = h["pc"]
        uvtab[:p, 9] = h["ptype"]
        uvtab[:p, 10] = h["material_id"]
        mat2tex = np.zeros(128, np.float32)
        mat2tex[:m] = tex_id
        lut = _bake_tex_lut(
            w.bank, w.tex,
            sorted({int(tex_id[i]) for i in range(m) if texf[i]}))
        tex_args = (w.tex, w.bank, jnp.asarray(mat2tex), jnp.asarray(uvtab),
                    lut)
    dense_tab = pack_prims_np(h["ptype"], h["valid"], h["pa"], h["pb"], h["pc"])
    # per-lane front-to-back chunk traversal (dense.sweep_rowgroup_bvh1):
    # multi-chunk scenes append chunk-AABB rows + an attr-major fetch table
    # so each lane sweeps only the (Morton-tight) chunks its ray enters,
    # nearest-first — the in-megakernel answer to the reference's stackless
    # BVH walk (lbvh.rs:172-213). OPT-IN (PT_SWEEP_BVH1=<min chunks>):
    # bit-exact vs the brute sweep in interpret mode and on CPU, but the
    # in-kernel lax.while_loop is pathological on the axon tunnel — the gem
    # render measured 0.54 vs 8.42 Mrays/s baseline and the Mosaic compile
    # ran past 20 min (2026-08-20 A/B), echoing the round-3 "loop-wrapped
    # pipelines never finish compiling" rule at the in-kernel level.
    fetch_tab = None
    _bvh1_env = _os_.environ.get("PT_SWEEP_BVH1")
    if not _bvh1_env or _bvh1_env in ("0", "off"):
        bvh1_min = 1 << 30
    else:
        bvh1_min = max(int(_bvh1_env), 1)
    n_ch32 = dense_tab.shape[0] // 32
    if n_ch32 >= bvh1_min:
        from pathtracer_tpu.kernels.dense import (
            chunk_aabb_rows_np,
            fetch_tab_np,
        )

        consts["bvh1"] = True
        consts["bvh1_base"] = dense_tab.shape[0]
        consts["bvh1_present"] = tuple(
            bool(any(pr[i] for pr in ct32)) for i in range(4))
        fetch_tab = jnp.asarray(fetch_tab_np(dense_tab, 32))
        dense_tab = np.concatenate(
            [dense_tab, chunk_aabb_rows_np(dense_tab, 32, rows_mult=128)],
            axis=0)
    # chunk-AABB gate (PT_SWEEP_AABB=1, brute-sweep scenes only): append
    # per-32-prim-chunk AABB rows so the in-kernel sweeps can lax.cond-skip
    # whole prim blocks no ray in a row group can hit — a flat one-level
    # BVH evaluated with vector slab tests (no gathers). Sweep results are
    # bit-identical either way.
    elif _os_.environ.get("PT_SWEEP_AABB"):
        from pathtracer_tpu.kernels.dense import chunk_aabb_rows_np

        consts["aabb_base"] = dense_tab.shape[0]
        dense_tab = np.concatenate(
            [dense_tab, chunk_aabb_rows_np(dense_tab, 32)], axis=0)
    return MegaScene(
        prim_tab=jnp.asarray(tab),
        dense_tab=jnp.asarray(dense_tab),
        mat_tab=jnp.asarray(mt),
        light_tab=jnp.asarray(lt),
        spec_tab=jnp.asarray(st),
        consts=consts,
        # HDR/Sun envs: emission / pdf_for / sample_uv run in XLA inside the
        # same dispatched program (they depend only on state rows + the
        # bounce's uniforms) and are fed to the kernel as ef rows
        env_args=None if env_kind == _ENV_CONST else (
            w.env, w.bank, w.tex, _bake_env_lut(w.env, w.bank, w.tex)),
        tex_args=tex_args,
        med_args=(w.mediums, w.bank) if consts["medium"] else None,
        fetch_tab=fetch_tab,
    )


ENV_LUT_MAX_TEXELS = 16384  # full (texel, λ-knot) bake cap: 64 MB of pairs


def _bake_env_lut(env, bank, tex):
    """Pre-combine an HDR environment's layer weight maps and basis curves
    into one (texel, λ-knot) pair table so the per-round env feed costs ONE
    flat gather per emission eval instead of per-layer metadata + atlas +
    curve gathers (~12 evals/round × ~3 layers: the hdri bench config spent
    ~4× more time in env gathers than in the whole bounce kernel).

    Exact by construction: spectral.evaluate λ-lerps each layer curve and
    the layer sum commutes with the lerp, so lerping the pre-summed knots
    gives the same value (modulo f32 reassociation). Returns None (general
    slow path) for non-HDR envs and maps over ENV_LUT_MAX_TEXELS."""
    from pathtracer_tpu.world.environment import ENV_HDR

    try:
        if int(np.asarray(env.kind)) != int(ENV_HDR):
            return None
        tid = int(np.asarray(env.tex_id))
        start = int(np.asarray(tex.layer_start[tid]))
        count = int(np.asarray(tex.layer_count[tid]))
        w_ = int(np.asarray(tex.layer_w[start]))
        h_ = int(np.asarray(tex.layer_h[start]))
        if w_ * h_ > ENV_LUT_MAX_TEXELS or count < 1:
            return None
        res = bank.values.shape[1]
        E = np.zeros((h_ * w_, res), np.float32)
        atlas = np.asarray(tex.atlas)
        values = np.asarray(bank.values)
        for k in range(count):
            li = start + k
            off = int(np.asarray(tex.layer_offset[li]))
            ci = int(np.asarray(tex.layer_curve[li]))
            if (int(np.asarray(tex.layer_w[li])) != w_
                    or int(np.asarray(tex.layer_h[li])) != h_):
                return None
            E += atlas[off:off + h_ * w_, None] * values[ci][None, :]
        pairs = np.stack([E, np.concatenate([E[:, 1:], E[:, -1:]], axis=1)],
                         axis=-1).reshape(h_ * w_ * res, 2)
        return dict(pairs=jnp.asarray(pairs), w=w_, h=h_, res=res,
                    lam_lo=float(bank.lam_lo), lam_hi=float(bank.lam_hi))
    except Exception:
        return None


def _env_emission_lut(env, lut, d, lam):
    """HDR emission via the baked (texel, λ-knot) table: ONE flat gather.
    Matches env_emission's ENV_HDR branch (nearest texel, λ-lerp)."""
    from pathtracer_tpu.core import vecmath

    d_env = jnp.einsum("ij,...j->...i", env.rotation, d)
    u, v = vecmath.direction_to_uv(d_env)
    w_, h_, res = lut["w"], lut["h"], lut["res"]
    x = jnp.minimum((jnp.clip(u, 0.0, 1.0 - 1e-6) * w_).astype(jnp.int32),
                    w_ - 1)
    y = jnp.minimum((jnp.clip(v, 0.0, 1.0 - 1e-6) * h_).astype(jnp.int32),
                    h_ - 1)
    texel = y * w_ + x
    uu = (lam - lut["lam_lo"]) / (lut["lam_hi"] - lut["lam_lo"]) * (res - 1)
    uu = jnp.clip(uu, 0.0, res - 1 - 1e-4)
    i0 = uu.astype(jnp.int32)
    frac = uu - i0
    vp = lut["pairs"][texel * res + i0]  # [..., 2] single gather
    return env.strength * (vp[..., 0] * (1.0 - frac) + vp[..., 1] * frac)


TEX_LUT_MAX_TEXELS = 65536  # combined surface-texture bake cap (~256 MB)


def _bake_tex_lut(bank, tex, tex_ids):
    """_bake_env_lut applied to the SURFACE textures the feed evaluates:
    per texture t, E_t[texel, λ-knot] = Σ_layers weight_l(texel)·curve_l(knot)
    (exact — the layer sum commutes with spectral.evaluate's λ-lerp), all
    concatenated into one flat pair table with a per-texture (base, w, h)
    row. Each per-hit eval then costs ONE meta gather + ONE pair gather
    per hero λ, instead of eval_texture's per-layer metadata + atlas +
    curve gathers (the general multi-layer path runs the FULL layer loop
    for every lane — measured 3.4 vs ~100 Mrays/s at 1080p).

    Returns None (general eval_texture path) when a texture's layers have
    mismatched dims or the combined bake exceeds TEX_LUT_MAX_TEXELS."""
    try:
        layer_start = np.asarray(tex.layer_start)
        layer_count = np.asarray(tex.layer_count)
        layer_w = np.asarray(tex.layer_w)
        layer_h = np.asarray(tex.layer_h)
        layer_curve = np.asarray(tex.layer_curve)
        layer_offset = np.asarray(tex.layer_offset)
        atlas = np.asarray(tex.atlas)
        values = np.asarray(bank.values)
        res = values.shape[1]
        total = 0
        for t in tex_ids:
            s = int(layer_start[t])
            if int(layer_count[t]) < 1:
                return None
            w_, h_ = int(layer_w[s]), int(layer_h[s])
            for k in range(int(layer_count[t])):
                if (int(layer_w[s + k]) != w_ or int(layer_h[s + k]) != h_):
                    return None
            total += w_ * h_
        if total > TEX_LUT_MAX_TEXELS:
            return None
        segs = []
        meta = np.zeros((128, 4), np.int32)
        base = 0
        for t in tex_ids:
            s = int(layer_start[t])
            w_, h_ = int(layer_w[s]), int(layer_h[s])
            E = np.zeros((h_ * w_, res), np.float32)
            for k in range(int(layer_count[t])):
                li = s + k
                off = int(layer_offset[li])
                E += (atlas[off:off + h_ * w_, None]
                      * values[int(layer_curve[li])][None, :])
            segs.append(
                np.stack([E, np.concatenate([E[:, 1:], E[:, -1:]], axis=1)],
                         axis=-1).reshape(h_ * w_ * res, 2))
            meta[t] = (base, w_, h_, 0)
            base += h_ * w_ * res
        return dict(pairs=jnp.asarray(np.concatenate(segs, axis=0)),
                    meta=jnp.asarray(meta), res=res,
                    lam_lo=float(bank.lam_lo), lam_hi=float(bank.lam_hi))
    except Exception:
        return None


# ------------------------------------------------------------------ helpers


def _tile(x):
    """[TILE] -> [SUB, 128]."""
    return x.reshape(SUB, 128)


def _flatrow(x):
    """[SUB, 128] -> [TILE]."""
    return x.reshape(TILE)


def _n_u_rows(light_samples, medium=False):
    """K2's uniform rows: 3 per NEE sample + 3 (bsdf sample) + 4 medium
    rows (free-flight, scatterer pick, phase u1/u2) when medium-aware,
    padded to a sublane multiple. Drawn with jax.random INSIDE each
    kernel-call's jit (threefry + one pallas call per program compiles fine
    on the tunnel; the Mosaic in-kernel PRNG returns int32 bits and the CPU
    interpreter stubs it to zeros, so host-fed uniforms stay the portable
    choice)."""
    return -(-(3 * light_samples + 3 + (4 if medium else 0)) // 8) * 8


NU4 = 8  # K4's uniform rows: 1 (RR) + 5 (respawn), padded


def _ef_rows(light_samples, c_lanes):
    """Env-feed rows (HDR/Sun envs only): C escape-emission rows + 1
    escape-pdf row, then per NEE sample dir(3) + pdf(1) + C emission rows;
    sublane-padded."""
    return -(-((c_lanes + 1) + light_samples * (4 + c_lanes)) // 8) * 8


def _env_feed(env_args, state, u, light_samples, c_lanes):
    """XLA-side environment feed for non-constant envs.

    Everything the kernel needs from an HDR/Sun environment is computable
    OUTSIDE the pallas call, inside the same dispatched program: the escape
    emission/pdf depend only on the lane's current ray direction (state
    rows S_D — the sweep never changes d), and the NEE env sample depends
    only on this bounce's uniform rows. So the tested XLA environment
    module (world/environment.py: env_emission / env_pdf_for /
    env_sample_uv — equirect texel atlas, 2-level importance-map inverse
    transform, sun cap) produces per-lane rows the kernel just reads —
    estimator-identical to the XLA wavefront by construction, and no
    in-kernel texel gathers (which don't lower under Mosaic anyway).
    """
    from pathtracer_tpu.world.environment import (
        env_emission,
        env_pdf_for,
        env_sample_uv,
    )

    env, bank, tex, lut = env_args
    if lut is not None:
        emit = lambda dd, ll: _env_emission_lut(env, lut, dd, ll)
    else:
        emit = lambda dd, ll: env_emission(env, bank, tex, dd, ll)
    n_pad = state.shape[1]
    d = state[S_D:S_D + 3].T  # [n, 3]
    lam = [state[S_LAM + ci] for ci in range(c_lanes)]
    rows = [emit(d, lam[ci]) for ci in range(c_lanes)]
    rows.append(env_pdf_for(env, d))
    for si in range(light_samples):
        nd, npdf = env_sample_uv(env, u[3 * si + 1], u[3 * si + 2])
        rows += [nd[:, 0], nd[:, 1], nd[:, 2], npdf]
        rows += [emit(nd, lam[ci]) for ci in range(c_lanes)]
    ef = jnp.stack(rows).astype(jnp.float32)
    pad = _ef_rows(light_samples, c_lanes) - ef.shape[0]
    if pad:
        ef = jnp.concatenate([ef, jnp.zeros((pad, n_pad), jnp.float32)])
    return ef


def _tf_rows(c_lanes):
    """Texture-feed rows: C per-lane reflectance values, sublane-padded."""
    return -(-c_lanes // 8) * 8


def _tex_feed(tex_args, state, tp, c_lanes):
    """XLA-side surface-texture feed (the _env_feed pattern applied to
    uv-dependent lambertian reflectance, reference src/texture.rs:204-276):
    given the K1 sweep's hit rows (t, prim id), compute each lane's hit
    point, its uv by prim type (the geometry/soa.py formulas; identity
    transforms only — the mega gate requires them), the hit material's
    texture id, and eval the full layer-stack texture at the lane's C hero
    wavelengths via the tested textures/texture.py machinery. Runs OUTSIDE
    the pallas calls in the same dispatched program; the shade kernel
    selects fed rows only for _M_TEXF materials, so untextured scenes and
    materials are bitwise unaffected."""
    from pathtracer_tpu.textures.texture import eval_texture

    tex, bank, mat2tex, uvtab, lut = tex_args
    t = tp[0]
    pid = tp[1]
    hit = pid >= 0.0
    rows = jnp.take(uvtab, jnp.maximum(pid, 0.0).astype(jnp.int32), axis=0)
    pa, pb, pc = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9]
    ptype = rows[:, 9]
    mat_id = rows[:, 10].astype(jnp.int32)
    o = state[S_O:S_O + 3].T
    d = state[S_D:S_D + 3].T
    p = o + t[:, None] * d
    # triangle barycentrics (geometry/soa.py:330-341)
    e1, e2 = pb - pa, pc - pa
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12,
                        1.0 / jnp.where(det != 0.0, det, 1.0), 0.0)
    tvec = o - pa
    bu = jnp.sum(tvec * pvec, axis=-1) * inv_det
    bv = jnp.sum(d * jnp.cross(tvec, e1), axis=-1) * inv_det
    tri_uv = jnp.stack([bu, bv], axis=-1)
    # sphere equirect uv (soa.py:344-348)
    rel_s = p - pa
    sph_n = rel_s / jnp.maximum(
        jnp.linalg.norm(rel_s, axis=-1, keepdims=True), 1e-20)
    sph_u = (jnp.arctan2(sph_n[:, 1], sph_n[:, 0]) / (2 * jnp.pi)) % 1.0
    sph_v = jnp.arccos(jnp.clip(sph_n[:, 2], -1.0, 1.0)) / jnp.pi
    sph_uv = jnp.stack([sph_u, sph_v], axis=-1)
    # rect parametric uv (soa.py:351-358); disks keep uv (0,0) like the
    # reference's TODO (src/geometry/disk.rs)
    rel = p - pa
    rect_uv = jnp.stack(
        [0.5 * (jnp.sum(rel * pb, axis=-1)
                / jnp.maximum(jnp.sum(pb * pb, axis=-1), 1e-20) + 1.0),
         0.5 * (jnp.sum(rel * pc, axis=-1)
                / jnp.maximum(jnp.sum(pc * pc, axis=-1), 1e-20) + 1.0)],
        axis=-1)
    is_tri = (ptype == PRIM_TRIANGLE)[:, None]
    is_sph = (ptype == PRIM_SPHERE)[:, None]
    is_rec = (ptype == PRIM_RECT)[:, None]
    uv = jnp.where(is_tri, tri_uv,
                   jnp.where(is_sph, sph_uv,
                             jnp.where(is_rec, rect_uv,
                                       jnp.zeros_like(rect_uv))))
    tid = jnp.take(mat2tex, mat_id).astype(jnp.int32)
    if lut is not None:
        # baked path: one meta gather + one pair gather per hero λ
        mrow = jnp.take(lut["meta"], tid, axis=0)  # [n, 4] int32
        tw = mrow[:, 1].astype(jnp.float32)
        th = mrow[:, 2].astype(jnp.float32)
        x = jnp.minimum((jnp.clip(uv[:, 0], 0.0, 1.0 - 1e-6) * tw)
                        .astype(jnp.int32), mrow[:, 1] - 1)
        y = jnp.minimum((jnp.clip(uv[:, 1], 0.0, 1.0 - 1e-6) * th)
                        .astype(jnp.int32), mrow[:, 2] - 1)
        res = lut["res"]
        texel = mrow[:, 0] + (y * mrow[:, 1] + x) * res

        def tex_eval(_tid, lam, _uv):
            uu = jnp.clip((lam - lut["lam_lo"])
                          / (lut["lam_hi"] - lut["lam_lo"]) * (res - 1),
                          0.0, res - 1 - 1e-4)
            i0 = uu.astype(jnp.int32)
            frac = uu - i0
            vp = lut["pairs"][texel + i0]  # [n, 2] single gather
            return vp[:, 0] * (1.0 - frac) + vp[:, 1] * frac
    else:
        def tex_eval(tid_, lam, uv_):
            return eval_texture(tex, bank, tid_, lam, uv_)
    out = [jnp.where(hit, tex_eval(tid, state[S_LAM + ci], uv), 0.0)
           for ci in range(c_lanes)]
    tf = jnp.stack(out).astype(jnp.float32)
    pad = _tf_rows(c_lanes) - tf.shape[0]
    if pad:
        tf = jnp.concatenate(
            [tf, jnp.zeros((pad, tf.shape[1]), jnp.float32)])
    return tf


# ---- medium feed rows (medium-aware scenes; _env_feed pattern applied to
# the tracked-medium free flight of utils.rs:708-805)
def _mf_idx(C):
    """Row offsets into the medium-feed block for c_lanes == C."""
    i = {}
    i["flight"] = 0        # sampled free-flight distance (hero σs; vacuum→3e38)
    i["sigt"] = 1          # C rows: Σ σ_t over the tracked stack, per hero λ
    i["sigs"] = 1 + C      # C rows: Σ σ_s
    i["ssh"] = 1 + 2 * C   # hero Σ σ_s (flight rate)
    i["wo"] = i["ssh"] + 1     # 3 rows: phase-sampled continuation direction
    i["phpdf"] = i["wo"] + 3   # hero phase pdf at the sampled direction
    i["phs"] = i["phpdf"] + 1  # C rows: companion/hero phase ratio (lane0=1)
    i["g"] = i["phs"] + C      # C rows: scatterer's HG g per hero λ
    i["isray"] = i["g"] + C    # scatterer is Rayleigh (phase eval branch)
    i["inmed"] = i["isray"] + 1  # any tracked medium nonzero
    i["n"] = i["inmed"] + 1
    return i


def _mf_rows(c_lanes):
    return -(-_mf_idx(c_lanes)["n"] // 8) * 8


def _unpack_stack_rows(r0, r1):
    """4 medium ids from the two packed state rows (id_even + 256·id_odd)."""
    s0 = jnp.floor(r0 + 0.5) % 256.0
    s1 = jnp.floor((r0 + 0.5) / 256.0)
    s2 = jnp.floor(r1 + 0.5) % 256.0
    s3 = jnp.floor((r1 + 0.5) / 256.0)
    return [s0, s1, s2, s3]


def _med_feed(med_args, state, u, light_samples, c_lanes):
    """XLA-side medium feed for medium-aware scenes.

    Everything the kernels need from the tracked-medium stack is computable
    OUTSIDE the pallas calls, inside the same dispatched program: the
    free-flight distance, combined σ coefficients, the σ-share scatterer
    pick, and the phase-sampled continuation direction depend only on state
    rows (packed stack S_MSTK*, λ lanes, ray direction) and this bounce's
    uniform rows — none of which the K1 sweep changes. So the tested XLA
    medium module (mediums/tables.py: medium_coefficients / phase_sample /
    phase_eval — HG + Rayleigh, utils.rs:708-805) produces per-lane rows and
    the kernels handle only what needs the hit distance: the scatter-vs-
    surface classification, Beer–Lambert weights (exp lowers under Mosaic),
    and the closed-form NEE phase eval toward the in-kernel NEE direction
    (HG/Rayleigh from the fed g rows)."""
    from pathtracer_tpu.mediums.tables import (
        MED_RAYLEIGH,
        medium_coefficients,
        phase_eval,
        phase_sample,
    )

    meds, bank = med_args
    n_pad = state.shape[1]
    C = c_lanes
    lam_nc = state[S_LAM:S_LAM + C].T          # [n, C]
    lam_f = lam_nc.reshape(-1)
    d = state[S_D:S_D + 3].T                   # [n, 3]

    def rep(x):
        return jnp.repeat(x, C, axis=0)

    def lanes(x):
        return x.reshape(n_pad, C)

    stack = [s.astype(jnp.int32)
             for s in _unpack_stack_rows(state[S_MSTK0], state[S_MSTK1])]
    sigma_s = jnp.zeros((n_pad, C))
    sigma_a = jnp.zeros((n_pad, C))
    ss_hero_slots = []
    for k in range(4):
        ss_k, sa_k, _ = [
            lanes(x) for x in medium_coefficients(meds, bank, rep(stack[k]),
                                                  lam_f)
        ]
        sigma_s = sigma_s + ss_k
        sigma_a = sigma_a + sa_k
        ss_hero_slots.append(ss_k[:, 0])
    sigma_t = sigma_s + sigma_a
    ss_hero = sigma_s[:, 0]
    base = 3 * light_samples + 3
    u_flight, u_pick, u_ph1, u_ph2 = (u[base], u[base + 1], u[base + 2],
                                      u[base + 3])
    # hero free flight (utils.rs:767-789 per-medium race == one combined
    # exponential with rate Σσs + σ-share categorical pick); vacuum → no
    # scatter (a huge finite stand-in for inf keeps the f32 rows clean)
    flight = jnp.where(
        ss_hero > 1e-12,
        -jnp.log(jnp.maximum(1.0 - u_flight, 1e-12))
        / jnp.maximum(ss_hero, 1e-12),
        3e38,
    )
    ss_slots = jnp.stack(ss_hero_slots, axis=-1)  # [n, 4]
    cum = jnp.cumsum(ss_slots, axis=-1)
    pick = u_pick * jnp.maximum(ss_hero, 1e-20)
    slot = jnp.sum((cum < pick[:, None]).astype(jnp.int32), axis=-1)
    slot = jnp.minimum(slot, 3)
    stack_m = jnp.stack(stack, axis=-1)
    scat_med = jnp.take_along_axis(stack_m, slot[:, None], axis=-1)[:, 0]
    in_med = jnp.any(stack_m != 0, axis=-1)
    # phase sampling at the (potential) scatter event (pt_regen.py:286-303)
    wo_med, ph_pdf = phase_sample(meds, bank, scat_med, lam_nc[:, 0], d,
                                  u_ph1, u_ph2)
    ph_lanes = lanes(phase_eval(
        meds, bank, rep(scat_med), lam_f,
        rep(jnp.sum(d * wo_med, axis=-1))))
    ph0 = ph_lanes[:, :1]
    ph_scale = jnp.where(ph0 > 0.0, ph_lanes / jnp.where(ph0 > 0.0, ph0, 1.0),
                         0.0)
    ph_scale = jnp.concatenate([jnp.ones((n_pad, 1)), ph_scale[:, 1:]], 1)
    # scatterer's spectral phase parameters for the in-kernel NEE phase eval
    from pathtracer_tpu.core import spectral

    g_lanes = lanes(spectral.evaluate(bank, meds.g_idx[rep(scat_med)], lam_f))
    is_ray = (meds.mtype[scat_med] == MED_RAYLEIGH)
    g_lanes = jnp.where(is_ray[:, None], 0.0, g_lanes)
    rows = [flight]
    rows += [sigma_t[:, ci] for ci in range(C)]
    rows += [sigma_s[:, ci] for ci in range(C)]
    rows += [ss_hero, wo_med[:, 0], wo_med[:, 1], wo_med[:, 2], ph_pdf]
    rows += [ph_scale[:, ci] for ci in range(C)]
    rows += [g_lanes[:, ci] for ci in range(C)]
    rows += [is_ray.astype(jnp.float32), in_med.astype(jnp.float32)]
    mf = jnp.stack(rows).astype(jnp.float32)
    pad = _mf_rows(C) - mf.shape[0]
    if pad:
        mf = jnp.concatenate([mf, jnp.zeros((pad, n_pad), jnp.float32)])
    return mf


def _sel_rows(mat_prod, ids, rows, n, stride=1, base=0):
    """mat_prod: [R, TILE] matmul result; ids: [SUB,128] integer selector in
    [0, n); returns the per-lane value of row (base + stride*id + rows)."""
    acc = jnp.zeros((SUB, 128), jnp.float32)
    for i in range(n):
        acc = acc + jnp.where(ids == i, _tile(mat_prod[base + stride * i + rows, :]), 0.0)
    return acc


def _mat_param(mat, row, mat_id, n_mats):
    """Select mat[row, mat_id] by an M-loop of where-masks. `mat` is the
    MATERIALIZED [8, 128] table value (read once per kernel) — per-scalar
    VMEM loads at arbitrary lane offsets are not Mosaic-safe."""
    acc = jnp.zeros((SUB, 128), jnp.float32)
    for i in range(n_mats):
        acc = acc + jnp.where(mat_id == i, mat[row, i], 0.0)
    return acc


def _balance(a, b):
    s = a + b
    return jnp.where(s > 0.0, a / jnp.where(s > 0.0, s, 1.0), 1.0)


def _emission_value(spd, mtype, side, sharp, cos_theta, has_sharp=True):
    """materials/diffuse_light.py + sharp_light.py (already elementwise);
    has_sharp is a static scene property."""
    fwd = (cos_theta > 0.0).astype(jnp.float32)
    rev = (cos_theta < 0.0).astype(jnp.float32)
    dual = (cos_theta != 0.0).astype(jnp.float32)
    gate = jnp.where(side == 2, dual, jnp.where(side == 0, fwd, rev))
    e_diff = spd / jnp.pi * gate
    if has_sharp:
        n = sharp
        e_sharp = spd * (n + 1.0) * jnp.abs(cos_theta) ** n / (2.0 * jnp.pi) * gate
        e = jnp.where(mtype == MAT_SHARP_LIGHT, e_sharp, e_diff)
    else:
        e = e_diff
    is_light = (mtype == MAT_DIFFUSE_LIGHT) | (mtype == MAT_SHARP_LIGHT)
    return jnp.where(is_light, e, 0.0)


def _cie_xyz(lam):
    from pathtracer_tpu.core import cie

    return cie.x_bar(lam), cie.y_bar(lam), cie.z_bar(lam)


KNOT_CHUNK = 128


def _spectral_fetch(spec, lam, lam_lo, lam_hi, prec):
    """[SUB,128] λ -> [C_pad, TILE]: every curve row evaluated at each
    lane's λ (spectral.evaluate semantics: u clipped to [0, RES-1-1e-4],
    linear between knots) via lerp-weight soft-one-hot MXU matmuls.

    Knot-CHUNKED ([KNOT_CHUNK, TILE] weight tiles accumulated over 4
    chunks instead of one [512, TILE] block) so HWSS's four λ lanes fit
    Mosaic's 16 MB scoped-VMEM budget; identical products, f32 sums."""
    u = (lam - lam_lo) / (lam_hi - lam_lo) * (SPEC_RES - 1)
    u = jnp.clip(u, 0.0, SPEC_RES - 1 - 1e-4)
    i0 = jnp.floor(u)
    frac = u - i0
    i0_row = _flatrow(i0)[None, :]
    frac_row = _flatrow(frac)[None, :]
    R = None
    for k0 in range(0, SPEC_RES, KNOT_CHUNK):
        knots = (jax.lax.broadcasted_iota(jnp.int32, (KNOT_CHUNK, TILE), 0)
                 .astype(jnp.float32) + float(k0))
        soft = jnp.where(knots == i0_row, 1.0 - frac_row,
                         jnp.where(knots == i0_row + 1.0, frac_row, 0.0))
        part = jax.lax.dot_general(
            spec[:, k0:k0 + KNOT_CHUNK], soft, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        R = part if R is None else R + part
    return R


def _bsdf_eval_lanes(mtype, alpha, metallic, perm, eta_i, eta_o, kappa,
                     refl, wi, wo, mode, has_ggx=True, has_metal=True):
    """materials/tables.bsdf_eval for C spectral lanes sharing (wi, wo):
    the λ-independent GGX geometry is computed once (cmath.eval_ggx_lanes).
    has_ggx/has_metal are STATIC scene properties — GGX-free scenes compile
    the whole microfacet stack out, conductor-free scenes compile out
    fresnel_conductor. eta_i/eta_o/kappa/refl are per-lane lists; returns
    ([f], [pdf])."""
    C = len(refl)
    if has_ggx:
        a = jnp.maximum(alpha, 1e-4)
        lanes = [(jnp.maximum(eta_i[ci], 1e-3), jnp.maximum(eta_o[ci], 1e-3),
                  kappa[ci]) for ci in range(C)]
        ggx = cmath.eval_ggx_lanes(a, metallic > 0.5, perm, wi, wo, mode,
                                   lanes, has_metal=has_metal)
        is_ggx = mtype == MAT_GGX
    dead = mtype == 4  # passthrough
    fs, pdfs = [], []
    for ci in range(C):
        f_lam, pdf_lam = cmath.eval_lambertian(refl[ci], wi, wo)
        if has_ggx:
            f = jnp.where(is_ggx, ggx[ci][0], f_lam)
            pdf = jnp.where(is_ggx, ggx[ci][1], pdf_lam)
        else:
            f, pdf = f_lam, pdf_lam
        fs.append(jnp.where(dead, 0.0, f))
        pdfs.append(jnp.where(dead, 0.0, pdf))
    return fs, pdfs


def _bsdf_eval_lane(mtype, alpha, metallic, perm, eta_i, eta_o, kappa, refl,
                    wi, wo, mode, has_ggx=True, has_metal=True):
    """Single-lane wrapper over _bsdf_eval_lanes."""
    fs, pdfs = _bsdf_eval_lanes(mtype, alpha, metallic, perm, [eta_i],
                                [eta_o], [kappa], [refl], wi, wo, mode,
                                has_ggx=has_ggx, has_metal=has_metal)
    return fs[0], pdfs[0]


def _sample_surface_light(lp_type, pa, pb, pc, u1, u2):
    """geometry/soa.sample_surface componentwise (identity transforms)."""
    su = jnp.sqrt(u1)
    w0 = 1.0 - su
    w1 = su * (1.0 - u2)
    w2 = su * u2
    tri_p = pa.scale(w0) + pb.scale(w1) + pc.scale(w2)
    tri_n = cmath.normalize(cmath.cross(pb - pa, pc - pa))
    z = 1.0 - 2.0 * u1
    r_xy = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u2
    sph_n = V3(r_xy * jnp.cos(phi), r_xy * jnp.sin(phi), z)
    sph_p = pa + sph_n.scale(pb.x)
    rec_p = pa + pb.scale(2.0 * u1 - 1.0) + pc.scale(2.0 * u2 - 1.0)
    rec_n = cmath.normalize(cmath.cross(pb, pc))
    rr = jnp.sqrt(u1) * pc.x
    t_ax, b_ax = cmath.orthonormal_basis(pb)
    dsk_p = pa + t_ax.scale(rr * jnp.cos(phi)) + b_ax.scale(rr * jnp.sin(phi))
    dsk_n = pb
    is_tri = lp_type == PRIM_TRIANGLE
    is_sph = lp_type == PRIM_SPHERE
    is_rec = lp_type == PRIM_RECT
    p = cmath.where(is_tri, tri_p,
                    cmath.where(is_sph, sph_p, cmath.where(is_rec, rec_p, dsk_p)))
    nrm = cmath.where(is_tri, tri_n,
                      cmath.where(is_sph, sph_n, cmath.where(is_rec, rec_n, dsk_n)))
    return p, nrm


def _hit_attributes(attr, o, d, t):
    """_fill_attributes componentwise for identity transforms: shading
    normal, geo normal (uv elided — megakernel scenes are 1x1-textured and
    the disk uv is (0,0) anyway). attr: [24, TILE] matmul product."""
    a = lambda i: _tile(attr[i, :])
    pa = V3(a(2), a(3), a(4))
    pb = V3(a(5), a(6), a(7))
    pc = V3(a(8), a(9), a(10))
    na = V3(a(_R_NA), a(_R_NA + 1), a(_R_NA + 2))
    nb = V3(a(_R_NB), a(_R_NB + 1), a(_R_NB + 2))
    nc = V3(a(_R_NC), a(_R_NC + 1), a(_R_NC + 2))
    ptype = a(0)
    point = o + d.scale(t)
    e1 = pb - pa
    e2 = pc - pa
    tri_gn = cmath.normalize(cmath.cross(e1, e2))
    pvec = cmath.cross(d, e2)
    det = cmath.dot(e1, pvec)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / jnp.where(det != 0, det, 1.0), 0.0)
    tvec = o - pa
    bu = cmath.dot(tvec, pvec) * inv_det
    bv = cmath.dot(d, cmath.cross(tvec, e1)) * inv_det
    tri_sn = cmath.normalize(na.scale(1.0 - bu - bv) + nb.scale(bu) + nc.scale(bv))
    sph_n = cmath.normalize(point - pa)
    rect_n = cmath.normalize(cmath.cross(pb, pc))
    disk_n = pb
    is_tri = ptype == PRIM_TRIANGLE
    is_sph = ptype == PRIM_SPHERE
    is_rec = ptype == PRIM_RECT
    normal = cmath.where(is_tri, tri_sn,
                         cmath.where(is_sph, sph_n,
                                     cmath.where(is_rec, rect_n, disk_n)))
    gn = cmath.where(is_tri, tri_gn,
                     cmath.where(is_sph, sph_n,
                                 cmath.where(is_rec, rect_n, disk_n)))
    mat_id = a(_R_MAT)
    kind = a(_R_KIND)
    area = a(_R_AREA)
    return point, normal, gn, mat_id, kind, area


# ----------------------------------------------------------------- kernel K2


def _tile_alive(state_ref):
    """Scalar any-lane-alive predicate for the dead-tile skip: S_ALIVE=0
    lanes are PERMANENTLY finished (K4 respawns within the same program, so
    a lane with remaining spp never shows 0 between rounds) and an all-dead
    grid tile computes a bit-exact no-op — skipping its body is free
    throughput across the occupancy drain tail (gem: 96 rounds of which
    ~60 run under 10% occupancy)."""
    return jnp.any(state_ref[S_ALIVE, :] > 0.5)


def _skip_dead():
    import os as _os

    return not _os.environ.get("PT_MEGA_NO_SKIP_DEAD")


def _shade_kernel(consts, settings,
                  u_ref, state_ref, tp_ref, prim_ref, mat_ref, light_ref,
                  spec_ref, *rest):
    rest = list(rest)
    out_ref = rest.pop()
    ef_ref = rest.pop(0) if consts.get("env_kind", 0) != 0 else None
    tf_ref = rest.pop(0) if consts.get("tex_feed") else None
    mf_ref = rest.pop(0) if consts.get("medium") else None

    def run():
        _shade_body(consts, settings, u_ref, state_ref, prim_ref, mat_ref,
                    light_ref, spec_ref, out_ref,
                    t_hit=_tile(tp_ref[0, :]), pid=_tile(tp_ref[1, :]),
                    ef_ref=ef_ref, tf_ref=tf_ref, mf_ref=mf_ref)

    if not _skip_dead():
        return run()
    alive_any = _tile_alive(state_ref)
    pl.when(alive_any)(run)

    @pl.when(jnp.logical_not(alive_any))
    def _():
        # dead tiles must still write defined K2 rows: the counter rows
        # (O_SHADOW_CT/O_ENV_CT) are summed over EVERY lane outside the
        # kernel, and the computed body writes exactly 0 for dead lanes
        for r in range(out_ref.shape[0]):
            out_ref[r, :] = jnp.zeros((TILE,), jnp.float32)


def _shade_sweep_kernel(consts, settings, u_ref, state_ref, dense_ref,
                        prim_ref, mat_ref, light_ref, spec_ref, *rest):
    """K1+K2 fused: the closest-hit sweep runs INLINE (dense-table chunks
    in VMEM, _sweep_tiles) and feeds straight into the shade body — with
    the K3xls+K4 fusion this makes the bounce round exactly TWO dispatched
    programs on a tunnel whose per-program dispatch latency exceeds each
    kernel's device compute at 1080p."""
    rest = list(rest)
    out_ref = rest.pop()
    ftab_ref = rest.pop(0) if consts.get("bvh1") else None
    ef_ref = rest.pop(0) if consts.get("env_kind", 0) != 0 else None
    mf_ref = rest.pop(0) if consts.get("medium") else None

    def run():
        s = lambda i: _tile(state_ref[i, :])
        o = V3(s(S_O), s(S_O + 1), s(S_O + 2))
        d = V3(s(S_D), s(S_D + 1), s(S_D + 2))
        t_hit, pid = _sweep_tiles(dense_ref, o, d, None, closest=True,
                                  present_list=consts.get("ct32"),
                                  aabb_base=consts.get("aabb_base"),
                                  ftab_ref=ftab_ref,
                                  bvh1_base=consts.get("bvh1_base"),
                                  bvh1_present=consts.get("bvh1_present"))
        _shade_body(consts, settings, u_ref, state_ref, prim_ref, mat_ref,
                    light_ref, spec_ref, out_ref, t_hit=t_hit, pid=pid,
                    ef_ref=ef_ref, mf_ref=mf_ref)

    if not _skip_dead():
        return run()
    alive_any = _tile_alive(state_ref)
    pl.when(alive_any)(run)

    @pl.when(jnp.logical_not(alive_any))
    def _():
        for r in range(out_ref.shape[0]):
            out_ref[r, :] = jnp.zeros((TILE,), jnp.float32)


_ONEHOT_MAX = 1024   # single-matmul prim fetch up to here (programs for
                     # cornell/gem-sized scenes stay byte-identical)
_FETCH_BLOCK = 128   # lanes per fetch block past it (lane slices: 128-mult)


def _prim_attr_fetch(prim_ref, pid_c):
    """Hit-prim record fetch: [24, P] @ onehot[P, TILE] on the MXU.

    Past _ONEHOT_MAX prims the one-hot intermediate would blow scoped VMEM
    ([P, TILE] f32 is 59 MB at 7.3k prims — the flattened-arrangement
    scale), so large tables accumulate over 128-lane blocks in a fori_loop:
    identical total MXU flops and bit-identical output (exactly one block
    matches each lane's pid; the rest add zero), but the live intermediate
    is [_FETCH_BLOCK, TILE]."""
    p_pad = prim_ref.shape[1]
    pid_row = _flatrow(pid_c)[None, :]
    if p_pad <= _ONEHOT_MAX:
        onehot_p = (jax.lax.broadcasted_iota(jnp.int32, (p_pad, TILE), 0)
                    .astype(jnp.float32) == pid_row).astype(jnp.float32)
        return jax.lax.dot_general(
            prim_ref[:, :], onehot_p, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    def body(i, acc):
        base = i * _FETCH_BLOCK
        blk = prim_ref[:, pl.ds(base, _FETCH_BLOCK)]
        ids = (jax.lax.broadcasted_iota(jnp.int32, (_FETCH_BLOCK, TILE), 0)
               + base).astype(jnp.float32)
        onehot = (ids == pid_row).astype(jnp.float32)
        return acc + jax.lax.dot_general(
            blk, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    acc0 = jnp.zeros((prim_ref.shape[0], TILE), jnp.float32)
    return jax.lax.fori_loop(0, p_pad // _FETCH_BLOCK, body, acc0)


def _shade_body(consts, settings, u_ref, state_ref, prim_ref, mat_ref,
                light_ref, spec_ref, out_ref, t_hit, pid, ef_ref=None,
                tf_ref=None, mf_ref=None):
    c = consts
    ls = settings["light_samples"]
    C = settings["c_lanes"]
    medium = bool(c.get("medium"))
    env_kind = c.get("env_kind", 0)  # static; != 0 => ef_ref rows are fed
    nee_enabled = ls > 0
    p_env = c["p_env"]
    n_mats = c["n_mats"]
    n_lights = c["n_lights"]
    have_lights = n_lights > 0

    s = lambda i: _tile(state_ref[i, :])
    o = V3(s(S_O), s(S_O + 1), s(S_O + 2))
    d = V3(s(S_D), s(S_D + 1), s(S_D + 2))
    lam = [s(S_LAM + i) for i in range(C)]
    beta = [s(S_BETA + i) for i in range(C)]
    rad = [s(S_RAD + i) for i in range(C)]
    alive = s(S_ALIVE) > 0.5
    bounce_ct = s(S_BOUNCE)
    prev_pdf = s(S_PREV_PDF)
    # hero-wavelength spectral MIS (see pt.py body): the state carries the
    # per-lane pdf-ratio products Π p_c/p_0; every radiance contribution
    # scales by s_mis = C/Σ pdfr (exactly 1 for λ-independent sampling).
    if C > 1:
        sum_pdfr = s(S_PDFR + 0)
        for ci in range(1, C):
            sum_pdfr = sum_pdfr + s(S_PDFR + ci)
        s_mis = C / jnp.maximum(sum_pdfr, 1e-30)
    else:
        s_mis = jnp.ones((SUB, 128), jnp.float32)

    mat_tab = mat_ref[:]
    light_tab = light_ref[:]
    hit = pid >= 0.0
    pid_c = jnp.maximum(pid, 0.0)

    attr = _prim_attr_fetch(prim_ref, pid_c)
    point, normal, gn, mat_id_f, kind, area = _hit_attributes(attr, o, d, t_hit)
    mat_id = mat_id_f  # float ids compared against float loop constants
    at_surface = alive & hit & (kind != 2.0)

    # ---- tracked-medium free flight (pt_regen.py:108-144 / utils.rs:767-
    # 805): the flight distance, σ sums, scatterer pick and phase-sampled
    # direction come from the XLA medium feed (_med_feed); only what needs
    # the hit distance happens here: scatter-vs-surface classification and
    # the hero-divide-out Beer–Lambert lane weights (exp lowers in Mosaic).
    if medium:
        mfi = _mf_idx(C)
        mf = lambda i: _tile(mf_ref[i, :])
        flight = mf(mfi["flight"])
        sig_t = [mf(mfi["sigt"] + ci) for ci in range(C)]
        sig_s = [mf(mfi["sigs"] + ci) for ci in range(C)]
        ss_hero = mf(mfi["ssh"])
        in_med = mf(mfi["inmed"]) > 0.5
        g_scat = [mf(mfi["g"] + ci) for ci in range(C)]
        is_ray = mf(mfi["isray"]) > 0.5
        surf_t = jnp.where(hit, t_hit, RAY_TMAX)
        scattered = alive & (flight < surf_t)
        travel = jnp.minimum(jnp.minimum(flight, surf_t), 1e8)
        inv_ssh = jnp.where(ss_hero > 0.0,
                            1.0 / jnp.where(ss_hero > 0.0, ss_hero, 1.0), 0.0)
        medw = []
        for ci in range(C):
            w_exp = jnp.exp(-(sig_t[ci] - ss_hero) * travel)
            lane_w = jnp.where(scattered, sig_s[ci] * inv_ssh * w_exp, w_exp)
            lane_w = jnp.where(in_med, lane_w, 1.0)
            medw.append(lane_w)
            beta[ci] = beta[ci] * lane_w
        at_surface = at_surface & ~scattered
        scat_p = o + d.scale(travel)

        def _phase_lane(ci, cos_sc):
            # closed-form HG / Rayleigh phase toward an in-kernel direction
            # (mediums/hg.py:15-21, rayleigh.py:23-24) with the scatterer's
            # fed spectral g
            g = g_scat[ci]
            g2 = g * g
            den = 1.0 + g2 - 2.0 * g * cos_sc
            p_hg = (1.0 - g2) / jnp.maximum(
                4.0 * jnp.pi * den * jnp.sqrt(jnp.maximum(den, 1e-12)), 1e-12)
            p_ray = 3.0 / (16.0 * jnp.pi) * (1.0 + cos_sc * cos_sc)
            return jnp.where(is_ray, p_ray, p_hg)
    else:
        scattered = jnp.zeros((SUB, 128), bool)

    # ---- spectral matmul per λ lane: all curves at this lane's λ.
    # Precision is a per-scene static: HIGHEST costs ~6 bf16 MXU passes and
    # dominated K2's device time; DEFAULT (single bf16 pass, f32
    # accumulate) perturbs smooth spectral curves by ~4e-3 relative —
    # far below the tonemapped-film noise floor (A/B: PARITY.md round 3).
    prec = (jax.lax.Precision.HIGHEST if c.get("spec_f32", False)
            else jax.lax.Precision.DEFAULT)
    spec = spec_ref[:, :]
    R = [_spectral_fetch(spec, lam[ci], c["lam_lo"], c["lam_hi"], prec)
         for ci in range(C)]  # [C_pad, TILE] each

    env_row = 5 * n_mats

    # ---- escape: env emission (env_emission, world/environment.py)
    escaped = alive & ~hit & ~scattered
    if nee_enabled and p_env > 0.0:
        if env_kind != 0:
            # HDR/Sun: solid-angle pdf_for(d) computed in XLA and fed
            env_nee_pdf = _tile(ef_ref[C, :]) * p_env
        else:
            # constant env NEE pdf for MIS (uniform-uv over the sphere);
            # env_pdf_for applies env.rotation to d; the pdf depends only
            # on v of the rotated direction
            er = c["env_rot"]
            dz = er[6] * d.x + er[7] * d.y + er[8] * d.z
            # sin(pi * (acos(dz)/pi)) == sqrt(1 - dz^2): same Jacobian with
            # no arccos (Mosaic has no acos lowering - const-env NEE scenes
            # failed to compile on-chip until round 5)
            jac = (2.0 * jnp.pi * jnp.pi
                   * jnp.sqrt(jnp.maximum(1.0 - dz * dz, 0.0)) + 0.001)
            env_nee_pdf = (1.0 / jac) * p_env
        use_mis_env = (bounce_ct > 0.5) & (env_nee_pdf + prev_pdf > 0.0)
        w_env = jnp.where(use_mis_env, _balance(prev_pdf, jnp.maximum(env_nee_pdf, 0.0)), 1.0)
    else:
        w_env = jnp.ones((SUB, 128), jnp.float32)
    for ci in range(C):
        env_e = (_tile(ef_ref[ci, :]) if env_kind != 0
                 else _tile(R[ci][env_row, :]))
        rad[ci] = rad[ci] + jnp.where(escaped,
                                      beta[ci] * s_mis * env_e * w_env, 0.0)
    env_ct = escaped.astype(jnp.float32)

    # ---- light-hit emission + MIS (pt_regen.py:100-116)
    wi_world = -d
    cos_at_light = cmath.dot(gn, wi_world)
    side = _mat_param(mat_tab, _M_SIDE, mat_id, n_mats)
    sharp = _mat_param(mat_tab, _M_SHARP, mat_id, n_mats)
    mtype = _mat_param(mat_tab, _M_TYPE, mat_id, n_mats)
    if have_lights:
        pick_pdf = (1.0 - p_env) / float(max(n_lights, 1))
        hyp = pick_pdf * t_hit * t_hit / jnp.maximum(
            jnp.abs(cos_at_light) * area, 1e-30)
        hyp = jnp.where(jnp.abs(cos_at_light) * area > 0.0, hyp, 0.0)
        use_mis_l = (bounce_ct > 0.5) & nee_enabled
        w_light = jnp.where(use_mis_l & (prev_pdf + hyp > 0.0),
                            _balance(prev_pdf, jnp.maximum(hyp, 0.0)), 1.0)
        is_light_hit = at_surface & (kind == 1.0)
        for ci in range(C):
            spd = _sel_rows(R[ci], mat_id, 4, n_mats, stride=5)
            le = _emission_value(spd, mtype, side, sharp, cos_at_light,
                                 has_sharp=c["has_sharp"])
            rad[ci] = rad[ci] + jnp.where(is_light_hit,
                                          beta[ci] * s_mis * le * w_light, 0.0)

    # ---- shading frame
    tgt, btg = cmath.orthonormal_basis(normal)
    wi_local = cmath.to_local(tgt, btg, normal, wi_world)
    # NEE source point: the scatter point for medium events (pt_regen:179-183)
    point_m = cmath.where(scattered, scat_p, point) if medium else point

    # per-lane material parameters + spectra for bsdf dispatch
    alpha = _mat_param(mat_tab, _M_ALPHA, mat_id, n_mats)
    metal = _mat_param(mat_tab, _M_METAL, mat_id, n_mats)
    perm = _mat_param(mat_tab, _M_PERM, mat_id, n_mats)
    rscale = _mat_param(mat_tab, _M_RSCALE, mat_id, n_mats)
    eta_i = [_sel_rows(R[ci], mat_id, 0, n_mats, stride=5) for ci in range(C)]
    eta_o = [_sel_rows(R[ci], mat_id, 1, n_mats, stride=5) for ci in range(C)]
    kappa = [_sel_rows(R[ci], mat_id, 2, n_mats, stride=5) for ci in range(C)]
    refl = [rscale * _sel_rows(R[ci], mat_id, 3, n_mats, stride=5)
            for ci in range(C)]
    if c.get("tex_feed"):
        # uv-dependent lambertian reflectance from the XLA texture feed
        # (_tex_feed rows); untextured materials keep the baked curve path
        texm = _mat_param(mat_tab, _M_TEXF, mat_id, n_mats) > 0.5
        refl = [jnp.where(texm, _tile(tf_ref[ci, :]), refl[ci])
                for ci in range(C)]

    shadow_ct = jnp.zeros((SUB, 128), jnp.float32)

    # ---- NEE (pt_regen.py:121-166)
    if nee_enabled:
        inv_ls = 1.0 / ls
        for si in range(ls):
            u_pick = _tile(u_ref[3 * si, :])
            u1 = _tile(u_ref[3 * si + 1, :])
            u2 = _tile(u_ref[3 * si + 2, :])
            if p_env > 0.0:
                chose_env = u_pick < p_env
                u_pick2 = jnp.where(chose_env, u_pick / max(p_env, 1e-12),
                                    (u_pick - p_env) / max(1.0 - p_env, 1e-12))
                u_pick2 = jnp.clip(u_pick2, 0.0, 1.0 - 1e-7)
            else:
                chose_env = jnp.zeros((SUB, 128), bool)
                u_pick2 = u_pick
            # pick light + fetch light rows by L-loop
            li = jnp.minimum(jnp.floor(u_pick2 * max(n_lights, 1)),
                             float(max(n_lights, 1) - 1))

            def lrow(row):
                acc = jnp.zeros((SUB, 128), jnp.float32)
                for l in range(max(n_lights, 1)):
                    acc = acc + jnp.where(li == l, light_tab[row, l], 0.0)
                return acc

            lpa = V3(lrow(_L_PA), lrow(_L_PA + 1), lrow(_L_PA + 2))
            lpb = V3(lrow(_L_PB), lrow(_L_PB + 1), lrow(_L_PB + 2))
            lpc = V3(lrow(_L_PC), lrow(_L_PC + 1), lrow(_L_PC + 2))
            lp_type = lrow(_L_PTYPE)
            l_area = lrow(_L_AREA)
            l_mat = lrow(_L_MAT)
            l_mtype = lrow(_L_MTYPE)
            l_side = lrow(_L_SIDE)
            l_sharp = lrow(_L_SHARP)
            lp, ln = _sample_surface_light(lp_type, lpa, lpb, lpc, u1, u2)
            area_pdf = 1.0 / jnp.maximum(l_area, 1e-20)
            to_l = lp - point_m
            dist2 = jnp.maximum(cmath.length_squared(to_l), 1e-12)
            dist = jnp.sqrt(dist2)
            dir_l = to_l.scale(1.0 / dist)
            cos_l = cmath.dot(ln, -dir_l)
            lp_pdf = 1.0 / float(max(n_lights, 1))
            sa_pdf_light = (1.0 - p_env) * lp_pdf * area_pdf * jnp.where(
                jnp.abs(cos_l) > 0.0, dist2 / jnp.maximum(jnp.abs(cos_l), 1e-30), 0.0)
            if p_env > 0.0:
                if env_kind != 0:
                    # HDR/Sun NEE sample: direction + solid-angle pdf from
                    # env_sample_uv on THIS sample's (u1, u2) rows, fed
                    ebase = C + 1 + si * (4 + C)
                    env_dir = V3(_tile(ef_ref[ebase + 0, :]),
                                 _tile(ef_ref[ebase + 1, :]),
                                 _tile(ef_ref[ebase + 2, :]))
                    sa_pdf_env = _tile(ef_ref[ebase + 3, :]) * p_env
                else:
                    # constant-env NEE: uniform-uv direction (env_sample_uv)
                    env_d_uv = cmath.uv_to_direction(u1, u2)
                    ri = c["env_rot_inv"]
                    env_dir = V3(
                        ri[0] * env_d_uv.x + ri[1] * env_d_uv.y + ri[2] * env_d_uv.z,
                        ri[3] * env_d_uv.x + ri[4] * env_d_uv.y + ri[5] * env_d_uv.z,
                        ri[6] * env_d_uv.x + ri[7] * env_d_uv.y + ri[8] * env_d_uv.z,
                    )
                    jac_s = 2.0 * jnp.pi * jnp.pi * jnp.sin(jnp.pi * u2) + 0.001
                    sa_pdf_env = (1.0 / jac_s) * p_env
                nee_dir = cmath.where(chose_env, env_dir, dir_l)
                nee_pdf = jnp.where(chose_env, sa_pdf_env, sa_pdf_light)
                nee_tmax = jnp.where(chose_env, RAY_TMAX, dist * 0.99)
            else:
                nee_dir = dir_l
                nee_pdf = sa_pdf_light
                nee_tmax = dist * 0.99
            wo_local = cmath.to_local(tgt, btg, normal, nee_dir)
            max_le = jnp.zeros((SUB, 128), jnp.float32)
            max_thr = jnp.zeros((SUB, 128), jnp.float32)
            contribs = []
            nee_fs, nee_pdfs = _bsdf_eval_lanes(
                mtype, alpha, metal, perm, eta_i, eta_o, kappa, refl,
                wi_local, wo_local, TransportMode.Radiance,
                has_ggx=c["has_ggx"], has_metal=c.get("has_metal", True))
            pdf_s0 = None
            for ci in range(C):
                f_ci, pdf_ci = nee_fs[ci], nee_pdfs[ci]
                if ci == 0:
                    pdf_s0 = pdf_ci
                spd_l = _sel_rows(R[ci], l_mat, 4, n_mats, stride=5)
                le_inst = _emission_value(spd_l, l_mtype, l_side, l_sharp,
                                          cos_l, has_sharp=c["has_sharp"])
                if p_env > 0.0:
                    env_e_s = (_tile(ef_ref[C + 1 + si * (4 + C) + 4 + ci, :])
                               if env_kind != 0 else _tile(R[ci][env_row, :]))
                    le_ci = jnp.where(chose_env, env_e_s, le_inst)
                else:
                    le_ci = le_inst
                thr_ci = f_ci * jnp.abs(wo_local.z)
                if medium:
                    # medium scatter: phase toward the NEE dir replaces the
                    # surface throughput (pt_regen.py:218-229)
                    ph_ci = _phase_lane(ci, cmath.dot(d, nee_dir))
                    thr_ci = jnp.where(scattered, ph_ci, thr_ci)
                    if ci == 0:
                        pdf_s0 = jnp.where(scattered, ph_ci, pdf_s0)
                max_le = jnp.maximum(max_le, le_ci)
                max_thr = jnp.maximum(max_thr, thr_ci)
                contribs.append((thr_ci, le_ci))
            nee_src = (at_surface | scattered) if medium else at_surface
            worth = (nee_src & (max_le > 0.0) & (nee_pdf > 1e-12)
                     & (max_thr > 0.0))
            w_nee = _balance(nee_pdf, jnp.maximum(pdf_s0, 0.0))
            w_nee = jnp.where(nee_pdf + jnp.maximum(pdf_s0, 0.0) > 0.0, w_nee, 1.0)
            off_n = NORMAL_OFFSET * jnp.sign(cmath.dot(gn, nee_dir) + 1e-9)
            if medium:
                # no surface-normal offset at a scatter point (pt_regen:233-238)
                off_n = jnp.where(scattered, 0.0, off_n)
            so = point_m + gn.scale(off_n)
            base = O_NEE + 12 * si
            out_ref[base + 0, :] = _flatrow(so.x)
            out_ref[base + 1, :] = _flatrow(so.y)
            out_ref[base + 2, :] = _flatrow(so.z)
            out_ref[base + 3, :] = _flatrow(nee_dir.x)
            out_ref[base + 4, :] = _flatrow(nee_dir.y)
            out_ref[base + 5, :] = _flatrow(nee_dir.z)
            out_ref[base + 6, :] = _flatrow(nee_tmax)
            out_ref[base + 7, :] = _flatrow(worth.astype(jnp.float32))
            inv_pdf = jnp.where(nee_pdf > 1e-12, 1.0 / jnp.maximum(nee_pdf, 1e-12), 0.0)
            for ci in range(C):
                thr_ci, le_ci = contribs[ci]
                contrib = (beta[ci] * s_mis * thr_ci * le_ci
                           * w_nee * inv_pdf * inv_ls)
                if medium:
                    # NEE transmittance through the tracked media
                    # (pt_regen.py:245-253): Beer–Lambert over the shadow
                    # distance (env samples: 2·world_radius)
                    tr_dist = (jnp.where(chose_env, 2.0 * c["radius"], dist)
                               if p_env > 0.0 else dist)
                    tr_ci = jnp.where(
                        in_med,
                        jnp.exp(-sig_t[ci] * jnp.minimum(tr_dist, 1e8)), 1.0)
                    contrib = contrib * tr_ci
                out_ref[base + 8 + ci, :] = _flatrow(contrib)
            for ci in range(C, C_LANES):
                out_ref[base + 8 + ci, :] = jnp.zeros((TILE,), jnp.float32)
            shadow_ct = shadow_ct + worth.astype(jnp.float32)

    # ---- BSDF sample (hero) + HWSS lane ratios (pt_regen.py:168-186)
    u_b = [_tile(u_ref[3 * ls + i, :]) for i in range(3)]
    # hero sample: lambertian + ggx, select by mtype
    wo_lam_s, f_lam_s, pdf_lam_s = cmath.sample_lambertian(refl[0], wi_local,
                                                           u_b[0], u_b[1])
    w_lam_s = jnp.minimum(refl[0], 1.0)
    if c["has_ggx"]:
        a_g = jnp.maximum(alpha, 1e-4)
        wo_ggx_s, f_ggx_s, pdf_ggx_s, w_ggx_s = cmath.sample_ggx(
            a_g, jnp.maximum(eta_i[0], 1e-3), jnp.maximum(eta_o[0], 1e-3),
            kappa[0], metal > 0.5, perm, wi_local, u_b[0], u_b[1], u_b[2],
            TransportMode.Radiance, has_metal=c.get("has_metal", True))
        is_ggx = mtype == MAT_GGX
        wo_local_s = cmath.where(is_ggx, wo_ggx_s, wo_lam_s)
        f_pdf = jnp.where(is_ggx, pdf_ggx_s, pdf_lam_s)
        ratio_hero = jnp.where(is_ggx, w_ggx_s, w_lam_s)
    else:
        wo_local_s = wo_lam_s
        f_pdf = pdf_lam_s
        ratio_hero = w_lam_s
    is_pass = mtype == 4.0
    f_pdf = jnp.where(is_pass, 0.0, f_pdf)
    ratio_hero = jnp.where(is_pass, 0.0, ratio_hero)

    # companion-lane ratios via 4-lane eval (hero-death direct fallback)
    f_lanes, p_lanes = _bsdf_eval_lanes(
        mtype, alpha, metal, perm, eta_i, eta_o, kappa, refl,
        wi_local, wo_local_s, TransportMode.Radiance,
        has_ggx=c["has_ggx"], has_metal=c.get("has_metal", True))
    hero_f = f_lanes[0]
    hero_dead = (hero_f <= 0.0) & (f_pdf > 1e-12)
    inv_hero = jnp.where(hero_f > 0.0, 1.0 / jnp.where(hero_f > 0.0, hero_f, 1.0), 0.0)
    inv_fpdf = jnp.where(f_pdf > 1e-12, 1.0 / jnp.maximum(f_pdf, 1e-12), 0.0)
    ratios = [ratio_hero]
    for ci in range(1, C):
        stable = ratio_hero * f_lanes[ci] * inv_hero
        direct = f_lanes[ci] * jnp.abs(wo_local_s.z) * inv_fpdf
        ratios.append(jnp.where(hero_dead, direct, stable))
    sample_ok = (f_pdf > 1e-12)

    d_new = cmath.normalize(cmath.to_world(tgt, btg, normal, wo_local_s))
    o_new = point + gn.scale(NORMAL_OFFSET * jnp.sign(cmath.dot(gn, d_new)))

    if medium:
        # scatter events continue along the fed phase-sampled direction
        # from the scatter point; phase value == pdf (perfect importance
        # sampling), so the hero ratio is 1 and companion ratios are the
        # fed phase ratios (pt_regen.py:284-308)
        wo_m = V3(mf(mfi["wo"]), mf(mfi["wo"] + 1), mf(mfi["wo"] + 2))
        ph_pdf = mf(mfi["phpdf"])
        ph_s = [mf(mfi["phs"] + ci) for ci in range(C)]
        d_new = cmath.where(scattered, wo_m, d_new)
        o_new = cmath.where(scattered, scat_p, o_new)
        f_pdf = jnp.where(scattered, ph_pdf, f_pdf)
        ratios = [jnp.where(scattered, ph_s[ci], ratios[ci])
                  for ci in range(C)]
        sample_ok = sample_ok | scattered

        # ---- medium boundary transitions on transmission
        # (utils.rs:940-1005 via pt_regen.py:330-339): remove one
        # occurrence of the departed side's medium, push the entered side's
        stack = _unpack_stack_rows(s(S_MSTK0), s(S_MSTK1))
        crossed = at_surface & (wo_local_s.z * wi_local.z < 0.0)
        entering = wo_local_s.z < 0.0
        inner = _mat_param(mat_tab, _M_INNER, mat_id, n_mats)
        outer = _mat_param(mat_tab, _M_OUTER, mat_id, n_mats)
        do_tr = crossed & (inner != outer)
        rm_id = jnp.where(entering, outer, inner)
        add_id = jnp.where(entering, inner, outer)
        seen = jnp.zeros((SUB, 128), bool)
        for k in range(4):
            match = (stack[k] == rm_id) & do_tr & (rm_id > 0.5)
            sel = match & ~seen
            seen = seen | match
            stack[k] = jnp.where(sel, 0.0, stack[k])
        seen = jnp.zeros((SUB, 128), bool)
        for k in range(4):
            empty = stack[k] < 0.5
            sel = empty & ~seen & do_tr & (add_id > 0.5)
            seen = seen | empty
            stack[k] = jnp.where(sel, add_id, stack[k])
        out_ref[O_SCAT, :] = _flatrow(scattered.astype(jnp.float32))
        for ci in range(C):
            out_ref[O_MEDW + ci, :] = _flatrow(medw[ci])
        for ci in range(C, C_LANES):
            out_ref[O_MEDW + ci, :] = jnp.ones((TILE,), jnp.float32)
        out_ref[O_MSTK + 0, :] = _flatrow(stack[0] + 256.0 * stack[1])
        out_ref[O_MSTK + 1, :] = _flatrow(stack[2] + 256.0 * stack[3])
    else:
        for row in range(O_SCAT, O_NEE):
            out_ref[row, :] = jnp.zeros((TILE,), jnp.float32)

    # ---- write out
    # spectral-MIS pdf ratios p_c/p_0 at the sampled direction
    inv_p0 = jnp.where(p_lanes[0] > 0.0,
                       1.0 / jnp.where(p_lanes[0] > 0.0, p_lanes[0], 1.0), 0.0)
    for ci in range(C):
        out_ref[O_RAD + ci, :] = _flatrow(rad[ci])
        out_ref[O_RATIO + ci, :] = _flatrow(ratios[ci])
        psc = (jnp.ones((SUB, 128), jnp.float32) if ci == 0
               else p_lanes[ci] * inv_p0)
        if medium and ci > 0:
            # phase value == pdf, so the fed phase ratio IS the pdf ratio
            psc = jnp.where(scattered, ph_s[ci], psc)
        out_ref[O_PSCALE + ci, :] = _flatrow(psc)
    for ci in range(C, C_LANES):
        out_ref[O_RAD + ci, :] = jnp.zeros((TILE,), jnp.float32)
        out_ref[O_RATIO + ci, :] = jnp.zeros((TILE,), jnp.float32)
        out_ref[O_PSCALE + ci, :] = jnp.zeros((TILE,), jnp.float32)
    out_ref[O_AT_SURF, :] = _flatrow(at_surface.astype(jnp.float32))
    out_ref[O_ENV_CT, :] = _flatrow(env_ct)
    out_ref[O_SHADOW_CT, :] = _flatrow(shadow_ct)
    out_ref[O_FPDF, :] = _flatrow(f_pdf)
    out_ref[O_SAMPLE_OK, :] = _flatrow(sample_ok.astype(jnp.float32))
    out_ref[O_ONEW + 0, :] = _flatrow(o_new.x)
    out_ref[O_ONEW + 1, :] = _flatrow(o_new.y)
    out_ref[O_ONEW + 2, :] = _flatrow(o_new.z)
    out_ref[O_DNEW + 0, :] = _flatrow(d_new.x)
    out_ref[O_DNEW + 1, :] = _flatrow(d_new.y)
    out_ref[O_DNEW + 2, :] = _flatrow(d_new.z)
    nk2 = _k2_rows(ls)
    for row in range(O_NEE + 12 * ls, nk2):
        out_ref[row, :] = jnp.zeros((TILE,), jnp.float32)


# ----------------------------------------------------------------- kernel K4


def _finalize_passthrough(state_ref, out_ref):
    """Dead-tile K4 else-branch: the computed finalize of an all-dead tile
    is a bit-exact state passthrough with zero counter indicators (every
    merge is masked by continue/has_work, both 0), so copy + zero IS the
    computed result."""
    for r in range(NS):
        out_ref[r, :] = state_ref[r, :]
    for r in range(NS, out_ref.shape[0]):
        out_ref[r, :] = jnp.zeros((TILE,), jnp.float32)


def _finalize_kernel(consts, settings, u_ref, state_ref, k2_ref, *rest):
    *blk_refs, out_ref = rest

    def run():
        _finalize_body(consts, settings, u_ref, state_ref, k2_ref, out_ref,
                       blocked=[_tile(b[0, :]) > 0.5 for b in blk_refs])

    if not _skip_dead():
        return run()
    alive_any = _tile_alive(state_ref)
    pl.when(alive_any)(run)
    pl.when(jnp.logical_not(alive_any))(
        lambda: _finalize_passthrough(state_ref, out_ref))


def _finalize_sweep_kernel(consts, settings, u_ref, state_ref, k2_ref,
                           dense_ref, *rest):
    """K3+K4 fused: the NEE shadow sweeps run INLINE (dense-table chunks in
    VMEM, _sweep_tiles) and feed straight into the finalize body — two fewer
    dispatched programs per bounce round on a tunnel whose per-program
    dispatch latency exceeds the round's device compute."""
    rest = list(rest)
    out_ref = rest.pop()
    ftab_ref = rest.pop(0) if consts.get("bvh1") else None

    def run():
        ls = settings["light_samples"]
        ct32 = consts.get("ct32")
        k2 = lambda i: _tile(k2_ref[i, :])
        blocked = []
        for si in range(ls):
            base = O_NEE + 12 * si
            so = V3(k2(base + 0), k2(base + 1), k2(base + 2))
            sd = V3(k2(base + 3), k2(base + 4), k2(base + 5))
            tmax = k2(base + 6)
            blocked.append(_sweep_tiles(dense_ref, so, sd, tmax,
                                        closest=False, present_list=ct32,
                                        aabb_base=consts.get("aabb_base"),
                                        ftab_ref=ftab_ref,
                                        bvh1_base=consts.get("bvh1_base"),
                                        bvh1_present=consts.get("bvh1_present")))
        _finalize_body(consts, settings, u_ref, state_ref, k2_ref, out_ref,
                       blocked=blocked)

    if not _skip_dead():
        return run()
    alive_any = _tile_alive(state_ref)
    pl.when(alive_any)(run)
    pl.when(jnp.logical_not(alive_any))(
        lambda: _finalize_passthrough(state_ref, out_ref))


def _finalize_core(consts, settings, u_rr, rnd, s, state_ref, out_ref,
                   lam, beta, rad, acc, done, alive, bounce_ct, at_surface,
                   f_pdf, sample_ok, ratios, o, d, o_new, d_new, pscale,
                   scattered=None, mstk_new=None):
    """Shared K4 finalize tail (RR + continuation, death→XYZ accumulate,
    thin-lens respawn, state merge + write-out) — the single source of
    truth for both the split pipeline (_finalize_body) and the fused
    single-dispatch round (_all_kernel). `u_rr`/`rnd` are the caller's
    uniform tiles (the variants index their uniform blocks differently);
    `pscale` is the per-lane spectral-MIS pdf-ratio tiles at the sampled
    direction; `scattered`/`mstk_new` carry the medium-aware rows (split
    pipeline only; fused rounds exclude medium scenes)."""
    c = consts
    C = settings["c_lanes"]
    max_bounces = settings["max_bounces"]
    min_bounces = settings["min_bounces"]
    rr_enabled = settings["russian_roulette"]
    only_direct = settings["only_direct"]
    width = settings["width"]
    height = settings["height"]
    wb_lo = settings["wb_lo"]
    wb_span = settings["wb_span"]
    medium = scattered is not None

    # ---- RR + continuation (pt_regen.py:186-203)
    ratio_best = ratios[0]
    for ci in range(1, C):
        ratio_best = jnp.maximum(ratio_best, ratios[ci])
    if medium:
        # phase sampling is perfect importance sampling (pt_regen.py:306-308)
        ratio_best = jnp.where(scattered, 1.0, ratio_best)
        sample_ok = scattered | (sample_ok & (ratio_best > 0.0))
    else:
        sample_ok = sample_ok & (ratio_best > 0.0)
    if rr_enabled:
        rr_on = bounce_ct >= min_bounces
        p_cont = jnp.where(rr_on, jnp.clip(ratio_best, 0.05, 1.0), 1.0)
    else:
        p_cont = jnp.ones((SUB, 128), jnp.float32)
    survive = u_rr < p_cont
    inv_pc = 1.0 / jnp.maximum(p_cont, 1e-6)
    beta_next = []
    finite_ok = jnp.ones((SUB, 128), bool)
    for ci in range(C):
        bn = beta[ci] * jnp.where(sample_ok, ratios[ci] * inv_pc, 0.0)
        beta_next.append(bn)
        finite_ok = finite_ok & jnp.isfinite(bn)
    hit_depth_cap = (bounce_ct + 1.0) >= max_bounces
    cont_src = (at_surface | scattered) if medium else at_surface
    continue_path = (cont_src & sample_ok & survive & ~hit_depth_cap
                     & finite_ok)
    if only_direct:
        continue_path = continue_path & ~(bounce_ct >= 1.0)
    bounce_ind = continue_path.astype(jnp.float32)

    # ---- death -> XYZ accumulate (closed-form CIE; pt_regen.py:205-209)
    died = alive & ~continue_path
    from pathtracer_tpu.core import cie

    xyz = [jnp.zeros((SUB, 128), jnp.float32) for _ in range(3)]
    for ci in range(C):
        e = rad[ci] * (wb_span / C)
        xyz[0] = xyz[0] + e * cie.x_bar(lam[ci])
        xyz[1] = xyz[1] + e * cie.y_bar(lam[ci])
        xyz[2] = xyz[2] + e * cie.z_bar(lam[ci])
    for i in range(3):
        acc[i] = acc[i] + jnp.where(died, xyz[i], 0.0)
    # S_DONE is a per-lane samples-LEFT countdown (init = spp at spawn):
    # keeping spp OUT of the kernels' static settings means every spp
    # shares one compiled program per scene/film — the bench's 384- and
    # 12-spp phases used to pay two full tunnel compiles each.
    done = done - died.astype(jnp.float32)
    has_work = died & (done > 0.5)
    camera_ind = has_work.astype(jnp.float32)

    # ---- respawn: thin-lens camera ray (camera/projective.py get_ray +
    # camera/aperture.py sample_aperture, componentwise); respawn at the
    # lane's OWNING pixel (state row, not lane position: compaction
    # permutes lanes mid-render)
    pix = s(S_PIX)
    px = pix - jnp.floor(pix / width) * width
    py = jnp.floor(pix / width)
    film_u = (px + rnd[0]) / width
    film_v = (py + rnd[1]) / height
    # aperture sample
    r_d = jnp.sqrt(rnd[2])
    phi_d = 2.0 * jnp.pi * rnd[3]
    dx_l = r_d * jnp.cos(phi_d)
    dy_l = r_d * jnp.sin(phi_d)
    if c["cam_blades"] >= 3:
        bl = float(max(c["cam_blades"], 3))
        phi_a = jnp.arctan2(dy_l, dx_l)
        seg = 2.0 * jnp.pi / bl
        a_ = jnp.mod(phi_a, seg) - seg / 2.0
        poly = jnp.cos(jnp.pi / bl) / jnp.cos(a_)
        t_ = min(max(c["cam_sharp"], 0.0), 1.0)
        r_scale = (1.0 - t_) + t_ * poly
    else:
        r_scale = 1.0
    lx = dx_l * r_scale * c["cam_lens_r"]
    ly = dy_l * r_scale * c["cam_lens_r"]
    co = V3(*[jnp.full((SUB, 128), c["cam_origin"][i], jnp.float32) for i in range(3)])
    cu = c["cam_u"]
    cv = c["cam_v"]
    cw = c["cam_w"]
    o_s = V3(co.x + lx * cu[0] + ly * cv[0],
             co.y + lx * cu[1] + ly * cv[1],
             co.z + lx * cu[2] + ly * cv[2])
    fpx = (film_u * 2.0 - 1.0) * c["cam_half_w"]
    fpy = (1.0 - film_v * 2.0) * c["cam_half_h"]
    focal = V3(co.x + c["cam_focal"] * cw[0] + fpx * cu[0] + fpy * cv[0],
               co.y + c["cam_focal"] * cw[1] + fpx * cu[1] + fpy * cv[1],
               co.z + c["cam_focal"] * cw[2] + fpx * cu[2] + fpy * cv[2])
    d_s = cmath.normalize(focal - o_s)
    offs_lam = [((rnd[4] + ci / C) % 1.0) for ci in range(C)]
    lam_s = [wb_lo + ol * wb_span for ol in offs_lam]

    # ---- merge (pt_regen.py:216-227) + write-out
    cp = continue_path
    hw = has_work
    o_out = cmath.where(cp, o_new, cmath.where(hw, o_s, o))
    d_out = cmath.where(cp, d_new, cmath.where(hw, d_s, d))
    out_ref[S_O + 0, :] = _flatrow(o_out.x)
    out_ref[S_O + 1, :] = _flatrow(o_out.y)
    out_ref[S_O + 2, :] = _flatrow(o_out.z)
    out_ref[S_D + 0, :] = _flatrow(d_out.x)
    out_ref[S_D + 1, :] = _flatrow(d_out.y)
    out_ref[S_D + 2, :] = _flatrow(d_out.z)
    for ci in range(C):
        out_ref[S_LAM + ci, :] = _flatrow(jnp.where(hw, lam_s[ci], lam[ci]))
        out_ref[S_BETA + ci, :] = _flatrow(
            jnp.where(cp, beta_next[ci], jnp.where(hw, 1.0, beta[ci])))
        out_ref[S_RAD + ci, :] = _flatrow(jnp.where(died, 0.0, rad[ci]))
    for ci in range(C, C_LANES):
        out_ref[S_LAM + ci, :] = state_ref[S_LAM + ci, :]
        out_ref[S_BETA + ci, :] = state_ref[S_BETA + ci, :]
        out_ref[S_RAD + ci, :] = state_ref[S_RAD + ci, :]
    for i in range(3):
        out_ref[S_ACC + i, :] = _flatrow(acc[i])
    out_ref[S_DONE, :] = _flatrow(done)
    out_ref[S_ALIVE, :] = _flatrow((cp | hw).astype(jnp.float32))
    out_ref[S_BOUNCE, :] = _flatrow(
        jnp.where(cp, bounce_ct + 1.0, jnp.where(hw, 0.0, bounce_ct)))
    out_ref[S_PREV_PDF, :] = _flatrow(
        jnp.where(cp, f_pdf, jnp.where(hw, 0.0, s(S_PREV_PDF))))
    # spectral-MIS pdf-ratio products: multiply in this bounce's ratios on
    # continuation, reset on respawn
    for ci in range(C):
        new_r = jnp.where(cp, s(S_PDFR + ci) * pscale[ci],
                          jnp.where(hw, 1.0, s(S_PDFR + ci)))
        out_ref[S_PDFR + ci, :] = _flatrow(new_r)
    if medium:
        # transitioned packed stack on continuation; respawned camera paths
        # restart in vacuum (pt_regen.py:370-372)
        for i, row in enumerate((S_MSTK0, S_MSTK1)):
            new_stk = jnp.where(cp, mstk_new[i],
                                jnp.where(hw, 0.0, s(row)))
            out_ref[row, :] = _flatrow(new_stk)
    for row in range(S_PREV_PDF + 1, NS):
        if S_PDFR <= row < S_PDFR + C:
            continue
        if medium and row in (S_MSTK0, S_MSTK1):
            continue
        out_ref[row, :] = state_ref[row, :]
    out_ref[O4_BOUNCE_CT, :] = _flatrow(bounce_ind)
    out_ref[O4_CAMERA_CT, :] = _flatrow(camera_ind)


def _finalize_body(consts, settings, u_ref, state_ref, k2_ref, out_ref,
                   blocked):
    ls = settings["light_samples"]
    C = settings["c_lanes"]

    s = lambda i: _tile(state_ref[i, :])
    k2 = lambda i: _tile(k2_ref[i, :])
    o = V3(s(S_O), s(S_O + 1), s(S_O + 2))
    d = V3(s(S_D), s(S_D + 1), s(S_D + 2))
    lam = [s(S_LAM + i) for i in range(C)]
    beta = [s(S_BETA + i) for i in range(C)]
    acc = [s(S_ACC + i) for i in range(3)]
    done = s(S_DONE)
    alive = s(S_ALIVE) > 0.5
    bounce_ct = s(S_BOUNCE)

    rad = [k2(O_RAD + i) for i in range(C)]
    at_surface = k2(O_AT_SURF) > 0.5
    f_pdf = k2(O_FPDF)
    sample_ok = k2(O_SAMPLE_OK) > 0.5
    ratios = [k2(O_RATIO + i) for i in range(C)]
    o_new = V3(k2(O_ONEW), k2(O_ONEW + 1), k2(O_ONEW + 2))
    d_new = V3(k2(O_DNEW), k2(O_DNEW + 1), k2(O_DNEW + 2))
    medium = bool(consts.get("medium"))
    if medium:
        # free-flight lane weights computed in K2 (pt_regen applies them to
        # beta before the contribution adds AND the continuation product)
        scattered = k2(O_SCAT) > 0.5
        beta = [beta[ci] * k2(O_MEDW + ci) for ci in range(C)]
        mstk_new = [k2(O_MSTK + 0), k2(O_MSTK + 1)]
    else:
        scattered = None
        mstk_new = None

    # ---- resolve NEE with shadow results
    for si in range(ls):
        base = O_NEE + 12 * si
        worth = k2(base + 7) > 0.5
        ok = worth & ~blocked[si]
        for ci in range(C):
            rad[ci] = rad[ci] + jnp.where(ok, k2(base + 8 + ci), 0.0)

    _finalize_core(
        consts, settings, u_rr=_tile(u_ref[0, :]),
        rnd=[_tile(u_ref[1 + i, :]) for i in range(5)],
        s=s, state_ref=state_ref, out_ref=out_ref,
        lam=lam, beta=beta, rad=rad, acc=acc, done=done, alive=alive,
        bounce_ct=bounce_ct, at_surface=at_surface, f_pdf=f_pdf,
        sample_ok=sample_ok, ratios=ratios, o=o, d=d, o_new=o_new,
        d_new=d_new, pscale=[k2(O_PSCALE + ci) for ci in range(C)],
        scattered=scattered, mstk_new=mstk_new)
    for row in range(O4_CAMERA_CT + 1, NK4):
        out_ref[row, :] = jnp.zeros((TILE,), jnp.float32)


# ------------------------------------------------------------------- driver


def _full_block_spec(a):
    return pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape))


def _row_spec(rows):
    return pl.BlockSpec((rows, TILE), lambda i: (0, i))


@_mega_jit(static_argnames=("settings_t", "consts_t", "interpret",))
def _k2_call(state, tp, tabs, key, it_dev, settings_t, consts_t, interpret,
             tf=None):
    import jax.random as jrandom

    settings = dict(settings_t)
    consts = dict(consts_t)
    interp = pltpu.InterpretParams() if interpret else False
    prim_tab, dense_tab, mat_tab, light_tab, spec_tab, env_args, med_args = \
        tabs[:7]
    n_pad = state.shape[1]
    ls = settings["light_samples"]
    nk2 = _k2_rows(ls)
    nu = _n_u_rows(ls, consts.get("medium", False))
    u = jrandom.uniform(jrandom.fold_in(jrandom.fold_in(key, it_dev), 0),
                        (nu, n_pad))
    ins = [u, state, tp, prim_tab, mat_tab, light_tab, spec_tab]
    in_specs = [
        _row_spec(nu),
        _row_spec(NS),
        _row_spec(8),
        _full_block_spec(prim_tab),
        _full_block_spec(mat_tab),
        _full_block_spec(light_tab),
        _full_block_spec(spec_tab),
    ]
    if env_args is not None:
        ins.append(_env_feed(env_args, state, u, ls, settings["c_lanes"]))
        in_specs.append(_row_spec(_ef_rows(ls, settings["c_lanes"])))
    if consts.get("tex_feed"):
        assert tf is not None, "tex_feed scenes must ride _mega_step_texfeed"
        ins.append(tf)
        in_specs.append(_row_spec(_tf_rows(settings["c_lanes"])))
    if consts.get("medium"):
        ins.append(_med_feed(med_args, state, u, ls, settings["c_lanes"]))
        in_specs.append(_row_spec(_mf_rows(settings["c_lanes"])))
    return pl.pallas_call(
        functools.partial(_shade_kernel, consts, settings),
        grid=(n_pad // TILE,),
        in_specs=in_specs,
        out_specs=_row_spec(nk2),
        out_shape=jax.ShapeDtypeStruct((nk2, n_pad), jnp.float32),
        interpret=interp,
    )(*ins)


@_mega_jit(static_argnames=("settings_t", "consts_t", "interpret",))
def _k12_call(state, tabs, key, it_dev, settings_t, consts_t, interpret):
    """Closest-hit sweep + shading as ONE dispatched program (K1+K2 fused)."""
    import jax.random as jrandom

    settings = dict(settings_t)
    consts = dict(consts_t)
    interp = pltpu.InterpretParams() if interpret else False
    prim_tab, dense_tab, mat_tab, light_tab, spec_tab, env_args, med_args = \
        tabs[:7]
    fetch_tab = tabs[7] if len(tabs) > 7 else None
    n_pad = state.shape[1]
    ls = settings["light_samples"]
    nk2 = _k2_rows(ls)
    nu = _n_u_rows(ls, consts.get("medium", False))
    u = jrandom.uniform(jrandom.fold_in(jrandom.fold_in(key, it_dev), 0),
                        (nu, n_pad))
    ins = [u, state, dense_tab, prim_tab, mat_tab, light_tab, spec_tab]
    in_specs = [
        _row_spec(nu),
        _row_spec(NS),
        _full_block_spec(dense_tab),
        _full_block_spec(prim_tab),
        _full_block_spec(mat_tab),
        _full_block_spec(light_tab),
        _full_block_spec(spec_tab),
    ]
    if consts.get("bvh1"):
        ins.append(fetch_tab)
        in_specs.append(_full_block_spec(fetch_tab))
    if env_args is not None:
        ins.append(_env_feed(env_args, state, u, ls, settings["c_lanes"]))
        in_specs.append(_row_spec(_ef_rows(ls, settings["c_lanes"])))
    if consts.get("medium"):
        ins.append(_med_feed(med_args, state, u, ls, settings["c_lanes"]))
        in_specs.append(_row_spec(_mf_rows(settings["c_lanes"])))
    return pl.pallas_call(
        functools.partial(_shade_sweep_kernel, consts, settings),
        grid=(n_pad // TILE,),
        in_specs=in_specs,
        out_specs=_row_spec(nk2),
        out_shape=jax.ShapeDtypeStruct((nk2, n_pad), jnp.float32),
        interpret=interp,
    )(*ins)


@_mega_jit(static_argnames=("settings_t", "consts_t", "interpret",))
def _k4_call(state, k2, blks, counters, key, it_dev, settings_t, consts_t,
             interpret):
    import jax.random as jrandom

    settings = dict(settings_t)
    consts = dict(consts_t)
    interp = pltpu.InterpretParams() if interpret else False
    n_pad = state.shape[1]
    ls = settings["light_samples"]
    nk2 = _k2_rows(ls)
    u = jrandom.uniform(jrandom.fold_in(jrandom.fold_in(key, it_dev), 1),
                        (NU4, n_pad))
    out4 = pl.pallas_call(
        functools.partial(_finalize_kernel, consts, settings),
        grid=(n_pad // TILE,),
        in_specs=[
            _row_spec(NU4),
            _row_spec(NS),
            _row_spec(nk2),
        ] + [_row_spec(8) for _ in blks],
        out_specs=_row_spec(NK4),
        out_shape=jax.ShapeDtypeStruct((NK4, n_pad), jnp.float32),
        interpret=interp,
    )(u, state, k2, *blks)
    state_out = out4[:NS]
    counters = counters.at[prof.BOUNCE_RAYS].add(jnp.sum(out4[O4_BOUNCE_CT]))
    counters = counters.at[prof.SHADOW_RAYS].add(jnp.sum(k2[O_SHADOW_CT]))
    counters = counters.at[prof.CAMERA_RAYS].add(jnp.sum(out4[O4_CAMERA_CT]))
    counters = counters.at[prof.ENV_HITS].add(jnp.sum(k2[O_ENV_CT]))
    return state_out, counters, it_dev + 1


@_mega_jit(static_argnames=("settings_t", "consts_t", "interpret",))
def _k34_call(state, k2, dense_tab, counters, key, it_dev, settings_t,
              consts_t, interpret, fetch_tab=None):
    """Shadow sweeps + finalize as ONE dispatched program (K3xls+K4 fused)."""
    import jax.random as jrandom

    settings = dict(settings_t)
    consts = dict(consts_t)
    interp = pltpu.InterpretParams() if interpret else False
    n_pad = state.shape[1]
    ls = settings["light_samples"]
    nk2 = _k2_rows(ls)
    u = jrandom.uniform(jrandom.fold_in(jrandom.fold_in(key, it_dev), 1),
                        (NU4, n_pad))
    ins = [u, state, k2, dense_tab]
    in_specs = [
        _row_spec(NU4),
        _row_spec(NS),
        _row_spec(nk2),
        _full_block_spec(dense_tab),
    ]
    if consts.get("bvh1"):
        ins.append(fetch_tab)
        in_specs.append(_full_block_spec(fetch_tab))
    out4 = pl.pallas_call(
        functools.partial(_finalize_sweep_kernel, consts, settings),
        grid=(n_pad // TILE,),
        in_specs=in_specs,
        out_specs=_row_spec(NK4),
        out_shape=jax.ShapeDtypeStruct((NK4, n_pad), jnp.float32),
        interpret=interp,
    )(*ins)
    state_out = out4[:NS]
    counters = counters.at[prof.BOUNCE_RAYS].add(jnp.sum(out4[O4_BOUNCE_CT]))
    counters = counters.at[prof.SHADOW_RAYS].add(jnp.sum(k2[O_SHADOW_CT]))
    counters = counters.at[prof.CAMERA_RAYS].add(jnp.sum(out4[O4_CAMERA_CT]))
    counters = counters.at[prof.ENV_HITS].add(jnp.sum(k2[O_ENV_CT]))
    return state_out, counters, it_dev + 1


def _mega_step(state, counters, it_dev, tabs, key, settings_t, consts_t,
               interpret):
    """One bounce round = exactly TWO dispatched programs:
      K12  closest-hit sweep INLINE + shading (draws its own uniform block
           in-jit)
      K34  NEE shadow sweeps INLINE + finalize (own uniforms, counters
           fused, iteration bump fused)
    Each program holds exactly ONE pallas_call — the tunnel's AOT compiler
    takes ~110 s per ADDITIONAL pallas call in a program (and never
    finishes loop-wrapped pipelines), while single-kernel programs compile
    in seconds. The dependent-program dispatch latency on the tunnel
    (~2-14 ms) exceeds each kernel's device compute at 1080p, so programs
    per round is THE throughput lever (measured: tools/profile_scaling.py).
    The fully-fused 1-program round (_all_kernel) is estimator-identical
    but its Mosaic compile never finishes on the tunnel; 2 programs is the
    measured floor that still compiles in seconds."""
    dense_tab = tabs[1]
    ftab = tabs[7] if len(tabs) > 7 else None
    k2 = _k12_call(state, tabs, key, it_dev, settings_t, consts_t, interpret)
    return _k34_call(state, k2, dense_tab, counters, key, it_dev, settings_t,
                     consts_t, interpret, fetch_tab=ftab)


@_mega_jit(static_argnames=("settings_t", "consts_t", "interpret",))
def _mega_step_1prog(state, counters, it_dev, tabs, key, settings_t,
                     consts_t, interpret):
    """One bounce round as ONE dispatched program holding TWO pallas
    calls (K12 then K34). Bitwise the same ops as `_mega_step` — the
    outer jit only changes program packaging. On the axon tunnel each
    ADDITIONAL pallas call in a program costs ~110 s of one-time AOT
    compile, but dependent-program dispatch latency (~2-14 ms) dominates
    device compute at 1080p, so halving dispatches per round buys up to
    2x wall clock once the compile is amortized (it is cached per
    process and — via the terminal's compile cache — across runs)."""
    dense_tab = tabs[1]
    ftab = tabs[7] if len(tabs) > 7 else None
    k2 = _k12_call.raw(state, tabs, key, it_dev, settings_t, consts_t, interpret)
    return _k34_call.raw(state, k2, dense_tab, counters, key, it_dev, settings_t,
                     consts_t, interpret, fetch_tab=ftab)


@_mega_jit(static_argnames=("settings_t", "consts_t", "interpret", "rounds",))
def _mega_step_multi(state, counters, it_dev, tabs, key, settings_t,
                     consts_t, interpret, rounds):
    """`rounds` bounce rounds chained in ONE dispatched program (2·rounds
    pallas calls). Bitwise the same ops and uniform stream as `rounds`
    sequential _mega_step calls — only the program packaging changes. The
    tunnel's AOT compiler is ~linear at ~110 s per additional pallas call
    (418cced measurement), so PT_MEGA_ROUNDS=2 costs ~440 s of one-time
    compile and halves the per-round dispatch overhead that dominates
    1080p wall clock; the drain tail wastes at most rounds-1 dead-lane
    rounds per sync."""
    dense_tab = tabs[1]
    ftab = tabs[7] if len(tabs) > 7 else None
    for _ in range(rounds):
        k2 = _k12_call.raw(state, tabs, key, it_dev, settings_t, consts_t,
                       interpret)
        state, counters, it_dev = _k34_call.raw(
            state, k2, dense_tab, counters, key, it_dev, settings_t,
            consts_t, interpret, fetch_tab=ftab)
    return state, counters, it_dev


@_mega_jit(static_argnames=("settings_t", "consts_t", "interpret",))
def _mega_step_texfeed(state, counters, it_dev, tabs, tex_args, key,
                       settings_t, consts_t, interpret):
    """One bounce round for scenes with uv-dependent surface textures:
    K1 sweep | XLA texture feed | K2 shade | K34, all in ONE dispatched
    program (3 pallas calls + XLA rows between — the post-outage AOT
    compiler handles multi-call programs in seconds). The feed needs the
    sweep's hit rows, so the K1+K2-fused kernels cannot host it."""
    from pathtracer_tpu.kernels.dense import sweep_closest_rows

    dense_tab = tabs[1]
    tp = sweep_closest_rows(state, dense_tab, row0=S_O,
                            tmin_c=INTERSECTION_TIME_OFFSET, tmax_c=RAY_TMAX,
                            src_rows=8, interpret=interpret,
                            chunk_types=dict(consts_t).get("ct8"))
    tf = _tex_feed(tex_args, state, tp, dict(settings_t)["c_lanes"])
    k2 = _k2_call.raw(state, tp, tabs, key, it_dev, settings_t, consts_t,
                      interpret, tf=tf)
    return _k34_call.raw(state, k2, dense_tab, counters, key, it_dev,
                         settings_t, consts_t, interpret,
                         fetch_tab=tabs[7] if len(tabs) > 7 else None)


def _mega_step_3prog(state, counters, it_dev, tabs, key, settings_t, consts_t,
                     interpret):
    """The split 3-program round (K1 / K2 / K34) kept for ablation."""
    dense_tab = tabs[1]
    from pathtracer_tpu.kernels.dense import sweep_closest_rows

    tp = sweep_closest_rows(state, dense_tab, row0=S_O,
                            tmin_c=INTERSECTION_TIME_OFFSET, tmax_c=RAY_TMAX,
                            src_rows=8, interpret=interpret,
                            chunk_types=dict(consts_t).get("ct8"))
    k2 = _k2_call(state, tp, tabs, key, it_dev, settings_t, consts_t,
                  interpret)
    return _k34_call(state, k2, dense_tab, counters, key, it_dev, settings_t,
                     consts_t, interpret,
                     fetch_tab=tabs[7] if len(tabs) > 7 else None)


@functools.partial(
    jax.jit,
    static_argnames=("settings_t", "n", "n_pad"),
)
def _mega_init(camera, key, settings_t, n, n_pad, spp):
    """Initial spawn as ONE jitted program (state + counters)."""
    import jax.random as jrandom

    from pathtracer_tpu.core import sampling

    settings = dict(settings_t)
    c_lanes = settings["c_lanes"]
    width = settings["width"]
    height = settings["height"]
    start = settings["start"]
    # lane -> owning pixel; with lane replicas (settings["lane_mod"] = batch
    # pixel count) R lanes share each pixel and each renders spp/R samples
    pix = start + jnp.arange(n_pad, dtype=jnp.float32) % settings["lane_mod"]
    xy = jnp.stack([pix % width, jnp.floor(pix / width)], axis=-1)
    rnd0 = jrandom.uniform(sampling.fold(key, 1), (n_pad, 5))
    film_uv = (xy + rnd0[:, 0:2]) / jnp.array([width, height], jnp.float32)
    offs = jnp.arange(c_lanes, dtype=jnp.float32) / c_lanes
    lam0 = settings["wb_lo"] + ((rnd0[:, 4:5] + offs[None, :]) % 1.0) * settings["wb_span"]
    o0, d0, tau0 = camera.get_ray(film_uv[:, 0], film_uv[:, 1],
                                  rnd0[:, 2], rnd0[:, 3])
    in_batch = jnp.arange(n_pad) < n
    state = jnp.zeros((NS, n_pad), jnp.float32)
    return _mega_init_fill(state, o0, d0, lam0, tau0, pix, in_batch,
                           c_lanes, n_pad, spp, float(n))


def _mega_init_fill(state, o0, d0, lam0, tau0, pix, in_batch, c_lanes,
                    n_pad, spp, n_cam):
    state = state.at[S_O:S_O + 3].set(o0.T)
    state = state.at[S_D:S_D + 3].set(d0.T)
    state = state.at[S_LAM:S_LAM + c_lanes].set(lam0.T)
    state = state.at[S_BETA:S_BETA + c_lanes].set(
        jnp.broadcast_to(tau0[None, :], (c_lanes, n_pad)))
    # samples-LEFT countdown: padding lanes start exhausted
    state = state.at[S_DONE].set(jnp.where(in_batch, spp, 0.0))
    state = state.at[S_ALIVE].set(in_batch.astype(jnp.float32))
    state = state.at[S_PIX].set(pix)
    # spectral-MIS pdf-ratio products start at 1
    state = state.at[S_PDFR:S_PDFR + c_lanes].set(1.0)
    counters0 = prof.zeros().at[prof.CAMERA_RAYS].add(n_cam)
    return state, counters0


@functools.partial(jax.jit, static_argnames=("settings_t", "n", "n_pad"))
def _mega_init_mapped(camera, key, pix, valid, settings_t, n, n_pad,
                      spp):
    """Initial spawn with a HOST-FED lane->pixel map (PT_MEGA_MORTON):
    lanes are ordered so each 512-lane sweep row group covers a compact
    2D screen block (32x16 pixels) instead of a scanline strip — primary
    rays in a group then share a tight frustum, which is what the
    chunk-AABB sweep gate (PT_SWEEP_AABB) needs to actually skip prim
    blocks. `pix` is the owning pixel per lane (f32), `valid` masks
    padding lanes of partial blocks. Film assembly inverts the map once
    per render (renderer side)."""
    import jax.random as jrandom

    from pathtracer_tpu.core import sampling

    settings = dict(settings_t)
    c_lanes = settings["c_lanes"]
    width = settings["width"]
    height = settings["height"]
    xy = jnp.stack([pix % width, jnp.floor(pix / width)], axis=-1)
    rnd0 = jrandom.uniform(sampling.fold(key, 1), (n_pad, 5))
    film_uv = (xy + rnd0[:, 0:2]) / jnp.array([width, height], jnp.float32)
    offs = jnp.arange(c_lanes, dtype=jnp.float32) / c_lanes
    lam0 = settings["wb_lo"] + ((rnd0[:, 4:5] + offs[None, :]) % 1.0) * settings["wb_span"]
    o0, d0, tau0 = camera.get_ray(film_uv[:, 0], film_uv[:, 1],
                                  rnd0[:, 2], rnd0[:, 3])
    in_batch = valid > 0.5
    state = jnp.zeros((NS, n_pad), jnp.float32)
    return _mega_init_fill(state, o0, d0, lam0, tau0, pix, in_batch,
                           c_lanes, n_pad, spp, float(n))


@functools.partial(jax.jit, static_argnames=("m",))
def _compact(state, m):
    """Stable-partition lanes alive-first; return (front [NS, m], parked
    tail [8, n-m] = rows S_ACC..S_PIX pre-sliced so the film assembly
    fetches 8 rows, not 32). Caller guarantees alive count <= m, so every
    parked lane is dead and its acc/pix rows are final."""
    order = jnp.argsort(1.0 - state[S_ALIVE], stable=True)
    shuffled = jnp.take(state, order, axis=1)
    return shuffled[:, :m], shuffled[S_ACC:S_ACC + 8, m:]


@jax.jit
def _acc_rows(state):
    """Film-assembly rows (acc xyz ... pix) of a state segment."""
    return state[S_ACC:S_ACC + 8]


@jax.jit
def _alive_count(state):
    return jnp.sum(state[S_ALIVE])


@jax.jit
def _any_alive(state):
    return jnp.any(state[S_ALIVE] > 0.5)


def _freeze(d):
    return tuple(sorted(d.items()))


_SCENE_CACHE: dict = {}
ALIVE_CHECK_EVERY = 12  # blocking-sync cadence (compaction path only)
ALIVE_CHECK_ASYNC = 4   # pipelined-check cadence: issues are ~free (tiny
                        # program, async dispatch) and reads happen one
                        # interval later so the RTT hides behind compute


def pt_trace_regen_mega(world, camera, settings, width, height, spp, key,
                        start=0, batch_n=None, interpret=False, replicas=1):
    """Megakernel drop-in for integrator.pt_regen.pt_trace_regen: renders
    `spp` samples for pixels [start, start+batch_n) with one lane per pixel.
    Returns (xyz sums [batch_n, 3], counters[5]).

    `replicas=R` spawns R lanes per pixel, each rendering spp/R samples
    (summed at the end): same total compute in 1/R the bounce rounds at
    R x the lanes per dispatch — the dispatch-latency amortization lever
    for small films on the tunnel (512^2 @ 64 spp would otherwise spend
    ~200 rounds of ~2 ms kernels behind ~14 ms dispatches).

    Estimator-identical to the XLA regen loop (same NEE/MIS/RR machinery —
    see _shade_kernel/_finalize_kernel citations); the uniform stream is an
    independent threefry draw per bounce round, so outputs agree
    statistically, not bit-wise.
    """
    c_lanes = C_LANES if settings.hwss else 1
    # the bake reads these env levers (AABB gate rows / bvh1 fetch table):
    # they MUST join the cache key or an in-process A/B harness flipping
    # them silently re-measures the first variant's scene (this exact bug
    # voided the round-3 "chunk-AABB gate zero win" measurement)
    bake_env = (_os_top.environ.get("PT_SWEEP_AABB"),
                _os_top.environ.get("PT_SWEEP_BVH1"))
    med_key = (bool(settings.medium_aware), bake_env)
    cached = _SCENE_CACHE.get("entry")
    if (cached is not None and cached[0] is world and cached[1] is camera
            and cached[3] == med_key):
        scene = cached[2]
    else:
        scene = build_mega_scene(world, camera, settings)
        _SCENE_CACHE["entry"] = (world, camera, scene, med_key)
    n = batch_n or (width * height)
    assert spp % replicas == 0, "replicas must divide spp"
    n_lanes = n * replicas
    # per-scene tile pick (on-chip A/B 2026-08-18): single-chunk scenes
    # (cornell, furnace) run fastest at TILE=4096 (+3-14%); multi-chunk
    # sweep-heavy scenes (gem: 10 chunks) prefer 2048 (13.8 vs 12.6
    # Mrays/s — the fatter sweep body inflates Mosaic's stack frame and
    # slows the round). Module global + settings_t "tile" cache key; the
    # PT_MEGA_TILE env pin wins.
    global TILE, SUB
    import os as _ost
    if not _ost.environ.get("PT_MEGA_TILE"):
        n_chunks = scene.dense_tab.shape[0] // 32
        TILE = 4096 if n_chunks <= 4 else 2048
        SUB = TILE // 128
    step = max(TILE, RAY_TILE)
    n_pad = -(-n_lanes // step) * step
    wb = settings.wavelength_bounds

    import os as _os0
    # block-ordered lanes (PT_MEGA_MORTON): 512-lane sweep row groups cover
    # 32x16 pixel blocks so primary rays share a tight frustum and the
    # chunk-AABB gate (PT_SWEEP_AABB) can skip prim blocks. Full-film
    # single-replica renders only; padding lanes of partial blocks spawn
    # dead. Film assembly scatters acc rows back by pixel (one XLA
    # scatter per render).
    morton = (_os0.environ.get("PT_MEGA_MORTON") and replicas == 1
              and start == 0 and n == width * height)
    pix_np = valid_np = None
    if morton:
        BW, BH = 32, 16
        nbx = -(-width // BW)
        nby = -(-height // BH)
        nblk = -(-(nbx * nby) // (step // 512)) * (step // 512)
        n_pad = nblk * 512
        lane = np.arange(n_pad)
        blk, within = lane // 512, lane % 512
        bx, by = blk % nbx, blk // nbx
        x = bx * BW + within % BW
        y = by * BH + within // BW
        valid_np = ((x < width) & (y < height) & (by < nby)).astype(np.float32)
        pix_np = np.where(valid_np > 0, y * width + x, 0).astype(np.float32)

    settings_d = dict(
        c_lanes=c_lanes,
        tile=TILE,  # cache key only: the program jits close over the global
        light_samples=int(settings.light_samples),
        lane_mod=float(n),
        max_bounces=float(settings.max_bounces),
        min_bounces=float(settings.min_bounces),
        russian_roulette=bool(settings.russian_roulette),
        only_direct=bool(settings.only_direct),
        width=float(width),
        height=float(height),
        start=float(start),
        wb_lo=float(wb.lower),
        wb_span=float(wb.span),
    )
    tabs = (scene.prim_tab, scene.dense_tab, scene.mat_tab, scene.light_tab,
            scene.spec_tab, scene.env_args, scene.med_args, scene.fetch_tab)
    settings_t = _freeze(settings_d)
    consts_t = _freeze(scene.consts)

    from pathtracer_tpu.core import sampling

    import os as _os

    if morton:
        state, counters = _mega_init_mapped(
            camera, key, jnp.asarray(pix_np), jnp.asarray(valid_np),
            settings_t, n_lanes, n_pad, jnp.float32(spp // replicas))
    else:
        state, counters = _mega_init(camera, key, settings_t, n_lanes, n_pad,
                                     jnp.float32(spp // replicas))
    k_iter = sampling.fold(key, 2)
    it_dev = jnp.int32(0)  # device-resident counter: no per-step transfers
    it = 0
    # FUSED single-dispatch round by DEFAULT for constant-env scenes: the
    # post-outage AOT compiler builds the big Mosaic body in seconds (the
    # round-3 "never finishes compiling" pathology is gone) and it measures
    # fastest on-chip (121.9 vs 110.4 Mrays/s for the 2-prog round at
    # TILE=4096, 1080p cornell). Env-feed scenes (HDR/Sun) keep the 2-prog
    # round — the feed's XLA ops must live between the kernels. Escape
    # hatches: PT_MEGA_NOFUSED / PT_MEGA_3PROG / PT_MEGA_1PROG /
    # PT_MEGA_ROUNDS.
    tex_feed = bool(scene.consts.get("tex_feed"))
    rounds_per_prog = max(int(_os.environ.get("PT_MEGA_ROUNDS", "1")), 1)
    if tex_feed:
        rounds_per_prog = 1  # the tex round is always its own program
    fused_ok = (scene.env_args is None
                and scene.med_args is None
                and not tex_feed
                and scene.dense_tab.shape[0] // 32 <= 4
                and not _os.environ.get("PT_MEGA_NOFUSED")
                and not _os.environ.get("PT_MEGA_3PROG")
                and not _os.environ.get("PT_MEGA_1PROG")
                # the opt-in compaction ladder was calibrated against the
                # 2-prog stepper; under fused its pure-escape pixels drift
                # ~1e-3 (test_mega_compaction_film_integrity, 2026-08-21)
                and not _os.environ.get("PT_MEGA_COMPACT")
                and rounds_per_prog == 1)
    # fused measured: +10% on single-chunk NEE scenes (cornell 121.9 vs
    # 110.4); slower + scoped-vmem-heavier on multi-chunk scenes (gem) —
    # hence the chunk gate above. The round-3 "-33% on the ls=0 furnace"
    # does NOT reproduce after the dead-tile skip (tools/ab_fused_ls0.py,
    # 2026-08-21: fused 19.76 vs 2prog 18.51 Mrays/s; at TILE=2048 21.49
    # vs 21.19), so ls=0 scenes take the fused round too (VERDICT r4 #6).
    if tex_feed:
        # uv-dependent surface textures: the feed needs K1's hit rows, so
        # the round is K1 | feed | K2 | K34 in one program (no fused/multi
        # variants)
        def step_fn(st, ct, itd, tb, k, s_t, c_t, ip):
            return _mega_step_texfeed(st, ct, itd, tb, scene.tex_args, k,
                                      s_t, c_t, ip)
    else:
        step_fn = (_step_fused if fused_ok
                   else _mega_step_3prog if _os.environ.get("PT_MEGA_3PROG")
                   else _mega_step_1prog if _os.environ.get("PT_MEGA_1PROG")
                   else functools.partial(_mega_step_multi,
                                          rounds=rounds_per_prog)
                   if rounds_per_prog > 1
                   else _mega_step)
    # hard cap: expected rounds ~ per-lane spp x mean path length; 8x headroom
    max_iters = int((spp // replicas) * settings.max_bounces * 8 + 64)
    # occupancy compaction ladder (OPT-IN, PT_MEGA_COMPACT=1): once the
    # alive population halves, stable-partition lanes alive-first and run
    # the kernels on the front half only; parked tails hold only dead lanes
    # whose acc/pix rows are final. Measured on the axon tunnel it is a net
    # LOSS at bench spp (17.7 vs 60.7 Mrays/s): each new lane width is a
    # fresh Mosaic compile of every kernel and the occupancy drain curve
    # (tools/profile_mega_kernels.py --drain) caps the savable tail compute
    # at ~15% of the render. Kept for long-tail/high-spp workloads on
    # toolchains with persistent compile caches.
    parked = []
    m = n_pad
    compact = bool(_os.environ.get("PT_MEGA_COMPACT"))
    # parked-tail film assembly reads pixel ids from the f32 S_PIX row,
    # exact only below 2^24 (ADVICE r3 #4)
    if compact:
        assert start + n < (1 << 24), \
            "PT_MEGA_COMPACT: pixel ids ride f32 state rows (< 2^24)"
    if compact:
        # the compaction ladder needs a CURRENT population, so its checks
        # stay blocking (opt-in path; measured a loss at bench spp anyway)
        calls_per_sync = max(ALIVE_CHECK_EVERY // rounds_per_prog, 1)
        while it < max_iters:
            for _ in range(calls_per_sync):
                state, counters, it_dev = step_fn(
                    state, counters, it_dev, tabs, k_iter, settings_t,
                    consts_t, interpret)
                it += rounds_per_prog
            alive = float(np.asarray(_alive_count(state)))
            if alive == 0.0:
                break
            m_new = m
            while m_new > step and alive <= (m_new // 2):
                m_new = -(-(m_new // 2) // step) * step
            if m_new < m:
                state, tail = _compact(state, m_new)
                parked.append(tail)
                m = m_new
    else:
        # pipelined termination checks: every blocking alive fetch stalls a
        # full tunnel RTT (~35 ms vs ~8 ms/round of device compute), so the
        # loop used to spend ~20% of wall clock waiting on scalars. Instead
        # ISSUE a tiny alive-count program every ALIVE_CHECK_ASYNC rounds
        # and only READ a future one interval later — by then the device
        # has executed another interval of rounds and the scalar has long
        # since landed host-side, so the read returns without stalling.
        # Termination is still exact (break on the first zero count); the
        # only cost is up to one extra interval of all-dead rounds, which
        # are cheaper than the stalls they replace.
        #
        # Occupancy-adaptive tail (PT_MEGA_TAIL=0 disables): the measured
        # drain curve (tools/probe_wall.py, 1080p cornell @12spp) runs HALF
        # its rounds below 6% occupancy — straggler lanes keep the
        # full-width wavefront alive for ~45 rounds at ~9.7 ms each.
        # Compaction alone cannot win on this tunnel (rule 8: the smaller
        # rounds land under the ~8.8 ms/program pacing floor) and neither
        # can round-chaining alone (dead lanes still compute, so full-width
        # device cost is occupancy-independent) — but COMBINED they
        # multiply: stable-partition the wavefront down a QUANTIZED width
        # ladder (n/8, n/64 — fixed divisors so the per-width Mosaic
        # compiles stay warm across renders) and chain K = n_pad/m rounds
        # per program so each program's device cost stays at the pacing
        # floor. Small wavefronts (512² films) are floor-bound even at
        # full occupancy, so they start chained (k0). Lane slots key the
        # per-round uniform streams, so compaction is estimator-identical,
        # not bit-identical (S_PIX rides the state; parked tails hold only
        # dead lanes whose acc rows are final — same contract as the
        # opt-in ladder above).
        # Default OFF (opt-in PT_MEGA_TAIL=1): each ladder width x chain
        # factor is a fresh multi-body Mosaic compile; with no committed
        # on-chip A/B win and the round-3 driver bench timing out with the
        # ladder in place (BENCH_r03 rc=124), the committed default is the
        # measured 106-120 Mrays/s pipelined-checks loop (ADVICE r3 #1).
        tail_env = _os.environ.get("PT_MEGA_TAIL", "0")
        tail_on = (tail_env != "0"
                   and rounds_per_prog == 1
                   and (fused_ok or step_fn is _mega_step)
                   # interpret builds keep the exact sequential stream
                   # (bit-identity tests pin it) unless forced
                   and (not interpret or tail_env == "force"))
        if tail_on:
            assert start + n < (1 << 24), \
                "PT_MEGA_TAIL: pixel ids ride f32 state rows (< 2^24)"
        n_chunks = scene.dense_tab.shape[0] // 32
        prog_lanes = int(_os.environ.get("PT_MEGA_PROG_LANES",
                                         str(1 << 20)))
        k0 = 1
        if tail_on and not interpret:
            k0 = max(1, min(8, prog_lanes // max(n_pad * n_chunks, 1)))
        ladder: list = []
        if tail_on:
            for div in (8, 64):
                w = -(-max(n_pad // div, step) // step) * step
                if w < n_pad and (not ladder or w < ladder[-1]):
                    ladder.append(w)

        def _chained(k):
            if k == 1:
                return step_fn
            if fused_ok:
                return functools.partial(_step_fused_multi, rounds=k)
            return functools.partial(_mega_step_multi, rounds=k)

        m = n_pad
        if tail_on:
            k_cur = k0
            stepper = _chained(k_cur)
        else:
            # step_fn may already be the multi-round partial
            # (PT_MEGA_ROUNDS>1): track REAL rounds so the max_iters cap
            # and the check cadence stay in round units (ADVICE r3 #2)
            k_cur = rounds_per_prog
            stepper = step_fn
        # chain-only adaptive tail (PT_MEGA_CHAIN_TAIL=0 disables): once
        # the dead-tile skip makes low-occupancy rounds device-cheap, the
        # drain tail's remaining cost is the ~8.8 ms/program dispatch
        # pacing floor (PARITY rule 8). Chaining K rounds per program is
        # BITWISE-identical packaging (_mega_step_multi docstring), so
        # when the pipelined alive count drops below 1/8 (1/50) of the
        # wavefront, repackage to 4 (8) rounds per dispatch. Unlike the
        # opt-in compaction ladder this never changes lane population or
        # the sample stream. Compiles of the chained programs are seconds
        # on the rebuilt tunnel and persist in the repo compile cache.
        # single-chunk-class scenes only (<=4 chunks): those rounds are
        # pacing-floor-bound, which is the cost the tail removes. Multi-
        # chunk scenes are compute-bound per round (chaining buys ~nothing)
        # AND their K-round chained programs multiply the heavyweight
        # multi-chunk sweep body K times — the gem's lazy k=4/k=8 compiles
        # blew the round-5 driver bench's 700 s cap (2026-08-21).
        chain_tail = (not interpret
                      and not tail_on
                      and rounds_per_prog == 1
                      and not tex_feed
                      and n_chunks <= 4
                      and (fused_ok or step_fn is _mega_step)
                      and _os.environ.get("PT_MEGA_CHAIN_TAIL", "1") != "0")
        calls_per_sync = max(ALIVE_CHECK_ASYNC // k_cur, 1)
        pending: list = []  # (it_at_issue, device scalar future)
        stop = False
        while it < max_iters and not stop:
            for _ in range(calls_per_sync):
                state, counters, it_dev = stepper(
                    state, counters, it_dev, tabs, k_iter, settings_t,
                    consts_t, interpret)
                it += k_cur
            pending.append((it, _alive_count(state)))
            while pending and (it - pending[0][0] >= calls_per_sync * k_cur
                               or len(pending) > 3):
                _, fut = pending.pop(0)
                v = float(np.asarray(fut))
                if v == 0.0:
                    stop = True
                    break
                # descend the width ladder once the population clearly
                # fits: alive is monotone non-increasing, so the slightly
                # stale count is an upper bound on the current population
                if chain_tail:
                    frac = v / float(max(m, 1))
                    k_want = 8 if frac <= 0.02 else 4 if frac <= 0.125 \
                        else k_cur
                    if k_want > k_cur:
                        k_cur = k_want
                        stepper = _chained(k_cur)
                        calls_per_sync = max(ALIVE_CHECK_ASYNC // k_cur, 1)
                target = m
                for w in ladder:
                    if w < target and v <= w // 2:
                        target = w
                if target < m:
                    state, tail_seg = _compact(state, target)
                    parked.append(tail_seg)
                    m = target
                    # chain depth capped at 8 (compile budget): the n/64
                    # rung therefore runs ~n_pad/8 lane-rounds per program,
                    # above the pacing floor — acceptable for the opt-in
                    # ladder (ADVICE r3 #3)
                    k_cur = max(k0, min(8, n_pad // m))
                    stepper = _chained(k_cur)
                    calls_per_sync = max(ALIVE_CHECK_ASYNC // k_cur, 1)
                    # stale counts are superseded by checks on the front
                    pending.clear()
                    break
    if parked:
        parked.append(_acc_rows(state))
        # assemble by owning pixel: every lane's acc rows land at pix-start
        acc = np.zeros((n, 3), np.float32)
        pix_row = S_PIX - S_ACC
        for seg in parked:
            seg_h = np.asarray(seg)
            idx = seg_h[pix_row].astype(np.int64) - start
            ok = (idx >= 0) & (idx < n)
            # additive: replica lanes share a pixel
            np.add.at(acc, idx[ok], seg_h[:3, ok].T)
        return jnp.asarray(acc), counters
    if morton:
        # lanes are block-ordered: scatter acc rows back to pixel order
        # (ONE XLA scatter per render; padding lanes weighted out)
        accT = state[S_ACC:S_ACC + 3, :].T
        idx = jnp.asarray(pix_np.astype(np.int32))
        w = jnp.asarray(valid_np)
        return jnp.zeros((n, 3), jnp.float32).at[idx].add(
            accT * w[:, None]), counters
    acc = state[S_ACC:S_ACC + 3, :n_lanes].T
    if replicas > 1:
        acc = acc.reshape(replicas, n, 3).sum(axis=0)
    return acc, counters


# ===================== FUSED single-dispatch bounce round =====================
# Every per-program dispatch over the axon tunnel costs ~3 ms, so even the
# 5-program pipeline spends more time in launches than in compute at 1080p.
# This variant inlines the closest-hit sweep, both shadow sweeps, the
# shading AND the finalize/respawn into ONE Pallas kernel — one dispatch
# per bounce round. It is still a single pallas_call, so the tunnel's
# multi-call compile pathology does not apply; Mosaic compiles the larger
# body in seconds.

PBF = 32   # fused-sweep prim block (sublanes)
GWF = 512  # fused-sweep ray group (lanes)


def _sweep_tiles(dense_ref, o, d, t_max, closest, present_list=None,
                 aabb_base=None, ftab_ref=None, bvh1_base=None,
                 bvh1_present=None):
    """In-kernel sweep over [SUB, 128] ray tiles (lanes = rays): reshape to
    (TILE//GWF, GWF) row groups, test PBF-prim sublane blocks, reduce via
    dense.sweep_rowgroup (long homogeneous chunk runs ride a fori_loop —
    flattened instanced scenes keep the Mosaic body O(type runs)).
    closest=True -> (t [SUB,128], id [SUB,128]); else blocked mask.
    present_list: static per-chunk type presence (dense.chunk_type_presence,
    block=PBF).

    ftab_ref set -> per-lane front-to-back chunk traversal instead
    (dense.sweep_rowgroup_bvh1): each lane visits only the chunks its ray
    enters, nearest-first, via one-hot MXU chunk fetches; bvh1_base is the
    dense-table row offset of the chunk-AABB rows, bvh1_present the static
    scene-wide type presence."""
    from pathtracer_tpu.kernels.dense import sweep_rowgroup, sweep_rowgroup_bvh1

    g = TILE // GWF
    rs = lambda x: x.reshape(g, GWF)
    ox, oy, oz = rs(o.x), rs(o.y), rs(o.z)
    dx, dy, dz = rs(d.x), rs(d.y), rs(d.z)
    tmax_r = rs(t_max) if hasattr(t_max, "reshape") else None
    rows_a, rows_b = [], []
    for rg in range(g):
        oxr = ox[rg:rg + 1, :]
        oyr = oy[rg:rg + 1, :]
        ozr = oz[rg:rg + 1, :]
        dxr = dx[rg:rg + 1, :]
        dyr = dy[rg:rg + 1, :]
        dzr = dz[rg:rg + 1, :]
        tmin = jnp.full((1, GWF), INTERSECTION_TIME_OFFSET, jnp.float32)
        tmax = (tmax_r[rg:rg + 1, :] if tmax_r is not None
                else jnp.full((1, GWF), RAY_TMAX, jnp.float32))
        if ftab_ref is not None:
            if closest:
                best_t, best_id = sweep_rowgroup_bvh1(
                    dense_ref, ftab_ref, PBF, bvh1_base,
                    oxr, oyr, ozr, dxr, dyr, dzr, tmin, tmax,
                    closest=True, present=bvh1_present)
                hitf = jnp.isfinite(best_t)
                rows_a.append(best_t)
                rows_b.append(jnp.where(hitf, best_id, -1.0))
            else:
                rows_a.append(sweep_rowgroup_bvh1(
                    dense_ref, ftab_ref, PBF, bvh1_base,
                    oxr, oyr, ozr, dxr, dyr, dzr, tmin, tmax,
                    closest=False, present=bvh1_present))
        elif closest:
            best_t, best_id = sweep_rowgroup(
                dense_ref, PBF, oxr, oyr, ozr, dxr, dyr, dzr, tmin, tmax,
                closest=True, chunk_types=present_list,
                aabb_base=aabb_base)
            hitf = jnp.isfinite(best_t)
            rows_a.append(best_t)
            rows_b.append(jnp.where(hitf, best_id, -1.0))
        else:
            rows_a.append(sweep_rowgroup(
                dense_ref, PBF, oxr, oyr, ozr, dxr, dyr, dzr, tmin, tmax,
                closest=False, chunk_types=present_list,
                aabb_base=aabb_base))
    if closest:
        return (jnp.stack(rows_a).reshape(SUB, 128),
                jnp.stack(rows_b).reshape(SUB, 128))
    return jnp.stack(rows_a).reshape(SUB, 128) > 0.5


def _all_kernel(consts, settings, u_ref, state_ref, dense_ref, prim_ref,
                mat_ref, light_ref, spec_ref, out_ref):
    """The whole bounce round (K1+K2+K3+K4) in one Mosaic kernel.

    Identical math to _shade_kernel + _finalize_kernel with the sweeps from
    kernels/dense.py inlined via _sweep_tiles (same per-function reference
    citations apply); NEE shadow rays resolve immediately instead of
    round-tripping through HBM."""
    if _skip_dead():
        alive_any = _tile_alive(state_ref)
        pl.when(alive_any)(
            lambda: _all_kernel_body(consts, settings, u_ref, state_ref,
                                     dense_ref, prim_ref, mat_ref, light_ref,
                                     spec_ref, out_ref))
        pl.when(jnp.logical_not(alive_any))(
            lambda: _finalize_passthrough(state_ref, out_ref))
        return
    _all_kernel_body(consts, settings, u_ref, state_ref, dense_ref, prim_ref,
                     mat_ref, light_ref, spec_ref, out_ref)


def _all_kernel_body(consts, settings, u_ref, state_ref, dense_ref, prim_ref,
                     mat_ref, light_ref, spec_ref, out_ref):
    c = consts
    ls = settings["light_samples"]
    C = settings["c_lanes"]
    nee_enabled = ls > 0
    p_env = c["p_env"]
    n_mats = c["n_mats"]
    n_lights = c["n_lights"]
    have_lights = n_lights > 0
    max_bounces = settings["max_bounces"]
    min_bounces = settings["min_bounces"]
    rr_enabled = settings["russian_roulette"]
    only_direct = settings["only_direct"]
    width = settings["width"]
    height = settings["height"]
    start = settings["start"]
    wb_lo = settings["wb_lo"]
    wb_span = settings["wb_span"]

    s = lambda i: _tile(state_ref[i, :])
    o = V3(s(S_O), s(S_O + 1), s(S_O + 2))
    d = V3(s(S_D), s(S_D + 1), s(S_D + 2))
    lam = [s(S_LAM + i) for i in range(C)]
    beta = [s(S_BETA + i) for i in range(C)]
    rad = [s(S_RAD + i) for i in range(C)]
    acc = [s(S_ACC + i) for i in range(3)]
    done = s(S_DONE)
    alive = s(S_ALIVE) > 0.5
    bounce_ct = s(S_BOUNCE)
    prev_pdf = s(S_PREV_PDF)
    # hero-wavelength spectral MIS (see pt.py body)
    if C > 1:
        sum_pdfr = s(S_PDFR + 0)
        for ci in range(1, C):
            sum_pdfr = sum_pdfr + s(S_PDFR + ci)
        s_mis = C / jnp.maximum(sum_pdfr, 1e-30)
    else:
        s_mis = jnp.ones((SUB, 128), jnp.float32)

    mat_tab = mat_ref[:]
    light_tab = light_ref[:]

    # ---- K1: closest hit straight off the live ray state
    t_hit, pid = _sweep_tiles(dense_ref, o, d, None, closest=True,
                              present_list=c.get("ct32"),
                              aabb_base=c.get("aabb_base"))
    hit = pid >= 0.0
    pid_c = jnp.maximum(pid, 0.0)

    attr = _prim_attr_fetch(prim_ref, pid_c)
    point, normal, gn, mat_id, kind, area = _hit_attributes(attr, o, d, t_hit)
    at_surface = alive & hit & (kind != 2.0)

    prec = (jax.lax.Precision.HIGHEST if c.get("spec_f32", False)
            else jax.lax.Precision.DEFAULT)
    spec = spec_ref[:, :]
    R = [_spectral_fetch(spec, lam[ci], c["lam_lo"], c["lam_hi"], prec)
         for ci in range(C)]

    env_row = 5 * n_mats
    escaped = alive & ~hit
    if nee_enabled and p_env > 0.0:
        er = c["env_rot"]
        dz = er[6] * d.x + er[7] * d.y + er[8] * d.z
        # sqrt identity instead of arccos (see _shade_body note)
        jac = (2.0 * jnp.pi * jnp.pi
               * jnp.sqrt(jnp.maximum(1.0 - dz * dz, 0.0)) + 0.001)
        env_nee_pdf = (1.0 / jac) * p_env
        use_mis_env = (bounce_ct > 0.5) & (env_nee_pdf + prev_pdf > 0.0)
        w_env = jnp.where(use_mis_env,
                          _balance(prev_pdf, jnp.maximum(env_nee_pdf, 0.0)), 1.0)
    else:
        w_env = jnp.ones((SUB, 128), jnp.float32)
    for ci in range(C):
        env_e = _tile(R[ci][env_row, :])
        rad[ci] = rad[ci] + jnp.where(escaped,
                                      beta[ci] * s_mis * env_e * w_env, 0.0)
    env_ct = escaped.astype(jnp.float32)

    wi_world = -d
    cos_at_light = cmath.dot(gn, wi_world)
    side = _mat_param(mat_tab, _M_SIDE, mat_id, n_mats)
    sharp = _mat_param(mat_tab, _M_SHARP, mat_id, n_mats)
    mtype = _mat_param(mat_tab, _M_TYPE, mat_id, n_mats)
    if have_lights:
        pick_pdf = (1.0 - p_env) / float(max(n_lights, 1))
        hyp = pick_pdf * t_hit * t_hit / jnp.maximum(
            jnp.abs(cos_at_light) * area, 1e-30)
        hyp = jnp.where(jnp.abs(cos_at_light) * area > 0.0, hyp, 0.0)
        use_mis_l = (bounce_ct > 0.5) & nee_enabled
        w_light = jnp.where(use_mis_l & (prev_pdf + hyp > 0.0),
                            _balance(prev_pdf, jnp.maximum(hyp, 0.0)), 1.0)
        is_light_hit = at_surface & (kind == 1.0)
        for ci in range(C):
            spd = _sel_rows(R[ci], mat_id, 4, n_mats, stride=5)
            le = _emission_value(spd, mtype, side, sharp, cos_at_light,
                                 has_sharp=c["has_sharp"])
            rad[ci] = rad[ci] + jnp.where(is_light_hit,
                                          beta[ci] * s_mis * le * w_light, 0.0)

    tgt, btg = cmath.orthonormal_basis(normal)
    wi_local = cmath.to_local(tgt, btg, normal, wi_world)

    alpha = _mat_param(mat_tab, _M_ALPHA, mat_id, n_mats)
    metal = _mat_param(mat_tab, _M_METAL, mat_id, n_mats)
    perm = _mat_param(mat_tab, _M_PERM, mat_id, n_mats)
    rscale = _mat_param(mat_tab, _M_RSCALE, mat_id, n_mats)
    eta_i = [_sel_rows(R[ci], mat_id, 0, n_mats, stride=5) for ci in range(C)]
    eta_o = [_sel_rows(R[ci], mat_id, 1, n_mats, stride=5) for ci in range(C)]
    kappa = [_sel_rows(R[ci], mat_id, 2, n_mats, stride=5) for ci in range(C)]
    refl = [rscale * _sel_rows(R[ci], mat_id, 3, n_mats, stride=5)
            for ci in range(C)]

    shadow_ct = jnp.zeros((SUB, 128), jnp.float32)

    # ---- NEE with IMMEDIATE shadow resolution (K2+K3 fused)
    if nee_enabled:
        inv_ls = 1.0 / ls
        for si in range(ls):
            u_pick = _tile(u_ref[3 * si, :])
            u1 = _tile(u_ref[3 * si + 1, :])
            u2 = _tile(u_ref[3 * si + 2, :])
            if p_env > 0.0:
                chose_env = u_pick < p_env
                u_pick2 = jnp.where(chose_env, u_pick / max(p_env, 1e-12),
                                    (u_pick - p_env) / max(1.0 - p_env, 1e-12))
                u_pick2 = jnp.clip(u_pick2, 0.0, 1.0 - 1e-7)
            else:
                chose_env = jnp.zeros((SUB, 128), bool)
                u_pick2 = u_pick
            li = jnp.minimum(jnp.floor(u_pick2 * max(n_lights, 1)),
                             float(max(n_lights, 1) - 1))

            def lrow(row):
                acc_l = jnp.zeros((SUB, 128), jnp.float32)
                for l in range(max(n_lights, 1)):
                    acc_l = acc_l + jnp.where(li == l, light_tab[row, l], 0.0)
                return acc_l

            lpa = V3(lrow(_L_PA), lrow(_L_PA + 1), lrow(_L_PA + 2))
            lpb = V3(lrow(_L_PB), lrow(_L_PB + 1), lrow(_L_PB + 2))
            lpc = V3(lrow(_L_PC), lrow(_L_PC + 1), lrow(_L_PC + 2))
            lp_type = lrow(_L_PTYPE)
            l_area = lrow(_L_AREA)
            l_mat = lrow(_L_MAT)
            l_mtype = lrow(_L_MTYPE)
            l_side = lrow(_L_SIDE)
            l_sharp = lrow(_L_SHARP)
            lp, ln = _sample_surface_light(lp_type, lpa, lpb, lpc, u1, u2)
            area_pdf = 1.0 / jnp.maximum(l_area, 1e-20)
            to_l = lp - point
            dist2 = jnp.maximum(cmath.length_squared(to_l), 1e-12)
            dist = jnp.sqrt(dist2)
            dir_l = to_l.scale(1.0 / dist)
            cos_l = cmath.dot(ln, -dir_l)
            lp_pdf = 1.0 / float(max(n_lights, 1))
            sa_pdf_light = (1.0 - p_env) * lp_pdf * area_pdf * jnp.where(
                jnp.abs(cos_l) > 0.0, dist2 / jnp.maximum(jnp.abs(cos_l), 1e-30), 0.0)
            if p_env > 0.0:
                env_d_uv = cmath.uv_to_direction(u1, u2)
                ri = c["env_rot_inv"]
                env_dir = V3(
                    ri[0] * env_d_uv.x + ri[1] * env_d_uv.y + ri[2] * env_d_uv.z,
                    ri[3] * env_d_uv.x + ri[4] * env_d_uv.y + ri[5] * env_d_uv.z,
                    ri[6] * env_d_uv.x + ri[7] * env_d_uv.y + ri[8] * env_d_uv.z,
                )
                jac_s = 2.0 * jnp.pi * jnp.pi * jnp.sin(jnp.pi * u2) + 0.001
                sa_pdf_env = (1.0 / jac_s) * p_env
                nee_dir = cmath.where(chose_env, env_dir, dir_l)
                nee_pdf = jnp.where(chose_env, sa_pdf_env, sa_pdf_light)
                nee_tmax = jnp.where(chose_env, RAY_TMAX, dist * 0.99)
            else:
                nee_dir = dir_l
                nee_pdf = sa_pdf_light
                nee_tmax = dist * 0.99
            wo_local = cmath.to_local(tgt, btg, normal, nee_dir)
            max_le = jnp.zeros((SUB, 128), jnp.float32)
            max_thr = jnp.zeros((SUB, 128), jnp.float32)
            contribs = []
            nee_fs, nee_pdfs = _bsdf_eval_lanes(
                mtype, alpha, metal, perm, eta_i, eta_o, kappa, refl,
                wi_local, wo_local, TransportMode.Radiance,
                has_ggx=c["has_ggx"], has_metal=c.get("has_metal", True))
            pdf_s0 = None
            for ci in range(C):
                f_ci, pdf_ci = nee_fs[ci], nee_pdfs[ci]
                if ci == 0:
                    pdf_s0 = pdf_ci
                spd_l = _sel_rows(R[ci], l_mat, 4, n_mats, stride=5)
                le_inst = _emission_value(spd_l, l_mtype, l_side, l_sharp,
                                          cos_l, has_sharp=c["has_sharp"])
                if p_env > 0.0:
                    env_e_s = _tile(R[ci][env_row, :])
                    le_ci = jnp.where(chose_env, env_e_s, le_inst)
                else:
                    le_ci = le_inst
                thr_ci = f_ci * jnp.abs(wo_local.z)
                max_le = jnp.maximum(max_le, le_ci)
                max_thr = jnp.maximum(max_thr, thr_ci)
                contribs.append((thr_ci, le_ci))
            worth = (at_surface & (max_le > 0.0) & (nee_pdf > 1e-12)
                     & (max_thr > 0.0))
            w_nee = _balance(nee_pdf, jnp.maximum(pdf_s0, 0.0))
            so = point + gn.scale(
                NORMAL_OFFSET * jnp.sign(cmath.dot(gn, nee_dir) + 1e-9))
            # shadow sweep INLINE (K3)
            blocked = _sweep_tiles(dense_ref, so, nee_dir, nee_tmax,
                                   closest=False,
                                   present_list=c.get("ct32"),
                                   aabb_base=c.get("aabb_base"))
            ok = worth & ~blocked
            inv_pdf = jnp.where(nee_pdf > 1e-12,
                                1.0 / jnp.maximum(nee_pdf, 1e-12), 0.0)
            for ci in range(C):
                thr_ci, le_ci = contribs[ci]
                contrib = (beta[ci] * s_mis * thr_ci * le_ci
                           * w_nee * inv_pdf * inv_ls)
                rad[ci] = rad[ci] + jnp.where(ok, contrib, 0.0)
            shadow_ct = shadow_ct + (at_surface & worth).astype(jnp.float32)

    # ---- BSDF sample + HWSS ratios (as _shade_kernel)
    u_b = [_tile(u_ref[3 * ls + i, :]) for i in range(3)]
    wo_lam_s, f_lam_s, pdf_lam_s = cmath.sample_lambertian(refl[0], wi_local,
                                                           u_b[0], u_b[1])
    w_lam_s = jnp.minimum(refl[0], 1.0)
    if c["has_ggx"]:
        a_g = jnp.maximum(alpha, 1e-4)
        wo_ggx_s, f_ggx_s, pdf_ggx_s, w_ggx_s = cmath.sample_ggx(
            a_g, jnp.maximum(eta_i[0], 1e-3), jnp.maximum(eta_o[0], 1e-3),
            kappa[0], metal > 0.5, perm, wi_local, u_b[0], u_b[1], u_b[2],
            TransportMode.Radiance, has_metal=c.get("has_metal", True))
        is_ggx = mtype == MAT_GGX
        wo_local_s = cmath.where(is_ggx, wo_ggx_s, wo_lam_s)
        f_pdf = jnp.where(is_ggx, pdf_ggx_s, pdf_lam_s)
        ratio_hero = jnp.where(is_ggx, w_ggx_s, w_lam_s)
    else:
        wo_local_s = wo_lam_s
        f_pdf = pdf_lam_s
        ratio_hero = w_lam_s
    is_pass = mtype == 4.0
    f_pdf = jnp.where(is_pass, 0.0, f_pdf)
    ratio_hero = jnp.where(is_pass, 0.0, ratio_hero)

    f_lanes, p_lanes = _bsdf_eval_lanes(
        mtype, alpha, metal, perm, eta_i, eta_o, kappa, refl,
        wi_local, wo_local_s, TransportMode.Radiance,
        has_ggx=c["has_ggx"], has_metal=c.get("has_metal", True))
    hero_f = f_lanes[0]
    hero_dead = (hero_f <= 0.0) & (f_pdf > 1e-12)
    inv_hero = jnp.where(hero_f > 0.0, 1.0 / jnp.where(hero_f > 0.0, hero_f, 1.0), 0.0)
    inv_fpdf = jnp.where(f_pdf > 1e-12, 1.0 / jnp.maximum(f_pdf, 1e-12), 0.0)
    ratios = [ratio_hero]
    for ci in range(1, C):
        stable = ratio_hero * f_lanes[ci] * inv_hero
        direct = f_lanes[ci] * jnp.abs(wo_local_s.z) * inv_fpdf
        ratios.append(jnp.where(hero_dead, direct, stable))
    sample_ok = (f_pdf > 1e-12)

    d_new = cmath.normalize(cmath.to_world(tgt, btg, normal, wo_local_s))
    o_new = point + gn.scale(NORMAL_OFFSET * jnp.sign(cmath.dot(gn, d_new)))

    # ---- K4: RR + death + respawn — shared finalize tail
    # (_finalize_core, the single source of truth with _finalize_body);
    # the fused round indexes its own uniform block and computes pscale
    # inline (no K2 round-trip). Fused rounds exclude medium scenes.
    inv_p0 = jnp.where(p_lanes[0] > 0.0,
                       1.0 / jnp.where(p_lanes[0] > 0.0, p_lanes[0], 1.0), 0.0)
    pscale = [jnp.ones((SUB, 128), jnp.float32) if ci == 0
              else p_lanes[ci] * inv_p0 for ci in range(C)]
    _finalize_core(
        consts, settings, u_rr=_tile(u_ref[3 * ls + 3, :]),
        rnd=[_tile(u_ref[3 * ls + 4 + i, :]) for i in range(5)],
        s=s, state_ref=state_ref, out_ref=out_ref,
        lam=lam, beta=beta, rad=rad, acc=acc, done=done, alive=alive,
        bounce_ct=bounce_ct, at_surface=at_surface, f_pdf=f_pdf,
        sample_ok=sample_ok, ratios=ratios, o=o, d=d, o_new=o_new,
        d_new=d_new, pscale=pscale)
    out_ref[O4_CAMERA_CT + 1, :] = _flatrow(shadow_ct)
    out_ref[O4_CAMERA_CT + 2, :] = _flatrow(env_ct)
    for row in range(O4_CAMERA_CT + 3, NK4):
        out_ref[row, :] = jnp.zeros((TILE,), jnp.float32)


O4_SHADOW_CT = O4_CAMERA_CT + 1
O4_ENV_CT = O4_CAMERA_CT + 2


def _nu_fused(light_samples):
    """3 per NEE sample + 3 (bsdf) + 1 (RR) + 5 (respawn), sublane-padded."""
    return -(-(3 * light_samples + 9) // 8) * 8


@_mega_jit(static_argnames=("settings_t", "consts_t", "interpret",))
def _step_fused(state, counters, it_dev, tabs, key, settings_t, consts_t,
                interpret):
    """One bounce round = ONE dispatched program (uniform draw + one fused
    pallas call + counter reduction)."""
    import jax.random as jrandom

    settings = dict(settings_t)
    consts = dict(consts_t)
    interp = pltpu.InterpretParams() if interpret else False
    prim_tab, dense_tab, mat_tab, light_tab, spec_tab, env_args, med_args = \
        tabs[:7]
    assert env_args is None and med_args is None, (
        "fused single-dispatch round does not support HDR/Sun environments "
        "or medium-aware transport — their XLA feeds must live between the "
        "kernels (pt_trace_regen_mega routes them to the split pipeline)")
    n_pad = state.shape[1]
    ls = settings["light_samples"]
    nu = _nu_fused(ls)
    u = jrandom.uniform(jrandom.fold_in(key, it_dev), (nu, n_pad))
    out = pl.pallas_call(
        functools.partial(_all_kernel, consts, settings),
        grid=(n_pad // TILE,),
        in_specs=[
            _row_spec(nu),
            _row_spec(NS),
            _full_block_spec(dense_tab),
            _full_block_spec(prim_tab),
            _full_block_spec(mat_tab),
            _full_block_spec(light_tab),
            _full_block_spec(spec_tab),
        ],
        out_specs=_row_spec(NK4),
        out_shape=jax.ShapeDtypeStruct((NK4, n_pad), jnp.float32),
        interpret=interp,
    )(u, state, dense_tab, prim_tab, mat_tab, light_tab, spec_tab)
    state_out = out[:NS]
    counters = counters.at[prof.BOUNCE_RAYS].add(jnp.sum(out[O4_BOUNCE_CT]))
    counters = counters.at[prof.SHADOW_RAYS].add(jnp.sum(out[O4_SHADOW_CT]))
    counters = counters.at[prof.CAMERA_RAYS].add(jnp.sum(out[O4_CAMERA_CT]))
    counters = counters.at[prof.ENV_HITS].add(jnp.sum(out[O4_ENV_CT]))
    return state_out, counters, it_dev + 1


@_mega_jit(static_argnames=("settings_t", "consts_t", "interpret", "rounds"))
def _step_fused_multi(state, counters, it_dev, tabs, key, settings_t,
                      consts_t, interpret, rounds):
    """`rounds` FUSED bounce rounds chained in ONE dispatched program
    (`rounds` pallas calls). Bitwise the same ops and uniform stream as
    `rounds` sequential _step_fused calls (each inlined body draws its own
    uniforms off the incremented it_dev) — only the program packaging
    changes. This is the tail/chaining lever: the tunnel paces dispatch at
    ~8.8 ms per PROGRAM (PARITY rule 8), so K cheap rounds (small or
    compacted wavefronts) chained into one program cost one pacing
    interval instead of K."""
    for _ in range(rounds):
        state, counters, it_dev = _step_fused.raw(
            state, counters, it_dev, tabs, key, settings_t, consts_t,
            interpret)
    return state, counters, it_dev
