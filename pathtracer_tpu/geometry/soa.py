"""Scene geometry as structure-of-arrays + batched intersection.

TPU-first redesign of the reference's Hittable/Aggregate/Instance stack
(src/hittable.rs:53-77, src/geometry/mod.rs:17-122, src/geometry/instance.rs):
instead of enum dispatch per ray, ALL scene primitives (mesh triangles are
pre-expanded and pre-transformed to world space; parametric prims keep a
transform index) live in one padded SoA block. Intersection is a dense
rays × primitive-chunks sweep with a running min — on TPU this dense
formulation beats pointer-chasing traversal for scenes up to a few thousand
primitives and is the fallback leaf loop for the BVH path (accel/).

Primitive encodings (pa/pb/pc are [P,3] payload slots):
  TRIANGLE: pa,pb,pc = world-space vertices; na,nb,nc = shading normals
  SPHERE:   pa = center (local), pb[0] = radius
  RECT:     pa = center, pb = half-edge u, pc = half-edge v (local)
  DISK:     pa = center, pb = unit normal, pc[0] = radius (local)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pathtracer_tpu.core import vecmath
from pathtracer_tpu.prelude import RAY_TMAX

PRIM_TRIANGLE = 0
PRIM_SPHERE = 1
PRIM_RECT = 2
PRIM_DISK = 3

_CHUNK = 16  # primitive chunk width for the dense sweep
# chunk-loop unroll threshold: unrolled sweeps fuse into ONE XLA kernel
# (the lax.scan form round-trips the carry and runs ~100x slower on TPU)
_UNROLL_MAX = 24  # covers DENSE_MAX_PRIMS/16 chunks; scan carries are slower


class Primitives(NamedTuple):
    ptype: jnp.ndarray  # i32[P]
    pa: jnp.ndarray  # f32[P,3]
    pb: jnp.ndarray  # f32[P,3]
    pc: jnp.ndarray  # f32[P,3]
    na: jnp.ndarray  # f32[P,3] triangle shading normals
    nb: jnp.ndarray
    nc: jnp.ndarray
    material_id: jnp.ndarray  # i32[P] index into material table
    mat_kind: jnp.ndarray  # i32[P] 0=Material 1=Light 2=Camera (MaterialId kind)
    instance_id: jnp.ndarray  # i32[P]
    transform_id: jnp.ndarray  # i32[P]; 0 == identity
    area: jnp.ndarray  # f32[P] world-space surface area (host precomputed)
    valid: jnp.ndarray  # bool[P] padding mask
    xf_fwd: jnp.ndarray  # f32[T,4,4] local->world
    xf_inv: jnp.ndarray  # f32[T,4,4] world->local

    @property
    def count(self):
        return self.ptype.shape[0]


class HitRecord(NamedTuple):
    """Wavefront hit record — SoA analogue of the reference's HitRecord
    (src/hittable.rs:7-16)."""

    t: jnp.ndarray  # f32[N]
    point: jnp.ndarray  # f32[N,3]
    normal: jnp.ndarray  # f32[N,3] shading normal (unit)
    geo_normal: jnp.ndarray  # f32[N,3]
    uv: jnp.ndarray  # f32[N,2]
    material_id: jnp.ndarray  # i32[N]
    mat_kind: jnp.ndarray  # i32[N]
    instance_id: jnp.ndarray  # i32[N]
    prim_id: jnp.ndarray  # i32[N]
    hit: jnp.ndarray  # bool[N]


# ----------------------------------------------------------- t-only tests


def _t_triangle(pa, pb, pc, o, d, t_min, t_max):
    """Watertight ray-triangle test (PBRT / reference mesh.rs:67-198 style):
    translate to ray origin, permute axes so |d| is largest along z, shear
    into ray space, then signed 2-D edge functions. Adjacent triangles share
    an edge whose edge function is the exact negation across the pair, so a
    ray crossing a shared edge hits exactly one of the two (or both when the
    edge function is exactly zero — boundary-inclusive like the reference's
    f64 fallback resolution); no leaks at grazing angles.
    All args broadcast (ray batch × prim chunk)."""
    ax, ay, az = jnp.abs(d[..., 0]), jnp.abs(d[..., 1]), jnp.abs(d[..., 2])
    # kz = argmax |d|, kx/ky the cyclic others (winding preserved).
    # Selection is via vectorized where-masks, NOT take_along_axis: per-lane
    # dynamic component indexing lowers to catastrophic scalar code on the
    # TPU VPU (measured ~100x whole-sweep slowdown).
    kz_x = (ax > ay) & (ax > az)
    kz_y = ~kz_x & (ay > az)
    kz_z = ~kz_x & ~kz_y

    def comp_cyclic(v):
        """Returns (v[kx], v[ky], v[kz]) with kx=(kz+1)%3, ky=(kz+2)%3."""
        vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
        c_kz = jnp.where(kz_x, vx, jnp.where(kz_y, vy, vz))
        c_kx = jnp.where(kz_x, vy, jnp.where(kz_y, vz, vx))
        c_ky = jnp.where(kz_x, vz, jnp.where(kz_y, vx, vy))
        return c_kx, c_ky, c_kz

    dx_, dy_, dz = comp_cyclic(d)
    inv_dz = 1.0 / jnp.where(jnp.abs(dz) > 1e-30, dz, 1.0)
    sx = -dx_ * inv_dz
    sy = -dy_ * inv_dz

    def project(v):
        p = v - o
        px, py, pz = comp_cyclic(p)
        return px + sx * pz, py + sy * pz, pz * inv_dz

    x0, y0, z0 = project(pa)
    x1, y1, z1 = project(pb)
    x2, y2, z2 = project(pc)
    e0 = x1 * y2 - y1 * x2
    e1 = x2 * y0 - y2 * x0
    e2 = x0 * y1 - y0 * x1
    det = e0 + e1 + e2
    inside = ~(((e0 < 0) | (e1 < 0) | (e2 < 0)) & ((e0 > 0) | (e1 > 0) | (e2 > 0)))
    t_scaled = e0 * z0 + e1 * z1 + e2 * z2
    t = t_scaled / jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
    ok = inside & (jnp.abs(det) > 1e-30) & (t > t_min) & (t < t_max)
    return jnp.where(ok, t, jnp.inf)


def _t_sphere(pa, pb, o, d, t_min, t_max):
    oc = o - pa
    a = vecmath.dot(d, d)
    half_b = vecmath.dot(oc, d)
    r = pb[..., 0]
    c = vecmath.dot(oc, oc) - r * r
    disc = half_b * half_b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv_a = 1.0 / jnp.maximum(a, 1e-20)
    t0 = (-half_b - sq) * inv_a
    t1 = (-half_b + sq) * inv_a
    t0_ok = (disc > 0.0) & (t0 > t_min) & (t0 < t_max)
    t1_ok = (disc > 0.0) & (t1 > t_min) & (t1 < t_max)
    t = jnp.where(t0_ok, t0, jnp.where(t1_ok, t1, jnp.inf))
    return t


def _t_rect(pa, pb, pc, o, d, t_min, t_max):
    n = jnp.cross(pb, pc)
    n = vecmath.normalize(n)
    denom = vecmath.dot(d, n)
    t = vecmath.dot(pa - o, n) / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
    p = o + t[..., None] * d
    rel = p - pa
    a = vecmath.dot(rel, pb) / jnp.maximum(vecmath.dot(pb, pb), 1e-20)
    b = vecmath.dot(rel, pc) / jnp.maximum(vecmath.dot(pc, pc), 1e-20)
    ok = (
        (jnp.abs(denom) > 1e-12)
        & (jnp.abs(a) <= 1.0)
        & (jnp.abs(b) <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    return jnp.where(ok, t, jnp.inf)


def _t_disk(pa, pb, pc, o, d, t_min, t_max):
    n = pb
    denom = vecmath.dot(d, n)
    t = vecmath.dot(pa - o, n) / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
    p = o + t[..., None] * d
    rel = p - pa
    r2 = vecmath.dot(rel, rel)
    rad = pc[..., 0]
    ok = (jnp.abs(denom) > 1e-12) & (r2 <= rad * rad) & (t > t_min) & (t < t_max)
    return jnp.where(ok, t, jnp.inf)


def _chunk_ts(prims: Primitives, idx, o, d, t_min, t_max):
    """t for rays [N] vs prim indices -> [N, C]. idx is either a shared
    chunk [C] or per-ray leaf indices [N, C] (BVH leaves). Handles per-prim
    transforms by moving rays into local space (t is preserved because
    direction is transformed without renormalisation,
    like src/geometry/instance.rs:89-133)."""
    per_ray = idx.ndim == 2
    pa, pb, pc = prims.pa[idx], prims.pb[idx], prims.pc[idx]
    ptype = prims.ptype[idx]
    if prims.xf_inv.shape[0] == 1:
        # static fast path: the whole scene is in world space (no instance
        # transforms) — skip the per-(ray, prim) 3x3 applications entirely
        o_l = o[:, None, :]
        d_l = d[:, None, :]
    else:
        tid = prims.transform_id[idx]
        m_inv = prims.xf_inv[tid]  # [C,4,4] or [N,C,4,4]
        if per_ray:
            o_l = jnp.einsum("ncij,nj->nci", m_inv[..., :3, :3], o) + m_inv[..., :3, 3]
            d_l = jnp.einsum("ncij,nj->nci", m_inv[..., :3, :3], d)
        else:
            o_l = jnp.einsum("cij,nj->nci", m_inv[:, :3, :3], o) + m_inv[None, :, :3, 3]
            d_l = jnp.einsum("cij,nj->nci", m_inv[:, :3, :3], d)
    if per_ray:
        pa_b, pb_b, pc_b = pa, pb, pc
    else:
        pa_b, pb_b, pc_b = pa[None], pb[None], pc[None]
    tmin_b = t_min[:, None]
    tmax_b = t_max[:, None]
    t_tri = _t_triangle(pa_b, pb_b, pc_b, o_l, d_l, tmin_b, tmax_b)
    t_sph = _t_sphere(pa_b, pb_b, o_l, d_l, tmin_b, tmax_b)
    t_rec = _t_rect(pa_b, pb_b, pc_b, o_l, d_l, tmin_b, tmax_b)
    t_dsk = _t_disk(pa_b, pb_b, pc_b, o_l, d_l, tmin_b, tmax_b)
    pt_b = ptype if per_ray else ptype[None]
    t = jnp.select(
        [pt_b == PRIM_TRIANGLE, pt_b == PRIM_SPHERE, pt_b == PRIM_RECT],
        [t_tri, t_sph, t_rec],
        t_dsk,
    )
    vmask = prims.valid[idx] if per_ray else prims.valid[idx][None]
    return jnp.where(vmask, t, jnp.inf)


def intersect_dense(prims: Primitives, o, d, t_min, t_max, ignore_prim=None) -> HitRecord:
    """Closest-hit over ALL primitives: scan over chunks with running min.

    o, d: f32[N,3]; t_min/t_max: f32[N]. `ignore_prim`: optional i32[N]
    primitive index to skip (self-intersection exclusion for shadow rays).
    """
    n = o.shape[0]
    p = prims.count
    n_chunks = p // _CHUNK
    chunk_ids = jnp.arange(p, dtype=jnp.int32).reshape(n_chunks, _CHUNK)

    def body(carry, idx):
        t_best, id_best = carry
        t = _chunk_ts(prims, idx, o, d, t_min, jnp.minimum(t_max, t_best))
        if ignore_prim is not None:
            t = jnp.where(idx[None] == ignore_prim[:, None], jnp.inf, t)
        c_arg = jnp.argmin(t, axis=-1)
        c_t = jnp.take_along_axis(t, c_arg[:, None], axis=-1)[:, 0]
        better = c_t < t_best
        t_best = jnp.where(better, c_t, t_best)
        id_best = jnp.where(better, idx[c_arg], id_best)
        return (t_best, id_best), None

    # derive the init carry from the (possibly shard_map-varying) ray arrays
    # so the scan carry's varying-manual-axes type matches the body output
    zero = o[:, 0] * 0.0 + t_min * 0.0
    init = (zero + jnp.inf, zero.astype(jnp.int32) - 1)
    if n_chunks <= _UNROLL_MAX:
        # small scenes: unroll so XLA fuses the whole sweep into one kernel
        carry = init
        for c in range(n_chunks):
            carry, _ = body(carry, chunk_ids[c])
        t_best, id_best = carry
    else:
        (t_best, id_best), _ = jax.lax.scan(body, init, chunk_ids)
    hit = id_best >= 0
    return _fill_attributes(prims, o, d, t_best, jnp.maximum(id_best, 0), hit)


def intersect_any_dense(prims: Primitives, o, d, t_min, t_max, ignore_prim=None):
    """Occlusion query: does any primitive block (t_min, t_max)? -> bool[N].

    Cheaper than intersect_dense: no argmin bookkeeping, no attribute fill —
    this is the shadow-ray hot path (~half of all ray tests in NEE-heavy
    renders, see src/integrator/pt.rs:177)."""
    n = o.shape[0]
    p = prims.count
    chunk_ids = jnp.arange(p, dtype=jnp.int32).reshape(p // _CHUNK, _CHUNK)

    def body(blocked, idx):
        t = _chunk_ts(prims, idx, o, d, t_min, t_max)
        if ignore_prim is not None:
            t = jnp.where(idx[None] == ignore_prim[:, None], jnp.inf, t)
        return blocked | jnp.any(jnp.isfinite(t), axis=-1), None

    zero = o[:, 0] * 0.0 + t_min * 0.0
    n_chunks = p // _CHUNK
    if n_chunks <= _UNROLL_MAX:
        blocked = zero > 1.0
        for c in range(n_chunks):
            blocked, _ = body(blocked, chunk_ids[c])
    else:
        blocked, _ = jax.lax.scan(body, zero > 1.0, chunk_ids)
    return blocked


def _fill_attributes(prims: Primitives, o, d, t, pid, hit,
                     m_fwd=None, m_inv=None) -> HitRecord:
    """Recompute full hit attributes for the single winning primitive.

    `m_fwd`/`m_inv`: optional per-ray [N,4,4] transform overrides (the
    two-level accelerator passes the winning instance's transform here;
    see accel/two_level.py)."""
    # ONE packed row gather for all per-prim attributes (separate column
    # gathers cost ~4ms each at 1M-lane wavefronts on TPU; the pack below is
    # loop-invariant and hoisted out of the render loop by XLA)
    attr_pack = jnp.concatenate(
        [
            prims.pa, prims.pb, prims.pc, prims.na, prims.nb, prims.nc,
            prims.ptype.astype(jnp.float32)[:, None],
            prims.material_id.astype(jnp.float32)[:, None],
            prims.mat_kind.astype(jnp.float32)[:, None],
            prims.instance_id.astype(jnp.float32)[:, None],
            prims.transform_id.astype(jnp.float32)[:, None],
        ],
        axis=1,
    )  # [P, 23]
    rows = attr_pack[pid]
    pa, pb, pc = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9]
    na, nb, nc = rows[:, 9:12], rows[:, 12:15], rows[:, 15:18]
    ptype = rows[:, 18].astype(jnp.int32)
    material_id = rows[:, 19].astype(jnp.int32)
    mat_kind = rows[:, 20].astype(jnp.int32)
    instance_id = rows[:, 21].astype(jnp.int32)
    transform_id = rows[:, 22].astype(jnp.int32)
    identity_only = m_fwd is None and prims.xf_inv.shape[0] == 1
    if identity_only:
        o_l, d_l = o, d
    else:
        if m_fwd is None:
            m_fwd = prims.xf_fwd[transform_id]
            m_inv = prims.xf_inv[transform_id]
        o_l = jnp.einsum("nij,nj->ni", m_inv[:, :3, :3], o) + m_inv[:, :3, 3]
        d_l = jnp.einsum("nij,nj->ni", m_inv[:, :3, :3], d)
    p_l = o_l + t[..., None] * d_l

    # triangle attrs (world space already)
    e1, e2 = pb - pa, pc - pa
    tri_gn = vecmath.normalize(jnp.cross(e1, e2))
    # barycentrics from local point
    pvec = jnp.cross(d_l, e2)
    det = vecmath.dot(e1, pvec)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = o_l - pa
    bu = vecmath.dot(tvec, pvec) * inv_det
    bv = vecmath.dot(d_l, jnp.cross(tvec, e1)) * inv_det
    tri_sn = vecmath.normalize(
        (1.0 - bu - bv)[..., None] * na + bu[..., None] * nb + bv[..., None] * nc
    )
    tri_uv = jnp.stack([bu, bv], axis=-1)

    # sphere attrs
    sph_n = vecmath.normalize(p_l - pa)
    sph_u = (jnp.arctan2(sph_n[..., 1], sph_n[..., 0]) / (2 * jnp.pi)) % 1.0
    sph_v = jnp.arccos(jnp.clip(sph_n[..., 2], -1.0, 1.0)) / jnp.pi
    sph_uv = jnp.stack([sph_u, sph_v], axis=-1)

    # rect attrs
    rect_n = vecmath.normalize(jnp.cross(pb, pc))
    rel = p_l - pa
    rect_uv = jnp.stack(
        [
            0.5 * (vecmath.dot(rel, pb) / jnp.maximum(vecmath.dot(pb, pb), 1e-20) + 1.0),
            0.5 * (vecmath.dot(rel, pc) / jnp.maximum(vecmath.dot(pc, pc), 1e-20) + 1.0),
        ],
        axis=-1,
    )

    # disk attrs (uv left (0,0) like the reference's TODO, src/geometry/disk.rs)
    disk_n = pb
    zero_uv = jnp.zeros_like(rect_uv)

    is_tri = (ptype == PRIM_TRIANGLE)[..., None]
    is_sph = (ptype == PRIM_SPHERE)[..., None]
    is_rec = (ptype == PRIM_RECT)[..., None]
    n_local = jnp.where(
        is_tri, tri_sn, jnp.where(is_sph, sph_n, jnp.where(is_rec, rect_n, disk_n))
    )
    gn_local = jnp.where(
        is_tri, tri_gn, jnp.where(is_sph, sph_n, jnp.where(is_rec, rect_n, disk_n))
    )
    uv = jnp.where(is_tri[..., :1], tri_uv,
                   jnp.where(is_sph[..., :1], sph_uv,
                             jnp.where(is_rec[..., :1], rect_uv, zero_uv)))

    # back to world
    if identity_only:
        point, normal, geo_normal = p_l, n_local, gn_local
    else:
        point = jnp.einsum("nij,nj->ni", m_fwd[:, :3, :3], p_l) + m_fwd[:, :3, 3]
        normal = vecmath.normalize(jnp.einsum("nji,nj->ni", m_inv[:, :3, :3], n_local))
        geo_normal = vecmath.normalize(jnp.einsum("nji,nj->ni", m_inv[:, :3, :3], gn_local))

    return HitRecord(
        t=jnp.where(hit, t, RAY_TMAX),
        point=point,
        normal=normal,
        geo_normal=geo_normal,
        uv=uv,
        material_id=jnp.where(hit, material_id, -1),
        mat_kind=jnp.where(hit, mat_kind, -1),
        instance_id=jnp.where(hit, instance_id, -1),
        prim_id=jnp.where(hit, pid, -1),
        hit=hit,
    )


# -------------------------------------------------------- surface sampling


def sample_surface(prims: Primitives, pid, u1, u2):
    """Uniform-area sample on primitive `pid` -> (point, normal, area_pdf).

    Equivalent of Hittable::sample_surface (src/hittable.rs:53-77) across
    all primitive types, vectorised over the batch of picked lights.
    """
    # single packed row gather (see _fill_attributes for the rationale)
    pack = jnp.concatenate(
        [
            prims.pa, prims.pb, prims.pc,
            prims.ptype.astype(jnp.float32)[:, None],
            prims.transform_id.astype(jnp.float32)[:, None],
            prims.area[:, None],
        ],
        axis=1,
    )  # [P, 12]
    rows = pack[pid]
    pa, pb, pc = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9]
    ptype = rows[:, 9].astype(jnp.int32)
    tid = rows[:, 10].astype(jnp.int32)
    area = rows[:, 11]
    if prims.xf_fwd.shape[0] == 1:
        m_fwd = jnp.broadcast_to(prims.xf_fwd[0], pid.shape + (4, 4))
        m_inv = jnp.broadcast_to(prims.xf_inv[0], pid.shape + (4, 4))
    else:
        m_fwd = prims.xf_fwd[tid]
        m_inv = prims.xf_inv[tid]

    # triangle
    su = jnp.sqrt(u1)
    tri_p = (1.0 - su)[..., None] * pa + (su * (1.0 - u2))[..., None] * pb + (
        su * u2
    )[..., None] * pc
    tri_n = vecmath.normalize(jnp.cross(pb - pa, pc - pa))

    # sphere (uniform area)
    z = 1.0 - 2.0 * u1
    r_xy = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u2
    sph_n = jnp.stack([r_xy * jnp.cos(phi), r_xy * jnp.sin(phi), z], axis=-1)
    sph_p = pa + pb[..., 0:1] * sph_n

    # rect
    rec_p = pa + (2.0 * u1 - 1.0)[..., None] * pb + (2.0 * u2 - 1.0)[..., None] * pc
    rec_n = vecmath.normalize(jnp.cross(pb, pc))

    # disk
    rr = jnp.sqrt(u1) * pc[..., 0]
    t_ax, b_ax = vecmath.orthonormal_basis(pb)
    dsk_p = pa + (rr * jnp.cos(phi))[..., None] * t_ax + (rr * jnp.sin(phi))[..., None] * b_ax
    dsk_n = pb

    is_tri = (ptype == PRIM_TRIANGLE)[..., None]
    is_sph = (ptype == PRIM_SPHERE)[..., None]
    is_rec = (ptype == PRIM_RECT)[..., None]
    p_l = jnp.where(is_tri, tri_p, jnp.where(is_sph, sph_p, jnp.where(is_rec, rec_p, dsk_p)))
    n_l = jnp.where(is_tri, tri_n, jnp.where(is_sph, sph_n, jnp.where(is_rec, rec_n, dsk_n)))

    point = jnp.einsum("nij,nj->ni", m_fwd[:, :3, :3], p_l) + m_fwd[:, :3, 3]
    normal = vecmath.normalize(jnp.einsum("nji,nj->ni", m_inv[:, :3, :3], n_l))
    area_pdf = 1.0 / jnp.maximum(area, 1e-20)
    return point, normal, area_pdf


def primitive_area(prims: Primitives, pid):
    return prims.area[pid]
