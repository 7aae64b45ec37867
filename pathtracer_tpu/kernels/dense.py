"""Pallas dense ray×primitive sweep (closest-hit + any-hit).

TPU-native replacement for the hot sweep in geometry/soa.py
(itself the wavefront re-design of the reference's Accelerator::hit,
/root/reference/src/accelerator/mod.rs:86-178). The XLA sweep materializes
[N_rays, P_prims] intermediates in HBM (hundreds of MB at 1M-lane
wavefronts); this kernel holds the packed primitive table in VMEM and
computes each ray tile's tests entirely on-chip, so HBM traffic is just the
ray state in and (t, prim_id) out.

Layout (Mosaic alignment rules: lane slices must be 128-multiples, sublane
slices 8-multiples): RAYS stay in LANES for the whole kernel — attrs are
[1, GW=512] row slices of the [8, TILE] ray block, results write back as
[GW] lane vectors, zero relayouts. PRIMS ride SUBLANES — the packed table
is TRANSPOSED [P_pad, 128] so an 8-prim chunk is a [8, 128] static row
block whose per-attr [8, 1] columns broadcast against the ray lanes. Every
compute op is an aligned [8, GW] tile; closest-prim selection is sublane
min-reductions (min t, then min id among t==t_min) — no argmin, no gather.

Primitive encodings match geometry/soa.py exactly (watertight triangle via
where-mask cyclic axis permutation per mesh.rs:67-198; two-root sphere;
parametric rect/disk). Identity-transform scenes only — the world-space
flattening in parsing/builder.py makes that the common case; scenes with
live instance transforms fall back to the XLA sweep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from pathtracer_tpu.geometry.soa import (
    PRIM_DISK,
    PRIM_RECT,
    PRIM_SPHERE,
    PRIM_TRIANGLE,
    Primitives,
    _fill_attributes,
)

RAY_TILE = 4096  # rays per grid step
GW = 512         # rays per compute tile (lanes)
PB = 8           # prims per compute tile (sublanes)

# packed prim-table columns (table is [P_pad, 128]; cols 11.. are padding)
_C_PTYPE, _C_VALID = 0, 1
_C_PA, _C_PB, _C_PC = 2, 5, 8
_N_COLS = 128


def pack_prims(prims: Primitives) -> jnp.ndarray:
    """[P_pad, 128] f32 transposed primitive table (P_pad multiple of PB).

    Built with jnp ops so it can run INSIDE a jitted render (traced once);
    for host-side eager baking use pack_prims_np — on the axon tunnel every
    eager op is its own 20-40s remote compile."""
    p = prims.count
    p_pad = -(-p // 32) * 32  # 32-mult: shared with the fused kernel's PBF
    tab = jnp.zeros((p_pad, _N_COLS), jnp.float32)
    tab = tab.at[:p, _C_PTYPE].set(prims.ptype.astype(jnp.float32))
    tab = tab.at[:p, _C_VALID].set(prims.valid.astype(jnp.float32))
    tab = tab.at[:p, _C_PA:_C_PA + 3].set(prims.pa)
    tab = tab.at[:p, _C_PB:_C_PB + 3].set(prims.pb)
    tab = tab.at[:p, _C_PC:_C_PC + 3].set(prims.pc)
    return tab


def pack_prims_np(ptype, valid, pa, pb, pc):
    """Host NumPy variant of pack_prims (fields pre-fetched as arrays)."""
    import numpy as np

    p = len(ptype)
    p_pad = -(-p // 32) * 32  # 32-mult: shared with the fused kernel's PBF
    tab = np.zeros((p_pad, _N_COLS), np.float32)
    tab[:p, _C_PTYPE] = ptype
    tab[:p, _C_VALID] = valid
    tab[:p, _C_PA:_C_PA + 3] = pa
    tab[:p, _C_PB:_C_PB + 3] = pb
    tab[:p, _C_PC:_C_PC + 3] = pc
    return tab


def chunk_aabb_rows_np(tab, block, rows_mult=8):
    """Host: conservative per-`block`-prim-chunk AABBs from a packed
    [P_pad, 128] table -> [n_chunks_pad, 128] rows (cols 0-2 = lo,
    3-5 = hi, rest 0; pad to a multiple of `rows_mult`). Appended to the
    dense table they give the sweeps a flat one-level BVH: a [1, GW]
    vector slab test + lax.cond skips whole prim blocks no ray in the row
    group can hit (PT_SWEEP_AABB), and the per-lane traversal
    (sweep_rowgroup_bvh1) orders chunks front-to-back from the same rows.
    Empty/padding chunks get inverted boxes that never pass the gate."""
    import numpy as np

    ptype = tab[:, _C_PTYPE]
    valid = tab[:, _C_VALID] > 0.5
    pa = tab[:, _C_PA:_C_PA + 3]
    pb = tab[:, _C_PB:_C_PB + 3]
    pc = tab[:, _C_PC:_C_PC + 3]
    p = tab.shape[0]
    lo = np.full((p, 3), np.inf, np.float32)
    hi = np.full((p, 3), -np.inf, np.float32)
    tri = valid & (ptype == PRIM_TRIANGLE)
    lo[tri] = np.minimum(np.minimum(pa[tri], pb[tri]), pc[tri])
    hi[tri] = np.maximum(np.maximum(pa[tri], pb[tri]), pc[tri])
    sph = valid & (ptype == PRIM_SPHERE)
    r = pb[:, 0:1]
    lo[sph] = (pa - np.abs(r))[sph]
    hi[sph] = (pa + np.abs(r))[sph]
    rec = valid & (ptype == PRIM_RECT)
    ext = np.abs(pb) + np.abs(pc)
    lo[rec] = (pa - ext)[rec]
    hi[rec] = (pa + ext)[rec]
    dsk = valid & (ptype == PRIM_DISK)
    rd = np.abs(pc[:, 0:1])
    lo[dsk] = (pa - rd)[dsk]
    hi[dsk] = (pa + rd)[dsk]
    n_chunks = p // block
    rows = -(-n_chunks // rows_mult) * rows_mult
    out = np.zeros((rows, 128), np.float32)
    out[:, 0:3] = np.inf
    out[:, 3:6] = -np.inf
    for c in range(n_chunks):
        out[c, 0:3] = lo[c * block:(c + 1) * block].min(axis=0)
        out[c, 3:6] = hi[c * block:(c + 1) * block].max(axis=0)
    return out


def _chunk_gate(tab_ref, row, ox, oy, oz, dx, dy, dz, t_min, t_cap):
    """Scalar any-lane slab test of a [1, GW] ray tile vs AABB row `row`
    of the table (cols 0-5). Conservative: padding lanes may pass; a pass
    only runs the chunk, never changes results."""
    box = tab_ref[pl.ds(row, 1), :]

    def axis(ci, o, d):
        lo = box[:, ci:ci + 1]
        hi = box[:, ci + 3:ci + 4]
        nz = d != 0.0
        inv = jnp.where(nz, 1.0 / jnp.where(nz, d, 1.0), 0.0)
        ta = (lo - o) * inv
        tb = (hi - o) * inv
        inside = (o >= lo) & (o <= hi)
        tn = jnp.where(nz, jnp.minimum(ta, tb),
                       jnp.where(inside, -jnp.inf, jnp.inf))
        tf = jnp.where(nz, jnp.maximum(ta, tb),
                       jnp.where(inside, jnp.inf, -jnp.inf))
        return tn, tf

    n0, f0 = axis(0, ox, dx)
    n1, f1 = axis(1, oy, dy)
    n2, f2 = axis(2, oz, dz)
    tn = jnp.maximum(jnp.maximum(n0, n1), jnp.maximum(n2, t_min))
    tf = jnp.minimum(jnp.minimum(f0, f1), jnp.minimum(f2, t_cap))
    return jnp.any(tn <= tf)


def _chunk_t(ch, ox, oy, oz, dx, dy, dz, t_min, t_max, present=None):
    """t for a [1, GW] ray tile vs a [PB, 1] prim chunk -> [PB, GW].

    Mirrors soa._chunk_ts / _t_* componentwise (identity transforms).

    `present` is a STATIC (tri, sphere, rect, disk) presence tuple for the
    chunk (None = all). Scene bakes sort prims by type, so most chunks are
    homogeneous and compile only one intersection routine — the sweeps are
    VPU-compute-bound, so absent-type math is pure waste."""
    ptype = ch["ptype"]
    valid = ch["valid"] > 0.5
    pax, pay, paz = ch["pax"], ch["pay"], ch["paz"]
    pbx, pby, pbz = ch["pbx"], ch["pby"], ch["pbz"]
    pcx, pcy, pcz = ch["pcx"], ch["pcy"], ch["pcz"]
    inf = jnp.inf
    has_tri, has_sph, has_rect, has_disk = present or (True,) * 4
    if not (has_tri or has_sph or has_rect or has_disk):
        return jnp.full((ptype.shape[0], ox.shape[1]), inf, jnp.float32)

    t_tri = t_sph = t_rec = t_dsk = None

    if has_tri:
        # ---- watertight triangle (soa._t_triangle): cyclic axis
        # permutation by where-masks, shear into ray space, edge functions
        ax, ay, az = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
        kz_x = (ax > ay) & (ax > az)
        kz_y = ~kz_x & (ay > az)

        def cyc(vx, vy, vz):
            c_kz = jnp.where(kz_x, vx, jnp.where(kz_y, vy, vz))
            c_kx = jnp.where(kz_x, vy, jnp.where(kz_y, vz, vx))
            c_ky = jnp.where(kz_x, vz, jnp.where(kz_y, vx, vy))
            return c_kx, c_ky, c_kz

        dx_, dy_, dz_ = cyc(dx, dy, dz)
        inv_dz = 1.0 / jnp.where(jnp.abs(dz_) > 1e-30, dz_, 1.0)
        sx = -dx_ * inv_dz
        sy = -dy_ * inv_dz

        def project(vx, vy, vz):
            px, py, pz = cyc(vx - ox, vy - oy, vz - oz)
            return px + sx * pz, py + sy * pz, pz * inv_dz

        x0, y0, z0 = project(pax, pay, paz)
        x1, y1, z1 = project(pbx, pby, pbz)
        x2, y2, z2 = project(pcx, pcy, pcz)
        e0 = x1 * y2 - y1 * x2
        e1 = x2 * y0 - y2 * x0
        e2 = x0 * y1 - y0 * x1
        det = e0 + e1 + e2
        inside = ~(((e0 < 0) | (e1 < 0) | (e2 < 0))
                   & ((e0 > 0) | (e1 > 0) | (e2 > 0)))
        t_scaled = e0 * z0 + e1 * z1 + e2 * z2
        t_tri = t_scaled / jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
        ok_tri = (inside & (jnp.abs(det) > 1e-30) & (t_tri > t_min)
                  & (t_tri < t_max))
        t_tri = jnp.where(ok_tri, t_tri, inf)

    if has_sph:
        # ---- sphere (soa._t_sphere): two-root quadratic
        ocx, ocy, ocz = ox - pax, oy - pay, oz - paz
        a = dx * dx + dy * dy + dz * dz
        half_b = ocx * dx + ocy * dy + ocz * dz
        r = pbx
        c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = half_b * half_b - a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        inv_a = 1.0 / jnp.maximum(a, 1e-20)
        t0 = (-half_b - sq) * inv_a
        t1 = (-half_b + sq) * inv_a
        t0_ok = (disc > 0.0) & (t0 > t_min) & (t0 < t_max)
        t1_ok = (disc > 0.0) & (t1 > t_min) & (t1 < t_max)
        t_sph = jnp.where(t0_ok, t0, jnp.where(t1_ok, t1, inf))

    if has_rect:
        # ---- rect (soa._t_rect): pa center, pb/pc half-edges
        nx = pby * pcz - pbz * pcy
        ny = pbz * pcx - pbx * pcz
        nz = pbx * pcy - pby * pcx
        nlen = jnp.sqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-20))
        nx, ny, nz = nx / nlen, ny / nlen, nz / nlen
        denom_r = dx * nx + dy * ny + dz * nz
        t_r = ((pax - ox) * nx + (pay - oy) * ny + (paz - oz) * nz) / jnp.where(
            jnp.abs(denom_r) > 1e-12, denom_r, 1.0)
        rx = ox + t_r * dx - pax
        ry = oy + t_r * dy - pay
        rz = oz + t_r * dz - paz
        bb = jnp.maximum(pbx * pbx + pby * pby + pbz * pbz, 1e-20)
        cc = jnp.maximum(pcx * pcx + pcy * pcy + pcz * pcz, 1e-20)
        ra = (rx * pbx + ry * pby + rz * pbz) / bb
        rb_ = (rx * pcx + ry * pcy + rz * pcz) / cc
        ok_r = ((jnp.abs(denom_r) > 1e-12) & (jnp.abs(ra) <= 1.0)
                & (jnp.abs(rb_) <= 1.0) & (t_r > t_min) & (t_r < t_max))
        t_rec = jnp.where(ok_r, t_r, inf)

    if has_disk:
        # ---- disk (soa._t_disk): pa center, pb unit normal, pc[0] radius
        denom_d = dx * pbx + dy * pby + dz * pbz
        t_d = ((pax - ox) * pbx + (pay - oy) * pby
               + (paz - oz) * pbz) / jnp.where(
            jnp.abs(denom_d) > 1e-12, denom_d, 1.0)
        qx = ox + t_d * dx - pax
        qy = oy + t_d * dy - pay
        qz = oz + t_d * dz - paz
        r2 = qx * qx + qy * qy + qz * qz
        rad = pcx
        ok_d = ((jnp.abs(denom_d) > 1e-12) & (r2 <= rad * rad)
                & (t_d > t_min) & (t_d < t_max))
        t_dsk = jnp.where(ok_d, t_d, inf)

    t = None
    for flag, tt, code in ((has_tri, t_tri, PRIM_TRIANGLE),
                           (has_sph, t_sph, PRIM_SPHERE),
                           (has_rect, t_rec, PRIM_RECT),
                           (has_disk, t_dsk, PRIM_DISK)):
        if not flag:
            continue
        t = tt if t is None else jnp.where(ptype == code, tt, t)
    return jnp.where(valid, t, inf)


def chunk_type_presence(ptype, valid, block):
    """Host-side static (tri, sphere, rect, disk) presence per `block`-prim
    chunk of a (padded) type array; empty/padding chunks are all-False and
    compile to nothing."""
    import numpy as np

    ptype = np.asarray(ptype)
    valid = np.asarray(valid)
    p_pad = -(-len(ptype) // block) * block
    pres = []
    for c0 in range(0, p_pad, block):
        tp = ptype[c0:c0 + block][valid[c0:c0 + block] > 0]
        pres.append((bool((tp == PRIM_TRIANGLE).any()),
                     bool((tp == PRIM_SPHERE).any()),
                     bool((tp == PRIM_RECT).any()),
                     bool((tp == PRIM_DISK).any())))
    return tuple(pres)


def _pres(chunk_types, pc):
    return chunk_types[pc] if chunk_types is not None else None


# Unroll chunk runs shorter than this; loop longer ones. Scene bakes sort
# prims by type, so a flattened instanced scene (builder PT_FLATTEN_MAX) is
# one giant homogeneous run — a lax.fori_loop with a dynamic sublane-offset
# chunk read keeps the Mosaic body O(type runs) instead of O(chunks)
# (227 unrolled watertight-triangle chunks would explode compile time).
# Small scenes (cornell 1 chunk, gem 10 chunks at PBF=32) stay below the
# threshold and compile exactly the static-slice bodies they always did.
LOOP_MIN = 16


def _chunk_from_blk(blk):
    """[block, 1] prim attr slabs from a [block, lanes] table slice."""
    def a(col):
        return blk[:, col:col + 1]

    return dict(
        ptype=a(_C_PTYPE), valid=a(_C_VALID),
        pax=a(_C_PA), pay=a(_C_PA + 1), paz=a(_C_PA + 2),
        pbx=a(_C_PB), pby=a(_C_PB + 1), pbz=a(_C_PB + 2),
        pcx=a(_C_PC), pcy=a(_C_PC + 1), pcz=a(_C_PC + 2),
    )


def chunk_runs(chunk_types, n_chunks):
    """Host-side: group consecutive chunks by identical STATIC type
    presence -> [(start_chunk, n, present)]. All-absent runs (padding /
    invalid-only chunks) are dropped entirely."""
    if chunk_types is None:
        return [(0, n_chunks, None)]
    runs = []
    for pc in range(n_chunks):
        pr = chunk_types[pc]
        if runs and runs[-1][2] == pr:
            runs[-1] = (runs[-1][0], runs[-1][1] + 1, pr)
        else:
            runs.append((pc, 1, pr))
    return [(c0, n, pr) for (c0, n, pr) in runs
            if pr is None or any(pr)]


def sweep_rowgroup(tab_ref, block, ox, oy, oz, dx, dy, dz, t_min, t_max,
                   closest, chunk_types, aabb_base=None):
    """Reduce ONE [1, GW] ray row-group against every `block`-prim chunk of
    `tab_ref`. closest=True -> (best_t [GW], best_id [GW] f32, -1 on miss
    NOT applied — ids stay +inf for misses); closest=False -> blocked [GW]
    f32 0/1 mask. Shared by the standalone dense sweeps (block=PB) and the
    megakernel's inline sweeps (block=PBF).

    The per-chunk math and reduction order are IDENTICAL whether a run is
    unrolled or looped, so outputs are bit-identical to the historical
    fully-unrolled kernels.

    `aabb_base` (static row index; requires chunk_types): the table carries
    chunk_aabb_rows_np rows appended at that offset — each chunk's prim
    tests run under lax.cond behind a vector slab test (can any lane beat
    the carry inside the chunk's box?). Bit-identical by construction: a
    skipped chunk can contribute neither a strictly-closer t nor an
    any-hit within t_max."""
    gw = ox.shape[1]
    n_chunks = (len(chunk_types) if chunk_types is not None
                else tab_ref.shape[0] // block)
    if closest:
        carry = (jnp.full((gw,), jnp.inf, jnp.float32),
                 jnp.full((gw,), jnp.inf, jnp.float32))
    else:
        carry = jnp.zeros((gw,), jnp.float32)

    def step(ch, base_f, carry):
        t = _chunk_t(ch["vals"], ox, oy, oz, dx, dy, dz, t_min, t_max,
                     present=ch["present"])  # [block, GW]
        if closest:
            best_t, best_id = carry
            ids = (jax.lax.broadcasted_iota(jnp.int32, (block, gw), 0)
                   .astype(jnp.float32) + base_f)
            ct = jnp.min(t, axis=0)
            cid = jnp.min(jnp.where(t == ct[None, :], ids, jnp.inf), axis=0)
            better = ct < best_t
            return (jnp.where(better, ct, best_t),
                    jnp.where(better, cid, best_id))
        return jnp.maximum(
            carry, jnp.max(jnp.isfinite(t).astype(jnp.float32), axis=0))

    def gated_step(pc_row, base, base_f, read, present, carry):
        def run(c):
            return step(dict(vals=_chunk_from_blk(read()), present=present),
                        base_f, c)

        if aabb_base is None:
            return run(carry)
        if closest:
            t_cap = jnp.minimum(t_max, carry[0][None, :])
        else:
            t_cap = jnp.where(carry[None, :] > 0.5, -jnp.inf, t_max)
        hit = _chunk_gate(tab_ref, pc_row, ox, oy, oz, dx, dy, dz,
                          t_min, t_cap)
        return jax.lax.cond(hit, run, lambda c: c, carry)

    for c0, n, present in chunk_runs(chunk_types, n_chunks):
        if n < LOOP_MIN:
            for pc in range(c0, c0 + n):
                carry = gated_step(
                    (aabb_base + pc) if aabb_base is not None else 0,
                    pc * block, float(pc * block),
                    lambda pc=pc: tab_ref[pc * block:(pc + 1) * block, :],
                    present, carry)
        else:
            def body(i, carry, c0=c0, present=present):
                base = (c0 + i) * block
                return gated_step(
                    (aabb_base + c0 + i) if aabb_base is not None else 0,
                    base, base.astype(jnp.float32),
                    lambda base=base: tab_ref[pl.ds(base, block), :],
                    present, carry)

            carry = jax.lax.fori_loop(0, n, body, carry)
    return carry


def fetch_tab_np(tab, block):
    """Host: attr-major chunk fetch table for the per-lane traversal.

    [11*block, n_chunks_pad128] f32 where row a*block+j, col c = attr `a`
    (dense-table cols 0..10) of prim c*block+j. A one-hot over the chunk
    axis contracted against this table on the MXU hands every lane its OWN
    chunk's prim records in the [block, GW] layout the sweep math already
    uses. Padding chunks carry valid=0 records (t=inf in every test)."""
    import numpy as np

    p_pad = tab.shape[0]
    nch = p_pad // block
    ncp = -(-nch // 128) * 128
    ftab = np.zeros((11 * block, ncp), np.float32)
    ftab[:, :nch] = (tab[:nch * block, :11]
                     .reshape(nch, block, 11).transpose(2, 1, 0)
                     .reshape(11 * block, nch))
    return ftab


def sweep_rowgroup_bvh1(tab_ref, ftab_ref, block, aabb_base,
                        ox, oy, oz, dx, dy, dz, t_min, t_max, closest,
                        present):
    """Per-lane front-to-back chunk traversal — the TPU answer to the
    reference's stackless BVH walk (lbvh.rs:172-213) for the megakernel's
    dense path.

    The brute sweep (sweep_rowgroup) is O(n_chunks) for EVERY lane; this
    walks each lane through only the chunks whose AABB its ray enters,
    nearest-first, stopping as soon as no remaining chunk can beat the
    lane's carry. Lockstep cost per row group is max-over-lanes of chunks
    visited — with Morton-ordered (spatially tight) chunks that is a small
    constant instead of n_chunks. Per-lane chunk records ride a one-hot
    [n_chunks_pad, GW] MXU contraction against the attr-major fetch table
    (fetch_tab_np) — no per-lane gathers (PARITY rule 7).

    Closest-hit tie-break differs from the brute sweep ONLY when two prims
    in DIFFERENT chunks hit at bit-equal t (shared mesh edges): the brute
    sweep keeps the lower chunk index, the traversal keeps the nearer-
    entered chunk. Same t, either surface — estimator-equivalent.

    Returns (best_t [GW], best_id [GW], ids +inf on miss) or blocked [GW]."""
    gw = ox.shape[1]
    ncp = ftab_ref.shape[1]
    inf = jnp.inf

    # chunk AABB columns from the appended rows: [ncp, 1] lo/hi per axis
    A = tab_ref[pl.ds(aabb_base, ncp), :]

    def axis_t(ci, o, d):
        lo = A[:, ci:ci + 1]
        hi = A[:, ci + 3:ci + 4]
        nz = d != 0.0
        inv = jnp.where(nz, 1.0 / jnp.where(nz, d, 1.0), 0.0)
        ta = (lo - o) * inv
        tb = (hi - o) * inv
        inside = (o >= lo) & (o <= hi)
        tn = jnp.where(nz, jnp.minimum(ta, tb),
                       jnp.where(inside, -inf, inf))
        tf = jnp.where(nz, jnp.maximum(ta, tb),
                       jnp.where(inside, inf, -inf))
        return tn, tf

    n0, f0 = axis_t(0, ox, dx)
    n1, f1 = axis_t(1, oy, dy)
    n2, f2 = axis_t(2, oz, dz)
    tn = jnp.maximum(jnp.maximum(n0, n1), jnp.maximum(n2, t_min))
    tf = jnp.minimum(jnp.minimum(f0, f1), jnp.minimum(f2, t_max))
    tent = jnp.where(tn <= tf, tn, inf)  # [ncp, gw] chunk entry times

    iota_c = jax.lax.broadcasted_iota(jnp.int32, (ncp, gw), 0).astype(
        jnp.float32)
    ids_j = jax.lax.broadcasted_iota(jnp.int32, (block, gw), 0).astype(
        jnp.float32)

    def visit(tent, go):
        """One lockstep traversal step: each `go` lane fetches + tests its
        nearest unvisited chunk. Returns (t [block, gw], pid [block, gw],
        consumed tent)."""
        m = jnp.min(tent, axis=0)[None, :]  # [1, gw]
        # inf lanes: tent==m everywhere -> cidx 0, masked by go
        cidx = jnp.min(jnp.where(tent == m, iota_c, inf), axis=0)[None, :]
        onehot = ((iota_c == cidx) & go).astype(jnp.float32)
        fetched = jax.lax.dot_general(
            ftab_ref[:, :], onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # [11*block, gw]
        f_a = lambda a: fetched[a * block:(a + 1) * block, :]
        ch = dict(ptype=f_a(0), valid=f_a(1),
                  pax=f_a(2), pay=f_a(3), paz=f_a(4),
                  pbx=f_a(5), pby=f_a(6), pbz=f_a(7),
                  pcx=f_a(8), pcy=f_a(9), pcz=f_a(10))
        t = _chunk_t(ch, ox, oy, oz, dx, dy, dz, t_min, t_max,
                     present=present)  # [block, gw]
        pid = ids_j + cidx * float(block)
        return t, pid, jnp.where(onehot > 0.5, inf, tent)

    if closest:
        def cond(c):
            i, tent, best_t, _ = c
            return (i < ncp) & jnp.any(jnp.min(tent, axis=0) < best_t)

        def body(c):
            i, tent, best_t, best_id = c
            go = (jnp.min(tent, axis=0) < best_t)[None, :]
            t, pid, tent = visit(tent, go)
            ct = jnp.min(t, axis=0)
            cid = jnp.min(jnp.where(t == ct[None, :], pid, inf), axis=0)
            better = ct < best_t
            return (i + 1, tent,
                    jnp.where(better, ct, best_t),
                    jnp.where(better, cid, best_id))

        _, _, best_t, best_id = jax.lax.while_loop(
            cond, body, (jnp.int32(0), tent,
                         jnp.full((gw,), inf, jnp.float32),
                         jnp.full((gw,), inf, jnp.float32)))
        return best_t, best_id

    def cond(c):
        i, tent, blocked = c
        return (i < ncp) & jnp.any((blocked < 0.5)
                                   & (jnp.min(tent, axis=0) < inf))

    def body(c):
        i, tent, blocked = c
        go = ((blocked < 0.5) & (jnp.min(tent, axis=0) < inf))[None, :]
        t, _, tent = visit(tent, go)
        hit_any = jnp.max(jnp.isfinite(t).astype(jnp.float32), axis=0)
        return (i + 1, tent, jnp.maximum(blocked, hit_any))

    _, _, blocked = jax.lax.while_loop(
        cond, body, (jnp.int32(0), tent, jnp.zeros((gw,), jnp.float32)))
    return blocked


def _closest_kernel(chunk_types, rays_ref, tab_ref, out_ref):
    for rg in range(RAY_TILE // GW):
        sl = slice(rg * GW, (rg + 1) * GW)
        ox = rays_ref[0, sl][None, :]
        oy = rays_ref[1, sl][None, :]
        oz = rays_ref[2, sl][None, :]
        dx = rays_ref[3, sl][None, :]
        dy = rays_ref[4, sl][None, :]
        dz = rays_ref[5, sl][None, :]
        t_min = rays_ref[6, sl][None, :]
        t_max = rays_ref[7, sl][None, :]
        best_t, best_id = sweep_rowgroup(
            tab_ref, PB, ox, oy, oz, dx, dy, dz, t_min, t_max,
            closest=True, chunk_types=chunk_types)
        hit = jnp.isfinite(best_t)
        out_ref[0, sl] = best_t
        out_ref[1, sl] = jnp.where(hit, best_id, -1.0)


def _any_kernel(chunk_types, rays_ref, tab_ref, out_ref):
    for rg in range(RAY_TILE // GW):
        sl = slice(rg * GW, (rg + 1) * GW)
        ox = rays_ref[0, sl][None, :]
        oy = rays_ref[1, sl][None, :]
        oz = rays_ref[2, sl][None, :]
        dx = rays_ref[3, sl][None, :]
        dy = rays_ref[4, sl][None, :]
        dz = rays_ref[5, sl][None, :]
        t_min = rays_ref[6, sl][None, :]
        t_max = rays_ref[7, sl][None, :]
        out_ref[0, sl] = sweep_rowgroup(
            tab_ref, PB, ox, oy, oz, dx, dy, dz, t_min, t_max,
            closest=False, chunk_types=chunk_types)


def _pack_rays(o, d, t_min, t_max):
    n = o.shape[0]
    n_pad = -(-n // RAY_TILE) * RAY_TILE
    rays = jnp.zeros((8, n_pad), jnp.float32)
    rays = rays.at[0:3, :n].set(o.T)
    rays = rays.at[3:6, :n].set(d.T)
    # padding lanes keep d=0 -> every test's denominators are guarded and
    # t_min=t_max=0 rejects all candidates
    rays = rays.at[6, :n].set(t_min)
    rays = rays.at[7, :n].set(t_max)
    return rays, n_pad


@functools.partial(jax.jit, static_argnames=("interpret", "chunk_types"))
def _sweep_closest(rays, tab, interpret=False, chunk_types=None):
    n_pad = rays.shape[1]
    return pl.pallas_call(
        functools.partial(_closest_kernel, chunk_types),
        grid=(n_pad // RAY_TILE,),
        in_specs=[
            pl.BlockSpec((8, RAY_TILE), lambda i: (0, i)),
            pl.BlockSpec(tab.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((2, RAY_TILE), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((2, n_pad), jnp.float32),
        interpret=interpret,
    )(rays, tab)


@functools.partial(jax.jit, static_argnames=("interpret", "chunk_types"))
def _sweep_any(rays, tab, interpret=False, chunk_types=None):
    n_pad = rays.shape[1]
    return pl.pallas_call(
        functools.partial(_any_kernel, chunk_types),
        grid=(n_pad // RAY_TILE,),
        in_specs=[
            pl.BlockSpec((8, RAY_TILE), lambda i: (0, i)),
            pl.BlockSpec(tab.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, RAY_TILE), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        interpret=interpret,
    )(rays, tab)


def pallas_dense_available(prims: Primitives) -> bool:
    """Kernel preconditions: identity transforms (world-space flattened)."""
    return int(prims.xf_inv.shape[0]) == 1


def pallas_intersect_dense(prims: Primitives, o, d, t_min, t_max,
                           interpret: bool = False):
    """Drop-in for geometry.intersect_dense on identity-transform scenes.
    Attribute fill stays in XLA (single packed-row gather, fuses with
    shading)."""
    n = o.shape[0]
    rays, _ = _pack_rays(o, d, t_min, t_max)
    tab = pack_prims(prims)
    out = _sweep_closest(rays, tab, interpret=interpret)
    t_best = out[0, :n]
    id_best = out[1, :n].astype(jnp.int32)
    hit = id_best >= 0
    return _fill_attributes(prims, o, d, t_best, jnp.maximum(id_best, 0), hit)


def pallas_intersect_any_dense(prims: Primitives, o, d, t_min, t_max,
                               interpret: bool = False):
    n = o.shape[0]
    rays, _ = _pack_rays(o, d, t_min, t_max)
    tab = pack_prims(prims)
    out = _sweep_any(rays, tab, interpret=interpret)
    return out[0, :n] > 0.5

# ---- row-source variants: read ray origins/dirs straight out of a wider
# row-packed block (megakernel state / K2 output) instead of a dedicated
# [8, N] rays array — saves one concat program + one HBM round-trip per
# sweep in the megakernel pipeline. tmin/tmax are baked constants; the
# closest variant emits an [8, N] block (row 0 = t, row 1 = prim id) so the
# consumer can take it as an aligned input without a pad program.


def _closest_rows_kernel(row0, tmin_c, tmax_c, chunk_types, src_ref, tab_ref,
                         out_ref):
    for rg in range(RAY_TILE // GW):
        sl = slice(rg * GW, (rg + 1) * GW)
        ox = src_ref[row0 + 0, sl][None, :]
        oy = src_ref[row0 + 1, sl][None, :]
        oz = src_ref[row0 + 2, sl][None, :]
        dx = src_ref[row0 + 3, sl][None, :]
        dy = src_ref[row0 + 4, sl][None, :]
        dz = src_ref[row0 + 5, sl][None, :]
        t_min = jnp.full((1, GW), tmin_c, jnp.float32)
        t_max = jnp.full((1, GW), tmax_c, jnp.float32)
        best_t, best_id = sweep_rowgroup(
            tab_ref, PB, ox, oy, oz, dx, dy, dz, t_min, t_max,
            closest=True, chunk_types=chunk_types)
        hit = jnp.isfinite(best_t)
        out_ref[0, sl] = best_t
        out_ref[1, sl] = jnp.where(hit, best_id, -1.0)
        for r in range(2, 8):
            out_ref[r, sl] = jnp.zeros((GW,), jnp.float32)


def _any_rows_kernel(row0, tmin_c, tmax_row, chunk_types, src_ref, tab_ref,
                     out_ref):
    """tmax_row: row index of per-ray tmax within src (or None -> RAY_TMAX
    constant is not needed here; megakernel NEE always carries a tmax row)."""
    for rg in range(RAY_TILE // GW):
        sl = slice(rg * GW, (rg + 1) * GW)
        ox = src_ref[row0 + 0, sl][None, :]
        oy = src_ref[row0 + 1, sl][None, :]
        oz = src_ref[row0 + 2, sl][None, :]
        dx = src_ref[row0 + 3, sl][None, :]
        dy = src_ref[row0 + 4, sl][None, :]
        dz = src_ref[row0 + 5, sl][None, :]
        t_min = jnp.full((1, GW), tmin_c, jnp.float32)
        t_max = src_ref[tmax_row, sl][None, :]
        out_ref[0, sl] = sweep_rowgroup(
            tab_ref, PB, ox, oy, oz, dx, dy, dz, t_min, t_max,
            closest=False, chunk_types=chunk_types)
        for r in range(1, 8):
            out_ref[r, sl] = jnp.zeros((GW,), jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("row0", "tmin_c", "tmax_c", "src_rows",
                                    "interpret", "chunk_types"))
def sweep_closest_rows(src, tab, row0, tmin_c, tmax_c, src_rows,
                       interpret=False, chunk_types=None):
    n_pad = src.shape[1]
    return pl.pallas_call(
        functools.partial(_closest_rows_kernel, row0, tmin_c, tmax_c,
                          chunk_types),
        grid=(n_pad // RAY_TILE,),
        in_specs=[
            pl.BlockSpec((src_rows, RAY_TILE), lambda i: (0, i)),
            pl.BlockSpec(tab.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, RAY_TILE), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        interpret=interpret,
    )(src, tab)


@functools.partial(jax.jit,
                   static_argnames=("row0", "tmin_c", "tmax_row", "src_rows",
                                    "interpret", "chunk_types"))
def sweep_any_rows(src, tab, row0, tmin_c, tmax_row, src_rows,
                   interpret=False, chunk_types=None):
    n_pad = src.shape[1]
    return pl.pallas_call(
        functools.partial(_any_rows_kernel, row0, tmin_c, tmax_row,
                          chunk_types),
        grid=(n_pad // RAY_TILE,),
        in_specs=[
            pl.BlockSpec((src_rows, RAY_TILE), lambda i: (0, i)),
            pl.BlockSpec(tab.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, RAY_TILE), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        interpret=interpret,
    )(src, tab)
