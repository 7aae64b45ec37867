"""Two-level acceleration: TLAS over instances + shared per-mesh BLASes.

Capability parity with the reference's two-level scheme — per-mesh FlatBVH
(src/geometry/mesh.rs:283-304) under an instance-level accelerator
(src/accelerator/mod.rs:86-178, src/geometry/instance.rs:89-133) — with a
TPU-first layout: ONE unified node array (TLAS nodes first, then every
mesh BLAS concatenated) traversed by a single lockstep wavefront loop.

Entering an instance leaf pushes exactly one frame of "stack": the ray
saves the TLAS continuation pointer, transforms itself into mesh-local
space (direction NOT renormalised, so hit parameters t are directly
comparable with world-space hits, like instance.rs:89-133), and walks the
mesh BLAS; the BLAS subtree's final exit is a POP sentinel (-1) returning
to the saved pointer. Meshes are shared: K instances of one mesh reference
one BLAS node range and one block of local-space triangle rows — memory is
O(unique meshes), not O(instances).

Sentinels in `exit`:  >=0 next node · -1 pop back to TLAS · -2 terminate.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pathtracer_tpu.accel.flatten import LEAF_K, flatten_bvh
from pathtracer_tpu.accel.sah import build_sah_bvh
from pathtracer_tpu.geometry.aabb import slab_test
from pathtracer_tpu.geometry.soa import Primitives, _chunk_ts, _fill_attributes

TERMINATE = -2
POP = -1


class TwoLevel(NamedTuple):
    # unified node arrays: [0, n_tlas) = TLAS, [n_tlas, M) = concatenated BLASes
    lo: jnp.ndarray  # f32[M,3]
    hi: jnp.ndarray  # f32[M,3]
    exit: jnp.ndarray  # i32[M] (sentinels above)
    prim_start: jnp.ndarray  # i32[M] index into prim_order; -1 = internal
    prim_count: jnp.ndarray  # i32[M]
    node_inst: jnp.ndarray  # i32[M] instance id at TLAS instance leaves; -1 else
    prim_order: jnp.ndarray  # i32[...] global primitive row ids (LEAF_K padded)
    # per-instance table
    inst_xf_fwd: jnp.ndarray  # f32[I,4,4] local->world
    inst_xf_inv: jnp.ndarray  # f32[I,4,4] world->local
    inst_blas_root: jnp.ndarray  # i32[I] unified node id of the mesh BLAS root
    inst_mat_override: jnp.ndarray  # i32[I] world material id; -1 = per-face
    inst_kind_override: jnp.ndarray  # i32[I] mat kind of the override; -1 = per-face
    inst_gid: jnp.ndarray  # i32[I] InstanceId reported in HitRecords
    # malformed-structure guard for the traversal while_loop: a ray can
    # re-traverse a shared BLAS once per instance, so the bound is
    # 2·n_tlas + Σ_instances 2·blas_nodes(instance) + slack — NOT 4·n_nodes
    # (which silently truncated rays crossing >~4 instances of one mesh)
    step_cap: jnp.ndarray  # i32 scalar

    @property
    def n_nodes(self):
        return self.lo.shape[0]

    @property
    def n_instances(self):
        return self.inst_xf_fwd.shape[0]


def build_two_level(
    loose_lo: np.ndarray,
    loose_hi: np.ndarray,
    meshes: list,
    instances: list,
    leaf_size: int = LEAF_K,
) -> TwoLevel:
    """Host build.

    loose_lo/hi: world AABBs of the loose primitive rows (global prim ids
      0..n_loose-1 — loose rows come first in the Primitives array).
    meshes: list of dicts {row_start, aabb_lo [T,3], aabb_hi [T,3]} — local
      AABBs of each unique mesh's triangle rows (global prim ids row_start..).
    instances: list of dicts {mesh (index into meshes), xf_fwd 4x4,
      mat_override, kind_override, gid, world_lo, world_hi}.
    """
    n_loose = len(loose_lo)
    n_inst = len(instances)

    # ---- per-mesh BLAS builds (native builder for big meshes)
    from pathtracer_tpu.accel.flatten import build_bvh_arrays

    blas_parts = []  # (lo, hi, exit(with POP), prim_start, prim_count) + order
    blas_order = []
    for mesh in meshes:
        b = build_bvh_arrays(mesh["aabb_lo"], mesh["aabb_hi"], leaf_size)
        m_i = int(b.lo.shape[0])
        ex = np.asarray(b.exit_idx)
        ex = np.where(ex >= m_i, POP, ex)  # subtree done -> pop to TLAS
        order = np.asarray(b.prim_order)[:-leaf_size] + mesh["row_start"]
        blas_parts.append(
            (np.asarray(b.lo), np.asarray(b.hi), ex,
             np.asarray(b.prim_start), np.asarray(b.prim_count), order)
        )
        blas_order.append(order)

    # ---- TLAS over loose prims + instance AABBs (instances singleton leaves)
    if n_loose + n_inst == 0:
        raise ValueError("empty scene")
    shape_lo = np.concatenate(
        [np.asarray(loose_lo, np.float32).reshape(-1, 3)]
        + [np.asarray(i["world_lo"], np.float32).reshape(1, 3) for i in instances]
    )
    shape_hi = np.concatenate(
        [np.asarray(loose_hi, np.float32).reshape(-1, 3)]
        + [np.asarray(i["world_hi"], np.float32).reshape(1, 3) for i in instances]
    )
    singleton = np.zeros(n_loose + n_inst, bool)
    singleton[n_loose:] = True
    nodes, order = build_sah_bvh(shape_lo, shape_hi, leaf_size, singleton_mask=singleton)
    t_lo, t_hi, t_exit, t_pstart, t_pcount, t_order = flatten_bvh(nodes, order)
    n_tlas = len(t_lo)
    t_exit = np.where(t_exit >= n_tlas, TERMINATE, t_exit)

    # classify TLAS leaves: instance leaves (their single shape id >= n_loose)
    node_inst = np.full(n_tlas, -1, np.int32)
    for s in range(n_tlas):
        if t_pstart[s] >= 0 and t_pcount[s] == 1:
            shape = int(t_order[t_pstart[s]])
            if shape >= n_loose:
                node_inst[s] = shape - n_loose
                t_pstart[s] = -1  # no direct prim test at an instance leaf
                t_pcount[s] = 0
    # instance shape ids no longer referenced through prim_order — zero them
    # so padded LEAF_K gathers stay inside the primitive array
    t_order = np.where(t_order >= n_loose, 0, t_order)

    # ---- unify node arrays + globalize BLAS roots / prim_order offsets
    all_lo = [t_lo]
    all_hi = [t_hi]
    all_exit = [t_exit]
    all_pstart = [t_pstart]
    all_pcount = [t_pcount]
    all_ninst = [node_inst]
    order_parts = [t_order.astype(np.int64)]
    # TLAS leaf prim ids are shape ids < n_loose == global prim row ids: ok
    mesh_root = np.zeros(max(len(meshes), 1), np.int32)
    node_acc = n_tlas
    order_acc = len(t_order)
    for mi, (blo, bhi, bex, bps, bpc, border) in enumerate(blas_parts):
        mesh_root[mi] = node_acc
        ex = np.where(bex >= 0, bex + node_acc, bex)
        ps = np.where(bps >= 0, bps + order_acc, bps)
        all_lo.append(blo)
        all_hi.append(bhi)
        all_exit.append(ex)
        all_pstart.append(ps)
        all_pcount.append(bpc)
        all_ninst.append(np.full(len(blo), -1, np.int32))
        order_parts.append(border.astype(np.int64))
        node_acc += len(blo)
        order_acc += len(border)

    prim_order = np.concatenate(order_parts)
    prim_order = np.concatenate([prim_order, np.zeros(leaf_size, np.int64)])

    if n_inst:
        xf_fwd = np.stack([np.asarray(i["xf_fwd"], np.float32) for i in instances])
        xf_inv = np.stack(
            [np.linalg.inv(np.asarray(i["xf_fwd"], np.float64)).astype(np.float32)
             for i in instances]
        )
        blas_root = np.asarray([mesh_root[i["mesh"]] for i in instances], np.int32)
        mat_override = np.asarray([i["mat_override"] for i in instances], np.int32)
        kind_override = np.asarray([i["kind_override"] for i in instances], np.int32)
        gid = np.asarray([i["gid"] for i in instances], np.int32)
    else:
        xf_fwd = np.zeros((0, 4, 4), np.float32)
        xf_inv = np.zeros((0, 4, 4), np.float32)
        blas_root = np.zeros(0, np.int32)
        mat_override = np.zeros(0, np.int32)
        kind_override = np.zeros(0, np.int32)
        gid = np.zeros(0, np.int32)

    if max(node_acc, len(prim_order)) >= (1 << 24):
        raise ValueError(
            f"two-level structure too large for f32-packed traversal indices: "
            f"{node_acc} nodes / {len(prim_order)} prim-order entries >= 2^24")
    blas_sizes = [len(p[0]) for p in blas_parts]
    per_inst_steps = sum(2 * blas_sizes[i["mesh"]] for i in instances)
    total_nodes = int(node_acc)
    cap = 2 * n_tlas + max(per_inst_steps, 2 * (total_nodes - n_tlas)) + 16

    return TwoLevel(
        step_cap=jnp.asarray(cap, jnp.int32),
        lo=jnp.asarray(np.concatenate(all_lo), jnp.float32),
        hi=jnp.asarray(np.concatenate(all_hi), jnp.float32),
        exit=jnp.asarray(np.concatenate(all_exit), jnp.int32),
        prim_start=jnp.asarray(np.concatenate(all_pstart), jnp.int32),
        prim_count=jnp.asarray(np.concatenate(all_pcount), jnp.int32),
        node_inst=jnp.asarray(np.concatenate(all_ninst), jnp.int32),
        prim_order=jnp.asarray(prim_order, jnp.int32),
        inst_xf_fwd=jnp.asarray(xf_fwd),
        inst_xf_inv=jnp.asarray(xf_inv),
        inst_blas_root=jnp.asarray(blas_root),
        inst_mat_override=jnp.asarray(mat_override),
        inst_kind_override=jnp.asarray(kind_override),
        inst_gid=jnp.asarray(gid),
    )


def _traverse_2l(prims: Primitives, acc: TwoLevel, o, d, t_min, t_max, any_hit: bool):
    """Lockstep wavefront two-level traversal. Returns
    (t_best, best_prim, best_inst, hit)."""
    m = acc.n_nodes
    zero = o[:, 0] * 0.0 + t_min * 0.0

    # loop-invariant packed tables: ONE row gather per step instead of ~12
    # separate per-lane gathers (the dominant loop cost on TPU; ints ride
    # as exact f32 — node/prim counts are far below 2^24)
    node_pack = jnp.concatenate(
        [
            acc.lo, acc.hi,
            acc.exit.astype(jnp.float32)[:, None],
            acc.prim_start.astype(jnp.float32)[:, None],
            acc.prim_count.astype(jnp.float32)[:, None],
            acc.node_inst.astype(jnp.float32)[:, None],
        ],
        axis=1,
    )  # [M, 10]
    identity_only = prims.xf_inv.shape[0] == 1
    if identity_only:
        prim_pack = jnp.concatenate(
            [
                prims.ptype.astype(jnp.float32)[:, None],
                prims.pa, prims.pb, prims.pc,
                prims.valid.astype(jnp.float32)[:, None],
            ],
            axis=1,
        )  # [P, 11]
    i0 = zero.astype(jnp.int32)
    state = (
        jnp.int32(0),  # step counter (malformed-structure guard)
        i0,  # ptr
        i0 + TERMINATE,  # resume (TLAS continuation while inside a BLAS)
        i0 - 1,  # inst (-1 = in TLAS / world space)
        o,  # o_local (== o while in TLAS)
        d,  # d_local
        zero + jnp.inf,  # t_best
        i0 - 1,  # best_prim
        i0 - 1,  # best_inst
    )
    step_cap = acc.step_cap

    def cond(s):
        live = s[1] != TERMINATE
        if any_hit:
            live = live & (s[7] < 0)
        return jnp.any(live) & (s[0] < step_cap)

    def body(s):
        step, ptr, resume, inst, o_l, d_l, t_best, best_prim, best_inst = s
        live = ptr != TERMINATE
        if any_hit:
            live = live & (best_prim < 0)
        ptr_c = jnp.clip(ptr, 0, m - 1)
        in_blas = inst >= 0
        o_cur = jnp.where(in_blas[:, None], o_l, o)
        d_cur = jnp.where(in_blas[:, None], d_l, d)
        inv_d = jnp.where(
            jnp.abs(d_cur) > 1e-20, 1.0 / jnp.where(jnp.abs(d_cur) > 1e-20, d_cur, 1.0), 1e20
        )
        row = node_pack[ptr_c]  # single gather
        lo = row[:, 0:3]
        hi = row[:, 3:6]
        _, _, box_hit = slab_test(lo, hi, o_cur, inv_d, t_min, jnp.minimum(t_max, t_best))
        nxt = row[:, 6].astype(jnp.int32)
        pstart = row[:, 7].astype(jnp.int32)
        pcount = row[:, 8].astype(jnp.int32)
        ninst = row[:, 9].astype(jnp.int32)
        is_leaf = pstart >= 0
        is_inst = ninst >= 0

        # ---- leaf primitive test (triangles already in BLAS-local space;
        # loose prims with their own transform handled inside _chunk_ts)
        start = jnp.maximum(pstart, 0)
        leaf_idx = start[:, None] + jnp.arange(LEAF_K, dtype=jnp.int32)[None, :]
        leaf_prims = acc.prim_order[leaf_idx]
        tmax_run = jnp.minimum(t_max, t_best)
        if identity_only:
            from pathtracer_tpu.accel.traverse import _leaf_ts_packed

            pp = prim_pack[leaf_prims]  # [N, K, 11] single gather
            t = _leaf_ts_packed(pp, o_cur, d_cur, t_min, tmax_run)
        else:
            t = _chunk_ts(prims, leaf_prims, o_cur, d_cur, t_min, tmax_run)
        in_leaf = jnp.arange(LEAF_K, dtype=jnp.int32)[None, :] < pcount[:, None]
        do_leaf = (live & box_hit & is_leaf)[:, None]
        t = jnp.where(do_leaf & in_leaf, t, jnp.inf)
        # min+where selection, NOT argmin+take_along_axis (TPU VPU cliff)
        c_t = jnp.min(t, axis=-1)
        id_c = jnp.min(jnp.where(t <= c_t[:, None], leaf_prims, jnp.int32(2**30)), axis=-1)
        better = c_t < t_best
        t_best = jnp.where(better, c_t, t_best)
        best_prim = jnp.where(better, id_c, best_prim)
        best_inst = jnp.where(better, inst, best_inst)

        # ---- pointer transitions
        enter = live & box_hit & is_inst & ~in_blas
        descend = live & box_hit & ~is_leaf & ~is_inst
        # pop only when the exit edge is actually taken (a BLAS-root descend
        # must NOT trigger the root's own POP exit sentinel)
        pop = (nxt == POP) & ~descend & ~enter
        ninst_c = jnp.maximum(ninst, 0)
        m_inv = acc.inst_xf_inv[ninst_c] if acc.n_instances else jnp.zeros((o.shape[0], 4, 4))
        o_new = jnp.einsum("nij,nj->ni", m_inv[:, :3, :3], o) + m_inv[:, :3, 3]
        d_new = jnp.einsum("nij,nj->ni", m_inv[:, :3, :3], d)
        blas_root = acc.inst_blas_root[ninst_c] if acc.n_instances else i0
        new_ptr = jnp.where(
            descend, ptr_c + 1,
            jnp.where(enter, blas_root, jnp.where(pop, resume, nxt)),
        )
        new_inst = jnp.where(enter, ninst, jnp.where(pop, -1, inst))
        new_resume = jnp.where(enter, nxt, resume)
        o_l = jnp.where(enter[:, None], o_new, o_l)
        d_l = jnp.where(enter[:, None], d_new, d_l)
        ptr = jnp.where(live, new_ptr, ptr)
        inst = jnp.where(live, new_inst, inst)
        resume = jnp.where(live, new_resume, resume)
        return step + 1, ptr, resume, inst, o_l, d_l, t_best, best_prim, best_inst

    s = jax.lax.while_loop(cond, body, state)
    t_best, best_prim, best_inst = s[6], s[7], s[8]
    hit = best_prim >= 0
    return t_best, jnp.maximum(best_prim, 0), best_inst, hit


def intersect_two_level(prims: Primitives, acc: TwoLevel, o, d, t_min, t_max):
    """Closest-hit -> HitRecord with instance-aware attributes."""
    t, pid, iid, hit = _traverse_2l(prims, acc, o, d, t_min, t_max, any_hit=False)
    if acc.n_instances == 0:
        return _fill_attributes(prims, o, d, t, pid, hit)
    # effective transform: instance transform where the winning hit came
    # from a BLAS, else the primitive's own (possibly identity) transform
    iid_c = jnp.maximum(iid, 0)
    tid = prims.transform_id[pid]
    use_inst = (iid >= 0)[:, None, None]
    m_fwd = jnp.where(use_inst, acc.inst_xf_fwd[iid_c], prims.xf_fwd[tid])
    m_inv = jnp.where(use_inst, acc.inst_xf_inv[iid_c], prims.xf_inv[tid])
    hr = _fill_attributes(prims, o, d, t, pid, hit, m_fwd=m_fwd, m_inv=m_inv)
    # instance material / kind overrides + reported instance id
    ovr = acc.inst_mat_override[iid_c]
    kovr = acc.inst_kind_override[iid_c]
    use_ovr = (iid >= 0) & (ovr >= 0)
    material_id = jnp.where(use_ovr & hit, ovr, hr.material_id)
    mat_kind = jnp.where(use_ovr & hit, kovr, hr.mat_kind)
    instance_id = jnp.where((iid >= 0) & hit, acc.inst_gid[iid_c], hr.instance_id)
    return hr._replace(
        material_id=material_id, mat_kind=mat_kind, instance_id=instance_id
    )


def intersect_any_two_level(prims: Primitives, acc: TwoLevel, o, d, t_min, t_max):
    """Occlusion query -> bool[N]."""
    _, _, _, hit = _traverse_2l(prims, acc, o, d, t_min, t_max, any_hit=True)
    return hit
