"""Wavefront stackless BVH traversal.

Capability parity with the reference's iterative FlatBVH traversal loop
(src/accelerator/lbvh.rs:172-213) + the narrow-phase with closest-so-far
pruning (src/accelerator/mod.rs:86-178), fused into ONE loop: every live
ray holds a node pointer; internal-node hits advance to the next DFS slot,
misses jump via exit_index, and leaf nodes dense-test their ≤LEAF_K
primitives immediately (clamping t_max to the running closest hit). The
whole wavefront steps in lockstep — a ray that terminates idles until the
loop drains.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pathtracer_tpu.accel.flatten import BVH, LEAF_K
from pathtracer_tpu.geometry.aabb import slab_test
from pathtracer_tpu.geometry.soa import Primitives, _chunk_ts, _fill_attributes


def _traverse(prims: Primitives, bvh: BVH, o, d, t_min, t_max, any_hit: bool,
              max_steps: int | None = None):
    n = o.shape[0]
    m = bvh.n_nodes
    inv_d = jnp.where(jnp.abs(d) > 1e-20, 1.0 / jnp.where(jnp.abs(d) > 1e-20, d, 1.0), 1e20)
    zero = o[:, 0] * 0.0 + t_min * 0.0

    # ---- loop-invariant packed tables: ONE row gather per step instead of
    # ~a dozen separate array gathers (per-lane gathers are the dominant
    # cost of the lockstep loop on TPU; ints ride as exact f32 < 2^24)
    node_pack = jnp.concatenate(
        [
            bvh.lo, bvh.hi,
            bvh.exit_idx.astype(jnp.float32)[:, None],
            bvh.prim_start.astype(jnp.float32)[:, None],
            bvh.prim_count.astype(jnp.float32)[:, None],
        ],
        axis=1,
    )  # [M, 9]
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

    state = (
        jnp.int32(0),  # step counter (malformed-BVH infinite-loop guard)
        zero.astype(jnp.int32),  # node ptr
        zero + jnp.inf,  # t_best
        zero.astype(jnp.int32) - 1,  # id_best
    )
    step_cap = max_steps or (2 * m + 8)

    def cond(s):
        ptr = s[1]
        live = ptr < m
        if any_hit:
            live = live & (s[3] < 0)
        return jnp.any(live) & (s[0] < step_cap)

    def body(s):
        step, ptr, t_best, id_best = s
        ptr_c = jnp.minimum(ptr, m - 1)
        row = node_pack[ptr_c]  # [N, 9] — single gather
        lo = row[:, 0:3]
        hi = row[:, 3:6]
        exit_i = row[:, 6].astype(jnp.int32)
        pstart = row[:, 7].astype(jnp.int32)
        pcount = row[:, 8].astype(jnp.int32)
        _, _, box_hit = slab_test(lo, hi, o, inv_d, t_min, jnp.minimum(t_max, t_best))
        is_leaf = pstart >= 0
        live = ptr < m
        if any_hit:
            live = live & (id_best < 0)

        # leaf: dense-test its LEAF_K prims (masked by count)
        start = jnp.maximum(pstart, 0)
        leaf_idx = start[:, None] + jnp.arange(LEAF_K, dtype=jnp.int32)[None, :]
        leaf_prims = bvh.prim_order[leaf_idx]
        tmax_run = jnp.minimum(t_max, t_best)
        if identity_only:
            pp = prim_pack[leaf_prims]  # [N, K, 11] — single gather
            t = _leaf_ts_packed(pp, o, d, t_min, tmax_run)
        else:
            t = _chunk_ts(prims, leaf_prims, o, d, t_min, tmax_run)
        in_leaf = (
            jnp.arange(LEAF_K, dtype=jnp.int32)[None, :] < pcount[:, None]
        )
        do_leaf = (live & box_hit & is_leaf)[:, None]
        t = jnp.where(do_leaf & in_leaf, t, jnp.inf)
        # min+where selection, NOT argmin+take_along_axis (per-lane dynamic
        # indexing is a TPU VPU cliff)
        c_t = jnp.min(t, axis=-1)
        id_c = jnp.min(jnp.where(t <= c_t[:, None], leaf_prims, jnp.int32(2**30)), axis=-1)
        better = c_t < t_best
        t_best = jnp.where(better, c_t, t_best)
        id_best = jnp.where(better, id_c, id_best)

        # pointer update: internal-hit -> next slot; miss or leaf -> exit
        descend = box_hit & ~is_leaf
        new_ptr = jnp.where(descend, ptr_c + 1, exit_i)
        ptr = jnp.where(live, new_ptr, ptr)
        return step + 1, ptr, t_best, id_best

    _, ptr, t_best, id_best = jax.lax.while_loop(cond, body, state)
    hit = id_best >= 0
    return t_best, jnp.maximum(id_best, 0), hit


def _leaf_ts_packed(pp, o, d, t_min, t_max):
    """Leaf intersection from a packed [N, K, 11] prim block
    (ptype, pa, pb, pc, valid) with world-space rays."""
    from pathtracer_tpu.geometry.soa import (
        PRIM_RECT,
        PRIM_SPHERE,
        PRIM_TRIANGLE,
        _t_disk,
        _t_rect,
        _t_sphere,
        _t_triangle,
    )

    ptype = pp[..., 0]
    pa = pp[..., 1:4]
    pb = pp[..., 4:7]
    pc = pp[..., 7:10]
    valid = pp[..., 10] > 0.5
    o_b = o[:, None, :]
    d_b = d[:, None, :]
    tmin_b = t_min[:, None]
    tmax_b = t_max[:, None]
    t_tri = _t_triangle(pa, pb, pc, o_b, d_b, tmin_b, tmax_b)
    t_sph = _t_sphere(pa, pb, o_b, d_b, tmin_b, tmax_b)
    t_rec = _t_rect(pa, pb, pc, o_b, d_b, tmin_b, tmax_b)
    t_dsk = _t_disk(pa, pb, pc, o_b, d_b, tmin_b, tmax_b)
    t = jnp.select(
        [ptype == PRIM_TRIANGLE, ptype == PRIM_SPHERE, ptype == PRIM_RECT],
        [t_tri, t_sph, t_rec],
        t_dsk,
    )
    return jnp.where(valid, t, jnp.inf)


def intersect_bvh(prims: Primitives, bvh: BVH, o, d, t_min, t_max):
    """Closest-hit via stackless traversal -> HitRecord."""
    t, pid, hit = _traverse(prims, bvh, o, d, t_min, t_max, any_hit=False)
    return _fill_attributes(prims, o, d, t, pid, hit)


def intersect_any_bvh(prims: Primitives, bvh: BVH, o, d, t_min, t_max):
    """Occlusion query -> bool[N] (early-outs per-ray on first hit)."""
    _, _, hit = _traverse(prims, bvh, o, d, t_min, t_max, any_hit=True)
    return hit
