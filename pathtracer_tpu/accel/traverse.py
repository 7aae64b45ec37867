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
        lo = bvh.lo[ptr_c]
        hi = bvh.hi[ptr_c]
        _, _, box_hit = slab_test(lo, hi, o, inv_d, t_min, jnp.minimum(t_max, t_best))
        is_leaf = bvh.prim_start[ptr_c] >= 0
        live = ptr < m
        if any_hit:
            live = live & (id_best < 0)

        # leaf: dense-test its LEAF_K prims (masked by count)
        start = jnp.maximum(bvh.prim_start[ptr_c], 0)
        leaf_idx = start[:, None] + jnp.arange(LEAF_K, dtype=jnp.int32)[None, :]
        leaf_prims = bvh.prim_order[leaf_idx]
        t = _chunk_ts(prims, leaf_prims, o, d, t_min, jnp.minimum(t_max, t_best))
        in_leaf = (
            jnp.arange(LEAF_K, dtype=jnp.int32)[None, :] < bvh.prim_count[ptr_c][:, None]
        )
        do_leaf = (live & box_hit & is_leaf)[:, None]
        t = jnp.where(do_leaf & in_leaf, t, jnp.inf)
        c_arg = jnp.argmin(t, axis=-1)
        c_t = jnp.take_along_axis(t, c_arg[:, None], axis=-1)[:, 0]
        better = c_t < t_best
        t_best = jnp.where(better, c_t, t_best)
        id_best = jnp.where(better, jnp.take_along_axis(leaf_prims, c_arg[:, None], axis=-1)[:, 0], id_best)

        # pointer update: internal-hit -> next slot; miss or leaf -> exit
        descend = box_hit & ~is_leaf
        new_ptr = jnp.where(descend, ptr_c + 1, bvh.exit_idx[ptr_c])
        ptr = jnp.where(live, new_ptr, ptr)
        return step + 1, ptr, t_best, id_best

    _, ptr, t_best, id_best = jax.lax.while_loop(cond, body, state)
    hit = id_best >= 0
    return t_best, jnp.maximum(id_best, 0), hit


def intersect_bvh(prims: Primitives, bvh: BVH, o, d, t_min, t_max):
    """Closest-hit via stackless traversal -> HitRecord."""
    t, pid, hit = _traverse(prims, bvh, o, d, t_min, t_max, any_hit=False)
    return _fill_attributes(prims, o, d, t, pid, hit)


def intersect_any_bvh(prims: Primitives, bvh: BVH, o, d, t_min, t_max):
    """Occlusion query -> bool[N] (early-outs per-ray on first hit)."""
    _, _, hit = _traverse(prims, bvh, o, d, t_min, t_max, any_hit=True)
    return hit
