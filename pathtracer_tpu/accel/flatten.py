"""Stackless BVH flattening: DFS order with entry/exit threading.

Capability parity with the reference's FlatBVH
(src/accelerator/lbvh.rs:9-164): nodes laid out in DFS order so "hit"
always advances to the next array slot and "miss" jumps the whole subtree
via exit_index — the exact layout the reference notes is "for use in shader
programs", which is equally the right shape for a lockstep TPU wavefront.
"""

from __future__ import annotations

import sys
from typing import List, NamedTuple

import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.accel.sah import BuildNode, build_sah_bvh

LEAF_K = 4  # max prims per leaf (matches build leaf_size)


class BVH(NamedTuple):
    lo: jnp.ndarray  # f32[M,3]
    hi: jnp.ndarray  # f32[M,3]
    exit_idx: jnp.ndarray  # i32[M] node to jump to on miss / after a leaf
    prim_start: jnp.ndarray  # i32[M] (-1 for internal nodes)
    prim_count: jnp.ndarray  # i32[M]
    prim_order: jnp.ndarray  # i32[P_pad] leaf-contiguous primitive ids

    @property
    def n_nodes(self):
        return self.lo.shape[0]


def flatten_bvh(nodes: List[BuildNode], prim_order: np.ndarray):
    """DFS flatten with exit indices (miss/after-leaf jump target; exit == M
    terminates). Subtree sizes are computed first so every node's DFS slot —
    and therefore every exit target — is known before assignment."""
    m = len(nodes)
    size = np.ones(m, np.int64)

    def calc_size(i: int) -> int:
        node = nodes[i]
        if node.left >= 0:
            size[i] = 1 + calc_size(node.left) + calc_size(node.right)
        return int(size[i])

    lo = np.zeros((m, 3), np.float32)
    hi = np.zeros((m, 3), np.float32)
    exit_idx = np.zeros(m, np.int32)
    prim_start = np.full(m, -1, np.int32)
    prim_count = np.zeros(m, np.int32)

    def assign(i: int, slot: int, exit_to: int):
        node = nodes[i]
        lo[slot] = node.lo
        hi[slot] = node.hi
        exit_idx[slot] = exit_to
        if node.left < 0:
            prim_start[slot] = node.first
            prim_count[slot] = node.count
        else:
            left_slot = slot + 1
            right_slot = left_slot + int(size[node.left])
            assign(node.left, left_slot, right_slot)
            assign(node.right, right_slot, exit_to)

    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 100000))
    try:
        calc_size(0)
        assign(0, 0, m)
    finally:
        sys.setrecursionlimit(old)
    return lo, hi, exit_idx, prim_start, prim_count, prim_order.astype(np.int32)


def build_bvh_arrays(aabb_lo: np.ndarray, aabb_hi: np.ndarray, leaf_size: int = LEAF_K,
                     use_native: bool = True) -> BVH:
    result = None
    if use_native and len(aabb_lo) >= 64:
        from pathtracer_tpu.accel.native import build_bvh_native

        result = build_bvh_native(np.asarray(aabb_lo, np.float32),
                                  np.asarray(aabb_hi, np.float32), leaf_size)
    if result is not None:
        lo, hi, exit_idx, prim_start, prim_count, prim_order = result
    else:
        nodes, order = build_sah_bvh(aabb_lo, aabb_hi, leaf_size)
        lo, hi, exit_idx, prim_start, prim_count, prim_order = flatten_bvh(nodes, order)
    # traversal rides int indices through f32 packed rows — exact only < 2^24
    if max(len(lo), len(prim_order)) >= (1 << 24):
        raise ValueError(
            f"BVH too large for f32-packed traversal indices: "
            f"{len(lo)} nodes / {len(prim_order)} prim-order entries >= 2^24")
    # pad prim_order so leaf gathers of LEAF_K never go out of bounds
    pad = np.concatenate([prim_order, np.zeros(leaf_size, np.int32)])
    return BVH(
        lo=jnp.asarray(lo),
        hi=jnp.asarray(hi),
        exit_idx=jnp.asarray(exit_idx),
        prim_start=jnp.asarray(prim_start),
        prim_count=jnp.asarray(prim_count),
        prim_order=jnp.asarray(pad),
    )
