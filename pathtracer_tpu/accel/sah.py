"""Host-side SAH BVH builder.

Capability parity with the reference's vendored builder
(src/accelerator/bvh.rs:299-457): top-down recursion, 6-bucket surface-area
heuristic on the widest centroid axis, median-split fallback for degenerate
extents, multi-primitive leaves. Pure numpy; runs once at scene build.
"""

from __future__ import annotations

from typing import List, NamedTuple

import numpy as np

N_BUCKETS = 6


class BuildNode(NamedTuple):
    lo: np.ndarray
    hi: np.ndarray
    left: int  # -1 for leaf
    right: int
    first: int  # index into prim_order (leaf)
    count: int  # number of prims (leaf)


def _surface_area(lo, hi):
    d = np.maximum(hi - lo, 0.0)
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0])


def build_sah_bvh(aabb_lo: np.ndarray, aabb_hi: np.ndarray, leaf_size: int = 4,
                  singleton_mask: np.ndarray | None = None):
    """Returns (nodes: List[BuildNode], prim_order: int array). Node 0 is the
    root; children indices reference the node list.

    `singleton_mask`: optional bool[n] — shapes that must land in their own
    single-shape leaf (TLAS instance entries: the two-level traversal enters
    a BLAS per leaf, so an instance cannot share a leaf with other shapes)."""
    n = len(aabb_lo)
    centroids = (aabb_lo + aabb_hi) * 0.5
    order = np.arange(n)
    nodes: List[BuildNode] = []

    def emit(lo, hi, left, right, first, count):
        nodes.append(BuildNode(lo, hi, left, right, first, count))
        return len(nodes) - 1

    prim_order: List[int] = []

    def recurse(idx: np.ndarray) -> int:
        lo = aabb_lo[idx].min(axis=0)
        hi = aabb_hi[idx].max(axis=0)
        if len(idx) <= leaf_size and (
            len(idx) == 1
            or singleton_mask is None
            or not singleton_mask[idx].any()
        ):
            first = len(prim_order)
            prim_order.extend(idx.tolist())
            return emit(lo, hi, -1, -1, first, len(idx))
        cent = centroids[idx]
        c_lo, c_hi = cent.min(axis=0), cent.max(axis=0)
        extent = c_hi - c_lo
        axis = int(np.argmax(extent))
        if extent[axis] < 1e-5:
            # median split fallback (bvh.rs degenerate-extent branch)
            mid = len(idx) // 2
            part = np.argsort(cent[:, axis])
            left_idx, right_idx = idx[part[:mid]], idx[part[mid:]]
        else:
            # 6-bucket SAH
            rel = (cent[:, axis] - c_lo[axis]) / extent[axis]
            bucket = np.minimum((rel * N_BUCKETS).astype(np.int64), N_BUCKETS - 1)
            best_cost, best_split = np.inf, None
            for split in range(1, N_BUCKETS):
                in_l = bucket < split
                nl, nr = in_l.sum(), (~in_l).sum()
                if nl == 0 or nr == 0:
                    continue
                sa_l = _surface_area(
                    aabb_lo[idx[in_l]].min(axis=0), aabb_hi[idx[in_l]].max(axis=0)
                )
                sa_r = _surface_area(
                    aabb_lo[idx[~in_l]].min(axis=0), aabb_hi[idx[~in_l]].max(axis=0)
                )
                cost = sa_l * nl + sa_r * nr
                if cost < best_cost:
                    best_cost, best_split = cost, split
            if best_split is None:
                mid = len(idx) // 2
                part = np.argsort(cent[:, axis])
                left_idx, right_idx = idx[part[:mid]], idx[part[mid:]]
            else:
                in_l = bucket < best_split
                left_idx, right_idx = idx[in_l], idx[~in_l]
        me = emit(lo, hi, 0, 0, -1, 0)  # placeholder child ids
        li = recurse(left_idx)
        ri = recurse(right_idx)
        nodes[me] = nodes[me]._replace(left=li, right=ri)
        return me

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10000))
    try:
        recurse(order)
    finally:
        sys.setrecursionlimit(old_limit)
    return nodes, np.asarray(prim_order, np.int64)
