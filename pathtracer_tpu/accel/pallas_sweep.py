"""Pallas TPU kernel for the dense ray×primitive sweep.

The dense intersector (geometry/soa.py) is the renderer's hottest op for
small scenes (Cornell: 3 sweeps per bounce round). The XLA version scans
prim chunks with argmin bookkeeping materialised between steps; this Pallas
kernel keeps the whole primitive SoA resident in VMEM, tiles the ray
wavefront over the grid, and runs the chunk loop entirely in-registers —
all slicing is static so no gathers are emitted at all.

Identity-transform scenes only (the common case after world-space
flattening); scenes with instance transforms fall back to the XLA path.
CPU runs use interpreter mode (tests); the TPU build compiles via Mosaic.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from pathtracer_tpu.geometry.soa import (
    PRIM_RECT,
    PRIM_SPHERE,
    PRIM_TRIANGLE,
    Primitives,
    _fill_attributes,
    _t_disk,
    _t_rect,
    _t_sphere,
    _t_triangle,
)

RAY_TILE = 512
_CHUNK = 16


def _sweep_kernel(o_ref, d_ref, tmin_ref, tmax_ref,
                  pa_ref, pb_ref, pc_ref, ptype_ref, valid_ref,
                  tbest_ref, idbest_ref):
    o = o_ref[:]  # [T,3]
    d = d_ref[:]
    t_min = tmin_ref[:, 0]
    t_max = tmax_ref[:, 0]
    p = pa_ref.shape[0]
    t_best = jnp.full((o.shape[0],), jnp.inf, jnp.float32)
    id_best = jnp.full((o.shape[0],), -1, jnp.int32)
    o_l = o[:, None, :]
    d_l = d[:, None, :]
    tmin_b = t_min[:, None]
    for c in range(p // _CHUNK):
        sl = slice(c * _CHUNK, (c + 1) * _CHUNK)
        pa = pa_ref[sl, :][None]
        pb = pb_ref[sl, :][None]
        pc = pc_ref[sl, :][None]
        ptype = ptype_ref[sl, 0][None]
        valid = valid_ref[sl, 0][None] > 0
        tmax_b = jnp.minimum(t_max, t_best)[:, None]
        t_tri = _t_triangle(pa, pb, pc, o_l, d_l, tmin_b, tmax_b)
        t_sph = _t_sphere(pa, pb, o_l, d_l, tmin_b, tmax_b)
        t_rec = _t_rect(pa, pb, pc, o_l, d_l, tmin_b, tmax_b)
        t_dsk = _t_disk(pa, pb, pc, o_l, d_l, tmin_b, tmax_b)
        t = jnp.where(
            ptype == PRIM_TRIANGLE, t_tri,
            jnp.where(ptype == PRIM_SPHERE, t_sph,
                      jnp.where(ptype == PRIM_RECT, t_rec, t_dsk)),
        )
        t = jnp.where(valid, t, jnp.inf)
        c_arg = jnp.argmin(t, axis=-1).astype(jnp.int32)
        c_t = jnp.min(t, axis=-1)
        better = c_t < t_best
        t_best = jnp.where(better, c_t, t_best)
        id_best = jnp.where(better, c_arg + c * _CHUNK, id_best)
    tbest_ref[:, 0] = t_best
    idbest_ref[:, 0] = id_best


@partial(jax.jit, static_argnames=("interpret",))
def pallas_sweep(prims: Primitives, o, d, t_min, t_max, interpret: bool = False):
    """Returns (t_best [N], id_best [N]) for identity-transform scenes."""
    n = o.shape[0]
    pad = (-n) % RAY_TILE
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3))])
        d = jnp.concatenate([d, jnp.ones((pad, 3))])
        t_min = jnp.concatenate([t_min, jnp.zeros(pad)])
        t_max = jnp.concatenate([t_max, jnp.zeros(pad)])
    nn = n + pad
    grid = (nn // RAY_TILE,)
    ray_spec = lambda w: pl.BlockSpec((RAY_TILE, w), lambda i: (i, 0))
    full_spec = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0))
    pt2 = prims.ptype[:, None].astype(jnp.float32)
    vd2 = prims.valid[:, None].astype(jnp.float32)
    t_best, id_best = pl.pallas_call(
        _sweep_kernel,
        grid=grid,
        in_specs=[
            ray_spec(3), ray_spec(3), ray_spec(1), ray_spec(1),
            full_spec(prims.pa), full_spec(prims.pb), full_spec(prims.pc),
            full_spec(pt2), full_spec(vd2),
        ],
        out_specs=[ray_spec(1), ray_spec(1)],
        out_shape=[
            jax.ShapeDtypeStruct((nn, 1), jnp.float32),
            jax.ShapeDtypeStruct((nn, 1), jnp.int32),
        ],
        interpret=interpret,
    )(o, d, t_min[:, None], t_max[:, None], prims.pa, prims.pb, prims.pc, pt2, vd2)
    return t_best[:n, 0], id_best[:n, 0]


def pallas_intersect_dense(prims: Primitives, o, d, t_min, t_max, interpret: bool = False):
    """Drop-in alternative to geometry.intersect_dense for identity-transform
    scenes. Attribute fill stays in XLA (cheap, fuses with the shading)."""
    t_best, id_best = pallas_sweep(prims, o, d, t_min, t_max, interpret=interpret)
    hit = id_best >= 0
    return _fill_attributes(prims, o, d, t_best, jnp.maximum(id_best, 0), hit)
