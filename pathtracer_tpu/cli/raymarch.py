"""SDF raymarcher sharing the camera/tonemap/output layers.

Capability parity with the reference's raymarch binary
(src/bin/raymarch.rs, feature build_raymarch): sphere-traces signed
distance fields with the same projective camera and film/tonemap pipeline
as the renderer — here as one fused `lax.while_loop` wavefront.

Usage: python -m pathtracer_tpu.cli.raymarch [--size 256x256]
       [--scene menger|spheres] [--out output/raymarch.png]
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp

from pathtracer_tpu.camera import make_projective_camera
from pathtracer_tpu.core import vecmath
from pathtracer_tpu.tonemap import Clamp
from pathtracer_tpu.renderer.output import output_film


def sdf_sphere(p, c, r):
    return vecmath.length(p - c) - r


def sdf_box(p, c, half):
    q = jnp.abs(p - c) - half
    return vecmath.length(jnp.maximum(q, 0.0)) + jnp.minimum(
        jnp.max(q, axis=-1), 0.0
    )


def sdf_menger(p, iters: int = 4):
    """Menger sponge via box folding (the reference ships menger scenes)."""
    d = sdf_box(p, jnp.zeros(3), jnp.ones(3))
    s = 1.0
    for _ in range(iters):
        a = jnp.mod(p * s + 1.0, 2.0) - 1.0
        s *= 3.0
        r = jnp.abs(1.0 - 3.0 * jnp.abs(a))
        da = jnp.maximum(r[..., 0], r[..., 1])
        db = jnp.maximum(r[..., 1], r[..., 2])
        dc = jnp.maximum(r[..., 2], r[..., 0])
        c = (jnp.minimum(da, jnp.minimum(db, dc)) - 1.0) / s
        d = jnp.maximum(d, c)
    return d


def make_scene(name: str):
    if name == "menger":
        return lambda p: sdf_menger(p)
    def spheres(p):
        d1 = sdf_sphere(p, jnp.array([0.0, 0.0, 0.0]), 0.7)
        d2 = sdf_sphere(p, jnp.array([0.9, 0.4, -0.2]), 0.4)
        d3 = sdf_box(p, jnp.array([0.0, 0.0, -1.2]), jnp.array([2.5, 2.5, 0.1]))
        return jnp.minimum(jnp.minimum(d1, d2), d3)
    return spheres


def sdf_normal(sdf, p, eps=1e-4):
    def g(axis):
        e = jnp.zeros(3).at[axis].set(eps)
        return sdf(p + e) - sdf(p - e)
    return vecmath.normalize(jnp.stack([g(0), g(1), g(2)], axis=-1))


def raymarch(sdf, o, d, max_steps=128, t_max=20.0, eps=1e-4):
    def body(state):
        t, done, steps = state
        p = o + t[..., None] * d
        dist = sdf(p)
        hit = dist < eps
        t = jnp.where(done, t, t + jnp.maximum(dist, eps * 0.5))
        done = done | hit | (t > t_max)
        return t, done, steps + 1

    def cond(state):
        return (~jnp.all(state[1])) & (state[2] < max_steps)

    zero = o[:, 0] * 0.0
    t, done, _ = jax.lax.while_loop(cond, body, (zero + 0.01, zero > 1.0, jnp.int32(0)))
    p = o + t[..., None] * d
    hit = (sdf(p) < eps * 4) & (t < t_max)
    return t, hit


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="256x256")
    ap.add_argument("--scene", default="spheres", choices=["spheres", "menger"])
    ap.add_argument("--out", default="raymarch")
    ap.add_argument("--output-dir", default="output")
    args = ap.parse_args(argv)
    w, h = (int(t) for t in args.size.lower().split("x"))
    sdf = make_scene(args.scene)
    cam = make_projective_camera([2.5, -2.5, 1.8], [0, 0, 0], vfov_degrees=40.0,
                                 focal_distance=4.0, aspect_ratio=w / h)

    ids = jnp.arange(w * h)
    uv_x = ((ids % w).astype(jnp.float32) + 0.5) / w
    uv_y = ((ids // w).astype(jnp.float32) + 0.5) / h
    o, d, _ = cam.get_ray(uv_x, uv_y, jnp.zeros(w * h), jnp.zeros(w * h))
    t, hit = raymarch(sdf, o, d)
    p = o + t[..., None] * d
    n = sdf_normal(sdf, p)
    sun = vecmath.normalize(jnp.array([0.5, -0.3, 0.8]))
    diffuse = jnp.maximum(vecmath.dot(n, sun), 0.0) + 0.15
    # ambient-occlusion-ish term from step distance
    shade = jnp.where(hit, diffuse, 0.05)
    film = jnp.stack([shade, shade, shade], axis=-1).reshape(h, w, 3)
    exr, png = output_film(film, args.out, Clamp(luminance_only=False),
                           "sRGB", 1.0, args.output_dir)
    print(f"wrote {exr}, {png}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
