"""LT/BDPT perf forensics (VERDICT r3 #6): decompose where the splatted
renderer's wall clock goes on the real chip.

Measures, each as its own warm jitted program at n = 512*512 lanes:
  full    lt_trace (the production while_loop program), Mrays/s from counters
  isect   world.intersect over 8 sequential dependent rounds (lax.scan)
  any     world.intersect_any (the camera-connection shadow ray), 8 rounds
  scatter film.at[pid].add of [n,3] xyz, 16 rounds (2 splats/bounce)
  bsdf    bsdf_eval at n lanes, 8 rounds
  bdpt    bdpt_trace (own + splat films)

Run: python tools/profile_lt.py [n_log2]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SEARCH = ["/root/repo", "/root/reference"]


def timed(label, fn, *a, reps=3):
    fn(*a)  # warm/compile
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*a)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:10s} {best*1e3:9.2f} ms")
    return best


def main():
    from pathtracer_tpu.parsing.construct import construct_world
    from pathtracer_tpu.parsing.cameras import build_camera
    from pathtracer_tpu.integrator.lt import LTSettings, lt_trace
    from pathtracer_tpu.integrator.bdpt import BDPTSettings, bdpt_trace
    from pathtracer_tpu.materials import bsdf_eval
    from pathtracer_tpu.prelude import (INTERSECTION_TIME_OFFSET, RAY_TMAX,
                                        TransportMode)
    from pathtracer_tpu.core import sampling

    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 18)
    w = h = 512
    bundle = construct_world("data/scenes/cornell_box.toml",
                             search_paths=SEARCH, cache_dir="/tmp/pt_cache",
                             camera_surfaces=True)
    world = bundle.world
    cam = build_camera(bundle.camera_by_id("main"), aspect_ratio=1.0)
    key = jax.random.PRNGKey(0)

    lt = LTSettings(max_bounces=8, stratified=True)

    def full(k):
        film, counters = lt_trace(world, cam, lt, w, h, n, k)
        return film, counters

    full_j = jax.jit(full)
    full_j(key)
    t0 = time.perf_counter()
    film, counters = full_j(jax.random.PRNGKey(1))
    jax.block_until_ready(film)
    el = time.perf_counter() - t0
    c = np.asarray(counters)
    rays = float(c.sum())
    print(f"{'lt full':10s} {el*1e3:9.2f} ms   rays {rays:,.0f}  "
          f"{rays/el/1e6:8.2f} Mrays/s")

    o = jnp.zeros((n, 3)) + jnp.array([0.0, 0.0, 0.5])
    d0 = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
    d0 = d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True)
    tmin = jnp.full((n,), INTERSECTION_TIME_OFFSET, jnp.float32)
    tmax = jnp.full((n,), RAY_TMAX, jnp.float32)

    @jax.jit
    def isect8(d):
        def body(dd, _):
            hr = world.intersect(o, dd, tmin, tmax)
            dd = jnp.where(hr.hit[:, None], -dd, dd)
            return dd, hr.t.sum()
        dd, ts = jax.lax.scan(body, d, None, length=8)
        return ts.sum()

    timed("isect x8", isect8, d0)

    @jax.jit
    def any8(d):
        def body(dd, _):
            blocked = world.intersect_any(o, dd, tmin, tmax * 0.5)
            dd = jnp.where(blocked[:, None], -dd, dd)
            return dd, blocked.sum()
        dd, bs = jax.lax.scan(body, d, None, length=8)
        return bs.sum()

    timed("any x8", any8, d0)

    pid = jax.random.randint(jax.random.PRNGKey(3), (n,), 0, w * h)
    xyz = jax.random.uniform(jax.random.PRNGKey(4), (n, 3))

    @jax.jit
    def scat16(pid, xyz):
        film = jnp.zeros((w * h, 3))
        def body(f, _):
            return f.at[pid].add(xyz), 0.0
        f, _ = jax.lax.scan(body, film, None, length=16)
        return f.sum()

    timed("scat x16", scat16, pid, xyz)

    lam = jax.random.uniform(jax.random.PRNGKey(5), (n,)) * 300 + 400
    uv = jax.random.uniform(jax.random.PRNGKey(6), (n, 2))
    mid = jnp.zeros((n,), jnp.int32)
    wi = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))

    @jax.jit
    def bsdf8(lam):
        def body(l, _):
            f, p = bsdf_eval(world.mats, world.bank, world.tex, mid, l, uv,
                             wi, -wi, TransportMode.Importance)
            return l + p * 0.0, f.sum()
        l, fs = jax.lax.scan(body, lam, None, length=8)
        return fs.sum()

    timed("bsdf x8", bsdf8, lam)

    bd = BDPTSettings(max_depth=6)
    ids = jnp.arange(n, dtype=jnp.int32)
    xy = jnp.stack([(ids % w).astype(jnp.float32),
                    (ids // w).astype(jnp.float32)], axis=-1)
    film_uv = (xy % w) / jnp.array([w, h], jnp.float32)

    @jax.jit
    def bdpt_full(k):
        return bdpt_trace(world, cam, bd, film_uv, k)

    bdpt_full(key)
    t0 = time.perf_counter()
    r = bdpt_full(jax.random.PRNGKey(7))
    jax.block_until_ready(r)
    el = time.perf_counter() - t0
    c = np.asarray(r[-1])
    print(f"{'bdpt full':10s} {el*1e3:9.2f} ms   rays {float(c.sum()):,.0f}  "
          f"{float(c.sum())/el/1e6:8.2f} Mrays/s")


if __name__ == "__main__":
    main()
