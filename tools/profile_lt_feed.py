"""LT megakernel spawn-feed forensics (round 4, LT-mega v2 planning).

The LT megakernel commit measured the per-round XLA spawn feed at ~180 of
the 226 ms round at 1M lanes and attributed it to "CDF-inversion gathers".
Before building in-kernel spawning (v2), split the feed cost into its
actual components, each as its own warm jitted program with a FORCED host
fetch of a scalar (block_until_ready does not await remote execution on
the axon tunnel — PARITY.md):

  feed      full _lt_spawn_feed (what the kernel round actually pays)
  spawn     spawn_particles alone (light pick + surface + lambda + dir)
  strat     stratify_u0 alone (per-round stratum permutation)
  conn      _connect_to_camera_values alone (s=1 lens connection)
  uniforms  the jrandom.uniform draws alone
  round     one full LT-mega bounce round (lt_mega_round) for scale

Run: python tools/profile_lt_feed.py [n_log2=20]
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


def timed(label, fn, reps=5):
    np.asarray(fn(0))  # warm/compile
    np.asarray(fn(1))  # tunnel steady-state (PARITY: 2 calls post-compile)
    best = 1e9
    for r in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(2 + r))  # forced host fetch
        best = min(best, time.perf_counter() - t0)
    print(f"{label:10s} {best*1e3:9.2f} ms", flush=True)
    return best


def main():
    import jax.random as jrandom

    from pathtracer_tpu.integrator.lt import (LTSettings,
                                              _connect_to_camera_values,
                                              spawn_particles, stratify_u0)
    from pathtracer_tpu.kernels import lt_mega
    from pathtracer_tpu.parsing.cameras import build_camera
    from pathtracer_tpu.parsing.construct import construct_world

    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
    bundle = construct_world("data/scenes/cornell_box.toml",
                             search_paths=SEARCH, cache_dir="/tmp/pt_cache",
                             camera_surfaces=True)
    world = bundle.world
    cam = build_camera(bundle.camera_by_id("main"), aspect_ratio=1.0)
    settings = LTSettings(max_bounces=8, stratified=True)
    key = jax.random.PRNGKey(0)
    print(f"device {jax.devices()[0]}  n={n}", flush=True)

    @jax.jit
    def f_feed(it):
        f = lt_mega._lt_spawn_feed(world, settings, key, it, n, cam, 512, 512)
        return f.sum()

    @jax.jit
    def f_uniforms(it):
        kf = jrandom.fold_in(jrandom.fold_in(key, it), 2)
        u0 = jrandom.uniform(kf, (n, 9))
        uc = jrandom.uniform(jrandom.fold_in(kf, 1), (n, 2))
        return u0.sum() + uc.sum()

    @jax.jit
    def f_strat(it):
        kf = jrandom.fold_in(jrandom.fold_in(key, it), 2)
        u0 = jrandom.uniform(kf, (n, 9))
        return stratify_u0(settings, u0, kf).sum()

    @jax.jit
    def f_spawn(it):
        kf = jrandom.fold_in(jrandom.fold_in(key, it), 2)
        u0 = jrandom.uniform(kf, (n, 9))
        sp = spawn_particles(world, settings, u0)
        return sp["o"].sum() + sp["beta"].sum() + sp["lam"].sum()

    @jax.jit
    def f_conn(it):
        kf = jrandom.fold_in(jrandom.fold_in(key, it), 2)
        u0 = jrandom.uniform(kf, (n, 9))
        sp = spawn_particles(world, settings, u0)
        uc = jrandom.uniform(jrandom.fold_in(kf, 1), (n, 2))
        lv = _connect_to_camera_values(world, cam, sp, uc)
        return lv["energy"].sum() + lv["tmax"].sum()

    t_feed = timed("feed", f_feed)
    timed("uniforms", f_uniforms)
    timed("strat", f_strat)
    t_spawn = timed("spawn", f_spawn)
    t_conn = timed("conn", f_conn)
    print(f"conn-only {1e3*(t_conn - t_spawn):9.2f} ms (conn minus spawn)",
          flush=True)
    print(f"feed total {t_feed*1e3:.2f} ms at n={n}", flush=True)


if __name__ == "__main__":
    main()
