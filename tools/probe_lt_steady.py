"""LT steady-state forensics (VERDICT r3 #6): per-call wall over 6 repeat
calls for several (max_bounces, camera_samples, n) combos, so warm-up
artifacts (the tunnel needs ~2 calls to reach steady state) can't masquerade
as per-bounce cost. Rays from counters; Mrays/s at steady state = median of
the last 4 calls.

Run: python tools/probe_lt_steady.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

SEARCH = ["/root/repo", "/root/reference"]


def main():
    from pathtracer_tpu.parsing.construct import construct_world
    from pathtracer_tpu.parsing.cameras import build_camera
    from pathtracer_tpu.integrator.lt import LTSettings, lt_trace

    w = h = 512
    bundle = construct_world("data/scenes/cornell_box.toml",
                             search_paths=SEARCH, cache_dir="/tmp/pt_cache",
                             camera_surfaces=True)
    world = bundle.world
    cam = build_camera(bundle.camera_by_id("main"), aspect_ratio=1.0)
    print("device:", jax.devices()[0], flush=True)

    for mb, cs, n in [(8, 1, 1 << 18), (1, 1, 1 << 18), (8, 2, 1 << 18),
                      (8, 1, 1 << 20), (8, 1, 1 << 21)]:
        lt = LTSettings(max_bounces=mb, camera_samples=cs, stratified=True)

        def full(k):
            return lt_trace(world, cam, lt, w, h, n, k)

        fj = jax.jit(full)
        walls = []
        rays = 0.0
        t0 = time.perf_counter()
        fj(jax.random.PRNGKey(0))
        # force value fetch (block_until_ready lies on the tunnel)
        compile_s = time.perf_counter() - t0
        for r in range(6):
            t0 = time.perf_counter()
            film, counters = fj(jax.random.PRNGKey(1 + r))
            c = np.asarray(counters)
            walls.append(time.perf_counter() - t0)
            rays = float(c.sum())
        steady = float(np.median(sorted(walls)[:4]))
        print(f"mb={mb} cs={cs} n={n>>10}k: compile {compile_s:6.1f}s  "
              f"calls [{', '.join(f'{x*1e3:.0f}' for x in walls)}] ms  "
              f"rays/call {rays/1e6:6.2f}M  steady {rays/steady/1e6:7.2f} Mrays/s",
              flush=True)


if __name__ == "__main__":
    main()
