"""BDPT per-call wall forensics (VERDICT r3 #6)."""
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
    from pathtracer_tpu.integrator.bdpt import BDPTSettings
    from pathtracer_tpu.renderer.bdpt_renderer import _bdpt_chunk

    w = h = 512
    bundle = construct_world("data/scenes/cornell_box.toml",
                             search_paths=SEARCH, cache_dir="/tmp/pt_cache",
                             camera_surfaces=True)
    world = bundle.world
    cam = build_camera(bundle.camera_by_id("main"), aspect_ratio=1.0)
    print("device:", jax.devices()[0], flush=True)

    for md in [6, 4]:
        bd = BDPTSettings(max_depth=md)
        walls = []
        rays = 0.0
        t0 = time.perf_counter()
        for r in range(7):
            f, sp, counters = _bdpt_chunk(world, cam, jax.random.PRNGKey(r),
                                          bd, w, h)
            c = np.asarray(counters)
            walls.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            rays = float(c.sum())
        steady = float(np.median(sorted(walls[1:])[:4]))
        print(f"md={md}: calls [{', '.join(f'{x:.2f}' for x in walls)}] s  "
              f"rays/call {rays/1e6:6.2f}M  steady {rays/steady/1e6:7.2f} "
              f"Mrays/s", flush=True)


if __name__ == "__main__":
    main()
