"""On-chip BDPT batched-rewrite measurement: md=6 compile wall + steady
throughput at 512² (VERDICT r4 #5: md=6 used to cost 853 s of AOT compile;
target <180 s compile and ≥25 Mrays/s)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

import jax
import numpy as np

from pathtracer_tpu.integrator.bdpt import BDPTSettings
from pathtracer_tpu.parsing.cameras import build_camera
from pathtracer_tpu.parsing.construct import construct_world
from pathtracer_tpu.renderer.bdpt_renderer import render_bdpt

print("device:", jax.devices()[0], flush=True)

c = construct_world("data/scenes/cornell_box.toml",
                    search_paths=["/root/repo", "/root/reference"],
                    cache_dir="/tmp/pt_cache", camera_surfaces=True)
cam = build_camera(c.camera_by_id("main"), aspect_ratio=1.0)

for md in (4, 6):
    bd = BDPTSettings(max_depth=md)
    t0 = time.time()
    film, prof, _ = render_bdpt(c.world, cam, bd, 512, 512, 1,
                                key=jax.random.PRNGKey(0))
    np.asarray(film)
    compile_s = time.time() - t0
    # steady-state: one more warm call, then timed
    film, prof, _ = render_bdpt(c.world, cam, bd, 512, 512, 1,
                                key=jax.random.PRNGKey(1))
    np.asarray(film)
    t0 = time.perf_counter()
    film, prof, _ = render_bdpt(c.world, cam, bd, 512, 512, 4,
                                key=jax.random.PRNGKey(2))
    f = np.asarray(film)
    el = time.perf_counter() - t0
    print(f"bdpt md={md}: compile+first {compile_s:.1f}s, steady "
          f"{prof.total_rays / el / 1e6:.2f} Mrays/s ({el:.2f}s), "
          f"mean {f.mean():.4f}, finite={np.isfinite(f).all()}", flush=True)
