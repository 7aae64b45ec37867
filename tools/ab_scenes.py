"""On-chip A/B: gem + arrangement 1080p through the megakernel, with and
without the chunk-AABB gate (PT_SWEEP_AABB) and lane replicas. Honest
timing (value fetch)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

import jax
import numpy as np

from pathtracer_tpu.integrator.pt import PTSettings
from pathtracer_tpu.kernels.megakernel import pt_trace_regen_mega
from pathtracer_tpu.parsing.cameras import build_camera
from pathtracer_tpu.parsing.construct import construct_world
from pathtracer_tpu.utils.profile import Profile

print("device:", jax.devices()[0], flush=True)


def bench_scene(name, scene, spp, mb, variants):
    c = construct_world(scene, search_paths=["/root/repo", "/root/reference"],
                        cache_dir="/tmp/pt_cache")
    W = H = 1080
    cam = build_camera(c.camera_by_id("main"), aspect_ratio=1.0)
    s = PTSettings(max_bounces=mb, min_bounces=1, light_samples=2,
                   russian_roulette=True)
    for tag, env, replicas in variants:
        for k, v in env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        try:
            acc, _ = pt_trace_regen_mega(c.world, cam, s, W, H, 1,
                                         jax.random.PRNGKey(0),
                                         replicas=replicas)
            np.asarray(acc)  # warm/compile
            t0 = time.perf_counter()
            acc, ct = pt_trace_regen_mega(c.world, cam, s, W, H, spp,
                                          jax.random.PRNGKey(1),
                                          replicas=replicas)
            film = np.asarray(acc)
            ctv = np.asarray(ct)
            el = time.perf_counter() - t0
            prof = Profile().add_device_counts(ctv)
            mr = prof.total_rays / el / 1e6
            print(f"{name} {tag}: {mr:.2f} Mrays/s ({el:.2f}s, mean"
                  f" {film.mean():.5f}, finite={np.isfinite(film).all()})",
                  flush=True)
        except Exception as e:
            print(f"{name} {tag}: FAIL {repr(e)[:300]}", flush=True)
        for k in env:
            os.environ.pop(k, None)


GEM = "/root/reference/data/scenes/cornell_box_diamond_gem.toml"
ARR = "data/scenes/diamond_arrangement_instanced.toml"
bench_scene("gem", GEM, 8, 12, [
    ("base", {}, 1),
    ("base (repeat)", {}, 1),
    ("aabb", {"PT_SWEEP_AABB": "1"}, 1),
    ("aabb (repeat)", {"PT_SWEEP_AABB": "1"}, 1),
    ("aabb rounds2", {"PT_SWEEP_AABB": "1", "PT_MEGA_ROUNDS": "2"}, 1),
    ("aabb replicas4", {"PT_SWEEP_AABB": "1"}, 4),
])
bench_scene("arrangement", ARR, 2, 8, [
    ("base", {}, 1),
    ("base (repeat)", {}, 1),
    ("aabb", {"PT_SWEEP_AABB": "1"}, 1),
    ("aabb (repeat)", {"PT_SWEEP_AABB": "1"}, 1),
    ("aabb replicas2", {"PT_SWEEP_AABB": "1"}, 2),
])
