"""On-chip A/B: cornell 1080p through the megakernel — 2-prog round (default)
vs 1-prog round (PT_MEGA_1PROG) vs replicas. Honest timing: value fetch, not
block_until_ready. One TPU process at a time; each variant re-jits."""
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

c = construct_world("data/scenes/cornell_box.toml",
                    search_paths=["/root/repo", "/root/reference"],
                    cache_dir="/tmp/pt_cache")
W, H, SPP = 1080, 1080, 12
cam = build_camera(c.camera_by_id("main"), aspect_ratio=W / H)
s = PTSettings(max_bounces=12, min_bounces=1, light_samples=2,
               russian_roulette=True, only_direct=False)
print("device:", jax.devices()[0], flush=True)


def run(tag, env_1prog, replicas, rounds=None):
    if env_1prog:
        os.environ["PT_MEGA_1PROG"] = "1"
    else:
        os.environ.pop("PT_MEGA_1PROG", None)
    if rounds:
        os.environ["PT_MEGA_ROUNDS"] = str(rounds)
    else:
        os.environ.pop("PT_MEGA_ROUNDS", None)
    # warm (compile) — spp must be divisible by replicas
    acc, ct = pt_trace_regen_mega(c.world, cam, s, W, H, replicas,
                                  jax.random.PRNGKey(0), replicas=replicas)
    np.asarray(acc)
    t0 = time.perf_counter()
    acc, ct = pt_trace_regen_mega(c.world, cam, s, W, H, SPP,
                                  jax.random.PRNGKey(1), replicas=replicas)
    film = np.asarray(acc)
    ctv = np.asarray(ct)
    el = time.perf_counter() - t0
    prof = Profile().add_device_counts(ctv)
    mr = prof.total_rays / el / 1e6
    print(f"{tag}: {mr:.1f} Mrays/s  ({el:.2f}s, film mean {film.mean():.4f},"
          f" finite={np.isfinite(film).all()})", flush=True)
    return mr


run("2prog", False, 1)
run("2prog (repeat)", False, 1)
run("1prog", True, 1)
run("1prog (repeat)", True, 1)
run("rounds2", False, 1, rounds=2)
run("rounds2 (repeat)", False, 1, rounds=2)
run("rounds4", False, 1, rounds=4)
run("rounds4 (repeat)", False, 1, rounds=4)
run("2prog replicas4", False, 4)
run("2prog replicas4 (repeat)", False, 4)
run("2prog replicas12", False, 12)
run("rounds2 replicas4", False, 4, rounds=2)
run("rounds2 replicas4 (repeat)", False, 4, rounds=2)
