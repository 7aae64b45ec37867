"""On-chip LT A/B at 512²: megakernel v2 (in-kernel spawn) vs v1 (XLA
spawn feed) vs the XLA wavefront. Honest timing (value fetch), warm
steady-state protocol (2 warm calls — PARITY round-4 LT forensics)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

import jax
import numpy as np

from pathtracer_tpu.integrator.lt import LTSettings, lt_trace
from pathtracer_tpu.kernels.lt_mega import lt_trace_mega
from pathtracer_tpu.parsing.cameras import build_camera
from pathtracer_tpu.parsing.construct import construct_world
from pathtracer_tpu.utils.profile import Profile

print("device:", jax.devices()[0], flush=True)

c = construct_world("data/scenes/cornell_box.toml",
                    search_paths=["/root/repo", "/root/reference"],
                    cache_dir="/tmp/pt_cache", camera_surfaces=True)
W = H = 512
cam = build_camera(c.camera_by_id("main"), aspect_ratio=1.0)
s = LTSettings(max_bounces=8, camera_samples=1, stratified=True)
N_PATHS = W * H * 8  # ~2.1M paths


def bench(tag, fn):
    t0 = time.time()
    film, ct = fn(jax.random.PRNGKey(0))
    np.asarray(film)
    compile_s = time.time() - t0
    for w in range(2):  # steady-state warm (tunnel second-call overhead)
        film, ct = fn(jax.random.PRNGKey(1 + w))
        np.asarray(film)
    t0 = time.perf_counter()
    film, ct = fn(jax.random.PRNGKey(9))
    f = np.asarray(film)
    el = time.perf_counter() - t0
    prof = Profile().add_device_counts(np.asarray(ct))
    print(f"{tag}: {prof.total_rays / el / 1e6:.2f} Mrays/s ({el:.2f}s, "
          f"compile+first {compile_s:.1f}s, mean {f.mean():.4f}, "
          f"finite={np.isfinite(f).all()})", flush=True)


bench("lt_mega_v2", lambda k: lt_trace_mega(c.world, cam, s, W, H, N_PATHS, k))
if "--v2only" in sys.argv:
    sys.exit(0)
os.environ["PT_LT_MEGA_V1"] = "1"
bench("lt_mega_v1", lambda k: lt_trace_mega(c.world, cam, s, W, H, N_PATHS, k))
os.environ.pop("PT_LT_MEGA_V1", None)
jit_lt = jax.jit(lambda k: lt_trace(c.world, cam, s, W, H, 1 << 20, k))


def xla_fn(k):
    # XLA wavefront processes 1M-lane chunks; run 2 chunks for ~2M paths
    f1, c1 = jit_lt(jax.random.fold_in(k, 0))
    f2, c2 = jit_lt(jax.random.fold_in(k, 1))
    return f1 + f2, c1 + c2


bench("lt_xla", xla_fn)
