"""Chain-only adaptive tail A/B (VERDICT r4 #3): cornell 1080p @ 12 spp —
the drain tail's pacing-floor cost is the 12-vs-384-spp gap. Variants:
default (chain tail on) vs PT_MEGA_CHAIN_TAIL=0, fresh subprocess each."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
os.chdir({repo!r})
import jax
import numpy as np
from pathtracer_tpu.integrator.pt import PTSettings
from pathtracer_tpu.kernels.megakernel import pt_trace_regen_mega
from pathtracer_tpu.parsing.cameras import build_camera
from pathtracer_tpu.parsing.construct import construct_world
from pathtracer_tpu.utils.profile import Profile

c = construct_world("data/scenes/cornell_box.toml",
                    search_paths=[{repo!r}, "/root/reference"],
                    cache_dir="/tmp/pt_cache")
cam = build_camera(c.camera_by_id("main"), aspect_ratio=1.0)
s = PTSettings(max_bounces=12, min_bounces=1, light_samples=2,
               russian_roulette=True)
acc, _ = pt_trace_regen_mega(c.world, cam, s, 1080, 1080, 12,
                             jax.random.PRNGKey(0))
np.asarray(acc)
for r in range(3):
    t0 = time.perf_counter()
    acc, ct = pt_trace_regen_mega(c.world, cam, s, 1080, 1080, 12,
                                  jax.random.PRNGKey(1 + r))
    np.asarray(acc)
    el = time.perf_counter() - t0
    prof = Profile().add_device_counts(np.asarray(ct))
    print("RUN %.2f" % (prof.total_rays / el / 1e6), flush=True)
"""

VARIANTS = [("chain_tail_on", {}), ("chain_tail_off", {"PT_MEGA_CHAIN_TAIL": "0"})]

if __name__ == "__main__":
    for tag, envd in VARIANTS:
        env = dict(os.environ)
        env.update(envd)
        try:
            r = subprocess.run([sys.executable, "-c", CHILD.format(repo=REPO)],
                               env=env, capture_output=True, text=True,
                               timeout=2200, cwd=REPO)
            runs = [l.split()[1] for l in r.stdout.splitlines()
                    if l.startswith("RUN")]
            print(f"cornell_1080_12spp {tag}: {runs or 'FAIL'} "
                  f"{'' if runs else (r.stdout + r.stderr)[-400:]}", flush=True)
        except subprocess.TimeoutExpired:
            print(f"cornell_1080_12spp {tag}: TIMEOUT", flush=True)
