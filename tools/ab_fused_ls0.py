"""Isolate the fused ls=0 anomaly (VERDICT r4 #6): the fused single-call
round measured −33% on the ls=0 white furnace (27 vs 40 Mrays/s) and was
gated around without a cause. Candidates (VERDICT list): uniform-table
size, NEE-row dead code, grid shape.

Variants (each its own subprocess — the scene cache keys on bake env but
step-fn selection reads env at call time, and a fresh client keeps every
measurement independent):
  2prog            default ls=0 route (K12 + K34 programs)
  fused            PT_MEGA_FORCE_FUSED=1 (the anomaly)
  fused_tile2048   fused at TILE=2048 (grid-shape candidate: ls=0 scenes
                   pick TILE=4096 via the single-chunk heuristic)
  2prog_tile2048   control for the TILE effect alone
  fused_ls1        ls=1 fused on the same scene (NEE-row candidate: if
                   ls>0 fused is fine, dead NEE code is implicated)
  2prog_ls1        control
"""
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

c = construct_world("/root/reference/data/scenes/white_furnace.toml",
                    search_paths=[{repo!r}, "/root/reference"],
                    cache_dir="/tmp/pt_cache")
cam = build_camera(c.camera_by_id("main"), aspect_ratio=1.0)
s = PTSettings(max_bounces=12, min_bounces=2, light_samples={ls},
               russian_roulette=True)
acc, _ = pt_trace_regen_mega(c.world, cam, s, 512, 512, 4,
                             jax.random.PRNGKey(0))
np.asarray(acc)
best = 0.0
for r in range(2):
    t0 = time.perf_counter()
    acc, ct = pt_trace_regen_mega(c.world, cam, s, 512, 512, 32,
                                  jax.random.PRNGKey(1 + r))
    film = np.asarray(acc)
    el = time.perf_counter() - t0
    prof = Profile().add_device_counts(np.asarray(ct))
    best = max(best, prof.total_rays / el / 1e6)
print("AB_RESULT %.2f" % best, flush=True)
"""

VARIANTS = [
    ("2prog", 0, {}),
    ("fused", 0, {"PT_MEGA_FORCE_FUSED": "1"}),
    ("fused_tile2048", 0, {"PT_MEGA_FORCE_FUSED": "1", "PT_MEGA_TILE": "2048"}),
    ("2prog_tile2048", 0, {"PT_MEGA_TILE": "2048"}),
    ("fused_ls1", 1, {}),
    ("2prog_ls1", 1, {"PT_MEGA_NOFUSED": "1"}),
]

if __name__ == "__main__":
    names = sys.argv[1:] or [v[0] for v in VARIANTS]
    for tag, ls, envd in VARIANTS:
        if tag not in names:
            continue
        env = dict(os.environ)
        env.update(envd)
        try:
            r = subprocess.run(
                [sys.executable, "-c", CHILD.format(repo=REPO, ls=ls)],
                env=env, capture_output=True, text=True, timeout=2200,
                cwd=REPO)
            ok = [l for l in r.stdout.splitlines()
                  if l.startswith("AB_RESULT")]
            if ok:
                print(f"furnace_ls{ls} {tag}: {ok[-1].split()[1]} Mrays/s",
                      flush=True)
            else:
                print(f"furnace_ls{ls} {tag}: FAIL "
                      f"{(r.stdout + r.stderr)[-400:]}", flush=True)
        except subprocess.TimeoutExpired:
            print(f"furnace_ls{ls} {tag}: TIMEOUT", flush=True)
