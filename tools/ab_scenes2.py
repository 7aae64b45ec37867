"""On-chip A/B for mesh-heavy megakernel scenes (gem + instanced
arrangement): chunk-AABB gate (PT_SWEEP_AABB) x block-ordered lanes
(PT_MEGA_MORTON), each variant in its OWN subprocess so no in-process
cache (scene bake, jit, env) can leak between variants — the round-3/4
in-process harness (ab_scenes.py) reused the megakernel's scene cache
across env flips, so its "aabb" rows silently re-measured the base
scene; its zero-win conclusion was void.

Run: python tools/ab_scenes2.py [gem|arrangement|both] [variant...]
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GEM = "/root/reference/data/scenes/cornell_box_diamond_gem.toml"
ARR = "data/scenes/diamond_arrangement_instanced.toml"

VARIANTS = {
    "base": {},
    "aabb": {"PT_SWEEP_AABB": "1"},
    "morton": {"PT_MEGA_MORTON": "1"},
    "aabb_morton": {"PT_SWEEP_AABB": "1", "PT_MEGA_MORTON": "1"},
}

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

c = construct_world({scene!r}, search_paths=[{repo!r}, "/root/reference"],
                    cache_dir="/tmp/pt_cache")
W = H = 1080
cam = build_camera(c.camera_by_id("main"), aspect_ratio=1.0)
s = PTSettings(max_bounces={mb}, min_bounces=1, light_samples=2,
               russian_roulette=True)
acc, _ = pt_trace_regen_mega(c.world, cam, s, W, H, 1, jax.random.PRNGKey(0))
np.asarray(acc)  # compile + warm
best = 0.0
for r in range(2):
    t0 = time.perf_counter()
    acc, ct = pt_trace_regen_mega(c.world, cam, s, W, H, {spp},
                                  jax.random.PRNGKey(1 + r))
    film = np.asarray(acc)
    ctv = np.asarray(ct)
    el = time.perf_counter() - t0
    prof = Profile().add_device_counts(ctv)
    mr = prof.total_rays / el / 1e6
    best = max(best, mr)
    print("RUN %.2f Mrays/s (%.2fs) mean=%.5f finite=%s"
          % (mr, el, film.mean(), bool(np.isfinite(film).all())), flush=True)
print("AB_RESULT %.2f" % best, flush=True)
"""


def run(scene_name, scene, spp, mb, variants):
    for tag in variants:
        env = dict(os.environ)
        env.update(VARIANTS[tag])
        code = CHILD.format(repo=REPO, scene=scene, mb=mb, spp=spp)
        try:
            r = subprocess.run([sys.executable, "-c", code], env=env,
                               capture_output=True, text=True, timeout=2200,
                               cwd=REPO)
            lines = [l for l in r.stdout.splitlines() if l.startswith(("RUN", "AB_RESULT"))]
            ok = [l for l in lines if l.startswith("AB_RESULT")]
            if ok:
                print(f"{scene_name} {tag}: {ok[-1].split()[1]} Mrays/s "
                      f"| {'; '.join(lines[:-1])}", flush=True)
            else:
                print(f"{scene_name} {tag}: FAIL\n{(r.stdout + r.stderr)[-600:]}",
                      flush=True)
        except subprocess.TimeoutExpired:
            print(f"{scene_name} {tag}: TIMEOUT 2200s", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    variants = sys.argv[2:] or list(VARIANTS)
    if which in ("gem", "both"):
        run("gem", GEM, 8, 12, variants)
    if which in ("arrangement", "both"):
        run("arrangement", ARR, 2, 8, variants)
