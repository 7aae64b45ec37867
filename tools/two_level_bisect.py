"""Two-level render-crash bisect (VERDICT r3 #4).

Round 3 established that the ISOLATED two-level traversal (_traverse_2l)
runs clean on the tunnel at every lane count, but the FULL render program
(pt_trace_regen with world.intersect routed through intersect_two_level)
still kills the TPU worker. This harness inserts the shading pipeline
piecewise after the traversal until the crash reproduces; each step runs in
its own subprocess so a worker kill is attributable to exactly one step.

  steps (262k lanes, instanced diamond arrangement, PT_FLATTEN_MAX=0):
    closest   intersect_two_level (traversal + attribute fill)
    anyhit    intersect_any_two_level alone
    both      closest + any-hit in ONE program (NEE round shape)
    shade     closest + bsdf_eval at the hits
    bounce2   lax.scan of 2 rounds: closest -> bsdf_sample -> respawn ray
    walk_nl   pt_trace_regen, light_samples=0, max_bounces=2
    walk      pt_trace_regen, light_samples=2, max_bounces=4
    walk_full pt_trace_regen at bench settings (ls=2, mb=8)

Usage:
  python tools/two_level_bisect.py           # driver: all steps, subprocesses
  python tools/two_level_bisect.py STEP      # one step in-process
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)
os.environ["PT_FLATTEN_MAX"] = "0"  # force the two-level path

STEPS = ["closest", "anyhit", "both", "shade", "bounce2", "walk_nl", "walk",
         "walk_full"]
LANES = 262144


def run(step):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from pathtracer_tpu.parsing.construct import construct_world
    from pathtracer_tpu.prelude import (INTERSECTION_TIME_OFFSET, RAY_TMAX,
                                        TransportMode)

    print("devices:", jax.devices(), flush=True)
    bundle = construct_world("data/scenes/diamond_arrangement_instanced.toml",
                             search_paths=[REPO, "/root/reference"],
                             cache_dir="/tmp/pt_cache")
    world = bundle.world
    assert world.accel2 is not None, "builder flattened the scene"
    rng = np.random.default_rng(0)
    center = np.asarray(world.center)
    o = (center[None, :] + rng.normal(0, float(world.radius),
                                      (LANES, 3))).astype(np.float32)
    d = rng.normal(size=(LANES, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    tmin = jnp.full((LANES,), INTERSECTION_TIME_OFFSET, jnp.float32)
    tmax = jnp.full((LANES,), RAY_TMAX, jnp.float32)

    if step == "closest":
        @jax.jit
        def prog(o, d):
            hr = world.intersect(o, d, tmin, tmax)
            return hr.t.sum() + hr.point.sum()
    elif step == "anyhit":
        @jax.jit
        def prog(o, d):
            return world.intersect_any(o, d, tmin, tmax).sum()
    elif step == "both":
        @jax.jit
        def prog(o, d):
            hr = world.intersect(o, d, tmin, tmax)
            blocked = world.intersect_any(hr.point, -d, tmin, tmax * 0.5)
            return hr.t.sum() + blocked.sum()
    elif step == "shade":
        from pathtracer_tpu.materials import bsdf_eval

        @jax.jit
        def prog(o, d):
            hr = world.intersect(o, d, tmin, tmax)
            lam = jnp.full((LANES,), 550.0)
            wi = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (LANES, 3))
            f, p = bsdf_eval(world.mats, world.bank, world.tex,
                             jnp.maximum(hr.material_id, 0), lam, hr.uv,
                             wi, -wi, TransportMode.Importance)
            return f.sum() + p.sum() + hr.t.sum()
    elif step == "bounce2":
        from pathtracer_tpu.core import vecmath
        from pathtracer_tpu.materials import bsdf_sample
        from pathtracer_tpu.prelude import NORMAL_OFFSET

        @jax.jit
        def prog(o, d):
            def body(carry, _):
                o, d = carry
                hr = world.intersect(o, d, tmin, tmax)
                t_ax, b_ax = vecmath.orthonormal_basis(hr.normal)
                frame = vecmath.TangentFrame(t_ax, b_ax, hr.normal)
                wi_l = frame.to_local(-d)
                lam = jnp.full((LANES,), 550.0)
                u = jax.random.uniform(jax.random.PRNGKey(0), (LANES, 3))
                wo_l, f, pdf, ratio = bsdf_sample(
                    world.mats, world.bank, world.tex,
                    jnp.maximum(hr.material_id, 0), lam, hr.uv, wi_l,
                    u[:, 0], u[:, 1], u[:, 2], TransportMode.Importance)
                dn = vecmath.normalize(frame.to_world(wo_l))
                on = hr.point + hr.geo_normal * (
                    NORMAL_OFFSET * jnp.sign(vecmath.dot(hr.geo_normal, dn))
                )[..., None]
                return (jnp.where(hr.hit[..., None], on, o),
                        jnp.where(hr.hit[..., None], dn, d)), ratio.sum()
            (o2, d2), rs = jax.lax.scan(body, (o, d), None, length=2)
            return o2.sum() + rs.sum()
    elif step in ("walk_nl", "walk", "walk_full"):
        import jax.random as jr
        from pathtracer_tpu.integrator.pt import PTSettings
        from pathtracer_tpu.integrator.pt_regen import pt_trace_regen
        from pathtracer_tpu.parsing.cameras import build_camera

        ls, mb = {"walk_nl": (0, 2), "walk": (2, 4), "walk_full": (2, 8)}[step]
        settings = PTSettings(max_bounces=mb, min_bounces=1, light_samples=ls,
                              russian_roulette=True)
        cam = build_camera(bundle.camera_by_id("main"), aspect_ratio=1.0)

        @jax.jit
        def prog(o, d):
            # 512x512 film = 262144 lanes (= LANES), spp 1
            film, counters = pt_trace_regen(world, cam, settings, 512, 512,
                                            1, jr.PRNGKey(0))
            return film.sum() + counters.sum()
    else:
        raise SystemExit(f"unknown step {step}")

    t0 = time.perf_counter()
    r = prog(o, d)
    v = float(np.asarray(r).sum()) if not hasattr(r, "shape") or r.shape == () \
        else float(np.asarray(r))
    print(f"PASS {step}: value {v:.4g} in {time.perf_counter()-t0:.1f}s",
          flush=True)


def driver():
    for step in STEPS:
        t0 = time.perf_counter()
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__), step],
                               capture_output=True, text=True, timeout=900)
            tail = (r.stdout + r.stderr).strip().splitlines()
            status = "PASS" if r.returncode == 0 else f"CRASH rc={r.returncode}"
            print(f"[{step:9s}] {status} ({time.perf_counter()-t0:.0f}s)  "
                  f"{tail[-1][:160] if tail else ''}", flush=True)
            if r.returncode != 0:
                for line in tail[-8:]:
                    print("    " + line[:200], flush=True)
        except subprocess.TimeoutExpired:
            print(f"[{step:9s}] TIMEOUT 900s", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run(sys.argv[1])
    else:
        driver()
