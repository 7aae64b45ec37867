"""Two-level TPU worker-crash ablation (VERDICT r2 #3).

Round 2: intersect_two_level crashed the tunnel's TPU worker at every lane
count on the instanced arrangement, while being green on CPU. This script
runs ONE ablation step per invocation (so a worker crash is attributable),
from small to full:

  steps:
    tiny      — 8k lanes, full two-level traversal
    mid       — 262k lanes
    full      — 583k lanes (bench batch size)
    no_blas   — TLAS only (treat instance leaves as misses)
    one_inst  — arrangement clipped to 1 instance
    gem_blas  — single-mesh scene routed through the two-level code

Usage: python tools/two_level_ablate.py STEP
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_world(max_instances=None):
    import tomllib
    from pathtracer_tpu.parsing.construct import construct_world

    path = "data/scenes/diamond_arrangement_instanced.toml"
    if max_instances is not None:
        with open(path, "rb") as f:
            doc = tomllib.load(f)
        kept = []
        n_mesh = 0
        for inst in doc.get("instances", []):
            agg = inst.get("aggregate", {})
            if agg.get("type") == "MeshRef" or "mesh" in str(agg.get("type", "")):
                if n_mesh >= max_instances:
                    continue
                n_mesh += 1
            kept.append(inst)
        doc["instances"] = kept
        import tempfile, tomli_w  # tomli_w may be absent; fall back

        raise SystemExit("instance clipping requires tomli_w; use full scene")
    return construct_world(path, search_paths=["/root/repo", "/root/reference"],
                           cache_dir="/tmp/pt_cache")


def run(step):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from pathtracer_tpu.accel.two_level import _traverse_2l
    from pathtracer_tpu.prelude import INTERSECTION_TIME_OFFSET, RAY_TMAX

    print("devices:", jax.devices(), flush=True)
    import os as _os
    _os.environ["PT_FLATTEN_MAX"] = "0"  # builder now flattens small scenes;
    # force the two-level path (what this harness exists to ablate)
    bundle = build_world()
    world = bundle.world
    acc = world.accel2
    assert acc is not None
    lanes = {"tiny": 8192, "mid": 262144, "full": 583200}.get(step, 65536)
    rng = np.random.default_rng(0)
    center = np.asarray(world.center)
    o = (center[None, :] + rng.normal(0, float(world.radius), (lanes, 3))).astype(np.float32)
    d = rng.normal(size=(lanes, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    tmin = jnp.full((lanes,), INTERSECTION_TIME_OFFSET, jnp.float32)
    tmax = jnp.full((lanes,), RAY_TMAX, jnp.float32)

    if step == "no_blas":
        # TLAS-only: clip every instance's BLAS root to TERMINATE so rays
        # never descend — isolates the TLAS loop
        acc = acc._replace(inst_blas_root=jnp.full_like(acc.inst_blas_root, -2))

    fn = jax.jit(lambda o, d: _traverse_2l(world.prims, acc, o, d, tmin, tmax,
                                           any_hit=False))
    t, pid, iid, hit = fn(o, d)
    hs = float(jnp.mean(hit.astype(jnp.float32)).block_until_ready())
    # value fetch = true sync on the tunnel
    print(f"[{step}] lanes={lanes} hit_frac={np.asarray(hit).mean():.4f} ok", flush=True)


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "tiny")
