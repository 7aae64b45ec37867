"""On-chip component timing for the Cornell regen hot loop.

Times each major per-iteration component in isolation at wavefront width,
with honest value-fetch timing (block_until_ready does not sync on the
axon tunnel — see PARITY.md). Run: python tools/profile_components.py
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from pathtracer_tpu.integrator.pt import PTSettings, HWSS_LANES, _frame_arrays
from pathtracer_tpu.parsing.cameras import build_camera
from pathtracer_tpu.parsing.construct import construct_world
from pathtracer_tpu.core import sampling, vecmath, cie
from pathtracer_tpu.materials import bsdf_eval, bsdf_sample, emission
from pathtracer_tpu.prelude import (
    INTERSECTION_TIME_OFFSET, RAY_TMAX, TransportMode,
)

W = H = 1080
N = W * H


def timed(fn, *args, reps=5, label=""):
    # reduce outputs to ONE scalar on device so the forced value fetch
    # doesn't time a multi-MB tunnel transfer
    red = jax.jit(lambda *a: sum(
        jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(fn(*a))))
    _ = np.asarray(red(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        _ = np.asarray(red(*args))
    el = (time.perf_counter() - t0) / reps
    print(f"{label:40s} {el*1e3:9.2f} ms", flush=True)
    return el


def main():
    bundle = construct_world(
        "data/scenes/cornell_box.toml",
        search_paths=["/root/repo", "/root/reference"],
        cache_dir="/tmp/pt_cache",
    )
    world = bundle.world
    print("prims:", world.prims.count, "mats:", world.mats.alpha.shape if hasattr(world.mats, 'alpha') else '?')
    camera = build_camera(bundle.camera_by_id("main"), aspect_ratio=1.0)
    key = jax.random.PRNGKey(0)
    C = HWSS_LANES

    k1, k2, k3 = jax.random.split(key, 3)
    o = jax.device_put(np.random.randn(N, 3).astype(np.float32) * 0.1)
    d_h = np.random.randn(N, 3).astype(np.float32)
    d_h /= np.linalg.norm(d_h, axis=1, keepdims=True)
    d = jax.device_put(d_h)
    lam = jax.device_put(np.random.uniform(380, 780, (N, C)).astype(np.float32))
    uv = jax.device_put(np.random.rand(N, 2).astype(np.float32))
    wi = jax.device_put(d_h)
    mat_id = jax.device_put(np.random.randint(0, 4, N).astype(np.int32))
    u = jax.device_put(np.random.rand(N, 8).astype(np.float32))
    t_min = jnp.full((N,), INTERSECTION_TIME_OFFSET, jnp.float32)
    t_max = jnp.full((N,), RAY_TMAX, jnp.float32)
    lam_f = lam.reshape(-1)
    rep = lambda x: jnp.repeat(x, C, axis=0)

    null = jax.jit(lambda o: o[:8, 0] * 2.0)
    timed(null, o, label="null (tunnel RTT baseline)")

    isect = jax.jit(lambda o, d: world.intersect(o, d, t_min, t_max))
    timed(isect, o, d, label="intersect_dense closest-hit")
    isect_any = jax.jit(lambda o, d: world.intersect_any(o, d, t_min, t_max))
    timed(isect_any, o, d, label="intersect_any (shadow)")

    ev = jax.jit(lambda mat_id, lam, uv, wi: bsdf_eval(
        world.mats, world.bank, world.tex, rep(mat_id), lam.reshape(-1),
        rep(uv), rep(wi), rep(wi), TransportMode.Radiance))
    timed(ev, mat_id, lam, uv, wi, label=f"bsdf_eval x{C} lanes")

    sa = jax.jit(lambda mat_id, lam, uv, wi, u: bsdf_sample(
        world.mats, world.bank, world.tex, mat_id, lam[:, 0], uv,
        wi, u[:, 0], u[:, 1], u[:, 2], TransportMode.Radiance))
    timed(sa, mat_id, lam, uv, wi, u, label="bsdf_sample (hero)")

    em = jax.jit(lambda mat_id, lam, uv: emission(
        world.mats, world.bank, rep(mat_id), lam.reshape(-1), rep(uv),
        rep(jnp.ones((N,)))))
    timed(em, mat_id, lam, uv, label=f"emission x{C}")

    from pathtracer_tpu.world.environment import env_emission, env_pdf_for, env_sample_uv
    ee = jax.jit(lambda d, lam: env_emission(world.env, world.bank, world.tex, rep(d), lam.reshape(-1)))
    timed(ee, d, lam, label=f"env_emission x{C}")
    ep = jax.jit(lambda d: env_pdf_for(world.env, d))
    timed(ep, d, label="env_pdf_for")

    x2 = jax.jit(lambda lam, r: jnp.sum(cie.wavelength_to_xyz(lam, r), axis=1))
    timed(x2, lam, jnp.ones((N, C)), label="wavelength_to_xyz")

    unif = jax.jit(lambda k: jax.random.uniform(k, (N, 15)))
    timed(unif, key, label="random.uniform [N,15]")

    # full regen body once: measure one while-iteration cost indirectly by
    # running the full render at spp=1 and dividing by iteration count later
    from pathtracer_tpu.renderer.persistent import _regen_pass
    settings = PTSettings(max_bounces=12, min_bounces=1, light_samples=2,
                          russian_roulette=True, only_direct=False)

    def full(key):
        film, counters = _regen_pass(world, camera, key, settings, W, H, 4)
        return counters
    c = full(key)
    print("counters:", np.asarray(c))
    t0 = time.perf_counter()
    c = full(jax.random.fold_in(key, 7))
    cv = np.asarray(c)
    el = time.perf_counter() - t0
    print(f"full regen spp=4: {el:.2f}s  total rays {cv.sum()/1e6:.1f}M "
          f"-> {cv.sum()/el/1e6:.1f} Mrays/s")


if __name__ == "__main__":
    main()
