"""Decompose the bench cornell render's wall clock (production fused round,
HWSS c_lanes=4): (a) device cost per round via a no-check 32-round chain,
(b) production-loop wall + round count, (c) occupancy curve (alive counts
every 4 rounds, read after the render so the fetches don't pace the loop
we time). Run: python tools/probe_wall.py [width] [spp]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

import jax
import numpy as np

from pathtracer_tpu.integrator.pt import PTSettings
from pathtracer_tpu.kernels import megakernel as mk
from pathtracer_tpu.parsing.cameras import build_camera
from pathtracer_tpu.parsing.construct import construct_world
from pathtracer_tpu.utils.profile import Profile


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 1080
    SPP = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    H = W
    b = construct_world("data/scenes/cornell_box.toml",
                        search_paths=["/root/repo", "/root/reference"],
                        cache_dir="/tmp/pt_cache")
    cam = build_camera(b.camera_by_id("main"), aspect_ratio=1.0)
    s = PTSettings(max_bounces=12, min_bounces=1, light_samples=2,
                   russian_roulette=True)
    print("device:", jax.devices()[0], flush=True)

    # production render (warm + timed) — gives wall + counters
    acc, ct = mk.pt_trace_regen_mega(b.world, cam, s, W, H, SPP,
                                     jax.random.PRNGKey(0))
    np.asarray(acc)
    t0 = time.perf_counter()
    acc, ct = mk.pt_trace_regen_mega(b.world, cam, s, W, H, SPP,
                                     jax.random.PRNGKey(1))
    np.asarray(acc)
    ctv = np.asarray(ct)
    wall = time.perf_counter() - t0
    prof = Profile().add_device_counts(ctv)
    print(f"production: {wall*1e3:.0f} ms, {prof.total_rays/1e6:.1f} Mrays "
          f"-> {prof.total_rays/wall/1e6:.1f} Mrays/s", flush=True)

    # manual loop with the same step fn: count rounds, collect alive futures
    # every round but DON'T read until the end; time a no-check 32-chain.
    scene = mk.build_mega_scene(b.world, cam, s)
    wb = s.wavelength_bounds
    step = max(mk.TILE, mk.RAY_TILE)
    n = W * H
    n_pad = -(-n // step) * step
    settings_d = dict(c_lanes=4, tile=mk.TILE, light_samples=2,
                      spp=float(SPP), lane_mod=float(n), max_bounces=12.0,
                      min_bounces=1.0, russian_roulette=True,
                      only_direct=False, width=float(W), height=float(H),
                      start=0.0, wb_lo=float(wb.lower),
                      wb_span=float(wb.span))
    settings_t = mk._freeze(settings_d)
    consts_t = mk._freeze(scene.consts)
    tabs = (scene.prim_tab, scene.dense_tab, scene.mat_tab, scene.light_tab,
            scene.spec_tab, scene.env_args)
    from pathtracer_tpu.core import sampling
    key = jax.random.PRNGKey(1)
    state, counters = mk._mega_init(cam, key, settings_t, n, n_pad)
    k_iter = sampling.fold(key, 2)
    import jax.numpy as jnp
    it_dev = jnp.int32(0)
    fused = scene.env_args is None and scene.dense_tab.shape[0] // 32 <= 4
    step_fn = mk._step_fused if fused else mk._mega_step
    print(f"fused={fused} n_pad={n_pad}", flush=True)

    # no-check chain at full occupancy: 32 rounds, one fetch
    st, ctr, itd = state, counters, it_dev
    st, ctr, itd = step_fn(st, ctr, itd, tabs, k_iter, settings_t, consts_t,
                           False)
    np.asarray(mk._alive_count(st))      # warm
    st, ctr, itd = state, counters, it_dev
    t0 = time.perf_counter()
    for _ in range(32):
        st, ctr, itd = step_fn(st, ctr, itd, tabs, k_iter, settings_t,
                               consts_t, False)
    np.asarray(mk._alive_count(st))
    chain = (time.perf_counter() - t0) / 32
    print(f"device cost/round (32-chain, full occ): {chain*1e3:.2f} ms",
          flush=True)

    # occupancy curve: run the render loop, stash alive futures, read after
    st, ctr, itd = state, counters, it_dev
    futs = []
    max_iters = SPP * 12 * 8 + 64
    t0 = time.perf_counter()
    it = 0
    while it < max_iters:
        for _ in range(4):
            st, ctr, itd = step_fn(st, ctr, itd, tabs, k_iter, settings_t,
                                   consts_t, False)
            it += 1
        futs.append((it, mk._alive_count(st)))
        if len(futs) >= 2 and it - futs[-2][0] >= 4:
            # emulate production pacing: read the second-newest
            if float(np.asarray(futs[-2][1])) == 0.0:
                break
    wall2 = time.perf_counter() - t0
    vals = [(i, float(np.asarray(f))) for i, f in futs]
    print(f"loop wall {wall2*1e3:.0f} ms over {it} rounds "
          f"-> {wall2/it*1e3:.2f} ms/round", flush=True)
    occ = [v / n_pad for _, v in vals]
    print("occupancy every 4 rounds:",
          " ".join(f"{o:.2f}" for o in occ), flush=True)
    # useful fraction = mean occupancy over executed rounds
    print(f"mean occupancy {np.mean(occ):.3f} "
          f"(wasted device fraction ~{1-np.mean(occ):.3f})", flush=True)


if __name__ == "__main__":
    main()
