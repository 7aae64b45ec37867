"""A/B the megakernel round cost across (TILE, dispatch) on 1080p cornell:
for each config, time a no-check 32-round chain (device cost/round) and a
full production render (Mrays/s). Run: python tools/ab_tile_fused.py
[configs...] where each config is tile:mode, mode in {fused,2prog}.
Default sweep: 4096:fused 4096:2prog 2048:fused 2048:2prog.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

import jax
import numpy as np

from pathtracer_tpu.integrator.pt import PTSettings
from pathtracer_tpu.parsing.cameras import build_camera
from pathtracer_tpu.parsing.construct import construct_world
from pathtracer_tpu.utils.profile import Profile


def run_config(b, cam, s, tile, mode, W, H, SPP):
    import importlib
    from pathtracer_tpu.kernels import megakernel as mk
    from pathtracer_tpu.core import sampling
    import jax.numpy as jnp

    os.environ["PT_MEGA_TILE"] = str(tile)
    mk.TILE = tile
    mk.SUB = tile // 128
    if mode == "2prog":
        os.environ["PT_MEGA_NOFUSED"] = "1"
    else:
        os.environ.pop("PT_MEGA_NOFUSED", None)

    # production render (warm + timed)
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
    mrays = prof.total_rays / wall / 1e6

    # 32-round no-check chain at full occupancy
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
    key = jax.random.PRNGKey(1)
    state, counters = mk._mega_init(cam, key, settings_t, n, n_pad)
    k_iter = sampling.fold(key, 2)
    it_dev = jnp.int32(0)
    step_fn = mk._step_fused if mode == "fused" else mk._mega_step
    st, ctr, itd = step_fn(state, counters, it_dev, tabs, k_iter,
                           settings_t, consts_t, False)
    np.asarray(mk._alive_count(st))  # warm
    st, ctr, itd = state, counters, it_dev
    t0 = time.perf_counter()
    for _ in range(32):
        st, ctr, itd = step_fn(st, ctr, itd, tabs, k_iter, settings_t,
                               consts_t, False)
    np.asarray(mk._alive_count(st))
    chain = (time.perf_counter() - t0) / 32
    print(f"CONFIG tile={tile} mode={mode}: production {mrays:.1f} Mrays/s "
          f"({wall*1e3:.0f} ms), chain {chain*1e3:.2f} ms/round "
          f"({chain/n_pad*1e9:.2f} ns/lane)", flush=True)


def main():
    W = H = 1080
    SPP = 12
    configs = sys.argv[1:] or ["4096:fused", "4096:2prog",
                               "2048:fused", "2048:2prog"]
    b = construct_world("data/scenes/cornell_box.toml",
                        search_paths=["/root/repo", "/root/reference"],
                        cache_dir="/tmp/pt_cache")
    cam = build_camera(b.camera_by_id("main"), aspect_ratio=1.0)
    s = PTSettings(max_bounces=12, min_bounces=1, light_samples=2,
                   russian_roulette=True)
    print("device:", jax.devices()[0], flush=True)
    for cfg in configs:
        tile_s, mode = cfg.split(":")
        run_config(b, cam, s, int(tile_s), mode, W, H, SPP)


if __name__ == "__main__":
    main()
