"""Per-kernel device-cost split + occupancy for ANY megakernel scene.

Generalization of profile_mega_kernels.py (cornell-only): pass a scene path
and film size, get the 2-prog round's K12 / K34 deltas and the production
round cost, plus the occupancy drain curve.

Run: python tools/profile_scene_mega.py <scene.toml> [width] [spp] [mb] [ls]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/data/scenes/cornell_box_diamond_gem.toml"
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    spp = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    mb = int(sys.argv[4]) if len(sys.argv) > 4 else 12
    ls = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    c_lanes = int(sys.argv[6]) if len(sys.argv) > 6 else 4

    import numpy as np
    import jax
    import jax.numpy as jnp

    from pathtracer_tpu.core import sampling
    from pathtracer_tpu.parsing.cameras import build_camera
    from pathtracer_tpu.parsing.construct import construct_world
    from pathtracer_tpu.integrator.pt import PTSettings
    from pathtracer_tpu.kernels import megakernel as mk
    from pathtracer_tpu.kernels.dense import sweep_any_rows, sweep_closest_rows
    from pathtracer_tpu.prelude import INTERSECTION_TIME_OFFSET, RAY_TMAX

    n = width * width
    b = construct_world(scene_path,
                        search_paths=["/root/repo", "/root/reference"],
                        cache_dir="/tmp/pt_cache")
    cam = build_camera(b.camera_by_id("main"), aspect_ratio=1.0)
    settings = PTSettings(max_bounces=mb, min_bounces=1, light_samples=ls,
                          russian_roulette=True)
    scene = mk.build_mega_scene(b.world, cam, settings)
    n_chunks = scene.dense_tab.shape[0] // 32
    print(f"scene={scene_path} prims(dense rows)={scene.dense_tab.shape[0]} "
          f"chunks32={n_chunks} TILE={mk.TILE}", flush=True)
    wb = settings.wavelength_bounds
    step = max(mk.TILE, mk.RAY_TILE)
    n_pad = -(-n // step) * step
    C = c_lanes
    settings_d = dict(
        c_lanes=C, light_samples=ls, spp=float(spp), max_bounces=float(mb),
        min_bounces=1.0, russian_roulette=True, only_direct=False,
        width=float(width), height=float(width), start=0.0,
        lane_mod=float(n), wb_lo=float(wb.lower), wb_span=float(wb.span))
    settings_t = mk._freeze(settings_d)
    consts_t = mk._freeze(scene.consts)
    tabs = (scene.prim_tab, scene.dense_tab, scene.mat_tab, scene.light_tab,
            scene.spec_tab, scene.env_args, scene.med_args)
    dense_tab = scene.dense_tab
    key = jax.random.PRNGKey(0)
    state0, counters0 = mk._mega_init(cam, key, settings_t, n, n_pad)
    k_iter = sampling.fold(key, 2)
    nk2 = mk._k2_rows(ls)

    red = jax.jit(lambda a: jnp.sum(a))

    def fetch(x):
        return np.asarray(red(x))

    def k1(s):
        return sweep_closest_rows(s, dense_tab, row0=mk.S_O,
                                  tmin_c=INTERSECTION_TIME_OFFSET,
                                  tmax_c=RAY_TMAX, src_rows=mk.NS,
                                  chunk_types=scene.consts.get("ct8"))

    def k12(s):
        return mk._k12_call(s, tabs, k_iter, jnp.int32(0), settings_t,
                            consts_t, False)

    def k3f(k2, si):
        return sweep_any_rows(k2, dense_tab, row0=mk.O_NEE + 12 * si,
                              tmin_c=INTERSECTION_TIME_OFFSET,
                              tmax_row=mk.O_NEE + 12 * si + 6, src_rows=nk2,
                              chunk_types=scene.consts.get("ct8"))

    def round_2prog(s):
        k2 = k12(s)
        return mk._k34_call(s, k2, dense_tab, counters0, k_iter,
                            jnp.int32(0), settings_t, consts_t, False)[0]

    variants = {
        "K1 sweep only": lambda s: (k1(s), s)[1],
        "K12 (sweep+shade)": lambda s: (k12(s), s)[1],
        "K12+1K3": lambda s: (k3f(k12(s), 0), s)[1],
        "2-prog round": round_2prog,
        "prod step": None,
    }

    REP = 16
    prev = 0.0
    for name, fn in variants.items():
        if fn is None:
            s, c, i = state0, counters0, jnp.int32(0)
            s, c, i = mk._mega_step(s, c, i, tabs, k_iter, settings_t,
                                    consts_t, False)
            _ = fetch(s)
            t0 = time.perf_counter()
            s, c, i = state0, counters0, jnp.int32(0)
            for _ in range(REP):
                s, c, i = mk._mega_step(s, c, i, tabs, k_iter, settings_t,
                                        consts_t, False)
            _ = fetch(s)
        else:
            _ = fetch(fn(state0))
            t0 = time.perf_counter()
            last = state0
            for _ in range(REP):
                last = fn(state0)
            _ = fetch(last)
        el = (time.perf_counter() - t0) / REP
        print(f"{name:20s} {el * 1e3:8.2f} ms/round (delta "
              f"{(el - prev) * 1e3:+7.2f} ms)", flush=True)
        prev = el

    # occupancy drain + true bounce-round count for one sample batch
    count_alive = jax.jit(lambda s: jnp.sum(s[mk.S_ALIVE]))
    state, counters = state0, counters0
    it_dev = jnp.int32(0)
    t_start = time.perf_counter()
    curve = []
    for seg in range(80):
        for _ in range(4):
            state, counters, it_dev = mk._mega_step(
                state, counters, it_dev, tabs, k_iter, settings_t, consts_t,
                False)
        a = float(np.asarray(count_alive(state)))
        curve.append(a)
        if a == 0.0:
            break
    el = time.perf_counter() - t_start
    occ = [f"{100 * a / n:.1f}" for a in curve]
    print(f"occupancy% every 4 rounds: {occ}", flush=True)
    print(f"(loop with 4-round syncs took {el:.2f}s, "
          f"{4 * len(curve)} rounds)", flush=True)


if __name__ == "__main__":
    main()
