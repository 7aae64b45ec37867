"""Timing of the 5-program mega pipeline at 1080p Cornell.

Honest fetch = np.asarray of a tiny PRE-JITTED reduction (a fresh jit per
fetch costs ~420 ms of host-side retrace and swamps everything).
Measures: raw fetch RTT, any-alive sync, marginal per-round cost at
full occupancy, and a production-loop replica reporting round count +
segment times. Run: python tools/profile_mega.py [n_lanes]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from pathtracer_tpu.core import sampling
    from pathtracer_tpu.parsing.cameras import build_camera
    from pathtracer_tpu.parsing.construct import construct_world
    from pathtracer_tpu.integrator.pt import PTSettings
    from pathtracer_tpu.kernels import megakernel as mk

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1080 * 1080
    b = construct_world("data/scenes/cornell_box.toml",
                        search_paths=["/root/repo", "/root/reference"],
                        cache_dir="/tmp/pt_cache")
    world = b.world
    cam = build_camera(b.camera_by_id("main"), aspect_ratio=1.0)
    settings = PTSettings(max_bounces=12, min_bounces=1, light_samples=2,
                          russian_roulette=True)
    scene = mk.build_mega_scene(world, cam, settings)
    wb = settings.wavelength_bounds
    step = max(mk.TILE, mk.RAY_TILE)
    n_pad = -(-n // step) * step
    settings_d = dict(
        c_lanes=1, light_samples=2, spp=12.0, max_bounces=12.0,
        min_bounces=1.0, russian_roulette=True, only_direct=False,
        width=1080.0, height=1080.0, start=0.0,
        wb_lo=float(wb.lower), wb_span=float(wb.span))
    settings_t = mk._freeze(settings_d)
    consts_t = mk._freeze(scene.consts)
    tabs = (scene.prim_tab, scene.dense_tab, scene.mat_tab, scene.light_tab,
            scene.spec_tab, scene.env_args)
    key = jax.random.PRNGKey(0)
    state0, counters0 = mk._mega_init(cam, key, settings_t, n, n_pad)
    k_iter = sampling.fold(key, 2)

    red = jax.jit(lambda a: jnp.sum(a))
    _ = np.asarray(red(state0))

    def fetch(x):
        return np.asarray(red(x))

    # raw RTT: fetch a tiny committed array repeatedly
    tiny = jnp.float32(1.0) + 0.0
    _ = np.asarray(tiny)
    t0 = time.perf_counter()
    for _ in range(20):
        _ = np.asarray(tiny)
    rtt = (time.perf_counter() - t0) / 20
    print(f"tiny np.asarray RTT: {rtt * 1e3:.2f} ms", flush=True)

    # any-alive sync
    _ = bool(np.asarray(mk._any_alive(state0)))
    t0 = time.perf_counter()
    for _ in range(10):
        _ = bool(np.asarray(mk._any_alive(state0)))
    print(f"any-alive sync: {(time.perf_counter() - t0) / 10 * 1e3:.2f} ms",
          flush=True)

    # marginal per-round device cost at full occupancy: N rounds then one
    # fetch; compare different N (state resets each trial so occupancy
    # stays full-ish for the first rounds)
    def run_rounds(nr):
        s, c, i = state0, counters0, jnp.int32(0)
        t0 = time.perf_counter()
        for _ in range(nr):
            s, c, i = mk._mega_step(s, c, i, tabs, k_iter, settings_t,
                                    consts_t, False)
        _ = fetch(s)
        return time.perf_counter() - t0

    _ = run_rounds(2)  # warm all programs
    for nr in (1, 2, 4, 8, 16, 32):
        el = run_rounds(nr)
        print(f"{nr:3d} rounds + fetch: {el * 1e3:8.1f} ms "
              f"({el / nr * 1e3:6.2f} ms/round)", flush=True)

    # host-side dispatch cost: issue N rounds WITHOUT any fetch
    for nr in (8, 32):
        s, c, i = state0, counters0, jnp.int32(0)
        t0 = time.perf_counter()
        for _ in range(nr):
            s, c, i = mk._mega_step(s, c, i, tabs, k_iter, settings_t,
                                    consts_t, False)
        el = time.perf_counter() - t0
        print(f"issue-only {nr} rounds: {el * 1e3:8.1f} ms "
              f"({el / nr * 1e3:6.2f} ms/round host-side)", flush=True)
        _ = fetch(s)

    # production replica: full render loop with segment timings
    state, counters = state0, counters0
    it_dev = jnp.int32(0)
    it = 0
    t_start = time.perf_counter()
    while it < 1216:
        t0 = time.perf_counter()
        for _ in range(mk.ALIVE_CHECK_EVERY):
            state, counters, it_dev = mk._mega_step(
                state, counters, it_dev, tabs, k_iter, settings_t, consts_t,
                False)
            it += 1
        t_issue = time.perf_counter() - t0
        t0 = time.perf_counter()
        alive = bool(np.asarray(mk._any_alive(state)))
        t_sync = time.perf_counter() - t0
        print(f"seg @{it:3d}: issue {t_issue * 1e3:7.1f} ms, "
              f"alive-sync {t_sync * 1e3:7.1f} ms, alive={alive}", flush=True)
        if not alive:
            break
    total = time.perf_counter() - t_start
    rays = float(np.asarray(counters0 := counters)[0:4].sum())
    print(f"TOTAL: {total:.2f}s, rounds={it}", flush=True)


if __name__ == "__main__":
    main()
