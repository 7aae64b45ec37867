"""Is the mega round dispatch-bound or compute-bound on the tunnel?

Measures (a) a dependent chain of trivial one-op programs (pure dispatch
overhead), (b) full mega rounds at full/half/quarter lane counts with
advancing state (fresh init each, first 12 rounds = full occupancy).
If round time is flat in lane count, the tunnel's per-program dispatch
overhead dominates and the lever is fewer programs per round; if it
scales, compute/bandwidth dominates and the lever is traffic + occupancy.
Run: python tools/profile_scaling.py
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

    print("devices:", jax.devices(), flush=True)

    # ---- (a) dependent trivial-program chain: dispatch overhead floor
    bump = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    x = bump(x)
    _ = np.asarray(x)
    t0 = time.perf_counter()
    REP = 64
    for _ in range(REP):
        x = bump(x)
    _ = np.asarray(x[0, 0])
    el = (time.perf_counter() - t0) / REP
    print(f"trivial dependent chain: {el * 1e3:.2f} ms/program", flush=True)

    # ---- (b) mega rounds at multiple lane counts
    b = construct_world("data/scenes/cornell_box.toml",
                        search_paths=["/root/repo", "/root/reference"],
                        cache_dir="/tmp/pt_cache")
    cam = build_camera(b.camera_by_id("main"), aspect_ratio=1.0)
    settings = PTSettings(max_bounces=12, min_bounces=1, light_samples=2,
                          russian_roulette=True)
    scene = mk.build_mega_scene(b.world, cam, settings)
    wb = settings.wavelength_bounds
    tabs = (scene.prim_tab, scene.dense_tab, scene.mat_tab, scene.light_tab,
            scene.spec_tab, scene.env_args)
    consts_t = mk._freeze(scene.consts)
    key = jax.random.PRNGKey(0)
    k_iter = sampling.fold(key, 2)

    step = max(mk.TILE, mk.RAY_TILE)
    n_full = -(-(1080 * 1080) // step) * step
    ROUNDS = 12
    for n_pad in (n_full, n_full // 3 // step * step, n_full // 9 // step * step):
        settings_d = dict(
            c_lanes=1, light_samples=2, spp=12.0, max_bounces=12.0,
            min_bounces=1.0, russian_roulette=True, only_direct=False,
            width=1080.0, height=1080.0, start=0.0,
            wb_lo=float(wb.lower), wb_span=float(wb.span))
        settings_t = mk._freeze(settings_d)
        state0, counters0 = mk._mega_init(cam, key, settings_t, n_pad, n_pad)
        # warm: one full chain of ROUNDS so every program is compiled
        s, c, i = state0, counters0, jnp.int32(0)
        for _ in range(2):
            s, c, i = mk._mega_step(s, c, i, tabs, k_iter, settings_t,
                                    consts_t, False)
        _ = np.asarray(s[mk.S_ALIVE, 0])
        t0 = time.perf_counter()
        s, c, i = state0, counters0, jnp.int32(0)
        for _ in range(ROUNDS):
            s, c, i = mk._mega_step(s, c, i, tabs, k_iter, settings_t,
                                    consts_t, False)
        _ = np.asarray(s[mk.S_ALIVE, 0])
        el = (time.perf_counter() - t0) / ROUNDS
        print(f"n_pad={n_pad:8d}: {el * 1e3:7.2f} ms/round "
              f"({el / (n_pad / n_full) * 1e3:.2f} ms normalized)", flush=True)


if __name__ == "__main__":
    main()
