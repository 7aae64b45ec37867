"""Per-kernel timing of the 5-program mega pipeline at 1080p Cornell.

Times each dispatched program (K1 closest, K2 shade, K3 any-hit x ls, K4
finalize) in isolation AND the whole round, with honest value-fetch
syncs. Also measures raw dispatch overhead (null program) and the
any-alive sync cost. Run: python tools/profile_mega.py [n_lanes]
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
    from pathtracer_tpu.kernels.dense import sweep_any_rows, sweep_closest_rows
    from pathtracer_tpu.prelude import INTERSECTION_TIME_OFFSET, RAY_TMAX
    from pathtracer_tpu.utils import profile as prof

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
        c_lanes=mk.C_LANES, light_samples=2, spp=12.0, max_bounces=12.0,
        min_bounces=1.0, russian_roulette=True, only_direct=False,
        width=1080.0, height=1080.0, start=0.0,
        wb_lo=float(wb.lower), wb_span=float(wb.span))
    settings_t = mk._freeze(settings_d)
    consts_t = mk._freeze(scene.consts)
    tabs = (scene.prim_tab, scene.dense_tab, scene.mat_tab, scene.light_tab,
            scene.spec_tab)
    key = jax.random.PRNGKey(0)
    state, counters = mk._mega_init(cam, key, settings_t, n, n_pad)
    it_dev = jnp.int32(0)
    k_iter = sampling.fold(key, 2)
    ls = 2
    dense_tab = scene.dense_tab

    def fetch(x):
        return np.asarray(jax.jit(lambda a: jnp.sum(a))(x))

    def timed(label, fn, reps=10):
        r = fn()
        _ = fetch(r)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn()
            _ = fetch(r)
        el = (time.perf_counter() - t0) / reps
        print(f"{label:28s} {el * 1e3:8.2f} ms (incl. 1 value-fetch sync)",
              flush=True)
        return r, el

    # warm one full round first (also gives k2/tp/blks for isolation)
    tp = sweep_closest_rows(state, dense_tab, row0=mk.S_O,
                            tmin_c=INTERSECTION_TIME_OFFSET, tmax_c=RAY_TMAX,
                            src_rows=mk.NS)
    k2 = mk._k2_call(state, tp, tabs, k_iter, it_dev, settings_t, consts_t,
                     False)
    nk2 = mk._k2_rows(ls)
    blks = [sweep_any_rows(k2, dense_tab, row0=mk.O_NEE + 12 * si,
                           tmin_c=INTERSECTION_TIME_OFFSET,
                           tmax_row=mk.O_NEE + 12 * si + 6, src_rows=nk2)
            for si in range(ls)]
    _ = mk._k4_call(state, k2, blks, counters, k_iter, it_dev, settings_t,
                    consts_t, False)

    null = jax.jit(lambda a: a + 1.0)
    _, t_null = timed("null program", lambda: null(jnp.float32(1.0)))
    _, t_k1 = timed("K1 closest sweep", lambda: sweep_closest_rows(
        state, dense_tab, row0=mk.S_O, tmin_c=INTERSECTION_TIME_OFFSET,
        tmax_c=RAY_TMAX, src_rows=mk.NS))
    _, t_k2 = timed("K2 shade", lambda: mk._k2_call(
        state, tp, tabs, k_iter, it_dev, settings_t, consts_t, False))
    _, t_k3 = timed("K3 any-hit (one)", lambda: sweep_any_rows(
        k2, dense_tab, row0=mk.O_NEE, tmin_c=INTERSECTION_TIME_OFFSET,
        tmax_row=mk.O_NEE + 6, src_rows=nk2))
    _, t_k4 = timed("K4 finalize", lambda: mk._k4_call(
        state, k2, blks, counters, k_iter, it_dev, settings_t, consts_t,
        False)[0])

    def full_round():
        s2, c2, i2 = mk._mega_step(state, counters, it_dev, tabs, k_iter,
                                   settings_t, consts_t, False)
        return s2

    _, t_round = timed("full round (5 dispatches)", full_round)
    sum_isolated = t_k1 + t_k2 + ls * t_k3 + t_k4
    print(f"\nsum of isolated kernels: {sum_isolated * 1e3:.2f} ms "
          f"(each incl. ~{t_null * 1e3:.1f} ms sync)")
    print(f"full round: {t_round * 1e3:.2f} ms — overlap gain "
          f"{(sum_isolated - t_round) * 1e3:.2f} ms")

    # any-alive host sync
    t0 = time.perf_counter()
    for _ in range(10):
        _ = bool(np.asarray(mk._any_alive(state)))
    print(f"any-alive sync: {(time.perf_counter() - t0) / 10 * 1e3:.2f} ms")

    # N back-to-back rounds without sync (pipelining visibility)
    for nr in (6, 12):
        s, c, i = state, counters, it_dev
        t0 = time.perf_counter()
        for _ in range(nr):
            s, c, i = mk._mega_step(s, c, i, tabs, k_iter, settings_t,
                                    consts_t, False)
        _ = fetch(s)
        el = time.perf_counter() - t0
        print(f"{nr} rounds + 1 sync: {el * 1e3:.1f} ms "
              f"({el / nr * 1e3:.2f} ms/round)", flush=True)


if __name__ == "__main__":
    main()
