"""Split the mega round's ~10ms device cost per kernel + occupancy curve.

Issues 32 repetitions of growing kernel prefixes (K1; K1+K2; K1+K2+K3;
K1+K2+2xK3; full round) ending in one value fetch — differences give each
kernel's device cost. Then runs the production loop fetching the alive
count every 4 rounds for the occupancy/tail curve.
Run: python tools/profile_mega_kernels.py
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

    n = 1080 * 1080
    b = construct_world("data/scenes/cornell_box.toml",
                        search_paths=["/root/repo", "/root/reference"],
                        cache_dir="/tmp/pt_cache")
    cam = build_camera(b.camera_by_id("main"), aspect_ratio=1.0)
    settings = PTSettings(max_bounces=12, min_bounces=1, light_samples=2,
                          russian_roulette=True)
    scene = mk.build_mega_scene(b.world, cam, settings)
    wb = settings.wavelength_bounds
    step = max(mk.TILE, mk.RAY_TILE)
    n_pad = -(-n // step) * step
    settings_d = dict(
        c_lanes=1, light_samples=2, spp=12.0, max_bounces=12.0,
        min_bounces=1.0, russian_roulette=True, only_direct=False,
        width=1080.0, height=1080.0, start=0.0, lane_mod=float(n),
        wb_lo=float(wb.lower), wb_span=float(wb.span))
    settings_t = mk._freeze(settings_d)
    consts_t = mk._freeze(scene.consts)
    tabs = (scene.prim_tab, scene.dense_tab, scene.mat_tab, scene.light_tab,
            scene.spec_tab, scene.env_args)
    dense_tab = scene.dense_tab
    key = jax.random.PRNGKey(0)
    state0, counters0 = mk._mega_init(cam, key, settings_t, n, n_pad)
    k_iter = sampling.fold(key, 2)
    ls = 2
    nk2 = mk._k2_rows(ls)

    red = jax.jit(lambda a: jnp.sum(a))

    def fetch(x):
        return np.asarray(red(x))

    def k1(s):
        return sweep_closest_rows(s, dense_tab, row0=mk.S_O,
                                  tmin_c=INTERSECTION_TIME_OFFSET,
                                  tmax_c=RAY_TMAX, src_rows=mk.NS)

    def k2f(s, tp):
        return mk._k2_call(s, tp, tabs, k_iter, jnp.int32(0), settings_t,
                           consts_t, False)

    def k3f(k2, si):
        return sweep_any_rows(k2, dense_tab, row0=mk.O_NEE + 12 * si,
                              tmin_c=INTERSECTION_TIME_OFFSET,
                              tmax_row=mk.O_NEE + 12 * si + 6, src_rows=nk2)

    def k4f(s, k2, blks):
        return mk._k4_call(s, k2, blks, counters0, k_iter, jnp.int32(0),
                           settings_t, consts_t, False)[0]

    def old_round(s):
        tp = k1(s)
        k2 = k2f(s, tp)
        blks = [k3f(k2, si) for si in (0, 1)]
        return k4f(s, k2, blks)

    def new_round(s):
        tp = k1(s)
        k2 = k2f(s, tp)
        return mk._k34_call(s, k2, dense_tab, counters0, k_iter,
                            jnp.int32(0), settings_t, consts_t, False)[0]

    def round_2prog(s):
        k2 = mk._k12_call(s, tabs, k_iter, jnp.int32(0), settings_t,
                          consts_t, False)
        return mk._k34_call(s, k2, dense_tab, counters0, k_iter,
                            jnp.int32(0), settings_t, consts_t, False)[0]

    variants = {
        "K1 only": lambda s: (k1(s), s)[1],
        "K1+K2": lambda s: (k2f(s, k1(s)), s)[1],
        "K1+K2+K3": lambda s: (k3f(k2f(s, k1(s)), 0), s)[1],
        "K1+K2+2K3": lambda s: ([k3f(k2f(s, k1(s)), si) for si in (0, 1)], s)[1],
        "old 5-prog round": old_round,
        "3-prog round": new_round,
        "2-prog round": round_2prog,
        "full round": None,
    }

    REP = 32
    prev = 0.0
    for name, fn in variants.items():
        # warm
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
            # NOTE: state does not advance, so occupancy stays full —
            # ideal for cost splitting
            _ = fetch(fn(state0))
            t0 = time.perf_counter()
            last = state0
            for _ in range(REP):
                last = fn(state0)
            _ = fetch(last)
        el = (time.perf_counter() - t0) / REP
        print(f"{name:12s} {el * 1e3:7.2f} ms/round (delta "
              f"{(el - prev) * 1e3:+6.2f} ms)", flush=True)
        prev = el

    # NOTE: in the non-advancing variants each rep's programs have no data
    # dependency, so the device may overlap them; treat deltas as lower
    # bounds. occupancy curve:
    count_alive = jax.jit(lambda s: jnp.sum(s[mk.S_ALIVE]))
    state, counters = state0, counters0
    it_dev = jnp.int32(0)
    t_start = time.perf_counter()
    curve = []
    for seg in range(40):
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
    print(f"(loop with 4-round syncs took {el:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
