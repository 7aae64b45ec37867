"""Benchmark: PT throughput on the real chip across the three accelerator
paths — dense sweep (Cornell), single-level BVH (diamond gem), two-level
TLAS/BLAS (instanced diamond arrangement).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...extras}.
Baseline: the reference renderer's 23.9 Mrays/sec on a 20-thread CPU
(reference data/config.toml:7-9; see BASELINE.md). The primary metric stays
the 1080p Cornell PT number for round-over-round comparability; the BVH and
two-level numbers ride along as extra keys.
"""

from __future__ import annotations

import json
import time
import traceback

BASELINE_MRAYS = 23.9


def _bench_scene(scene_path, spp, width=1080, height=1080, pixel_batch=None,
                 light_samples=2):
    """HONEST timing: the wall clock spans dispatch -> a forced host fetch
    of the ray counters (np.asarray). `block_until_ready` does NOT await
    remote execution on the axon tunnel — timing on it reports dispatch
    latency and once inflated this bench ~200x (the round-1 363 Mrays/s
    figure was that artifact; see PARITY.md)."""
    import numpy as np
    import jax

    from pathtracer_tpu.integrator.pt import PTSettings
    from pathtracer_tpu.parsing.cameras import build_camera
    from pathtracer_tpu.parsing.construct import construct_world
    from pathtracer_tpu.renderer.persistent import _regen_pass

    bundle = construct_world(
        scene_path,
        search_paths=["/root/repo", "/root/reference"],
        cache_dir="/tmp/pt_cache",
    )
    # config_test_cornell_box.toml settings: PT, light_samples=2, bounces 1..12
    settings = PTSettings(
        max_bounces=12, min_bounces=1, light_samples=light_samples,
        russian_roulette=True, only_direct=False,
    )
    camera = build_camera(bundle.camera_by_id("main"), aspect_ratio=width / height)

    def one_pass(key):
        n_pix = width * height
        batch = pixel_batch or n_pix
        total = None
        for bidx in range(n_pix // batch):
            film, counters = _regen_pass(
                bundle.world, camera, jax.random.fold_in(key, bidx), settings,
                width, height, spp, start=bidx * batch, batch_n=batch,
            )
            total = counters if total is None else total + counters
        return film, np.asarray(total)

    # warm-up/compile (fetch forces completion)
    film, _ = one_pass(jax.random.PRNGKey(0))
    # timed
    t0 = time.perf_counter()
    film, c = one_pass(jax.random.PRNGKey(1))
    el = time.perf_counter() - t0
    assert np.isfinite(np.asarray(film)).all()
    return float(c.sum()) / el / 1e6, spp / el


def main():
    import jax

    result = {
        "metric": "cornell_1080p_pt_mrays_per_chip",
        "value": 0.0,
        "unit": "Mrays/sec",
        "vs_baseline": 0.0,
        "device": str(jax.devices()[0]),
    }

    def retry(fn, tries=2):
        # the axon tunnel throws transient UNAVAILABLE device errors;
        # one retry after a cool-down recovers most of them
        for i in range(tries):
            try:
                return fn()
            except Exception:
                traceback.print_exc()
                if i + 1 < tries:
                    time.sleep(60)
        return None

    r = retry(lambda: _bench_scene("data/scenes/cornell_box.toml", spp=12))
    if r is not None:
        mrays, spp_s = r
        result["value"] = round(mrays, 2)
        result["vs_baseline"] = round(mrays / BASELINE_MRAYS, 3)
        result["spp_per_sec_1080p"] = round(spp_s, 3)
    # mesh-heavy path (302-triangle gem; dense sweep after the 1024 cutoff).
    # pixel_batch: full-film 1.17M-lane programs for this scene crash the
    # tunnel's TPU worker (kernel fault); 583k-lane batches run fine
    r = retry(lambda: _bench_scene(
        "/root/reference/data/scenes/cornell_box_diamond_gem.toml", spp=8,
        pixel_batch=1080 * 540))
    if r is not None:
        result["gem_1080p_mrays"] = round(r[0], 2)
        result["gem_spp_per_sec"] = round(r[1], 3)
    # two-level TLAS/BLAS path (24 shared-BLAS diamond instances)
    r = retry(lambda: _bench_scene(
        "data/scenes/diamond_arrangement_instanced.toml", spp=2,
        pixel_batch=1080 * 540))
    if r is not None:
        result["arrangement_1080p_mrays_two_level"] = round(r[0], 2)
        result["arrangement_spp_per_sec"] = round(r[1], 3)
    # BDPT + LT on the Cornell box at 512² (BASELINE configs)
    r = retry(_bench_bdpt_lt, tries=1)
    if r is not None:
        result.update(r)
    print(json.dumps(result))


def _bench_bdpt_lt(width=512, height=512):
    import jax

    from pathtracer_tpu.integrator.bdpt import BDPTSettings
    from pathtracer_tpu.integrator.lt import LTSettings
    from pathtracer_tpu.parsing.cameras import build_camera
    from pathtracer_tpu.parsing.construct import construct_world
    from pathtracer_tpu.renderer.bdpt_renderer import render_bdpt
    from pathtracer_tpu.renderer.splatted import render_splatted

    bundle = construct_world(
        "data/scenes/cornell_box.toml",
        search_paths=["/root/repo", "/root/reference"],
        cache_dir="/tmp/pt_cache", camera_surfaces=True,
    )
    import numpy as np

    camera = build_camera(bundle.camera_by_id("main"), aspect_ratio=width / height)
    out = {}
    # warm-up + honest wall timing (Profile fetch inside render_* forces
    # completion; renderer-internal elapsed is not trusted on the tunnel)
    bd = BDPTSettings(max_depth=6)
    render_bdpt(bundle.world, camera, bd, width, height, 1, key=jax.random.PRNGKey(0))
    t0 = time.perf_counter()
    film, prof, _ = render_bdpt(bundle.world, camera, bd, width, height, 2,
                                key=jax.random.PRNGKey(1))
    np.asarray(film)
    el = time.perf_counter() - t0
    out["bdpt_cornell_512_mrays"] = round(prof.total_rays / el / 1e6, 2)
    lt = LTSettings(max_bounces=8)
    render_splatted(bundle.world, camera, lt, width, height, 1, key=jax.random.PRNGKey(0))
    t0 = time.perf_counter()
    film, prof, _ = render_splatted(bundle.world, camera, lt, width, height, 4,
                                    key=jax.random.PRNGKey(1))
    np.asarray(film)
    el = time.perf_counter() - t0
    out["lt_cornell_512_mrays"] = round(prof.total_rays / el / 1e6, 2)
    return out


if __name__ == "__main__":
    main()
