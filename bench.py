"""Benchmark: Cornell box PT throughput on the real chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference renderer's 23.9 Mrays/sec on a 20-thread CPU
(reference data/config.toml:7-9; see BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_MRAYS = 23.9


def main():
    import jax

    from pathtracer_tpu.core import sampling
    from pathtracer_tpu.integrator.pt import PTSettings
    from pathtracer_tpu.parsing.cameras import build_camera
    from pathtracer_tpu.parsing.construct import construct_world
    from pathtracer_tpu.renderer.persistent import _regen_pass
    from pathtracer_tpu.utils.profile import Profile

    width = height = 1080
    spp_chunk = 12
    bundle = construct_world(
        "data/scenes/cornell_box.toml",
        search_paths=["/root/repo", "/root/reference"],
        cache_dir="/tmp/pt_cache",
    )
    # config_test_cornell_box.toml settings: PT, light_samples=2, bounces 1..12
    settings = PTSettings(
        max_bounces=12, min_bounces=1, light_samples=2,
        russian_roulette=True, only_direct=False,
    )
    camera = build_camera(bundle.camera_by_id("main"), aspect_ratio=width / height)
    key = jax.random.PRNGKey(0)

    # warm-up/compile (sample-regeneration wavefront, renderer/persistent.py)
    film, counters = _regen_pass(bundle.world, camera, sampling.fold(key, 0),
                                 settings, width, height, spp_chunk)
    film.block_until_ready()

    # timed: 2 passes
    n_timed = 2
    t0 = time.perf_counter()
    total = None
    for i in range(1, n_timed + 1):
        film, counters = _regen_pass(bundle.world, camera, sampling.fold(key, i),
                                     settings, width, height, spp_chunk)
        total = counters if total is None else total + counters
    film.block_until_ready()
    total.block_until_ready()
    elapsed = time.perf_counter() - t0

    profile = Profile().add_device_counts(total)
    mrays = profile.total_rays / elapsed / 1e6
    spp_sec = n_timed * spp_chunk / elapsed
    result = {
        "metric": "cornell_1080p_pt_mrays_per_chip",
        "value": round(mrays, 2),
        "unit": "Mrays/sec",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
        "spp_per_sec_1080p": round(spp_sec, 3),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
