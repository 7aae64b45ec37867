"""Flagship showcase render (VERDICT r3 #9): the moissanite gem at 1080p,
matching the reference README's lead image (/root/reference/README.md:7-9,
showcase/moissanite_gem_1080p.png — theirs is BDPT without HWSS; ours is
megakernel PT WITH hero-wavelength spectral sampling, which kills exactly
the color noise the reference README laments).

Run: python tools/render_showcase.py [spp]  (default 256)
Writes showcase/moissanite_gem_1080p.{exr,png} + a settings note.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from pathtracer_tpu.integrator.pt import PTSettings
from pathtracer_tpu.parsing.cameras import build_camera
from pathtracer_tpu.parsing.construct import construct_world
from pathtracer_tpu.renderer.persistent import render_regen
from pathtracer_tpu.renderer.output import output_film


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    w = h = 1080
    bundle = construct_world(
        "/root/reference/data/scenes/cornell_box_diamond_gem.toml",
        search_paths=["/root/repo", "/root/reference"],
        cache_dir="/tmp/pt_cache")
    settings = PTSettings(max_bounces=12, min_bounces=1, light_samples=2,
                          russian_roulette=True, hwss=True)
    camera = build_camera(bundle.camera_by_id("main"), aspect_ratio=w / h)
    print(f"device: {jax.devices()[0]}  spp={spp}", flush=True)
    t0 = time.perf_counter()
    film, prof, _ = render_regen(bundle.world, camera, settings, w, h, spp,
                                 key=jax.random.PRNGKey(2024))
    film_np = np.asarray(film)
    wall = time.perf_counter() - t0
    assert np.isfinite(film_np).all()
    print(f"rendered {spp} spp in {wall:.1f}s  "
          f"({prof.total_rays / wall / 1e6:.1f} Mrays/s)", flush=True)
    from pathtracer_tpu.tonemap.tonemap import Reinhard1

    tm = Reinhard1(key_value=0.18, white_point=4.0, luminance_only=False)
    output_film(film, "moissanite_gem_1080p", tm, "sRGB",
                output_dir="showcase")
    with open("showcase/moissanite_gem_1080p.txt", "w") as f:
        f.write(
            "moissanite gem (reference data/scenes/cornell_box_diamond_gem"
            f".toml), 1080x1080, megakernel PT, {spp} spp, max_bounces 12, "
            "light_samples 2, HWSS C=4 hero-wavelength spectral MIS, "
            f"Reinhard1 key 0.18, rendered in {wall:.1f}s on one v5e chip "
            f"({prof.total_rays / wall / 1e6:.1f} Mrays/s). Reference "
            "counterpart: README.md lead image (BDPT, no HWSS).\n")
    print("wrote showcase/moissanite_gem_1080p.{exr,png,txt}", flush=True)


if __name__ == "__main__":
    main()
