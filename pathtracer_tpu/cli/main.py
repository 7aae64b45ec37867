"""CLI renderer entry point.

Capability parity with src/bin/main.rs:81-198: args {scene, config,
dry_run, log levels}; loads config + scene, builds the world, renders every
[[render_settings]] entry, writes EXR+PNG, prints Profile ray statistics.

Usage:
  python -m pathtracer_tpu.cli.main --config data/config.toml \
      [--scene data/scenes/cornell_box.toml] [--data-root /root/reference] \
      [--dry-run] [--spp N] [--size WxH]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time

import jax

from pathtracer_tpu.parsing.config import parse_config
from pathtracer_tpu.parsing.construct import construct_world
from pathtracer_tpu.parsing.cameras import build_camera
from pathtracer_tpu.parsing.paths import DEFAULT_SEARCH_PATHS, resolve
from pathtracer_tpu.integrator.pt import PTSettings
from pathtracer_tpu.integrator.lt import LTSettings
from pathtracer_tpu.integrator.bdpt import BDPTSettings
from pathtracer_tpu.renderer.naive import render_sampled  # noqa: F401 (naive-renderer configs)
from pathtracer_tpu.renderer.persistent import render_regen
from pathtracer_tpu.renderer.splatted import render_splatted
from pathtracer_tpu.renderer.bdpt_renderer import render_bdpt
from pathtracer_tpu.renderer.output import output_film
from pathtracer_tpu.tonemap import Clamp, Reinhard0, Reinhard0x3, Reinhard1, Reinhard1x3

log = logging.getLogger("pathtracer_tpu")


def make_tonemapper(tc):
    if tc.kind == "Clamp":
        return Clamp(exposure=tc.exposure, luminance_only=tc.luminance_only, silenced=tc.silenced)
    if tc.kind == "Reinhard0":
        return Reinhard0(key_value=tc.key_value, luminance_only=tc.luminance_only)
    if tc.kind == "Reinhard0x3":
        return Reinhard0x3(key_value=tc.key_value)
    if tc.kind == "Reinhard1":
        return Reinhard1(key_value=tc.key_value, white_point=tc.white_point,
                         luminance_only=tc.luminance_only)
    if tc.kind == "Reinhard1x3":
        return Reinhard1x3(key_value=tc.key_value, white_point=tc.white_point)
    raise ValueError(f"unknown tonemapper {tc.kind!r}")


def render_settings_entry(bundle, rs, key, output_dir="output", spp=None, size=None,
                          renderer_kind="Naive", tile_size=(32, 32)):
    """Render one [[render_settings]] entry end-to-end."""
    width, height = size or (rs.width, rs.height)
    spp = spp or rs.min_samples
    spec = bundle.camera_by_id(rs.camera_id)
    camera = build_camera(spec, aspect_ratio=width / height)
    integ = rs.integrator
    if integ.kind not in ("PT", "LT", "BDPT"):
        log.warning("integrator %s not yet wired into the CLI; falling back to PT "
                    "(the reference falls back likewise, src/integrator/mod.rs:106-119)",
                    integ.kind)
    t0 = time.perf_counter()
    tm = make_tonemapper(rs.tonemap)
    if integ.kind == "BDPT":
        settings = BDPTSettings(
            max_depth=max(2, rs.max_bounces),
            wavelength_bounds=rs.wavelength_bounds,
            selected_pair=integ.selected_pair,
        )
        film, profile, elapsed = render_bdpt(
            bundle.world, camera, settings, width, height, spp, key=key,
            progress=lambda done, total: log.info("  BDPT %d/%d spp", done, total),
        )
        exr, png = output_film(film, rs.filename, tm, rs.colorspace,
                               rs.premultiply, output_dir)
        log.info("wrote %s, %s (%.1fs total)", exr, png, time.perf_counter() - t0)
        return film, profile
    if integ.kind == "LT":
        settings = LTSettings(
            max_bounces=rs.max_bounces,
            min_bounces=rs.min_bounces,
            camera_samples=integ.camera_samples,
            russian_roulette=rs.russian_roulette,
            wavelength_bounds=rs.wavelength_bounds,
        )
        film, profile, elapsed = render_splatted(
            bundle.world, camera, settings, width, height, spp, key=key,
            progress=lambda done, total: log.info("  LT chunk %d/%d", done, total),
        )
        log.info("%s", profile.pretty_print(elapsed, jax.device_count()))
        # reference writes the splat film as *_lightfilm (naive.rs:351-403)
        exr, png = output_film(film, rs.filename + "_lightfilm", tm, rs.colorspace,
                               rs.premultiply, output_dir)
        log.info("wrote %s, %s (%.1fs total)", exr, png, time.perf_counter() - t0)
        return film, profile
    settings = PTSettings(
        max_bounces=rs.max_bounces,
        min_bounces=rs.min_bounces,
        light_samples=integ.light_samples,
        russian_roulette=rs.russian_roulette,
        only_direct=rs.only_direct,
        medium_aware=integ.medium_aware,
        hwss=rs.hwss,
        wavelength_bounds=rs.wavelength_bounds,
    )
    if renderer_kind == "Tiled":
        # device-tiled scheduling: shards the film over the visible device
        # mesh and runs the production integrator per shard (tiled.rs parity)
        from pathtracer_tpu.renderer.tiled import render_tiled

        film, profile, elapsed = render_tiled(
            bundle.world, camera, settings, width, height, spp,
            tile_size=tile_size, key=key, sample_chunk=min(8, spp),
            progress=lambda done, total: log.info("  %d/%d spp", done, total),
        )
    else:
        # sample-regeneration wavefront (medium-aware since r3: the tracked-
        # medium free flight + stack transitions run inside the regen body,
        # so cornell_box_medium-class scenes keep full occupancy too)
        film, profile, elapsed = render_regen(
            bundle.world, camera, settings, width, height, spp, key=key,
        )
    log.info("%s", profile.pretty_print(elapsed, jax.device_count()))
    exr, png = output_film(film, rs.filename, tm, rs.colorspace, rs.premultiply, output_dir)
    log.info("wrote %s, %s (%.1fs total)", exr, png, time.perf_counter() - t0)
    return film, profile


def main(argv=None):
    ap = argparse.ArgumentParser(description="pathtracer_tpu renderer")
    ap.add_argument("--config", default="data/config.toml")
    ap.add_argument("--scene", default=None, help="override default_scene_file")
    ap.add_argument("--data-root", action="append", default=None,
                    help="extra asset search root (repeatable)")
    ap.add_argument("--output-dir", default="output")
    ap.add_argument("--cache-dir", default="cache")
    ap.add_argument("--dry-run", action="store_true", help="parse + build only")
    ap.add_argument("--spp", type=int, default=None, help="override min_samples")
    ap.add_argument("--size", default=None, help="override resolution, WxH")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--stdout-log", default="INFO")
    args = ap.parse_args(argv)

    logging.basicConfig(
        level=getattr(logging, args.stdout_log.upper(), logging.INFO),
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    search = (args.data_root or []) + DEFAULT_SEARCH_PATHS
    os.makedirs(args.output_dir, exist_ok=True)
    os.makedirs(args.cache_dir, exist_ok=True)

    config = parse_config(resolve(args.config, search))
    scene_path = args.scene or config.default_scene_file
    log.info("building world from %s", scene_path)
    # LT renders need the camera lens proxy in the scene for direct
    # light→lens hits (projective_camera.rs:73-79)
    use_lt = any(rs.integrator.kind == "LT" for rs in config.render_settings)
    bundle = construct_world(scene_path, search_paths=search,
                             cache_dir=args.cache_dir, camera_surfaces=use_lt)
    log.info("world: %d primitives, %d materials, %d curves",
             bundle.world.prims.count, bundle.world.mats.count, bundle.world.bank.n_curves)
    if args.dry_run:
        print("dry run OK")
        return 0

    size = None
    if args.size:
        w, h = args.size.lower().split("x")
        size = (int(w), int(h))
    key = jax.random.PRNGKey(args.seed)
    for i, rs in enumerate(config.render_settings):
        log.info("render_settings[%d]: %s %dx%d @ %d spp (%s)",
                 i, rs.filename, rs.width, rs.height, rs.min_samples, rs.integrator.kind)
        render_settings_entry(bundle, rs, jax.random.fold_in(key, i),
                              args.output_dir, args.spp, size,
                              renderer_kind=config.renderer_kind,
                              tile_size=config.tile_size)
    return 0


if __name__ == "__main__":
    sys.exit(main())
