"""Tiled renderer: tile decomposition + multi-device scheduling.

Capability parity with TiledRenderer (src/renderer/tiled.rs): the reference
decomposes the film into tiles and work-steals them across rayon threads
with per-tile sample phases. On TPU the equivalent scheduling unit is the
device: tiles are assigned statically round-robin to mesh devices via
`shard_map` (parallel/mesh.py), and "phases" are sample chunks, after which
the host can snapshot the accumulating film for preview (renderer/preview).

`generate_tiles` reproduces the reference's full+remnant decomposition
(tiled.rs:190-277) for hosts that want explicit tile lists (preview UI,
progress reporting).
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax

from pathtracer_tpu.integrator.pt import PTSettings
from pathtracer_tpu.parallel.mesh import (
    make_render_mesh,
    render_regen_sharded,
    render_sampled_sharded,
)
from pathtracer_tpu.renderer.naive import render_sampled
from pathtracer_tpu.renderer.persistent import render_regen


class Tile(NamedTuple):
    x0: int
    y0: int
    width: int
    height: int


def generate_tiles(width: int, height: int, tile_w: int, tile_h: int) -> List[Tile]:
    """Full tiles plus right/bottom remnants covering every pixel exactly
    once (reference: src/renderer/tiled.rs:190-277 + test :676-689)."""
    tiles = []
    y = 0
    while y < height:
        th = min(tile_h, height - y)
        x = 0
        while x < width:
            tw = min(tile_w, width - x)
            tiles.append(Tile(x, y, tw, th))
            x += tw
        y += th
    return tiles


def render_tiled(
    world,
    camera,
    settings: PTSettings,
    width: int,
    height: int,
    min_samples: int,
    tile_size=(32, 32),
    key=None,
    sample_chunk: int = 8,
    progress=None,
    phase_samples: int = 0,
    phase_callback=None,
):
    """Render with device-tiled scheduling. Surface-only settings run the
    production sample-regeneration integrator (sharded over the mesh when
    multiple devices are visible); medium-aware settings run the plain
    wavefront loop. Falls back to the single-device path when only one
    device is visible.

    `phase_samples` > 0 splits the render into sample phases (the
    reference's 10-sample tile phases, tiled.rs:279-542): after each phase
    `phase_callback(film_so_far [H,W,3], samples_done)` receives the
    current normalised accumulation — the preview-window/live-progress
    hook, device-wide instead of per-CPU-tile."""
    import time as _time

    import jax.numpy as jnp

    from pathtracer_tpu.core import sampling as _sampling
    from pathtracer_tpu.utils.profile import Profile

    n_dev = jax.device_count()
    multi = n_dev > 1 and (width * height) % n_dev == 0
    if key is None:
        key = jax.random.PRNGKey(0)

    def one_pass(spp, k):
        if not settings.medium_aware:
            if multi:
                mesh = make_render_mesh(n_dev)
                return render_regen_sharded(
                    world, camera, settings, width, height, spp, mesh, key=k,
                )
            return render_regen(world, camera, settings, width, height, spp, key=k)
        if multi:
            mesh = make_render_mesh(n_dev)
            return render_sampled_sharded(
                world, camera, settings, width, height, spp, mesh,
                key=k, sample_chunk=sample_chunk, progress=progress,
            )
        return render_sampled(
            world, camera, settings, width, height, spp,
            key=k, sample_chunk=sample_chunk, progress=progress,
        )

    if phase_samples <= 0 or phase_samples >= min_samples:
        return one_pass(min_samples, key)

    t0 = _time.perf_counter()
    film_acc = None
    done = 0
    profile = Profile()
    phase = 0
    while done < min_samples:
        spp = min(phase_samples, min_samples - done)
        film, prof, _ = one_pass(spp, _sampling.fold(key, 4000 + phase))
        w_new = spp / (done + spp)
        film_acc = film if film_acc is None else film_acc * (1.0 - w_new) + film * w_new
        done += spp
        phase += 1
        profile.camera_rays += prof.camera_rays
        profile.bounce_rays += prof.bounce_rays
        profile.shadow_rays += prof.shadow_rays
        profile.light_rays += prof.light_rays
        profile.env_hits += prof.env_hits
        if phase_callback is not None:
            phase_callback(film_acc, done)
        if progress is not None:
            progress(done, min_samples)
    return film_acc, profile, _time.perf_counter() - t0
