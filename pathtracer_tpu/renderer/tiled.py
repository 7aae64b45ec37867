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
):
    """Render with device-tiled scheduling. Surface-only settings run the
    production sample-regeneration integrator (sharded over the mesh when
    multiple devices are visible); medium-aware settings run the plain
    wavefront loop. Falls back to the single-device path when only one
    device is visible."""
    n_dev = jax.device_count()
    multi = n_dev > 1 and (width * height) % n_dev == 0
    if not settings.medium_aware:
        if multi:
            mesh = make_render_mesh(n_dev)
            return render_regen_sharded(
                world, camera, settings, width, height, min_samples, mesh, key=key,
            )
        return render_regen(
            world, camera, settings, width, height, min_samples, key=key,
        )
    if multi:
        mesh = make_render_mesh(n_dev)
        return render_sampled_sharded(
            world, camera, settings, width, height, min_samples, mesh,
            key=key, sample_chunk=sample_chunk, progress=progress,
        )
    return render_sampled(
        world, camera, settings, width, height, min_samples,
        key=key, sample_chunk=sample_chunk, progress=progress,
    )
