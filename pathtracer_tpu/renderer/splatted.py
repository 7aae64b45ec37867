"""Splatting renderer: drives the light-tracing integrator.

Capability parity with NaiveRenderer::render_splatted
(src/renderer/naive.rs:120-321): rounds of light paths, splats scatter-added
into the light film (replacing the crossbeam channel + accumulator thread),
normalised by paths-per-pixel so the LT film is directly comparable to (and
combinable with) the PT film — the reference's `_combined = image +
light/spp` output (naive.rs:351-403).
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp

from pathtracer_tpu.core import sampling
from pathtracer_tpu.integrator.lt import LTSettings, lt_trace
from pathtracer_tpu.utils.profile import Profile
from pathtracer_tpu.utils import profile as prof


@partial(jax.jit, static_argnames=("settings", "width", "height", "n_paths"))
def _lt_chunk(world, camera, key, settings: LTSettings, width: int, height: int, n_paths: int):
    return lt_trace(world, camera, settings, width, height, n_paths, key)


def render_splatted(
    world,
    camera,
    settings: LTSettings,
    width: int,
    height: int,
    min_samples: int,
    key=None,
    paths_per_chunk: int | None = None,
    progress=None,
):
    """Render `min_samples` light-paths-per-pixel. Returns
    (light_film [H,W,3] normalised to radiance, Profile, elapsed)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    n_pix = width * height
    total_paths = n_pix * min_samples
    chunk = paths_per_chunk or n_pix
    n_chunks = -(-total_paths // chunk)
    film = jnp.zeros((n_pix, 3), jnp.float32)
    counters_acc = prof.zeros()
    profile = Profile()
    t0 = time.perf_counter()
    for c in range(n_chunks):
        f, counters = _lt_chunk(
            world, camera, sampling.fold(key, 3000 + c), settings, width, height, chunk
        )
        film = film + f
        counters_acc = counters_acc + counters
        if progress is not None:
            progress(c + 1, n_chunks)
    # splat sum × (W·H)/n_paths == film-average measurement -> per-pixel value
    film = film * (float(n_pix) / float(n_chunks * chunk))
    # Profile value fetch = reliable sync on the axon tunnel
    profile.add_device_counts(counters_acc)
    elapsed = time.perf_counter() - t0
    return film.reshape(height, width, 3), profile, elapsed
