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
    use_megakernel: bool | None = None,
):
    """Render `min_samples` light-paths-per-pixel. Returns
    (light_film [H,W,3] normalised to radiance, Profile, elapsed).

    PT_LT_MEGA=1 (or use_megakernel=True) routes the bounce rounds through
    the LT megakernel (kernels/lt_mega.py) when its gate passes. OPT-IN for
    now: on-chip the films match the XLA wavefront to 0.1% but the v1 is
    SLOWER (4.1 vs 10.3 Mrays/s at 512² — the per-round XLA spawn feed's
    CDF-inversion gathers dominate, ~180 of 226 ms/round at 1M lanes);
    the v2 lever is in-kernel spawning off the light tables."""
    import os

    if key is None:
        key = jax.random.PRNGKey(0)
    n_pix = width * height
    total_paths = n_pix * min_samples
    if use_megakernel is None:
        use_megakernel = bool(os.environ.get("PT_LT_MEGA"))
    if jax.devices()[0].platform not in ("tpu", "axon"):
        use_megakernel = False
    if use_megakernel:
        from pathtracer_tpu.kernels.lt_mega import (
            lt_mega_available,
            lt_trace_mega,
        )

        if lt_mega_available(world, camera, settings):
            t0 = time.perf_counter()
            film, counters = lt_trace_mega(world, camera, settings, width,
                                           height, total_paths, key)
            film = film * (float(n_pix) / float(total_paths))
            profile = Profile().add_device_counts(counters)
            elapsed = time.perf_counter() - t0
            return film.reshape(height, width, 3), profile, elapsed
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
