"""Progressive preview renderer.

Capability parity with PreviewRenderer (src/renderer/preview.rs, feature
`preview`): the reference opens a minifb window and repaints per-frame
accumulations. Headless TPU hosts have no window; the equivalent is a
progressive render that tonemaps the accumulating film after every chunk
and writes `preview.png` (plus an optional user callback for UIs to hook).
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

from pathtracer_tpu.core import sampling
from pathtracer_tpu.integrator.pt import PTSettings
from pathtracer_tpu.renderer.naive import _render_chunk
from pathtracer_tpu.tonemap import tonemap_to_rgb, write_png
from pathtracer_tpu.utils.profile import Profile
from pathtracer_tpu.utils import profile as prof


def render_preview(
    world,
    camera,
    settings: PTSettings,
    width: int,
    height: int,
    min_samples: int,
    tonemapper,
    colorspace: str = "Rec709",
    key=None,
    sample_chunk: int = 2,
    preview_path: str = "output/preview.png",
    frame_callback=None,
):
    """Render progressively; after each chunk the running average is
    tonemapped and written to `preview_path` / passed to `frame_callback`.
    Returns (film_xyz [H,W,3], Profile, elapsed)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    os.makedirs(os.path.dirname(preview_path) or ".", exist_ok=True)
    n_chunks = -(-min_samples // sample_chunk)
    film = None
    done = 0
    counters_acc = prof.zeros()
    profile = Profile()
    t0 = time.perf_counter()
    for c in range(n_chunks):
        this = min(sample_chunk, min_samples - done)
        f, counters = _render_chunk(
            world, camera, sampling.fold(key, 4000 + c), settings, width, height, this
        )
        film = f if film is None else film + f
        counters_acc = counters_acc + counters
        done += this
        avg = (film / done).reshape(height, width, 3)
        display, _ = tonemap_to_rgb(avg, tonemapper, colorspace)
        frame = np.asarray(display)
        write_png(preview_path, frame)
        if frame_callback is not None:
            frame_callback(frame, done, min_samples)
    film = (film / done).reshape(height, width, 3)
    film.block_until_ready()
    elapsed = time.perf_counter() - t0
    profile.add_device_counts(counters_acc)
    return film, profile, elapsed
