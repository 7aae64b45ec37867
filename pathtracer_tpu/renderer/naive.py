"""Sample-loop renderer: the wavefront executor.

Capability parity with NaiveRenderer::render_sampled
(src/renderer/naive.rs:66-105): rayon's per-pixel loop becomes a jitted
`lax.scan` over sample rounds of a full-film wavefront (one ray per pixel
per round, box-filter jitter), accumulated into a device-resident XYZ film.
The host only loops over chunks for progress reporting.

Beyond the reference: optional film checkpointing — the accumulating film +
sample count are written to an npz after every chunk, and an interrupted
render resumes from it (the reference has no render checkpointing,
SURVEY §5; long TPU renders want it).
"""

from __future__ import annotations

import os
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from pathtracer_tpu.core import sampling
from pathtracer_tpu.integrator.pt import PTSettings, trace_camera_sample
from pathtracer_tpu.utils.profile import Profile
from pathtracer_tpu.utils import profile as prof


@partial(jax.jit, static_argnames=("settings", "width", "height", "chunk", "start", "batch_n"))
def _render_chunk(world, camera, key, settings: PTSettings, width: int, height: int,
                  chunk: int, start: int = 0, batch_n: int | None = None):
    n = batch_n or (width * height)
    ids = start + jnp.arange(n, dtype=jnp.int32)
    xy = jnp.stack([(ids % width).astype(jnp.float32), (ids // width).astype(jnp.float32)], axis=-1)
    inv_res = jnp.array([1.0 / width, 1.0 / height], jnp.float32)

    def body(carry, i):
        film, counters = carry
        ks = sampling.fold(key, i)
        jitter = jax.random.uniform(ks, (n, 2))
        film_uv = (xy + jitter) * inv_res
        xyz, c = trace_camera_sample(world, camera, settings, film_uv, sampling.fold(ks, 7))
        return (film + xyz, counters + c), None

    init = (jnp.zeros((n, 3), jnp.float32), prof.zeros())
    (film, counters), _ = jax.lax.scan(body, init, jnp.arange(chunk))
    return film, counters


def render_sampled(
    world,
    camera,
    settings: PTSettings,
    width: int,
    height: int,
    min_samples: int,
    key=None,
    sample_chunk: int = 8,
    progress=None,
    pixel_batch: int | None = None,
    checkpoint_path: str | None = None,
):
    """Render `min_samples` spp. Returns (film_xyz [H,W,3] sample-mean,
    Profile, elapsed_seconds). `pixel_batch` splits the film into ray
    batches (memory control for large films / HWSS)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    n_pix = width * height
    batch_n = pixel_batch or n_pix
    assert n_pix % batch_n == 0, "pixel_batch must divide the film"
    n_chunks = -(-min_samples // sample_chunk)
    film = jnp.zeros((n_pix, 3), jnp.float32)
    profile = Profile()
    counters_acc = prof.zeros()
    t0 = time.perf_counter()
    done = 0
    start_chunk = 0
    if checkpoint_path is not None and os.path.exists(checkpoint_path):
        ck = np.load(checkpoint_path)
        if int(ck["width"]) == width and int(ck["height"]) == height:
            film = jnp.asarray(ck["film"])
            counters_acc = jnp.asarray(ck["counters"])
            done = int(ck["done"])
            start_chunk = int(ck["chunk"])
    for c in range(start_chunk, n_chunks):
        this = min(sample_chunk, min_samples - done)
        for b in range(n_pix // batch_n):
            # fold the batch index too — identical keys across batches would
            # correlate the per-pixel samples between batches
            f, counters = _render_chunk(
                world, camera, sampling.fold(key, 1000 + c, b), settings, width, height,
                this, start=b * batch_n, batch_n=batch_n,
            )
            film = film.at[b * batch_n : (b + 1) * batch_n].add(f)
            counters_acc = counters_acc + counters
        done += this
        if checkpoint_path is not None:
            np.savez(checkpoint_path, film=np.asarray(film),
                     counters=np.asarray(counters_acc), done=done, chunk=c + 1,
                     width=width, height=height)
        if progress is not None:
            progress(done, min_samples)
    film = film / float(min_samples)
    # Profile value fetch = reliable sync on the axon tunnel
    profile.add_device_counts(counters_acc)
    elapsed = time.perf_counter() - t0
    return film.reshape(height, width, 3), profile, elapsed
