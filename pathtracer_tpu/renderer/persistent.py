"""Persistent-wavefront renderer driver (full-occupancy production path)."""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp

from pathtracer_tpu.integrator.pt import PTSettings
from pathtracer_tpu.integrator.pt_persistent import pt_trace_persistent
from pathtracer_tpu.utils.profile import Profile


@partial(jax.jit, static_argnames=("settings", "width", "height", "spp", "pool_size"))
def _persistent_pass(world, camera, key, settings: PTSettings, width: int,
                     height: int, spp: int, pool_size: int | None):
    film, counters = pt_trace_persistent(
        world, camera, settings, width, height, width * height * spp, key,
        pool_size=pool_size,
    )
    return film / float(spp), counters


def render_persistent(world, camera, settings: PTSettings, width: int,
                      height: int, min_samples: int, key=None,
                      pool_size: int | None = None):
    """Render min_samples spp in ONE persistent pass.
    Returns (film [H,W,3], Profile, elapsed)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    film, counters = _persistent_pass(
        world, camera, key, settings, width, height, min_samples, pool_size
    )
    film.block_until_ready()
    elapsed = time.perf_counter() - t0
    profile = Profile().add_device_counts(counters)
    return jnp.reshape(film, (height, width, 3)), profile, elapsed
