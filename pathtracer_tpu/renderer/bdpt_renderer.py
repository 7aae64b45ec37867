"""BDPT render loop: own-pixel contributions + lens splats combined into one
film (the reference's commented BDPT plumbing in src/renderer/naive.rs:548-618)."""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp

from pathtracer_tpu.core import sampling, cie
from pathtracer_tpu.integrator.bdpt import BDPTSettings, bdpt_trace
from pathtracer_tpu.utils.profile import Profile


# film-point budget per inner call, scaled by strategy count: the batched
# passes build [n·P] lanes (P ≈ max_depth² pairs), so a full 512² film at
# md=6 materializes 7.9M-lane temps and OOMs the 16G HBM — but
# over-chunking costs throughput (md=4 at 64k chunks measured 8.5 vs the
# full-film 13+ Mrays/s: per-chunk dispatch + underfilled sweeps). Cap
# n_chunk·P at ~8M lanes: md=4 keeps the full 512² film in one call,
# md=6 splits it in two.
BDPT_LANE_BUDGET = 1 << 23


@partial(jax.jit, static_argnames=("settings", "width", "height", "n_chunk"))
def _bdpt_chunk(world, camera, key, start, settings: BDPTSettings, width: int,
                height: int, n_chunk: int):
    n = width * height
    ids = start + jnp.arange(n_chunk, dtype=jnp.int32)
    xy = jnp.stack([(ids % width).astype(jnp.float32), (ids // width).astype(jnp.float32)], axis=-1)
    jitter = jax.random.uniform(sampling.fold(key, 11), (n_chunk, 2))
    film_uv = (xy + jitter) / jnp.array([width, height], jnp.float32)
    own, splat_uv, splat_e, lam, lam_splat, counters = bdpt_trace(
        world, camera, settings, film_uv, sampling.fold(key, 13)
    )
    span = settings.wavelength_bounds.span
    own_xyz = cie.wavelength_to_xyz(lam, own) * span
    film = jnp.zeros((n, 3)).at[ids].add(own_xyz)
    # splats: scatter-add into the film (×W·H handled by caller's normalise)
    px = jnp.clip((splat_uv[:, 0] * width).astype(jnp.int32), 0, width - 1)
    py = jnp.clip((splat_uv[:, 1] * height).astype(jnp.int32), 0, height - 1)
    pid = py * width + px
    splat_xyz = cie.wavelength_to_xyz(lam_splat, splat_e) * span
    splat_film = jnp.zeros((n, 3)).at[pid].add(splat_xyz)
    return film, splat_film, counters


def render_bdpt(world, camera, settings: BDPTSettings, width: int, height: int,
                min_samples: int, key=None, progress=None):
    """Returns (film [H,W,3], Profile, elapsed)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    n = width * height
    film = jnp.zeros((n, 3))
    splats = jnp.zeros((n, 3))
    total = None
    t0 = time.perf_counter()
    p_est = max(settings.max_depth * settings.max_depth, 1)
    n_chunks = max(-(-(n * p_est) // BDPT_LANE_BUDGET), 1)
    n_chunk = -(-n // n_chunks)
    for c in range(min_samples):
        for start in range(0, n, n_chunk):
            f, sp, counters = _bdpt_chunk(
                world, camera, sampling.fold(key, 5000 + c * 7919 + start),
                jnp.int32(start), settings, width, height,
                min(n_chunk, n - start))
            film = film + f
            splats = splats + sp
            total = counters if total is None else total + counters
        if progress is not None:
            progress(c + 1, min_samples)
    # own-pixel terms average per sample; splats are film-wide measurements:
    # ×(W·H) per-pixel factor, averaged over the N·spp light subpaths
    out = film / min_samples + splats * (float(n) / (n * min_samples))
    # Profile value fetch = reliable sync on the axon tunnel
    profile = Profile().add_device_counts(total)
    elapsed = time.perf_counter() - t0
    return jnp.reshape(out, (height, width, 3)), profile, elapsed
