"""Multi-chip scale-out: film-tile data parallelism over a device mesh.

The reference is single-process (rayon work-stealing over tiles,
src/renderer/tiled.rs:325-420; crossbeam splat channel). The TPU-native
design shards the *film* (pixel axis) across an ICI mesh with `shard_map`:
each device traces its own pixel rows against the replicated World, and the
Profile counters are `psum`-reduced. No other communication is needed for
PT; LT/BDPT splat films are psum'd at the end of each round (scatter-add is
local, the film sum rides ICI).
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8 top-level API (experimental alias is deprecated)
    from jax import shard_map
    _SHARD_MAP_NEW = True
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
    _SHARD_MAP_NEW = False


def _shard_map(fn, mesh, in_specs, out_specs, check=False):
    if _SHARD_MAP_NEW:
        return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                         check_vma=check)
    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                     check_rep=check)

from pathtracer_tpu.core import sampling
from pathtracer_tpu.integrator.pt import PTSettings, trace_camera_sample
from pathtracer_tpu.utils.profile import Profile
from pathtracer_tpu.utils import profile as prof

TILE_AXIS = "tiles"


def make_render_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (TILE_AXIS,))


def render_chunk_sharded(world, camera, key, settings: PTSettings,
                         width: int, height: int, chunk: int, mesh: Mesh):
    """One jitted multi-device render chunk: film rows sharded over the
    mesh, world/camera replicated, counters psum-reduced.
    Returns (film [H*W, 3] sharded, counters [5] replicated)."""
    n = width * height
    n_dev = mesh.devices.size
    assert n % n_dev == 0, f"film pixels {n} must divide over {n_dev} devices"

    def local_chunk(pix_ids, world, camera, key):
        # pix_ids: this device's shard of pixel indices [N/D]
        me = jax.lax.axis_index(TILE_AXIS)
        kd = sampling.fold(key, me)
        xy = jnp.stack(
            [(pix_ids % width).astype(jnp.float32), (pix_ids // width).astype(jnp.float32)],
            axis=-1,
        )
        inv_res = jnp.array([1.0 / width, 1.0 / height], jnp.float32)

        def body(carry, i):
            film, counters = carry
            ks = sampling.fold(kd, i)
            jitter = jax.random.uniform(ks, (pix_ids.shape[0], 2))
            film_uv = (xy + jitter) * inv_res
            xyz, c = trace_camera_sample(world, camera, settings, film_uv, sampling.fold(ks, 7))
            return (film + xyz, counters + c), None

        init = jax.lax.pcast(
            (jnp.zeros((pix_ids.shape[0], 3), jnp.float32), prof.zeros()),
            (TILE_AXIS,),
            to="varying",
        )
        (film, counters), _ = jax.lax.scan(body, init, jnp.arange(chunk))
        return film, jax.lax.psum(counters, TILE_AXIS)

    fn = _shard_map(
        local_chunk,
        mesh=mesh,
        in_specs=(P(TILE_AXIS), P(), P(), P()),
        out_specs=(P(TILE_AXIS), P()),
        check=True,
    )
    pix = jax.device_put(
        jnp.arange(n, dtype=jnp.int32), NamedSharding(mesh, P(TILE_AXIS))
    )
    return jax.jit(fn, static_argnames=())(pix, world, camera, key)


def render_regen_sharded(world, camera, settings: PTSettings, width: int,
                         height: int, min_samples: int, mesh: Mesh, key=None):
    """Multi-device render using the production sample-regeneration
    integrator (integrator/pt_regen.py — the fast path): film pixels are
    sharded over the mesh, each device runs its own regen wavefront to
    completion, and Profile counters are psum-reduced.

    Returns (film [H,W,3] host-gathered, Profile, elapsed)."""
    from pathtracer_tpu.integrator.pt_regen import pt_trace_regen

    if key is None:
        key = jax.random.PRNGKey(0)
    n = width * height
    n_dev = mesh.devices.size
    assert n % n_dev == 0, f"film pixels {n} must divide over {n_dev} devices"
    per = n // n_dev

    def local(world, camera, key):
        me = jax.lax.axis_index(TILE_AXIS)
        kd = sampling.fold(key, me)
        acc, counters = pt_trace_regen(
            world, camera, settings, width, height, min_samples, kd,
            start=me * per, batch_n=per,
        )
        return acc / float(min_samples), jax.lax.psum(counters, TILE_AXIS)

    fn = jax.jit(_shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(TILE_AXIS), P()),
    ))
    t0 = time.perf_counter()
    film, counters = fn(world, camera, key)
    # Profile value fetch = reliable sync on the axon tunnel
    profile = Profile().add_device_counts(counters)
    elapsed = time.perf_counter() - t0
    return jnp.reshape(film, (height, width, 3)), profile, elapsed


def render_splatted_sharded(world, camera, settings, width: int, height: int,
                            min_samples: int, mesh: Mesh, key=None,
                            paths_per_device: int | None = None):
    """Multi-device light tracing: LIGHT PATHS are sharded over the mesh
    (each device walks its own particle population against the replicated
    World and scatter-adds into a local film), and the per-device splat
    films + Profile counters are `psum`-reduced over ICI — the TPU-native
    replacement for the reference's crossbeam splat channel
    (src/renderer/naive.rs:173-245).

    Returns (light_film [H,W,3] normalised, Profile, elapsed)."""
    from pathtracer_tpu.integrator.lt import lt_trace

    if key is None:
        key = jax.random.PRNGKey(0)
    n_pix = width * height
    n_dev = mesh.devices.size
    total_paths = n_pix * min_samples
    per_dev = paths_per_device or -(-total_paths // n_dev)

    def local(world, camera, key):
        me = jax.lax.axis_index(TILE_AXIS)
        kd = sampling.fold(key, me)
        film, counters = lt_trace(world, camera, settings, width, height,
                                  per_dev, kd)
        return (jax.lax.psum(film, TILE_AXIS),
                jax.lax.psum(counters, TILE_AXIS))

    fn = jax.jit(_shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(), P()),
    ))
    t0 = time.perf_counter()
    film, counters = fn(world, camera, key)
    # Profile value fetch = reliable sync on the axon tunnel
    profile = Profile().add_device_counts(counters)
    elapsed = time.perf_counter() - t0
    film = film * (float(n_pix) / float(per_dev * n_dev))
    return jnp.reshape(film, (height, width, 3)), profile, elapsed


def render_bdpt_sharded(world, camera, settings, width: int, height: int,
                        min_samples: int, mesh: Mesh, key=None, progress=None):
    """Multi-device BDPT: EYE PIXELS are sharded over the mesh (each device
    builds eye+light subpaths and runs the (s,t) connection matrix for its
    own film rows — connections are device-local), own-pixel contributions
    stay sharded, and the t=1 lens-splat films + Profile counters are
    `psum`-reduced over ICI (splats can land anywhere on the film). Fills
    SURVEY §2.14's scale-out row for the BDPT integrator (VERDICT r2 #6).

    Returns (film [H,W,3], Profile, elapsed)."""
    from pathtracer_tpu.core import cie
    from pathtracer_tpu.integrator.bdpt import bdpt_trace

    if key is None:
        key = jax.random.PRNGKey(0)
    n = width * height
    n_dev = mesh.devices.size
    assert n % n_dev == 0, f"film pixels {n} must divide over {n_dev} devices"
    span = settings.wavelength_bounds.span

    def local(pix_ids, world, camera, key):
        me = jax.lax.axis_index(TILE_AXIS)
        kd = sampling.fold(key, me)
        xy = jnp.stack([(pix_ids % width).astype(jnp.float32),
                        (pix_ids // width).astype(jnp.float32)], axis=-1)
        jitter = jax.random.uniform(sampling.fold(kd, 11), (pix_ids.shape[0], 2))
        film_uv = (xy + jitter) / jnp.array([width, height], jnp.float32)
        own, splat_uv, splat_e, lam, lam_splat, counters = bdpt_trace(
            world, camera, settings, film_uv, sampling.fold(kd, 13))
        film = cie.wavelength_to_xyz(lam, own) * span
        px = jnp.clip((splat_uv[:, 0] * width).astype(jnp.int32), 0, width - 1)
        py = jnp.clip((splat_uv[:, 1] * height).astype(jnp.int32), 0, height - 1)
        pid = py * width + px
        splat_xyz = cie.wavelength_to_xyz(lam_splat, splat_e) * span
        splat_film = jnp.zeros((n, 3)).at[pid].add(splat_xyz)
        return (film, jax.lax.psum(splat_film, TILE_AXIS),
                jax.lax.psum(counters, TILE_AXIS))

    fn = jax.jit(_shard_map(
        local,
        mesh=mesh,
        in_specs=(P(TILE_AXIS), P(), P(), P()),
        out_specs=(P(TILE_AXIS), P(), P()),
    ))
    pix = jax.device_put(jnp.arange(n, dtype=jnp.int32),
                         NamedSharding(mesh, P(TILE_AXIS)))
    film = jnp.zeros((n, 3))
    splats = jnp.zeros((n, 3))
    total = prof.zeros()
    t0 = time.perf_counter()
    for c in range(min_samples):
        f, sp, counters = fn(pix, world, camera, sampling.fold(key, 5000 + c))
        film = film + f
        splats = splats + sp
        total = total + counters
        if progress is not None:
            progress(c + 1, min_samples)
    # normalisation identical to renderer/bdpt_renderer.render_bdpt
    out = film / min_samples + splats * (1.0 / min_samples)
    profile = Profile().add_device_counts(total)
    elapsed = time.perf_counter() - t0
    return jnp.reshape(out, (height, width, 3)), profile, elapsed


def render_sampled_sharded(world, camera, settings: PTSettings, width: int,
                           height: int, min_samples: int, mesh: Mesh,
                           key=None, sample_chunk: int = 8, progress=None):
    """Multi-device render loop (render_sampled equivalent over a mesh)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    n_chunks = -(-min_samples // sample_chunk)
    film = None
    counters_acc = prof.zeros()
    profile = Profile()
    t0 = time.perf_counter()
    done = 0
    for c in range(n_chunks):
        this = min(sample_chunk, min_samples - done)
        f, counters = render_chunk_sharded(
            world, camera, sampling.fold(key, 2000 + c), settings, width, height, this, mesh
        )
        film = f if film is None else film + f
        counters_acc = counters_acc + counters
        done += this
        if progress is not None:
            progress(done, min_samples)
    film = (film / float(min_samples)).reshape(height, width, 3)
    # Profile value fetch = reliable sync on the axon tunnel
    profile.add_device_counts(counters_acc)
    elapsed = time.perf_counter() - t0
    return film, profile, elapsed
