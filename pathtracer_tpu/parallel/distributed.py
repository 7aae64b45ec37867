"""Multi-host scale-out: jax.distributed over DCN (SURVEY §5 / §2.14).

The reference is single-process (no distributed backend,
src/renderer/naive.rs — rayon + crossbeam only), so this layer is a
TPU-native design with no upstream semantics to match beyond determinism of
the summed film: each HOST drives its local chips; the film rides the
global mesh's pixel axis so intra-host traffic stays on ICI and only the
psum'd Profile counters + the final film gather cross DCN.

Usage on each host of an N-host slice:

    from pathtracer_tpu.parallel import distributed as dist
    dist.init_distributed(coordinator="host0:1234",
                          num_processes=N, process_id=k)
    mesh = dist.make_global_render_mesh()
    film, profile, _ = dist.render_regen_multihost(
        world, camera, settings, W, H, spp, mesh)

Single-process calls are the degenerate case (init is a no-op, the global
mesh == the local mesh), which is how the test suite exercises this path.
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pathtracer_tpu.core import sampling
from pathtracer_tpu.parallel.mesh import TILE_AXIS, _shard_map
from pathtracer_tpu.utils.profile import Profile


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialise the multi-host runtime (DCN coordination). Returns True
    when a multi-process runtime is active. With no arguments in a
    single-process environment this is a no-op returning False."""
    if num_processes is None or num_processes <= 1:
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_global_render_mesh() -> Mesh:
    """1-D mesh over EVERY device in the slice (all hosts). With
    jax.distributed initialised, jax.devices() spans hosts and shard_map
    computations coordinate over DCN automatically."""
    return Mesh(np.array(jax.devices()), (TILE_AXIS,))


def render_regen_multihost(world, camera, settings, width: int, height: int,
                           min_samples: int, mesh: Mesh, key=None):
    """Film-pixel data parallelism over the global (possibly multi-host)
    mesh: each device runs the production regen integrator on its pixel
    rows; Profile counters psum over ICI+DCN; the film is gathered to every
    host (process_allgather) so any host can write outputs.

    Returns (film [H,W,3] as a host numpy array, Profile, elapsed)."""
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
        local, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(TILE_AXIS), P()),
    ))
    t0 = time.perf_counter()
    film, counters = fn(world, camera, key)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        film_np = np.asarray(multihost_utils.process_allgather(
            film, tiled=True))
    else:
        film_np = np.asarray(film)
    profile = Profile().add_device_counts(counters)
    elapsed = time.perf_counter() - t0
    return film_np.reshape(height, width, 3), profile, elapsed
