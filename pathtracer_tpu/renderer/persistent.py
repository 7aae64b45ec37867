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
    # the Profile value fetch is the reliable sync on the axon tunnel
    # (block_until_ready returns before remote execution completes)
    profile = Profile().add_device_counts(counters)
    elapsed = time.perf_counter() - t0
    return jnp.reshape(film, (height, width, 3)), profile, elapsed


@partial(jax.jit, static_argnames=("settings", "width", "height", "spp", "start", "batch_n"))
def _regen_pass(world, camera, key, settings: PTSettings, width: int,
                height: int, spp: int, start: int = 0, batch_n: int | None = None):
    # `start` MUST be static: a traced pixel offset blocks XLA from
    # const-folding the lane->pixel mapping — measured 200x+ slower steps
    # AND 5x+ longer compiles on TPU. Batched renders pay one compile per
    # batch offset instead (rarely needed now the dense path covers
    # mid-size scenes).
    from pathtracer_tpu.integrator.pt_regen import pt_trace_regen

    acc, counters = pt_trace_regen(world, camera, settings, width, height, spp,
                                   key, start=start, batch_n=batch_n)
    return acc / float(spp), counters


@partial(jax.jit, static_argnames=("settings", "width", "height", "spp",
                                   "start", "batch_n"))
def _regen_init(world, camera, key, settings: PTSettings, width: int,
                height: int, spp: int, start: int, batch_n: int | None):
    from pathtracer_tpu.integrator.pt_regen import pt_trace_regen

    # max_rounds=0: the bounded while_loop exits immediately -> state0
    return pt_trace_regen(world, camera, settings, width, height, spp, key,
                          start=start, batch_n=batch_n, max_rounds=0,
                          return_state=True)


@partial(jax.jit, static_argnames=("settings", "width", "height", "spp",
                                   "start", "batch_n", "max_rounds"))
def _regen_advance(world, camera, key, settings: PTSettings, width: int,
                   height: int, spp: int, start: int, batch_n: int | None,
                   max_rounds: int, state):
    from pathtracer_tpu.integrator.pt_regen import pt_trace_regen

    st = pt_trace_regen(world, camera, settings, width, height, spp, key,
                        start=start, batch_n=batch_n, init_state=state,
                        max_rounds=max_rounds, return_state=True)
    return st, jnp.any(st[8])


def _regen_pass_stepped(world, camera, key, settings: PTSettings, width: int,
                        height: int, spp: int, start: int, batch_n: int,
                        rounds_per_dispatch: int, max_total_rounds: int = 1 << 20):
    """Chunked regen render: advance at most `rounds_per_dispatch` bounce
    rounds per dispatched program, carrying the full integrator state on
    device between dispatches. Exists because the axon tunnel's worker
    kills any SINGLE program that runs past its execution watchdog
    (two-level gather-heavy renders at mb=8 crashed after >900 s while the
    identical-shape mb=4 program passed — tools/two_level_bisect.py); the
    sample stream is identical to the one-dispatch render by construction
    (the uniform cursor rides the carry)."""
    import numpy as np

    st = _regen_init(world, camera, key, settings, width, height, spp,
                     start, batch_n)
    it = 0
    alive_last = False
    while it < max_total_rounds:
        st, alive = _regen_advance(world, camera, key, settings, width,
                                   height, spp, start, batch_n,
                                   rounds_per_dispatch, st)
        it += rounds_per_dispatch
        # forced host fetch: the reliable sync + dispatch pacing on the
        # tunnel (block_until_ready returns before remote execution ends)
        alive_last = bool(np.asarray(alive))
        if not alive_last:
            break
    if alive_last:
        # the backstop tripped with live lanes: the accumulator is
        # under-sampled but still divided by full spp below — loudly wrong
        # beats silently dark (practically unreachable at the 1<<20 default)
        import logging

        from pathtracer_tpu.utils.logging import warn_once

        warn_once(logging.getLogger("pathtracer_tpu.renderer"),
                  "regen_stepped_backstop",
                  "stepped regen hit max_total_rounds=%d with lanes still "
                  "alive; film is under-sampled", max_total_rounds)
    return st[6] / float(spp), st[12]


def render_regen(world, camera, settings: PTSettings, width: int, height: int,
                 min_samples: int, key=None, pixel_batch: int | None = None,
                 use_megakernel: bool | None = None):
    """Fixed-pixel sample-regeneration renderer (integrator/pt_regen.py):
    high occupancy with no scatters. Returns (film [H,W,3], Profile, elapsed).

    When the scene/settings fit the Pallas megakernel's gate
    (kernels/megakernel.mega_available) the per-bounce body runs as
    Mosaic-compiled kernels instead of the XLA program (same estimator,
    ~10x the throughput on TPU); set use_megakernel=False or
    PT_NO_MEGAKERNEL=1 to force the XLA path."""
    import os

    if key is None:
        key = jax.random.PRNGKey(0)
    if use_megakernel is None:
        use_megakernel = not os.environ.get("PT_NO_MEGAKERNEL")
    # Mosaic kernels only compile for real TPU backends; CPU runs (tests,
    # cpu-only boxes) use the XLA path
    if jax.devices()[0].platform not in ("tpu", "axon"):
        use_megakernel = False
    if use_megakernel:
        from pathtracer_tpu.kernels.megakernel import (
            mega_available,
            pt_trace_regen_mega,
        )

        if mega_available(world, camera, settings):
            t0 = time.perf_counter()
            n_pix = width * height
            batch_n = pixel_batch or n_pix
            # lane replicas: regen leaves the wavefront dispatch-bound
            # (bounce rounds scale with per-lane spp, not lanes); spawn R
            # lanes per pixel at spp/R each — same compute, 1/R the rounds
            # (kernels/megakernel.py docstring). The lane budget is HBM-
            # cheap (state is 32 rows × 4 B/lane ≈ 128 MB at 1M lanes), so
            # PT_MEGA_REPLICAS / PT_MEGA_MAX_LANES exist to push full-film
            # 1080p renders (2.07M lanes) into the replica regime too.
            import os as _os

            replicas = 1
            forced = _os.environ.get("PT_MEGA_REPLICAS")
            max_lanes = int(_os.environ.get("PT_MEGA_MAX_LANES", "1100000"))
            if forced and min_samples % int(forced) == 0:
                replicas = max(int(forced), 1)
            elif pixel_batch is None:
                for cand in (8, 4, 2):
                    if min_samples % cand == 0 and n_pix * cand <= max_lanes:
                        replicas = cand
                        break
            films, counters_total = [], None
            from pathtracer_tpu.core import sampling as _sampling

            for b in range(n_pix // batch_n):
                acc, c = pt_trace_regen_mega(
                    world, camera, settings, width, height, min_samples,
                    _sampling.fold(key, 77 + b), start=b * batch_n,
                    batch_n=batch_n, replicas=replicas)
                films.append(acc / float(min_samples))
                counters_total = c if counters_total is None else counters_total + c
            film = jnp.concatenate(films, axis=0)
            profile = Profile().add_device_counts(counters_total)
            elapsed = time.perf_counter() - t0
            return jnp.reshape(film, (height, width, 3)), profile, elapsed
    n_pix = width * height
    batch_n = pixel_batch or n_pix
    # auto-batch large XLA-path wavefronts: full-film 1M+-lane programs for
    # mesh scenes crash the tunnel's TPU worker (round-2 gem finding);
    # 583k-lane batches run reliably. Mega-path renders above never hit
    # this (their lane count rides the kernel grid, not one XLA program).
    # Two-level scenes batch 4x smaller: lockstep traversal cost per round
    # is set by the WORST lane (deep TIR chains walk ~29k BVH steps) and
    # each step's gather cost scales with lanes, so smaller batches keep
    # each stepped dispatch well under the worker's execution watchdog.
    lane_cap = 131_072 if getattr(world, "accel2", None) is not None \
        else 583_200
    if pixel_batch is None and n_pix > lane_cap and \
            jax.devices()[0].platform in ("tpu", "axon"):
        for cand in (2, 3, 4, 5, 6, 8, 12, 16, 24, 32):
            if n_pix % cand == 0 and n_pix // cand <= lane_cap:
                batch_n = n_pix // cand
                break
        else:
            # awkward film factorization: a full-size batch would run each
            # dispatch far past the calibrated per-round cost (watchdog
            # risk on two-level scenes) — say so instead of silently risking
            # the worker
            import logging

            from pathtracer_tpu.utils.logging import warn_once

            warn_once(logging.getLogger("pathtracer_tpu.renderer"),
                      "regen_batch_divisor",
                      "no divisor in (2..32) fits %d pixels under the %d-"
                      "lane cap; running full-size dispatches",
                      n_pix, lane_cap)
    assert n_pix % batch_n == 0
    t0 = time.perf_counter()
    films = []
    counters_total = None
    import jax.numpy as _jnp
    from pathtracer_tpu.core import sampling as _sampling

    # bounded-dispatch stepping: two-level (TLAS/BLAS) renders are
    # gather-heavy enough that a full render in ONE dispatch outlives the
    # tunnel's execution watchdog and kills the worker; chunk them into
    # PT_STEP_ROUNDS-round programs (sample stream unchanged). Opt-in for
    # other scenes via the same env var.
    _step_env = os.environ.get("PT_STEP_ROUNDS")
    step_rounds = max(int(_step_env), 0) if _step_env is not None else 0
    if _step_env is None and getattr(world, "accel2", None) is not None and \
            jax.devices()[0].platform in ("tpu", "axon"):
        # ~20-45 s/round at 131k lanes on worst-lane-bound scenes; 2 rounds
        # keeps each dispatch an order of magnitude under the watchdog
        # (16-round dispatches at 262k lanes still crashed the worker)
        step_rounds = 2
    for b in range(n_pix // batch_n):
        if step_rounds > 0:
            f, c = _regen_pass_stepped(world, camera,
                                       _sampling.fold(key, 77 + b), settings,
                                       width, height, min_samples,
                                       b * batch_n, batch_n, step_rounds)
        else:
            f, c = _regen_pass(world, camera, _sampling.fold(key, 77 + b),
                               settings, width, height, min_samples,
                               start=b * batch_n, batch_n=batch_n)
        films.append(f)
        counters_total = c if counters_total is None else counters_total + c
    film = _jnp.concatenate(films, axis=0)
    # Profile value fetch = reliable sync (see render_persistent note)
    profile = Profile().add_device_counts(counters_total)
    elapsed = time.perf_counter() - t0
    return _jnp.reshape(film, (height, width, 3)), profile, elapsed
