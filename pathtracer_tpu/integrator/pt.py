"""Wavefront spectral path tracer with NEE + MIS and participating media.

Capability parity with the reference's PathTracingIntegrator + random_walk +
random_walk_medium (src/integrator/pt.rs:397-614, src/integrator/
utils.rs:152-376,708-1103), re-designed as a fixed-shape wavefront: one λ
per sample, a `lax.while_loop` over bounce rounds with masked lanes (dead
rays idle — on TPU masking a converged lane is cheaper than compaction
until occupancy drops far), NEE shadow rays batched per round, balance-
heuristic MIS between BSDF sampling and next-event estimation (instance
lights ∪ environment).

Medium-aware mode (settings.medium_aware): each ray tracks its current
medium id (the reference keeps a sorted `tracked_mediums` stack,
utils.rs:940-1005; the wavefront carries the innermost id — equivalent for
non-overlapping media). Per round: sample a free-flight distance against
σ_s; if it beats the surface hit the lane scatters in-medium via the phase
function, else the surface interaction runs and transmissive boundaries
swap the tracked id. Either way β *= e^{-σ_a·t} (σ_s cancels against the
exponential-sampling pdf).

Transport-mode note: camera paths here use TransportMode.Radiance (PBRT
convention — refraction applies the Veach 5.2.2.1 η² factor); the reference
labels the same camera-path mode "Importance" — physics identical, label
flipped.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from pathtracer_tpu.core import sampling, vecmath, cie
from pathtracer_tpu.core.bounds import Bounds1D, BOUNDED_VISIBLE_RANGE
from pathtracer_tpu.geometry import intersect_dense, intersect_any_dense, sample_surface
from pathtracer_tpu.materials import bsdf_eval, bsdf_sample, emission
from pathtracer_tpu.mediums.tables import medium_coefficients, phase_eval, phase_sample
from pathtracer_tpu.prelude import (
    INTERSECTION_TIME_OFFSET,
    NORMAL_OFFSET,
    RAY_TMAX,
    TransportMode,
    power_heuristic,
    safe_div,
)
from pathtracer_tpu.utils import profile as prof
from pathtracer_tpu.world.environment import env_emission, env_pdf_for, env_sample_uv
from pathtracer_tpu.world.world import World


@dataclasses.dataclass(frozen=True)
class PTSettings:
    """Static per-render integrator settings (mirrors RenderSettings +
    IntegratorKind::PT, src/parsing/config.rs:45-148)."""

    max_bounces: int = 8
    min_bounces: int = 1  # russian-roulette start index
    light_samples: int = 1
    russian_roulette: bool = True
    only_direct: bool = False
    medium_aware: bool = False
    wavelength_bounds: Bounds1D = BOUNDED_VISIBLE_RANGE


def pt_trace(world: World, settings: PTSettings, o0, d0, lam, key):
    """Trace one wavefront of camera rays to completion.

    o0, d0: f32[N,3] camera rays; lam: f32[N] sampled wavelengths;
    key: PRNG key for the walk. Returns (energy f32[N], counters f32[5]).
    Energy is spectral radiance at λ — callers convert via CIE and the λ-pdf.
    """
    n = o0.shape[0]
    env_prob = jnp.clip(world.env_sampling_probability, 0.0, 1.0)
    have_lights = world.n_lights > 0
    # NEE picks the environment with env_prob (or always, if no lights exist)
    p_env = jnp.where(have_lights, env_prob, 1.0)
    nee_enabled = settings.light_samples > 0
    medium_aware = settings.medium_aware

    def mis_or_one(use_mis, pdf_a, pdf_b):
        w = power_heuristic(pdf_a, jnp.maximum(pdf_b, 0.0))
        return jnp.where(use_mis & (pdf_a + pdf_b > 0.0), w, 1.0)

    def body(state):
        (bounce, o, d, beta, radiance, alive, prev_pdf, cur_med, counters) = state
        kb = sampling.fold(key, bounce)
        u = jax.random.uniform(kb, (n, 7 + 3 * max(settings.light_samples, 1)))
        hr = world.intersect(
            o, d,
            jnp.full((n,), INTERSECTION_TIME_OFFSET, jnp.float32),
            jnp.full((n,), RAY_TMAX, jnp.float32),
        )

        # ---- free-flight sampling in the tracked medium (utils.rs:767-805)
        if medium_aware:
            sigma_s, sigma_a, _ = medium_coefficients(world.mediums, world.bank, cur_med, lam)
            flight = jnp.where(
                sigma_s > 1e-12,
                -jnp.log(jnp.maximum(1.0 - u[:, 4], 1e-12)) / jnp.maximum(sigma_s, 1e-12),
                jnp.inf,
            )
            surf_t = jnp.where(hr.hit, hr.t, RAY_TMAX)
            scattered = alive & (flight < surf_t)
            travel = jnp.minimum(flight, surf_t)
            # σ_s cancels against the sampling pdf; absorption survives
            beta = beta * jnp.where(
                alive & (cur_med != 0), jnp.exp(-sigma_a * jnp.minimum(travel, 1e8)), 1.0
            )
        else:
            scattered = jnp.zeros((n,), bool)

        at_surface = alive & hr.hit & ~scattered

        # ---- environment escape (utils.rs:344-373 + pt.rs:487-511)
        escaped = alive & ~hr.hit & ~scattered
        env_e = env_emission(world.env, world.bank, world.tex, d, lam)
        env_nee_pdf = env_pdf_for(world.env, d) * p_env
        use_mis_env = (bounce > 0) & nee_enabled & (p_env > 0.0)
        w_env = mis_or_one(use_mis_env, prev_pdf, env_nee_pdf)
        radiance = radiance + jnp.where(escaped, beta * env_e * w_env, 0.0)
        counters = counters.at[prof.ENV_HITS].add(jnp.sum(escaped.astype(jnp.float32)))
        alive = alive & (hr.hit | scattered)

        # ---- emissive hit (pt.rs:512-560)
        wi_world = -d
        cos_at_light = vecmath.dot(hr.geo_normal, wi_world)
        le = emission(world.mats, world.bank, jnp.maximum(hr.material_id, 0), lam, hr.uv, cos_at_light)
        pick_pdf = safe_div(1.0 - p_env, world.n_lights.astype(jnp.float32))
        hyp_nee_pdf = pick_pdf * safe_div(
            hr.t * hr.t, jnp.abs(cos_at_light) * world.prims.area[jnp.maximum(hr.prim_id, 0)]
        )
        use_mis_light = (bounce > 0) & nee_enabled & have_lights
        w_light = mis_or_one(use_mis_light, prev_pdf, hyp_nee_pdf)
        is_light_hit = at_surface & (hr.mat_kind == 1)
        radiance = radiance + jnp.where(is_light_hit, beta * le * w_light, 0.0)

        if settings.only_direct:
            # direct-only: bsdf-hit emission at bounce 1 was just added; stop
            alive = alive & (bounce < 1)

        # ---- local frame at the hit / scatter point
        frame = vecmath.TangentFrame(*_frame_arrays(hr.normal))
        wi_local = frame.to_local(wi_world)
        if medium_aware:
            scatter_p = o + travel[..., None] * d
            point = jnp.where(scattered[..., None], scatter_p, hr.point)
        else:
            point = hr.point

        # ---- next-event estimation (pt.rs:333-393, estimate_direct)
        if nee_enabled:
            inv_ls = 1.0 / settings.light_samples
            for s in range(settings.light_samples):
                u_pick = u[:, 7 + 3 * s]
                u1 = u[:, 8 + 3 * s]
                u2 = u[:, 9 + 3 * s]
                chose_env, u_pick2 = sampling.choose(u_pick, p_env)
                # instance-light branch
                light_prim, lp_pdf = world.pick_random_light(u_pick2)
                lp, ln, area_pdf = sample_surface(world.prims, light_prim, u1, u2)
                to_l = lp - point
                dist2 = jnp.maximum(vecmath.length_squared(to_l), 1e-12)
                dist = jnp.sqrt(dist2)
                dir_l = to_l / dist[..., None]
                cos_l = vecmath.dot(ln, -dir_l)
                le_nee = emission(
                    world.mats, world.bank, world.prims.material_id[light_prim], lam,
                    jnp.zeros((n, 2)), cos_l,
                )
                sa_pdf_light = (1.0 - p_env) * lp_pdf * area_pdf * safe_div(
                    dist2, jnp.abs(cos_l)
                )
                # environment branch
                env_dir, env_pdf = env_sample_uv(world.env, u1, u2)
                sa_pdf_env = env_pdf * p_env
                le_env = env_emission(world.env, world.bank, world.tex, env_dir, lam)

                nee_dir = jnp.where(chose_env[..., None], env_dir, dir_l)
                nee_pdf = jnp.where(chose_env, sa_pdf_env, sa_pdf_light)
                nee_le = jnp.where(chose_env, le_env, le_nee)
                # 1% end margin keeps the sampled light itself (and the
                # origin offset) outside the occlusion interval — the
                # reference's veach_v uses the same tmax*0.99 slack
                # (src/integrator/utils.rs:136-146)
                nee_tmax = jnp.where(chose_env, RAY_TMAX, dist * 0.99)

                wo_local = frame.to_local(nee_dir)
                f_surf, pdf_surf = bsdf_eval(
                    world.mats, world.bank, world.tex,
                    jnp.maximum(hr.material_id, 0), lam, hr.uv,
                    wi_local, wo_local, TransportMode.Radiance,
                )
                thr_surf = f_surf * jnp.abs(wo_local[..., 2])
                if medium_aware:
                    # phase angle is between the propagation direction d and
                    # the outgoing NEE direction
                    ph = phase_eval(
                        world.mediums, world.bank, cur_med, lam,
                        vecmath.dot(d, nee_dir),
                    )
                    thr = jnp.where(scattered, ph, thr_surf)
                    fwd_pdf = jnp.where(scattered, ph, pdf_surf)
                else:
                    thr = thr_surf
                    fwd_pdf = pdf_surf
                worth = alive & (nee_le > 0.0) & (nee_pdf > 1e-12) & (thr > 0.0)
                offset_n = jnp.where(
                    scattered[..., None], jnp.zeros_like(hr.geo_normal), hr.geo_normal
                )
                so = point + offset_n * (
                    NORMAL_OFFSET * jnp.sign(vecmath.dot(offset_n, nee_dir) + 1e-9)
                )[..., None]
                blocked = world.intersect_any(
                    so, nee_dir,
                    jnp.full((n,), INTERSECTION_TIME_OFFSET, jnp.float32),
                    nee_tmax,
                )
                visible = ~blocked
                if medium_aware:
                    # transmittance of the tracked medium along the shadow ray
                    tr_dist = jnp.where(chose_env, 2.0 * world.radius, dist)
                    tr = jnp.where(
                        cur_med != 0,
                        jnp.exp(-(sigma_s + sigma_a) * jnp.minimum(tr_dist, 1e8)),
                        1.0,
                    )
                else:
                    tr = 1.0
                w_nee = mis_or_one(jnp.ones((n,), bool), nee_pdf, fwd_pdf)
                contrib = beta * thr * nee_le * tr * safe_div(w_nee, nee_pdf) * inv_ls
                radiance = radiance + jnp.where(worth & visible, contrib, 0.0)
                counters = counters.at[prof.SHADOW_RAYS].add(
                    jnp.sum((alive & worth).astype(jnp.float32))
                )

        # ---- BSDF / phase sampling + throughput update (utils.rs:214-321)
        wo_local, f, f_pdf, ratio_surf = bsdf_sample(
            world.mats, world.bank, world.tex,
            jnp.maximum(hr.material_id, 0), lam, hr.uv,
            wi_local, u[:, 0], u[:, 1], u[:, 2], TransportMode.Radiance,
        )
        d_surf = vecmath.normalize(frame.to_world(wo_local))
        if medium_aware:
            wo_med, ph_pdf = phase_sample(
                world.mediums, world.bank, cur_med, lam, d, u[:, 5], u[:, 6]
            )
            # HG/Rayleigh samplers have pdf == phase value -> weight 1
            ratio = jnp.where(scattered, 1.0, ratio_surf)
            f_pdf = jnp.where(scattered, ph_pdf, f_pdf)
            d_new = jnp.where(scattered[..., None], wo_med, d_surf)
        else:
            ratio = ratio_surf
            d_new = d_surf
        sample_ok = scattered | ((f_pdf > 1e-12) & (ratio > 0.0))
        # russian roulette with continue-prob min(throughput gain, 1)
        # (utils.rs:266-276)
        if settings.russian_roulette:
            rr_on = bounce >= settings.min_bounces
            p_cont = jnp.where(rr_on, jnp.clip(ratio, 0.05, 1.0), 1.0)
        else:
            p_cont = jnp.ones((n,), jnp.float32)
        survive = u[:, 3] < p_cont
        beta = beta * jnp.where(sample_ok, ratio / p_cont, 0.0)
        alive = alive & sample_ok & survive & jnp.isfinite(beta)

        o_new = jnp.where(
            scattered[..., None],
            point,
            hr.point + hr.geo_normal * (
                NORMAL_OFFSET * jnp.sign(vecmath.dot(hr.geo_normal, d_new))
            )[..., None],
        )
        # ---- medium boundary transitions (utils.rs:940-1005)
        if medium_aware:
            crossed = at_surface & (wo_local[..., 2] * wi_local[..., 2] < 0.0)
            entering = wo_local[..., 2] < 0.0
            mat = jnp.maximum(hr.material_id, 0)
            new_med = jnp.where(
                entering, world.mats.inner_medium[mat], world.mats.outer_medium[mat]
            )
            cur_med = jnp.where(crossed, new_med, cur_med)
        counters = counters.at[prof.BOUNCE_RAYS].add(jnp.sum(alive.astype(jnp.float32)))
        return (
            bounce + 1,
            jnp.where(alive[..., None], o_new, o),
            jnp.where(alive[..., None], d_new, d),
            beta,
            radiance,
            alive,
            jnp.where(alive, f_pdf, prev_pdf),
            cur_med,
            counters,
        )

    def cond(state):
        bounce = state[0]
        alive = state[5]
        return (bounce < settings.max_bounces) & jnp.any(alive)

    # init state derived from the varying inputs (shard_map VMA-compatible)
    zero = o0[:, 0] * 0.0 + lam * 0.0
    counters0 = prof.zeros().at[prof.CAMERA_RAYS].add(float(n)) + jnp.sum(zero)
    state0 = (
        jnp.int32(0),
        o0,
        d0,
        zero + 1.0,
        zero,
        zero < 1.0,
        zero,
        zero.astype(jnp.int32),
        counters0,
    )
    state = jax.lax.while_loop(cond, body, state0)
    radiance = state[4]
    counters = state[8]
    return radiance, counters


def _frame_arrays(normal):
    t, b = vecmath.orthonormal_basis(normal)
    return t, b, normal


def trace_camera_sample(world, camera, settings: PTSettings, film_uv, key):
    """One full PT sample for a wavefront of film points: sample λ, generate
    the lens ray, walk, convert to XYZ (pt.rs color() equivalent).
    film_uv: f32[N,2]. Returns (xyz f32[N,3], counters)."""
    n = film_uv.shape[0]
    k_lam, k_lens, k_walk = jax.random.split(key, 3)
    wb = settings.wavelength_bounds
    lam = wb.sample(jax.random.uniform(k_lam, (n,)))
    ul = jax.random.uniform(k_lens, (n, 2))
    o, d, tau = camera.get_ray(film_uv[:, 0], film_uv[:, 1], ul[:, 0], ul[:, 1])
    energy, counters = pt_trace(world, settings, o, d, lam, k_walk)
    # MC estimator of ∫ L(λ) x̄(λ) dλ with uniform λ-pdf 1/span; tau carries
    # camera-ray weight (0 = vignetted by a lens assembly)
    xyz = cie.wavelength_to_xyz(lam, energy * tau) * wb.span
    return xyz, counters
