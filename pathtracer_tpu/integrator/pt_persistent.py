"""Persistent-wavefront path tracer: full-occupancy sample regeneration.

The plain wavefront (integrator/pt.py) runs each sample batch until EVERY
lane terminates — with russian roulette most lanes die after 3-5 bounces
while the loop runs to max_bounces, wasting over half the VPU work on
masked lanes. This variant keeps a pool of N always-live lanes: whenever a
path terminates, its radiance is scatter-added to the film and the lane
immediately pulls the next (pixel, sample) from a global counter and spawns
a fresh camera ray. Occupancy stays ~100% until the tail drains — the
"persistent ray queues + stream compaction" design the survey targets
(SURVEY §2.14, BASELINE north star); compaction happens implicitly because
regenerated lanes reuse dead slots.

Shares every sampling/shading convention with pt.py (NEE + MIS, RR,
hero-wavelength lanes); media are not yet threaded through this variant —
use pt.py for medium_aware renders.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pathtracer_tpu.core import sampling, vecmath, cie
from pathtracer_tpu.integrator.pt import PTSettings, HWSS_LANES, _frame_arrays
from pathtracer_tpu.geometry import sample_surface
from pathtracer_tpu.materials import bsdf_eval, bsdf_sample, emission
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


def pt_trace_persistent(world: World, camera, settings: PTSettings,
                        width: int, height: int, total_samples: int, key,
                        pool_size: int | None = None):
    """Render `total_samples` paths (W·H·spp) with a persistent lane pool.
    Returns (film [H*W, 3] xyz sums — divide by spp, counters)."""
    assert not settings.medium_aware, "persistent mode is surface-only for now"
    n_pix = width * height
    n = pool_size or min(n_pix, 1 << 18)
    C = HWSS_LANES if settings.hwss else 1
    wb = settings.wavelength_bounds
    env_prob = jnp.clip(world.env_sampling_probability, 0.0, 1.0)
    have_lights = world.n_lights > 0
    p_env = jnp.where(have_lights, env_prob, 1.0)
    nee_enabled = settings.light_samples > 0
    inv_res = jnp.array([1.0 / width, 1.0 / height], jnp.float32)

    def mis_or_one(use_mis, pdf_a, pdf_b):
        w = power_heuristic(pdf_a, jnp.maximum(pdf_b, 0.0))
        return jnp.where(use_mis & (pdf_a + pdf_b > 0.0), w, 1.0)

    def lanes(x):
        return x.reshape(n, C)

    def rep(x):
        return jnp.repeat(x, C, axis=0)

    def spawn(sample_ids, rnd):
        """Fresh camera rays for sample indices (invalid ids masked later).
        rnd: f32[n, 5] fresh uniforms."""
        pix = (sample_ids % n_pix).astype(jnp.int32)
        xy = jnp.stack([(pix % width).astype(jnp.float32),
                        (pix // width).astype(jnp.float32)], axis=-1)
        film_uv = (xy + rnd[:, 0:2]) * inv_res
        o, d, tau = camera.get_ray(film_uv[:, 0], film_uv[:, 1], rnd[:, 2], rnd[:, 3])
        offs = jnp.arange(C, dtype=jnp.float32) / C
        lam = wb.lower + ((rnd[:, 4:5] + offs[None, :]) % 1.0) * wb.span
        return pix, o, d, lam, tau

    # initial pool
    k0 = sampling.fold(key, 0)
    rnd0 = jax.random.uniform(k0, (n, 5))
    ids0 = jnp.arange(n, dtype=jnp.int32)
    pix0, o0, d0, lam0, tau0 = spawn(ids0, rnd0)
    total = int(total_samples)

    n_u = 7 + 3 * max(settings.light_samples, 1) + 5

    def body(state):
        (rnd_i, next_id, pix, o, d, lam, beta, radiance, alive, bounce_ct,
         prev_pdf, film, counters, pdfr) = state
        # hero-wavelength spectral MIS (see pt.py body): pdfr lane c carries
        # the running p_c/p_0 pdf-ratio product; contributions scale by
        # C/sum(pdfr).
        if C > 1:
            s_mis = (C / jnp.sum(pdfr, axis=-1))[:, None]
        else:
            s_mis = 1.0
        kb = sampling.fold(key, rnd_i + 1)
        u = jax.random.uniform(kb, (n, n_u))
        lam_f = lam.reshape(-1)
        hr = world.intersect(
            o, d,
            jnp.full((n,), INTERSECTION_TIME_OFFSET, jnp.float32),
            jnp.full((n,), RAY_TMAX, jnp.float32),
        )
        # camera lens proxies absorb the path (MaterialId::Camera)
        at_surface = alive & hr.hit & (hr.mat_kind != 2)

        # ---- environment escape
        escaped = alive & ~hr.hit
        env_e = lanes(env_emission(world.env, world.bank, world.tex, rep(d), lam_f))
        env_nee_pdf = env_pdf_for(world.env, d) * p_env
        use_mis_env = (bounce_ct > 0) & nee_enabled & (p_env > 0.0)
        w_env = mis_or_one(use_mis_env, prev_pdf, env_nee_pdf)
        radiance = radiance + jnp.where(
            escaped[:, None], beta * s_mis * env_e * w_env[:, None], 0.0)
        counters = counters.at[prof.ENV_HITS].add(jnp.sum(escaped.astype(jnp.float32)))

        # ---- emissive hit
        wi_world = -d
        cos_at_light = vecmath.dot(hr.geo_normal, wi_world)
        mat_id = jnp.maximum(hr.material_id, 0)
        le = lanes(emission(world.mats, world.bank, rep(mat_id), lam_f,
                            rep(hr.uv), rep(cos_at_light)))
        pick_pdf = safe_div(1.0 - p_env, world.n_lights.astype(jnp.float32))
        hyp_nee_pdf = pick_pdf * safe_div(
            hr.t * hr.t,
            jnp.abs(cos_at_light) * world.prims.area[jnp.maximum(hr.prim_id, 0)],
        )
        use_mis_light = (bounce_ct > 0) & nee_enabled & have_lights
        w_light = mis_or_one(use_mis_light, prev_pdf, hyp_nee_pdf)
        is_light_hit = at_surface & (hr.mat_kind == 1)
        radiance = radiance + jnp.where(
            is_light_hit[:, None], beta * s_mis * le * w_light[:, None], 0.0
        )

        frame = vecmath.TangentFrame(*_frame_arrays(hr.normal))
        wi_local = frame.to_local(wi_world)

        # ---- NEE
        if nee_enabled:
            inv_ls = 1.0 / settings.light_samples
            for s_i in range(settings.light_samples):
                base = 7 + 3 * s_i
                chose_env, u_pick2 = sampling.choose(u[:, base], p_env)
                light_prim, lp_pdf = world.pick_random_light(u_pick2)
                lp, ln, area_pdf = sample_surface(world.prims, light_prim,
                                                  u[:, base + 1], u[:, base + 2])
                to_l = lp - hr.point
                dist2 = jnp.maximum(vecmath.length_squared(to_l), 1e-12)
                dist = jnp.sqrt(dist2)
                dir_l = to_l / dist[..., None]
                cos_l = vecmath.dot(ln, -dir_l)
                le_nee = lanes(emission(world.mats, world.bank,
                                        rep(world.prims.material_id[light_prim]),
                                        lam_f, rep(jnp.zeros((n, 2))), rep(cos_l)))
                sa_pdf_light = (1.0 - p_env) * lp_pdf * area_pdf * safe_div(
                    dist2, jnp.abs(cos_l))
                env_dir, env_pdf = env_sample_uv(world.env, u[:, base + 1], u[:, base + 2])
                sa_pdf_env = env_pdf * p_env
                le_env = lanes(env_emission(world.env, world.bank, world.tex,
                                            rep(env_dir), lam_f))
                nee_dir = jnp.where(chose_env[..., None], env_dir, dir_l)
                nee_pdf = jnp.where(chose_env, sa_pdf_env, sa_pdf_light)
                nee_le = jnp.where(chose_env[:, None], le_env, le_nee)
                nee_tmax = jnp.where(chose_env, RAY_TMAX, dist * 0.99)
                wo_local = frame.to_local(nee_dir)
                f_s, pdf_s = bsdf_eval(world.mats, world.bank, world.tex,
                                       rep(mat_id), lam_f, rep(hr.uv),
                                       rep(wi_local), rep(wo_local),
                                       TransportMode.Radiance)
                f_s, pdf_s = lanes(f_s), lanes(pdf_s)
                thr = f_s * jnp.abs(wo_local[..., 2])[:, None]
                worth = at_surface & (jnp.max(nee_le, -1) > 0.0) & (nee_pdf > 1e-12) & (
                    jnp.max(thr, -1) > 0.0)
                so = hr.point + hr.geo_normal * (
                    NORMAL_OFFSET * jnp.sign(vecmath.dot(hr.geo_normal, nee_dir) + 1e-9)
                )[..., None]
                blocked = world.intersect_any(
                    so, nee_dir,
                    jnp.full((n,), INTERSECTION_TIME_OFFSET, jnp.float32), nee_tmax)
                w_nee = mis_or_one(jnp.ones((n,), bool), nee_pdf, pdf_s[:, 0])
                contrib = (beta * s_mis * thr * nee_le
                           * safe_div(w_nee, nee_pdf)[:, None] * inv_ls)
                radiance = radiance + jnp.where((worth & ~blocked)[:, None], contrib, 0.0)
                counters = counters.at[prof.SHADOW_RAYS].add(
                    jnp.sum((at_surface & worth).astype(jnp.float32)))

        # ---- BSDF sampling (hero-driven)
        wo_local, f_h, f_pdf, ratio_hero = bsdf_sample(
            world.mats, world.bank, world.tex, mat_id, lam[:, 0], hr.uv,
            wi_local, u[:, 0], u[:, 1], u[:, 2], TransportMode.Radiance)
        if C > 1:
            f_lanes, p_lanes = bsdf_eval(world.mats, world.bank, world.tex,
                                   rep(mat_id), lam_f, rep(hr.uv),
                                   rep(wi_local), rep(wo_local),
                                   TransportMode.Radiance)
            f_lanes, p_lanes = lanes(f_lanes), lanes(p_lanes)
            # spectral-MIS pdf ratios p_c/p_0 at the sampled direction
            pscale = jnp.concatenate(
                [jnp.ones((n, 1)), safe_div(p_lanes, p_lanes[:, :1])[:, 1:]],
                axis=1)
            scale = safe_div(f_lanes, f_lanes[:, :1])
            ratio_stable = ratio_hero[:, None] * scale
            ratio_direct = safe_div(
                f_lanes * jnp.abs(wo_local[..., 2])[:, None], f_pdf[:, None])
            hero_dead = (f_lanes[:, :1] <= 0.0) & (f_pdf[:, None] > 1e-12)
            ratio_lanes = jnp.where(hero_dead, ratio_direct, ratio_stable)
            ratio_lanes = jnp.concatenate([ratio_hero[:, None], ratio_lanes[:, 1:]], 1)
        else:
            ratio_lanes = ratio_hero[:, None]
        ratio_best = jnp.max(ratio_lanes, axis=-1)
        sample_ok = (f_pdf > 1e-12) & (ratio_best > 0.0)
        if settings.russian_roulette:
            rr_on = bounce_ct >= settings.min_bounces
            p_cont = jnp.where(rr_on, jnp.clip(ratio_best, 0.05, 1.0), 1.0)
        else:
            p_cont = jnp.ones((n,))
        survive = u[:, 3] < p_cont
        beta_next = beta * jnp.where(sample_ok[:, None], ratio_lanes / p_cont[:, None], 0.0)
        hit_depth_cap = (bounce_ct + 1) >= settings.max_bounces
        direct_stop = settings.only_direct & (bounce_ct >= 1)
        continue_path = (at_surface & sample_ok & survive & ~hit_depth_cap
                         & ~direct_stop & jnp.all(jnp.isfinite(beta_next), -1))
        d_new = vecmath.normalize(frame.to_world(wo_local))
        o_new = hr.point + hr.geo_normal * (
            NORMAL_OFFSET * jnp.sign(vecmath.dot(hr.geo_normal, d_new)))[..., None]
        counters = counters.at[prof.BOUNCE_RAYS].add(
            jnp.sum(continue_path.astype(jnp.float32)))

        # ---- terminate + flush + regenerate
        died = alive & ~continue_path
        xyz = jnp.sum(cie.wavelength_to_xyz(lam, radiance), axis=1) * (wb.span / C)
        film = film.at[jnp.where(died, pix, 0)].add(
            jnp.where(died[:, None], xyz, 0.0))
        # assign new sample ids to dead slots (prefix-sum compaction)
        slot_rank = jnp.cumsum(died.astype(jnp.int32)) - 1
        new_ids = next_id + slot_rank
        has_work = died & (new_ids < total)
        rnd = jax.random.uniform(sampling.fold(key, rnd_i + 2), (n, 5))
        pix_s, o_s, d_s, lam_s, tau_s = spawn(new_ids, rnd)
        n_spawned = jnp.sum(has_work.astype(jnp.int32))
        counters = counters.at[prof.CAMERA_RAYS].add(n_spawned.astype(jnp.float32))

        pix = jnp.where(has_work, pix_s, pix)
        o = jnp.where(continue_path[:, None], o_new, jnp.where(has_work[:, None], o_s, o))
        d = jnp.where(continue_path[:, None], d_new, jnp.where(has_work[:, None], d_s, d))
        lam = jnp.where(has_work[:, None], lam_s, lam)
        beta = jnp.where(continue_path[:, None], beta_next,
                         jnp.where(has_work[:, None], tau_s[:, None] * jnp.ones((n, C)), beta))
        radiance = jnp.where((died)[:, None], 0.0, radiance)
        bounce_ct = jnp.where(continue_path, bounce_ct + 1,
                              jnp.where(has_work, 0, bounce_ct))
        prev_pdf = jnp.where(continue_path, f_pdf, jnp.where(has_work, 0.0, prev_pdf))
        if C > 1:
            pdfr = jnp.where(continue_path[:, None], pdfr * pscale,
                             jnp.where(has_work[:, None], 1.0, pdfr))
        alive = continue_path | has_work
        next_id = next_id + jnp.sum(died.astype(jnp.int32))
        return (rnd_i + 3, next_id, pix, o, d, lam, beta, radiance, alive,
                bounce_ct, prev_pdf, film, counters, pdfr)

    def cond(state):
        return jnp.any(state[8])

    zero1 = o0[:, 0] * 0.0
    film0 = jnp.zeros((n_pix, 3), jnp.float32) + jnp.sum(zero1) * 0.0
    counters0 = prof.zeros().at[prof.CAMERA_RAYS].add(float(n)) + jnp.sum(zero1)
    state0 = (
        jnp.int32(10), jnp.int32(n), pix0, o0, d0, lam0,
        tau0[:, None] * jnp.ones((n, C)),
        jnp.zeros((n, C)),
        (tau0 > 0.0) & (jnp.arange(n) < total),
        jnp.zeros((n,), jnp.int32),
        zero1,
        film0,
        counters0,
        jnp.ones((n, C)) + zero1[:, None] * 0.0,
    )
    state = jax.lax.while_loop(cond, body, state0)
    return state[11], state[12]
