"""Wavefront spectral path tracer: NEE + MIS, participating media, and
hero-wavelength spectral sampling (HWSS).

Capability parity with the reference's PathTracingIntegrator + random_walk +
random_walk_medium + the dormant random_walk_hero
(src/integrator/pt.rs:397-614, src/integrator/utils.rs:152-376,377-602,
708-1103), re-designed as a fixed-shape wavefront: a `lax.while_loop` over
bounce rounds with masked lanes, NEE shadow rays batched per round,
balance-heuristic MIS between BSDF sampling and next-event estimation.

HWSS (settings.hwss): each ray carries C=4 wavelengths [N,C] — the hero λ
plus equally-rotated companions. All *decisions* (BSDF direction, RR,
free-flight) use the hero; spectral quantities (β, radiance, σ, emission,
Fresnel) are per-lane. Lane throughput after a hero-sampled bounce is
ratio_hero · f_i/f_hero — exact single-sample weighting that collapses to
the hero alone under dispersion (the reference's hero divide-out pattern,
utils.rs:790-805). This cuts the CIE-integration variance ~4× per sample
for the cost of extra BSDF evals (geometry is shared).

Medium-aware mode: each ray tracks its innermost medium id (the reference
keeps a stack, utils.rs:940-1005 — equivalent for non-overlapping media).
β *= σ-weighted transmittance with the hero free-flight pdf divided out.

Transport-mode note: camera paths use TransportMode.Radiance (PBRT
convention — refraction applies the Veach 5.2.2.1 η² factor); the reference
labels the same camera-path mode "Importance" — physics identical.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from pathtracer_tpu.core import sampling, vecmath, cie
from pathtracer_tpu.core.bounds import Bounds1D, BOUNDED_VISIBLE_RANGE
from pathtracer_tpu.geometry import sample_surface
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
    hwss: bool = False  # hero-wavelength ×4 (config.rs hwss flag)
    wavelength_bounds: Bounds1D = BOUNDED_VISIBLE_RANGE


HWSS_LANES = 4
MEDIUM_STACK_K = 4  # tracked-medium stack depth (utils.rs keeps a sorted vec)


def _stack_push(stack, med_id, do):
    """Insert med_id into the first empty (0) slot of each ray's medium
    stack where `do` (bounded-depth analogue of tracked_mediums.push,
    utils.rs:975-977). Full stacks drop the push (depth-K limit)."""
    empty = stack == 0
    first = jnp.argmax(empty, axis=-1)
    can = jnp.any(empty, axis=-1) & do & (med_id != 0)
    onehot = (
        jnp.arange(stack.shape[-1], dtype=jnp.int32)[None, :] == first[:, None]
    ) & can[:, None]
    return jnp.where(onehot, med_id[:, None], stack)


def _stack_remove(stack, med_id, do):
    """Remove ONE occurrence of med_id (tracked_mediums.remove,
    utils.rs:958-966); a miss is a no-op like the reference's None arm."""
    match = (stack == med_id[:, None]) & do[:, None] & (med_id != 0)[:, None]
    first = jnp.argmax(match, axis=-1)
    any_match = jnp.any(match, axis=-1)
    onehot = (
        jnp.arange(stack.shape[-1], dtype=jnp.int32)[None, :] == first[:, None]
    ) & any_match[:, None]
    return jnp.where(onehot, 0, stack)


def pt_trace(world: World, settings: PTSettings, o0, d0, lam, key,
             beta0=None, pdfr0=None):
    """Trace one wavefront of camera rays to completion.

    o0, d0: f32[N,3]; lam: f32[N] or f32[N,C] wavelength lanes (lane 0 =
    hero). beta0/pdfr0 (f32[N,C], default 1): initial lane throughputs and
    spectral-MIS pdf-ratio products — camera_ray_hwss supplies them for
    chromatic lens assemblies. Returns (energy f32[N,C], counters f32[5])."""
    if lam.ndim == 1:
        lam = lam[:, None]
    n, C = lam.shape
    lam_f = lam.reshape(-1)
    lam_hero = lam[:, 0]

    def rep(x):
        return jnp.repeat(x, C, axis=0)

    def lanes(x):
        return x.reshape(n, C)

    env_prob = jnp.clip(world.env_sampling_probability, 0.0, 1.0)
    have_lights = world.n_lights > 0
    p_env = jnp.where(have_lights, env_prob, 1.0)
    nee_enabled = settings.light_samples > 0
    medium_aware = settings.medium_aware

    def mis_or_one(use_mis, pdf_a, pdf_b):
        w = power_heuristic(pdf_a, jnp.maximum(pdf_b, 0.0))
        return jnp.where(use_mis & (pdf_a + pdf_b > 0.0), w, 1.0)

    def spectral_emission(mat_id, uv, cos_theta):
        return lanes(emission(world.mats, world.bank, rep(mat_id), lam_f, rep(uv), rep(cos_theta)))

    def spectral_env(d):
        return lanes(env_emission(world.env, world.bank, world.tex, rep(d), lam_f))

    def spectral_bsdf_eval(mat_id, uv, wi_l, wo_l, mode):
        f, pdf = bsdf_eval(
            world.mats, world.bank, world.tex, rep(mat_id), lam_f, rep(uv),
            rep(wi_l), rep(wo_l), mode,
        )
        return lanes(f), lanes(pdf)

    def body(state):
        (bounce, o, d, beta, radiance, alive, prev_pdf, med_stack, counters,
         pdfr) = state
        # hero-wavelength spectral MIS (Wilkie et al. 2014; reference's HWSS
        # is dormant upstream): pdfr lane c carries Π_b p_c(d_b)/p_0(d_b)
        # along the path (lane 0 ≡ 1). Every radiance contribution scales by
        # s_mis = C/Σ_j pdfr_j, turning the hero-pdf-normalized betas into
        # the balance-heuristic mixture estimator. Exactly 1 for
        # λ-independent sampling (lambertian, non-dispersive GGX); for
        # dispersive near-delta refraction the companions' pdfs vanish and
        # the hero picks up the ×C compensation — without this, a dispersive
        # furnace loses the companions' share (~55% at C=4) of all
        # transmitted energy.
        if C > 1:
            s_mis = (C / jnp.sum(pdfr, axis=-1))[:, None]
        else:
            s_mis = 1.0
        kb = sampling.fold(key, bounce)
        u = jax.random.uniform(kb, (n, 8 + 3 * max(settings.light_samples, 1)))
        hr = world.intersect(
            o, d,
            jnp.full((n,), INTERSECTION_TIME_OFFSET, jnp.float32),
            jnp.full((n,), RAY_TMAX, jnp.float32),
        )
        # camera lens proxies absorb camera paths (MaterialId::Camera hits
        # contribute nothing under PT — reference pt.rs behavior)
        alive = alive & (hr.mat_kind != 2)

        # ---- free-flight sampling over ALL tracked mediums (utils.rs:767-805:
        # the reference races per-medium exponentials; sampling one combined
        # exponential with rate Σσs and picking the scatterer ∝ σs share is
        # the same distribution)
        if medium_aware:
            sigma_s = jnp.zeros((n, C))
            sigma_a = jnp.zeros((n, C))
            ss_hero_slots = []
            for k in range(MEDIUM_STACK_K):
                ss_k, sa_k, _ = [
                    lanes(x) for x in medium_coefficients(
                        world.mediums, world.bank, rep(med_stack[:, k]), lam_f
                    )
                ]
                sigma_s = sigma_s + ss_k
                sigma_a = sigma_a + sa_k
                ss_hero_slots.append(ss_k[:, 0])
            sigma_t = sigma_s + sigma_a
            ss_hero = sigma_s[:, 0]
            flight = jnp.where(
                ss_hero > 1e-12,
                -jnp.log(jnp.maximum(1.0 - u[:, 4], 1e-12)) / jnp.maximum(ss_hero, 1e-12),
                jnp.inf,
            )
            surf_t = jnp.where(hr.hit, hr.t, RAY_TMAX)
            scattered = alive & (flight < surf_t)
            travel = jnp.minimum(jnp.minimum(flight, surf_t), 1e8)
            # categorical pick of the scattering medium ∝ hero σs share
            ss_slots = jnp.stack(ss_hero_slots, axis=-1)  # [N, K]
            cum = jnp.cumsum(ss_slots, axis=-1)
            pick = u[:, 7] * jnp.maximum(ss_hero, 1e-20)
            slot = jnp.sum((cum < pick[:, None]).astype(jnp.int32), axis=-1)
            slot = jnp.minimum(slot, MEDIUM_STACK_K - 1)
            scat_med = jnp.take_along_axis(med_stack, slot[:, None], axis=-1)[:, 0]
            # hero-pdf divide-out (utils.rs:790-805): scatter event weight
            # σs_i·e^{−σt_i t}/(σs_h·e^{−σs_h t}); surface event weight
            # e^{−σt_i t}/e^{−σs_h t}
            in_med = alive & jnp.any(med_stack != 0, axis=-1)
            w_exp = jnp.exp(-(sigma_t - ss_hero[:, None]) * travel[:, None])
            w_scat = safe_div(sigma_s, ss_hero[:, None]) * w_exp
            lane_w = jnp.where(scattered[:, None], w_scat, w_exp)
            beta = beta * jnp.where(in_med[:, None], lane_w, 1.0)
        else:
            scattered = jnp.zeros((n,), bool)

        at_surface = alive & hr.hit & ~scattered

        # ---- environment escape (utils.rs:344-373 + pt.rs:487-511)
        escaped = alive & ~hr.hit & ~scattered
        env_e = spectral_env(d)
        env_nee_pdf = env_pdf_for(world.env, d) * p_env
        use_mis_env = (bounce > 0) & nee_enabled & (p_env > 0.0)
        w_env = mis_or_one(use_mis_env, prev_pdf, env_nee_pdf)
        radiance = radiance + jnp.where(
            escaped[:, None], beta * s_mis * env_e * w_env[:, None], 0.0)
        counters = counters.at[prof.ENV_HITS].add(jnp.sum(escaped.astype(jnp.float32)))
        alive = alive & (hr.hit | scattered)

        # ---- emissive hit (pt.rs:512-560)
        wi_world = -d
        cos_at_light = vecmath.dot(hr.geo_normal, wi_world)
        le = spectral_emission(jnp.maximum(hr.material_id, 0), hr.uv, cos_at_light)
        pick_pdf = safe_div(1.0 - p_env, world.n_lights.astype(jnp.float32))
        hyp_nee_pdf = pick_pdf * safe_div(
            hr.t * hr.t, jnp.abs(cos_at_light) * world.prims.area[jnp.maximum(hr.prim_id, 0)]
        )
        use_mis_light = (bounce > 0) & nee_enabled & have_lights
        w_light = mis_or_one(use_mis_light, prev_pdf, hyp_nee_pdf)
        is_light_hit = at_surface & (hr.mat_kind == 1)
        radiance = radiance + jnp.where(
            is_light_hit[:, None], beta * s_mis * le * w_light[:, None], 0.0)

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
                u_pick = u[:, 8 + 3 * s]
                u1 = u[:, 9 + 3 * s]
                u2 = u[:, 10 + 3 * s]
                chose_env, u_pick2 = sampling.choose(u_pick, p_env)
                # instance-light branch
                light_prim, lp_pdf = world.pick_random_light(u_pick2)
                lp, ln, area_pdf = sample_surface(world.prims, light_prim, u1, u2)
                to_l = lp - point
                dist2 = jnp.maximum(vecmath.length_squared(to_l), 1e-12)
                dist = jnp.sqrt(dist2)
                dir_l = to_l / dist[..., None]
                cos_l = vecmath.dot(ln, -dir_l)
                le_nee = spectral_emission(
                    world.prims.material_id[light_prim], jnp.zeros((n, 2)), cos_l
                )
                sa_pdf_light = (1.0 - p_env) * lp_pdf * area_pdf * safe_div(
                    dist2, jnp.abs(cos_l)
                )
                # environment branch
                env_dir, env_pdf = env_sample_uv(world.env, u1, u2)
                sa_pdf_env = env_pdf * p_env
                le_env = spectral_env(env_dir)

                nee_dir = jnp.where(chose_env[..., None], env_dir, dir_l)
                nee_pdf = jnp.where(chose_env, sa_pdf_env, sa_pdf_light)
                nee_le = jnp.where(chose_env[:, None], le_env, le_nee)
                # 1% end margin keeps the sampled light itself (and the
                # origin offset) outside the occlusion interval — the
                # reference's veach_v uses the same tmax*0.99 slack
                # (src/integrator/utils.rs:136-146)
                nee_tmax = jnp.where(chose_env, RAY_TMAX, dist * 0.99)

                wo_local = frame.to_local(nee_dir)
                f_surf, pdf_surf = spectral_bsdf_eval(
                    jnp.maximum(hr.material_id, 0), hr.uv, wi_local, wo_local,
                    TransportMode.Radiance,
                )
                thr_surf = f_surf * jnp.abs(wo_local[..., 2])[:, None]
                if medium_aware:
                    # phase angle between propagation dir d and NEE direction
                    # (phase of the medium that produced the scatter event)
                    ph = lanes(phase_eval(
                        world.mediums, world.bank, rep(scat_med), lam_f,
                        rep(vecmath.dot(d, nee_dir)),
                    ))
                    thr = jnp.where(scattered[:, None], ph, thr_surf)
                    fwd_pdf_hero = jnp.where(scattered, ph[:, 0], pdf_surf[:, 0])
                else:
                    thr = thr_surf
                    fwd_pdf_hero = pdf_surf[:, 0]
                worth = alive & (jnp.max(nee_le, axis=-1) > 0.0) & (nee_pdf > 1e-12) & (
                    jnp.max(thr, axis=-1) > 0.0
                )
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
                    tr_dist = jnp.where(chose_env, 2.0 * world.radius, dist)
                    tr = jnp.where(
                        in_med[:, None],
                        jnp.exp(-sigma_t * jnp.minimum(tr_dist, 1e8)[:, None]),
                        1.0,
                    )
                else:
                    tr = 1.0
                # NEE vs (hero-sampled) BSDF strategy: the bsdf strategy
                # density is the hero pdf for every lane
                w_nee = mis_or_one(jnp.ones((n,), bool), nee_pdf, fwd_pdf_hero)
                contrib = (beta * s_mis * thr * nee_le * tr
                           * safe_div(w_nee, nee_pdf)[:, None] * inv_ls)
                radiance = radiance + jnp.where((worth & visible)[:, None], contrib, 0.0)
                counters = counters.at[prof.SHADOW_RAYS].add(
                    jnp.sum((alive & worth).astype(jnp.float32))
                )

        # ---- BSDF / phase sampling + throughput update (utils.rs:214-321)
        # direction decided by the HERO wavelength
        wo_local, f_hero, f_pdf, ratio_hero = bsdf_sample(
            world.mats, world.bank, world.tex,
            jnp.maximum(hr.material_id, 0), lam_hero, hr.uv,
            wi_local, u[:, 0], u[:, 1], u[:, 2], TransportMode.Radiance,
        )
        if C > 1:
            # per-lane weight = ratio_hero · f_i/f_hero (exact; collapses to
            # the hero under dispersion — utils.rs hero divide-out). When the
            # hero's f is zero but other lanes are not (e.g. a reflectance
            # spectrum that is zero at the hero λ), fall back to the direct
            # f_i·cos/p_hero form so the surviving lanes keep their energy —
            # killing the whole ray there loses ~5% on Cornell-like spectra.
            f_lanes, p_lanes = spectral_bsdf_eval(
                jnp.maximum(hr.material_id, 0), hr.uv, wi_local, wo_local,
                TransportMode.Radiance,
            )
            # spectral-MIS pdf ratios p_c/p_0 at the sampled direction (both
            # from the same lane eval — exactly 1 when sampling is
            # λ-independent)
            pscale = jnp.concatenate(
                [jnp.ones((n, 1)), safe_div(p_lanes, p_lanes[:, :1])[:, 1:]],
                axis=1)
            scale = safe_div(f_lanes, f_lanes[:, :1])
            ratio_stable = ratio_hero[:, None] * scale
            ratio_direct = safe_div(
                f_lanes * jnp.abs(wo_local[..., 2])[:, None], f_pdf[:, None]
            )
            hero_dead = (f_lanes[:, :1] <= 0.0) & (f_pdf[:, None] > 1e-12)
            ratio_lanes = jnp.where(hero_dead, ratio_direct, ratio_stable)
            ratio_lanes = jnp.concatenate(
                [ratio_hero[:, None], ratio_lanes[:, 1:]], axis=1
            )
        else:
            ratio_lanes = ratio_hero[:, None]
        d_surf = vecmath.normalize(frame.to_world(wo_local))
        if medium_aware:
            wo_med, ph_pdf_f = phase_sample(
                world.mediums, world.bank, scat_med, lam_hero, d, u[:, 5], u[:, 6]
            )
            if C > 1:
                ph_lanes = lanes(phase_eval(
                    world.mediums, world.bank, rep(scat_med), lam_f,
                    rep(vecmath.dot(d, wo_med)),
                ))
                ph_scale = safe_div(ph_lanes, ph_lanes[:, :1])
                ph_scale = jnp.concatenate([jnp.ones((n, 1)), ph_scale[:, 1:]], axis=1)
            else:
                ph_scale = jnp.ones((n, 1))
            ratio_lanes = jnp.where(scattered[:, None], ph_scale, ratio_lanes)
            f_pdf = jnp.where(scattered, ph_pdf_f, f_pdf)
            d_new = jnp.where(scattered[..., None], wo_med, d_surf)
            if C > 1:
                # phase value == solid-angle pdf; ph_scale is the pdf ratio
                pscale = jnp.where(scattered[:, None], ph_scale, pscale)
        else:
            d_new = d_surf
        if C > 1:
            pdfr = jnp.where(alive[:, None], pdfr * pscale, pdfr)
        ratio_best = jnp.max(ratio_lanes, axis=-1)
        ratio_best = jnp.where(scattered, 1.0, ratio_best) if medium_aware else ratio_best
        sample_ok = scattered | ((f_pdf > 1e-12) & (ratio_best > 0.0))
        # russian roulette with continue-prob min(throughput gain, 1)
        # (utils.rs:266-276), driven by the strongest lane
        if settings.russian_roulette:
            rr_on = bounce >= settings.min_bounces
            p_cont = jnp.where(rr_on, jnp.clip(ratio_best, 0.05, 1.0), 1.0)
        else:
            p_cont = jnp.ones((n,), jnp.float32)
        survive = u[:, 3] < p_cont
        beta = beta * jnp.where(sample_ok[:, None], ratio_lanes / p_cont[:, None], 0.0)
        alive = alive & sample_ok & survive & jnp.all(jnp.isfinite(beta), axis=-1)

        o_new = jnp.where(
            scattered[..., None],
            point,
            hr.point + hr.geo_normal * (
                NORMAL_OFFSET * jnp.sign(vecmath.dot(hr.geo_normal, d_new))
            )[..., None],
        )
        # ---- medium boundary transitions on the tracked stack
        # (utils.rs:940-1005): transmit outer→inner removes outer & pushes
        # inner; inner→outer removes inner & pushes outer; reflections and
        # inner==outer boundaries leave the stack alone
        if medium_aware:
            crossed = at_surface & (wo_local[..., 2] * wi_local[..., 2] < 0.0)
            entering = wo_local[..., 2] < 0.0
            mat = jnp.maximum(hr.material_id, 0)
            inner = world.mats.inner_medium[mat]
            outer = world.mats.outer_medium[mat]
            do = crossed & (inner != outer)
            rm_id = jnp.where(entering, outer, inner)
            add_id = jnp.where(entering, inner, outer)
            med_stack = _stack_remove(med_stack, rm_id, do)
            med_stack = _stack_push(med_stack, add_id, do)
        counters = counters.at[prof.BOUNCE_RAYS].add(jnp.sum(alive.astype(jnp.float32)))
        return (
            bounce + 1,
            jnp.where(alive[..., None], o_new, o),
            jnp.where(alive[..., None], d_new, d),
            beta,
            radiance,
            alive,
            jnp.where(alive, f_pdf, prev_pdf),
            med_stack,
            counters,
            pdfr,
        )

    def cond(state):
        bounce = state[0]
        alive = state[5]
        return (bounce < settings.max_bounces) & jnp.any(alive)

    # init state derived from the varying inputs (shard_map VMA-compatible)
    zero1 = o0[:, 0] * 0.0 + lam_hero * 0.0
    zeroC = lam * 0.0
    counters0 = prof.zeros().at[prof.CAMERA_RAYS].add(float(n)) + jnp.sum(zero1)
    state0 = (
        jnp.int32(0),
        o0,
        d0,
        zeroC + (1.0 if beta0 is None else beta0),
        zeroC,
        zero1 < 1.0,
        zero1,
        jnp.zeros((n, MEDIUM_STACK_K), jnp.int32) + zero1[:, None].astype(jnp.int32),
        counters0,
        zeroC + (1.0 if pdfr0 is None else pdfr0),
    )
    state = jax.lax.while_loop(cond, body, state0)
    radiance = state[4]
    counters = state[8]
    return radiance, counters


def _frame_arrays(normal):
    t, b = vecmath.orthonormal_basis(normal)
    return t, b, normal


def camera_ray(camera, film_u, film_v, u1, u2, lam_hero):
    """Camera ray dispatch: λ-aware lens tracing when the camera supports it
    (RealisticCamera.get_ray_spectral — real chromatic aberration through
    the assembly, realistic_camera.rs:77-194 with the trace at the sampled
    λ rather than a fixed 550nm)."""
    if hasattr(camera, "get_ray_spectral"):
        return camera.get_ray_spectral(film_u, film_v, u1, u2, lam_hero)
    return camera.get_ray(film_u, film_v, u1, u2)


def camera_ray_hwss(camera, film_u, film_v, u1, u2, lam):
    """HWSS camera ray dispatch (lam f32[N, C]): realistic assemblies trace
    every companion λ through the lens stack (get_ray_hwss — chromatic
    vignetting + λ-exact pupil densities for the spectral-MIS ratios);
    achromatic cameras produce λ-independent rays, so lane weights and
    pdf ratios are exactly 1. Returns (o, d, tau, lane_w [N,C],
    pdfr0 [N,C])."""
    C = lam.shape[-1]
    if C > 1 and hasattr(camera, "get_ray_hwss"):
        return camera.get_ray_hwss(film_u, film_v, u1, u2, lam)
    o, d, tau = camera_ray(camera, film_u, film_v, u1, u2, lam[..., 0])
    ones = jnp.ones(lam.shape, jnp.float32)
    return o, d, tau, ones, ones


def sample_hero_wavelengths(key, n, bounds: Bounds1D, lanes: int):
    """Hero λ uniform + equally-rotated companions wrapping the range
    (Wilkie et al. HWSS; the reference's planned f32x4 λ packs)."""
    u = jax.random.uniform(key, (n,))
    offs = jnp.arange(lanes, dtype=jnp.float32) / lanes
    return bounds.lower + ((u[:, None] + offs[None, :]) % 1.0) * bounds.span


def trace_camera_sample(world, camera, settings: PTSettings, film_uv, key):
    """One full PT sample for a wavefront of film points: sample λ lanes,
    generate the lens ray, walk, convert to XYZ (pt.rs color() equivalent).
    film_uv: f32[N,2]. Returns (xyz f32[N,3], counters)."""
    n = film_uv.shape[0]
    k_lam, k_lens, k_walk = jax.random.split(key, 3)
    wb = settings.wavelength_bounds
    C = HWSS_LANES if settings.hwss else 1
    lam = sample_hero_wavelengths(k_lam, n, wb, C)
    ul = jax.random.uniform(k_lens, (n, 2))
    o, d, tau, lane_w, pdfr0 = camera_ray_hwss(
        camera, film_uv[:, 0], film_uv[:, 1], ul[:, 0], ul[:, 1], lam)
    energy, counters = pt_trace(world, settings, o, d, lam, k_walk,
                                beta0=lane_w, pdfr0=pdfr0)
    # MC estimator of ∫ L(λ) x̄(λ) dλ: each lane has pdf C/span -> average
    # the lanes and scale by span; tau = camera-ray weight (vignetting)
    xyz = jnp.sum(cie.wavelength_to_xyz(lam, energy), axis=1) * (wb.span / C)
    xyz = xyz * tau[:, None]
    return xyz, counters
