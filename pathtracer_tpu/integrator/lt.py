"""Light tracing (particle tracing) with camera-importance splats.

Capability parity with the reference's LightTracingIntegrator
(src/integrator/lt.rs): pick an instance light (or the environment) by
env probability, sample an emission position + direction + wavelength, walk
the light path (TransportMode::Importance — no η² factor on refraction),
and at every vertex connect to the camera lens: visibility test, film-uv
lookup via get_pixel_for_ray, splat the contribution.

TPU design: the crossbeam splat channel (src/renderer/naive.rs:173-245)
becomes a scatter-add into the device light film — `film.at[pixel].add(xyz)`
— so splats cost one segment-sum per round instead of a consumer thread.
The camera importance W_e is evaluated in closed form for the thin-lens
camera (focal²/(cos³θ·A_pixel_fp), lens pdf divided out), making LT films
directly comparable to PT films at equal spp. Realistic lens assemblies
(r4, VERDICT r3 #8) ride the same protocol: the connection point samples
the assembly's FRONT element aperture, the film uv comes from the full
reverse trace (camera/realistic.py get_pixel_for_ray — beyond the
reference's todo!()), and W_e uses the assembly's chief-ray-probed
effective focal length (camera/realistic.py _estimate_f_eff) with
vignetting handled exactly by the trace's validity mask.

Not yet modelled (like-for-like with the reference's own TODOs):
medium-aware light paths.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from pathtracer_tpu.core import sampling, vecmath, cie
from pathtracer_tpu.core.bounds import Bounds1D, BOUNDED_VISIBLE_RANGE
from pathtracer_tpu.geometry import sample_surface
from pathtracer_tpu.materials import bsdf_sample, bsdf_eval, emission, sample_emission_spectrum
from pathtracer_tpu.materials.tables import MAT_SHARP_LIGHT
from pathtracer_tpu.prelude import (
    INTERSECTION_TIME_OFFSET,
    NORMAL_OFFSET,
    RAY_TMAX,
    TransportMode,
    safe_div,
)
from pathtracer_tpu.utils import profile as prof
from pathtracer_tpu.world.environment import env_emission, env_sample_uv
from pathtracer_tpu.world.world import World


@dataclasses.dataclass(frozen=True)
class LTSettings:
    """Mirrors RenderSettings + IntegratorKind::LT
    (src/parsing/config.rs — camera_samples)."""

    max_bounces: int = 8
    min_bounces: int = 1
    camera_samples: int = 1
    russian_roulette: bool = True
    wavelength_bounds: Bounds1D = BOUNDED_VISIBLE_RANGE
    # stratified light-surface/λ sampling mirroring the reference's
    # StratifiedSampler(20, 20, 10) in the LT executor
    # (src/renderer/naive.rs:276): the emitter surface (u, v) is jittered
    # over a 20x20 grid and λ over 10 strata, cycled across the particle
    # population. Off = pure threefry uniforms (reference RandomSampler).
    stratified: bool = False
    strata_uv: int = 20
    strata_lam: int = 10


def _sample_emission_direction(world, mat_id, normal, u1, u2, u_side):
    """Direction + solid-angle pdf from a light surface point
    (DiffuseLight cosine / SharpLight cosine-power, sidedness-aware;
    src/materials/diffuse_light.rs:77-121, sharp_light.rs:32-40).
    Returns (direction_world, pdf_solid_angle, cos_theta)."""
    mats = world.mats
    sharp = mats.mtype[mat_id] == MAT_SHARP_LIGHT
    # diffuse light: plain cosine lobe (n=1 gives pdf (n+1)cosⁿ/2π = cos/π);
    # sharp light: cosine-power with `sharpness` as the exponent
    nexp = jnp.where(sharp, mats.sharpness[mat_id], 1.0)
    local = sampling.power_cosine_direction(u1, u2, nexp)
    side = mats.sidedness[mat_id]
    # Forward=+n, Reverse=-n, Dual: pick a side from u_side (half prob each)
    pick_rev = jnp.where(side == 1, True, jnp.where(side == 0, False, u_side < 0.5))
    t_ax, b_ax = vecmath.orthonormal_basis(normal)
    frame_n = jnp.where(pick_rev[..., None], -normal, normal)
    d = (
        local[..., 0:1] * t_ax
        + local[..., 1:2] * b_ax
        + local[..., 2:3] * frame_n
    )
    cos_t = jnp.abs(local[..., 2])
    pdf = (nexp + 1.0) * cos_t**nexp / (2.0 * jnp.pi)
    pdf = jnp.where(side == 2, pdf * 0.5, pdf)
    return d, pdf, cos_t


def _sample_lens_point(camera, u1, u2):
    """Connection point on the camera's lens surface: the thin-lens
    aperture disk, or the realistic assembly's FRONT element aperture
    (camera/{projective,realistic}.py sample_lens_point)."""
    return camera.sample_lens_point(u1, u2)


def _lens_area(camera):
    return camera.lens_area()


def _connect_to_camera(world, camera, point, normal_or_none, beta_f, lam, u_lens,
                       counters, bsdf_pdf_toward=None, n_conn=1):
    """Direct camera connection (evaluate_direct_importance equivalent,
    src/integrator/lt.rs:11-77). beta_f: throughput × bsdf/phase value ×
    (local cos at the vertex handled by caller). `bsdf_pdf_toward`: optional
    callback dir->solid-angle pdf of the vertex's own sampling producing
    that direction — used for MIS against the direct lens-hit strategy
    (only relevant for finite apertures with a lens proxy in the scene).
    Returns (film_u, film_v, energy, valid, counters, dir_c)."""
    lens_pt = _sample_lens_point(camera, u_lens[..., 0], u_lens[..., 1])
    to_cam = lens_pt - point
    dist2 = jnp.maximum(vecmath.length_squared(to_cam), 1e-12)
    dist = jnp.sqrt(dist2)
    dir_c = to_cam / dist[..., None]
    # the ray entering the lens travels -dir_c ... from camera: d = -dir_c
    film_u, film_v, on_film = camera.get_pixel_for_ray(lens_pt, -dir_c, lam)
    cos_cam = jnp.abs(vecmath.dot(-dir_c, camera.w))
    # importance: focal² / (cos³θ · A_pixel_fp); lens pdf (1/A_lens) divided
    # out by the A_lens in the measurement — cancels for pinhole too
    a_pix_fp = camera.we_film_area()
    we = safe_div(camera.we_focal()**2, jnp.maximum(cos_cam, 1e-6) ** 3 * a_pix_fp)
    # area-form connection: the vertex cosine lives in beta_f, the off-axis
    # lens cosines live in we (cos³θ); only the 1/d² Jacobian remains here
    geo = safe_div(1.0, dist2)
    # visibility (veach_v, utils.rs:136-146)
    if normal_or_none is None:
        so = point
    else:
        so = point + normal_or_none * (
            NORMAL_OFFSET * jnp.sign(vecmath.dot(normal_or_none, dir_c) + 1e-9)
        )[..., None]
    blocked = world.intersect_any(
        so, dir_c,
        jnp.full(point.shape[:1], INTERSECTION_TIME_OFFSET, jnp.float32),
        dist * 0.99,
    )
    counters = counters.at[prof.CAMERA_RAYS].add(jnp.sum((~blocked).astype(jnp.float32)))
    energy = beta_f * geo * we
    # MIS vs the direct lens-hit strategy (both produce vertex→lens paths
    # when the lens proxy is in the scene; balance heuristic in lens-area
    # measure). Pinhole: no proxy can be hit -> weight 1.
    a_lens = _lens_area(camera)
    if bsdf_pdf_toward is not None:
        # direct-hit competitor exists only when the lens proxy disk is in
        # the scene (mat_kind 2) AND the aperture has area
        has_proxy = jnp.any(world.prims.mat_kind == 2)
        # n_i·p_i in the balance heuristic: n_conn connection samples are
        # drawn per vertex, so the technique's effective density is
        # n_conn/a_lens (matches the w_hit competitor in the walk body)
        p_conn = safe_div(float(n_conn), a_lens)
        p_hit = bsdf_pdf_toward(dir_c) * safe_div(cos_cam, dist2)
        energy = energy * jnp.where(
            (a_lens > 0.0) & has_proxy, safe_div(p_conn, p_conn + p_hit), 1.0
        )
    valid = on_film & ~blocked & (energy > 0.0) & jnp.isfinite(energy)
    return film_u, film_v, energy, valid, counters


def stratify_u0(settings: LTSettings, u0, key):
    """StratifiedSampler(20,20,10) port: particle i lands in stratum
    i mod (20*20*10); the in-stratum offset is the threefry jitter.
    Lower-variance emitter-surface + λ coverage at equal path counts.
    The cell LABELS are randomly permuted per render: with the raw
    `i mod cells` assignment a path count below 20·20·10=4000 only
    ever visits the first n strata — λ never left the lower half of
    the band and the splat film was deterministically ~30% biased
    (measured 2026-08-18, 10-seed stderr 0.3%). A per-key uniform
    random subset of cells is unbiased at ANY path count."""
    n = u0.shape[0]
    suv = settings.strata_uv
    slam = settings.strata_lam
    cells = suv * suv * slam
    perm = jax.random.permutation(sampling.fold(key, 7), cells)
    cid = perm[jnp.arange(n, dtype=jnp.int32) % cells]
    cu = (cid % suv).astype(jnp.float32)
    cv = ((cid // suv) % suv).astype(jnp.float32)
    cl = (cid // (suv * suv)).astype(jnp.float32)
    u0 = u0.at[:, 1].set((cu + u0[:, 1]) / suv)
    u0 = u0.at[:, 2].set((cv + u0[:, 2]) / suv)
    u0 = u0.at[:, 3].set((cl + u0[:, 3]) / slam)
    return u0


def spawn_particles(world: World, settings: LTSettings, u0):
    """Sample light particles from 9 uniform columns (lt.rs:106-158):
    instance light vs environment by env_sampling_probability, emission
    position + direction + wavelength, particle weight. Returns a dict of
    per-particle arrays (also the light-vertex aux the s=1 connection
    needs). Shared by the XLA walk (lt_trace) and the LT megakernel's
    respawn feed (kernels/lt_mega.py) — single source of truth."""
    n = u0.shape[0]
    wb = settings.wavelength_bounds
    # ---- emission source pick: instance light vs environment by
    # env_sampling_probability (lt.rs:106-158 `choose`)
    p_env = world.env_sampling_probability
    pick_env = u0[:, 8] < p_env

    # ---- instance-light branch
    light_prim, pick_pdf = world.pick_random_light(u0[:, 0])
    lp_i, ln, area_pdf = sample_surface(world.prims, light_prim, u0[:, 1], u0[:, 2])
    mat_id = world.prims.material_id[light_prim]
    lam_i, power, lam_pdf = sample_emission_spectrum(world.mats, world.bank, mat_id, u0[:, 3], wb)
    d0_i, dir_pdf, cos0 = _sample_emission_direction(world, mat_id, ln, u0[:, 4], u0[:, 5], u0[:, 6])
    # emitted radiance toward d0 (sidedness gate folded into emission())
    le = emission(world.mats, world.bank, mat_id, lam_i, jnp.zeros((n, 2)), vecmath.dot(ln, d0_i))
    # particle weight: Le·cos/(p_branch·p_pick·p_A·p_ω·p_λ)
    beta_i = safe_div(
        le * cos0, jnp.maximum(1.0 - p_env, 1e-6) * pick_pdf * area_pdf * dir_pdf * lam_pdf
    )
    alive_i = (beta_i > 0.0) & (world.n_lights > 0)

    # ---- environment branch (environment.sample_emission,
    # src/world/environment.rs:100-196): direction from the importance map /
    # uniform sphere, position on the world-bounds disk facing inward, λ
    # uniform over the bounds (per-nm pdf 1/span)
    d_out, dir_pdf_env = env_sample_uv(world.env, u0[:, 1], u0[:, 2])
    lam_e = wb.sample(u0[:, 3])
    lam_pdf_e = 1.0 / wb.span
    le_env = env_emission(world.env, world.bank, world.tex, d_out, lam_e)
    radius = world.radius
    t_ax, b_ax = vecmath.orthonormal_basis(d_out)
    disk = sampling.random_in_unit_disk(u0[:, 4], u0[:, 5]) * radius
    lp_e = (
        world.center
        + d_out * radius
        + disk[..., 0:1] * t_ax
        + disk[..., 1:2] * b_ax
    )
    # particle flux: L·πR²/(p_env·p_ω·p_λ)  (pos pdf 1/(πR²) divided out —
    # the reference omits the disk-area factor, which its own dormant LT env
    # path never exercised; with it LT matches PT, see tests/test_render_lt.py)
    pos_pdf = 1.0 / (jnp.pi * radius * radius)
    beta_e = safe_div(le_env, p_env * dir_pdf_env * pos_pdf * lam_pdf_e)
    alive_e = beta_e > 0.0

    # ---- merge branches
    lam = jnp.where(pick_env, lam_e, lam_i)
    lp = jnp.where(pick_env[..., None], lp_e, lp_i)
    d0 = jnp.where(pick_env[..., None], -d_out, d0_i)
    beta = jnp.where(pick_env, beta_e, beta_i)
    beta = jnp.where(jnp.isfinite(beta) & (beta > 0.0), beta, 0.0)
    alive = jnp.where(pick_env, alive_e, alive_i) & (beta > 0.0)
    o = jnp.where(
        pick_env[..., None],
        lp,
        lp + ln * (NORMAL_OFFSET * jnp.sign(vecmath.dot(ln, d0)))[..., None],
    )
    prev_pdf0 = jnp.where(pick_env, dir_pdf_env, dir_pdf)
    return dict(o=o, d=d0, lam=lam, beta=beta, alive=alive,
                prev_pdf0=prev_pdf0, pick_env=pick_env,
                # light-vertex aux for the s=1 connection
                lp_i=lp_i, ln=ln, mat_id=mat_id, lam_i=lam_i,
                pick_pdf=pick_pdf, area_pdf=area_pdf, lam_pdf=lam_pdf,
                p_env=p_env)


def _connect_to_camera_values(world, camera, sp, uc):
    """Shadow-free light-vertex lens connection (the s=1 strategy of
    light_vertex_connect, minus the visibility test): given
    spawn_particles' output `sp` and lens uniforms `uc`, return the shadow
    task (so, dir, tmax) plus (film_u, film_v, energy, valid). Used by the
    LT megakernel's spawn feed (kernels/lt_mega.py) — the shadow ray sweeps
    in-kernel and the splat is gated by the respawn indicator."""
    from pathtracer_tpu.materials.tables import emission_direction_pdf

    lp_i, ln, mat_id, lam_i = sp["lp_i"], sp["ln"], sp["mat_id"], sp["lam_i"]
    p_env = sp["p_env"]
    lens_pt = _sample_lens_point(camera, uc[..., 0], uc[..., 1])
    to_cam = lens_pt - lp_i
    dist2 = jnp.maximum(vecmath.length_squared(to_cam), 1e-12)
    dist = jnp.sqrt(dist2)
    dir_c = to_cam / dist[..., None]
    film_u, film_v, on_film = camera.get_pixel_for_ray(lens_pt, -dir_c, lam_i)
    cos_cam = jnp.abs(vecmath.dot(-dir_c, camera.w))
    a_pix_fp = camera.we_film_area()
    we = safe_div(camera.we_focal()**2,
                  jnp.maximum(cos_cam, 1e-6) ** 3 * a_pix_fp)
    geo = safe_div(1.0, dist2)
    so = lp_i + ln * (
        NORMAL_OFFSET * jnp.sign(vecmath.dot(ln, dir_c) + 1e-9))[..., None]
    beta_f = safe_div(
        1.0,
        jnp.maximum(1.0 - p_env, 1e-6) * sp["pick_pdf"] * sp["area_pdf"]
        * sp["lam_pdf"],
    )
    cos_lc = vecmath.dot(ln, dir_c)
    le_c = emission(world.mats, world.bank, mat_id, lam_i,
                    jnp.zeros(lam_i.shape + (2,)), cos_lc)
    energy = beta_f * geo * we * le_c * jnp.abs(cos_lc)
    a_lens = _lens_area(camera)
    has_proxy = jnp.any(world.prims.mat_kind == 2)
    p_conn = safe_div(1.0, a_lens)
    p_hit = (emission_direction_pdf(world.mats, mat_id, cos_lc)
             * safe_div(cos_cam, dist2))
    energy = energy * jnp.where(
        (a_lens > 0.0) & has_proxy, safe_div(p_conn, p_conn + p_hit), 1.0)
    valid = on_film & (energy > 0.0) & jnp.isfinite(energy)
    return dict(so=so, dir=dir_c, tmax=dist * 0.99, film_u=film_u,
                film_v=film_v, energy=energy, valid=valid)


def lt_trace(world: World, camera, settings: LTSettings, width: int, height: int, n_paths: int, key):
    """Trace n_paths light paths, splatting camera connections.
    Returns (light_film [H*W, 3] xyz sum, counters). Caller divides by the
    number of paths-per-pixel equivalent (n_paths / (W·H))."""
    n = n_paths
    wb = settings.wavelength_bounds
    k_init, k_walk = jax.random.split(key)
    u0 = jax.random.uniform(k_init, (n, 9))
    if settings.stratified:
        u0 = stratify_u0(settings, u0, k_init)

    sp = spawn_particles(world, settings, u0)
    p_env = sp["p_env"]
    pick_env = sp["pick_env"]
    lp_i, ln, mat_id, lam_i = sp["lp_i"], sp["ln"], sp["mat_id"], sp["lam_i"]
    pick_pdf, area_pdf, lam_pdf = sp["pick_pdf"], sp["area_pdf"], sp["lam_pdf"]
    lam, beta, alive = sp["lam"], sp["beta"], sp["alive"]
    o, d = sp["o"], sp["d"]

    film = jnp.zeros((width * height, 3), jnp.float32)
    counters = prof.zeros().at[prof.LIGHT_RAYS].add(float(n)) + jnp.sum(beta * 0.0)

    def splat(film, film_u, film_v, energy, valid, lam):
        px = jnp.clip((film_u * width).astype(jnp.int32), 0, width - 1)
        py = jnp.clip((film_v * height).astype(jnp.int32), 0, height - 1)
        pid = py * width + px
        # beta already divides by the emission λ-pdf, so the estimator of
        # ∫x̄(λ)L(λ)dλ needs NO extra span factor (unlike PT's uniform-λ)
        xyz = cie.wavelength_to_xyz(lam, jnp.where(valid, energy, 0.0))
        return film.at[jnp.where(valid, pid, 0)].add(jnp.where(valid[..., None], xyz, 0.0))

    # connect the light vertex itself to the camera (s=1 paths; instance
    # particles only — a direct env→lens connection needs the env radiance
    # toward the lens, which is the proxy-hit strategy, not this one)
    def light_vertex_connect(film, counters, key_c):
        from pathtracer_tpu.materials.tables import emission_direction_pdf

        uc = jax.random.uniform(key_c, (n, 2))
        holder = {}

        def pdf_toward(dir_w):
            # emission toward the ACTUAL sampled lens point; pdf doubles as
            # the MIS competitor (the emitted ray hitting the lens directly)
            cos_lc = vecmath.dot(ln, dir_w)
            le_c = emission(world.mats, world.bank, mat_id, lam_i,
                            jnp.zeros((n, 2)), cos_lc)
            holder["le_cos"] = le_c * jnp.abs(cos_lc)
            return emission_direction_pdf(world.mats, mat_id, cos_lc)

        fu, fv, energy, valid, counters = _connect_to_camera(
            world, camera, lp_i, ln,
            safe_div(
                1.0,
                jnp.maximum(1.0 - p_env, 1e-6) * pick_pdf * area_pdf * lam_pdf,
            ),
            lam_i, uc, counters, bsdf_pdf_toward=pdf_toward,
        )
        energy = energy * holder["le_cos"]
        valid = (valid & ~pick_env & (world.n_lights > 0)
                 & (energy > 0.0) & jnp.isfinite(energy))
        return splat(film, fu, fv, energy, valid, lam_i), counters

    film, counters = light_vertex_connect(film, counters, sampling.fold(k_walk, 999))

    a_film = camera.we_film_area()
    a_lens = _lens_area(camera)

    def body(state):
        bounce, o, d, beta, alive, prev_pdf_sa, film, counters = state
        kb = sampling.fold(k_walk, bounce)
        u = jax.random.uniform(kb, (n, 4 + 2 * settings.camera_samples))
        hr = world.intersect(
            o, d,
            jnp.full((n,), INTERSECTION_TIME_OFFSET, jnp.float32),
            jnp.full((n,), RAY_TMAX, jnp.float32),
        )

        # ---- direct light→lens hit (reference lt.rs:253-301 Camera vertex;
        # requires the camera lens proxy disk in the scene). MIS-paired with
        # the deterministic lens connection from the PREVIOUS vertex.
        # the particle travels along d INTO the camera; from the camera's
        # convention the ray direction into the scene is -d (matching the
        # -dir_c convention in _connect_to_camera). Also reject unphysical
        # back-side proxy-disk hits (d·w >= 0 means the particle approached
        # from behind the camera).
        hit_cam = alive & hr.hit & (hr.mat_kind == 2) & (
            vecmath.dot(d, camera.w) < 0.0)
        fu_h, fv_h, on_film_h = camera.get_pixel_for_ray(hr.point, -d)
        cos_cam_h = jnp.abs(vecmath.dot(d, camera.w))
        we_area = safe_div(
            camera.we_focal()**2,
            a_lens * jnp.maximum(cos_cam_h, 1e-6) ** 4 * a_film,
        )
        p_hit_area = prev_pdf_sa * safe_div(cos_cam_h, jnp.maximum(hr.t, 1e-6) ** 2)
        # competitor density (n_i·p_i balance heuristic): bounce 0's lens
        # connection comes from the single light-vertex connection; later
        # bounces draw settings.camera_samples connections per vertex
        n_comp = jnp.where(bounce == 0, 1.0, float(settings.camera_samples))
        w_hit = safe_div(p_hit_area, p_hit_area + safe_div(n_comp, a_lens))
        # env particles have no s=1 lens-connection competitor on their
        # first segment (no env→lens connection strategy exists) -> full
        # weight for the direct hit
        w_hit = jnp.where((bounce == 0) & pick_env, 1.0, w_hit)
        e_hit = beta * we_area * w_hit
        film = splat(film, fu_h, fv_h, jnp.where(hit_cam, e_hit, 0.0),
                     hit_cam & on_film_h & jnp.isfinite(e_hit), lam)
        alive = alive & hr.hit & (hr.mat_kind != 2)
        frame = vecmath.TangentFrame(*_frame_arrays(hr.normal))
        wi_local = frame.to_local(-d)

        # ---- camera connections at this surface vertex (lt.rs:234-248)
        inv_cs = 1.0 / settings.camera_samples
        for c in range(settings.camera_samples):
            uc = u[:, 4 + 2 * c : 6 + 2 * c]

            def f_and_pdf(dir_w):
                wo_l = frame.to_local(dir_w)
                return bsdf_eval(
                    world.mats, world.bank, world.tex,
                    jnp.maximum(hr.material_id, 0), lam, hr.uv,
                    wi_local, wo_l, TransportMode.Importance,
                )

            # evaluate f toward the actual sampled lens point inside the
            # helper via the callback (pdf doubles as the MIS competitor)
            pdf_holder = {}

            def pdf_toward(dir_w):
                f_c, pdf_c = f_and_pdf(dir_w)
                pdf_holder["f"] = f_c
                pdf_holder["cos"] = jnp.abs(frame.to_local(dir_w)[..., 2])
                return pdf_c

            fu, fv, energy, valid, counters = _connect_to_camera(
                world, camera, hr.point, hr.geo_normal, beta * inv_cs, lam, uc,
                counters, bsdf_pdf_toward=pdf_toward,
                n_conn=settings.camera_samples,
            )
            energy = energy * pdf_holder["f"] * pdf_holder["cos"]
            valid = valid & (energy > 0.0) & jnp.isfinite(energy)
            film = splat(film, fu, fv, jnp.where(alive, energy, 0.0), valid & alive, lam)

        # ---- continue the walk (Importance transport)
        wo_local, f, f_pdf, ratio = bsdf_sample(
            world.mats, world.bank, world.tex,
            jnp.maximum(hr.material_id, 0), lam, hr.uv,
            wi_local, u[:, 0], u[:, 1], u[:, 2], TransportMode.Importance,
        )
        if settings.russian_roulette:
            rr_on = bounce >= settings.min_bounces
            p_cont = jnp.where(rr_on, jnp.clip(ratio, 0.05, 1.0), 1.0)
        else:
            p_cont = jnp.ones((n,), jnp.float32)
        survive = u[:, 3] < p_cont
        sample_ok = (f_pdf > 1e-12) & (ratio > 0.0)
        beta = beta * jnp.where(sample_ok, ratio / p_cont, 0.0)
        alive = alive & sample_ok & survive & jnp.isfinite(beta)
        d_new = vecmath.normalize(frame.to_world(wo_local))
        o_new = hr.point + hr.geo_normal * (
            NORMAL_OFFSET * jnp.sign(vecmath.dot(hr.geo_normal, d_new))
        )[..., None]
        counters = counters.at[prof.BOUNCE_RAYS].add(jnp.sum(alive.astype(jnp.float32)))
        return (
            bounce + 1,
            jnp.where(alive[..., None], o_new, o),
            jnp.where(alive[..., None], d_new, d),
            beta,
            alive,
            jnp.where(alive, f_pdf, prev_pdf_sa),
            film,
            counters,
        )

    def cond(state):
        return (state[0] < settings.max_bounces) & jnp.any(state[4])

    # initial direction pdf: the emission sample's solid-angle pdf (for the
    # first-segment direct-lens-hit MIS)
    prev_pdf0 = sp["prev_pdf0"]
    state0 = (jnp.int32(0), o, d, beta, alive, prev_pdf0, film, counters)
    state = jax.lax.while_loop(cond, body, state0)
    return state[6], state[7]


def _frame_arrays(normal):
    t, b = vecmath.orthonormal_basis(normal)
    return t, b, normal
