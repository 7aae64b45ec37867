"""Bidirectional path tracing (vertex connection) with Veach MIS.

Capability parity with the reference's BDPTIntegrator
(src/integrator/bdpt/{mod,utils}.rs — compiled out upstream but named a
target config by BASELINE): build a light subpath and an eye subpath, form
every (s,t) connection including s=0 (eye path hits a light) and t=1
(light path splats through the lens), and weight each strategy with the
balance heuristic computed by walking relative pdf ratios along the
combined path (Veach eq. 10.9; reference eval_mis, bdpt/utils.rs:424-520).

TPU design: subpaths are fixed-shape vertex SoA arrays [N, D] built by an
unrolled masked walk (the reference's Vec<Vertex> becomes static arrays —
SURVEY §7 "BDPT pdf bookkeeping in fixed-shape arrays"); each (s,t) pair is
one batched connection pass (shadow-ray wavefront + scatter-add splats for
t=1). Vertex pdfs are stored in area measure, forward and reverse, exactly
like the reference's pdf_forward/pdf_backward (utils.rs:39-55).

Round-1 gaps (also unsupported or vestigial upstream): t=0 (light path
hitting the lens surface), medium vertices, environment connections.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pathtracer_tpu.core import sampling, vecmath
from pathtracer_tpu.core.bounds import Bounds1D, BOUNDED_VISIBLE_RANGE
from pathtracer_tpu.geometry import sample_surface
from pathtracer_tpu.integrator.lt import _sample_emission_direction
from pathtracer_tpu.materials import bsdf_eval, bsdf_sample, emission
from pathtracer_tpu.materials.tables import emission_direction_pdf
from pathtracer_tpu.prelude import (
    INTERSECTION_TIME_OFFSET,
    NORMAL_OFFSET,
    RAY_TMAX,
    TransportMode,
    safe_div,
)
from pathtracer_tpu.utils import profile as prof
from pathtracer_tpu.world.environment import env_emission, env_pdf_for, env_sample_uv
from pathtracer_tpu.world.world import World


@dataclasses.dataclass(frozen=True)
class BDPTSettings:
    max_depth: int = 4  # vertices per subpath (≈ max_bounces)
    russian_roulette: bool = False  # fixed-length subpaths keep pdfs simple
    wavelength_bounds: Bounds1D = BOUNDED_VISIBLE_RANGE
    selected_pair: Optional[Tuple[int, int]] = None  # debug single (s,t)


class Subpath(NamedTuple):
    """[N, D] vertex SoA (reference SurfaceVertex, utils.rs:39-55)."""

    pos: jnp.ndarray  # [N,D,3]
    ns: jnp.ndarray  # shading normal
    gn: jnp.ndarray  # geometric normal
    wi: jnp.ndarray  # unit dir from previous vertex to this one (world)
    mat_id: jnp.ndarray  # [N,D]
    prim_id: jnp.ndarray  # [N,D]
    is_light: jnp.ndarray  # bool
    beta: jnp.ndarray  # throughput up to (and incl. scattering at prev)
    pdf_fwd: jnp.ndarray  # area-measure pdf of generating this vertex
    pdf_rev: jnp.ndarray  # area-measure pdf in the reverse direction
    valid: jnp.ndarray  # bool


def _to_area_pdf(pdf_sa, from_pos, to_pos, to_ns):
    d = to_pos - from_pos
    dist2 = jnp.maximum(vecmath.length_squared(d), 1e-12)
    dir_ = d * jax.lax.rsqrt(dist2)[..., None]
    return pdf_sa * safe_div(jnp.abs(vecmath.dot(to_ns, dir_)), dist2)


def _walk_subpath(world, o0, d0, beta0, lam, mode, key, depth, pdf_dir_sa0, vert0=None,
                  counters=None):
    """Unrolled masked random walk collecting vertices 1..depth-1 (vertex 0
    is supplied by the caller; its pdf_rev gets backfilled). Returns
    (per-depth vertex dicts, escape dicts per depth, counters). Escape
    records (eye walks) carry the throughput/pdf at environment misses for
    the s=0 env strategy (bdpt/utils.rs:18-116 env case)."""
    n = o0.shape[0]
    verts = []
    escapes = []
    o, d = o0, d0
    beta = beta0
    alive = beta0 > 0.0
    pdf_sa = pdf_dir_sa0
    prev_pos = o0
    for i in range(depth - 1):
        kb = sampling.fold(key, i)
        u = jax.random.uniform(kb, (n, 3))
        hr = world.intersect(
            o, d,
            jnp.full((n,), INTERSECTION_TIME_OFFSET, jnp.float32),
            jnp.full((n,), RAY_TMAX, jnp.float32),
        )
        if counters is not None:
            counters = counters.at[prof.BOUNCE_RAYS].add(
                jnp.sum(alive.astype(jnp.float32))
            )
        escapes.append(dict(
            escaped=alive & ~hr.hit, beta=beta, dir=d, pdf_sa=pdf_sa,
        ))
        alive_here = alive & hr.hit
        pdf_fwd = _to_area_pdf(pdf_sa, prev_pos, hr.point, hr.normal)
        vert = dict(
            pos=hr.point, ns=hr.normal, gn=hr.geo_normal, wi=d,
            mat_id=jnp.maximum(hr.material_id, 0),
            prim_id=jnp.maximum(hr.prim_id, 0),
            is_light=hr.mat_kind == 1,
            beta=beta, pdf_fwd=pdf_fwd,
            pdf_rev=jnp.zeros((n,)),
            valid=alive_here,
        )
        # scatter
        frame = vecmath.TangentFrame(*_frame(hr.normal))
        wi_local = frame.to_local(-d)
        wo_local, f, f_pdf, ratio = bsdf_sample(
            world.mats, world.bank, world.tex,
            jnp.maximum(hr.material_id, 0), lam, hr.uv,
            wi_local, u[:, 0], u[:, 1], u[:, 2], mode,
        )
        # reverse pdf: bsdf at this vertex sampling back towards prev
        _, rev_pdf_sa = bsdf_eval(
            world.mats, world.bank, world.tex,
            jnp.maximum(hr.material_id, 0), lam, hr.uv,
            wo_local, wi_local, mode,
        )
        prev_vert = verts[-1] if verts else vert0
        if prev_vert is not None:
            prev_vert["pdf_rev"] = _to_area_pdf(
                rev_pdf_sa, hr.point, prev_vert["pos"], prev_vert["ns"]
            )
        d_new = vecmath.normalize(frame.to_world(wo_local))
        sample_ok = (f_pdf > 1e-12) & (ratio > 0.0)
        beta = beta * jnp.where(sample_ok, ratio, 0.0)
        alive = alive_here & sample_ok
        o = hr.point + hr.geo_normal * (
            NORMAL_OFFSET * jnp.sign(vecmath.dot(hr.geo_normal, d_new))
        )[..., None]
        prev_pos = hr.point
        d = d_new
        pdf_sa = f_pdf
        verts.append(vert)
    return verts, escapes, counters


def _frame(normal):
    t, b = vecmath.orthonormal_basis(normal)
    return t, b, normal


def _stack_subpath(vert0: dict, verts: list, n) -> Subpath:
    all_v = [vert0] + verts

    def stack(key_name, default=None):
        return jnp.stack([v[key_name] for v in all_v], axis=1)

    return Subpath(
        pos=stack("pos"), ns=stack("ns"), gn=stack("gn"), wi=stack("wi"),
        mat_id=stack("mat_id"), prim_id=stack("prim_id"),
        is_light=stack("is_light"), beta=stack("beta"),
        pdf_fwd=stack("pdf_fwd"), pdf_rev=stack("pdf_rev"), valid=stack("valid"),
    )


def generate_light_subpath(world: World, settings, lam, lam_pdf, key, n, counters):
    u0 = jax.random.uniform(sampling.fold(key, 100), (n, 6))
    light_prim, pick_pdf = world.pick_random_light(u0[:, 0])
    lp, ln, area_pdf = sample_surface(world.prims, light_prim, u0[:, 1], u0[:, 2])
    mat_id = world.prims.material_id[light_prim]
    d0, dir_pdf_sa, cos0 = _sample_emission_direction(world, mat_id, ln, u0[:, 3], u0[:, 4], u0[:, 5])
    le = emission(world.mats, world.bank, mat_id, lam, jnp.zeros((n, 2)), vecmath.dot(ln, d0))
    pdf_pos = pick_pdf * area_pdf
    beta0 = safe_div(1.0, pdf_pos * lam_pdf)
    beta0 = jnp.where((world.n_lights > 0) & jnp.isfinite(beta0), beta0, 0.0)
    vert0 = dict(
        pos=lp, ns=ln, gn=ln, wi=jnp.zeros((n, 3)), mat_id=mat_id,
        prim_id=light_prim, is_light=jnp.ones((n,), bool), beta=beta0,
        pdf_fwd=pdf_pos, pdf_rev=jnp.zeros((n,)), valid=beta0 > 0.0,
    )
    counters = counters.at[prof.LIGHT_RAYS].add(jnp.sum((beta0 > 0).astype(jnp.float32)))
    beta1 = beta0 * safe_div(le * cos0, dir_pdf_sa)
    o0 = lp + ln * (NORMAL_OFFSET * jnp.sign(vecmath.dot(ln, d0)))[..., None]
    verts, _, counters = _walk_subpath(
        world, o0, d0, beta1, lam, TransportMode.Importance,
        sampling.fold(key, 200), settings.max_depth, dir_pdf_sa, vert0=vert0,
        counters=counters,
    )
    return _stack_subpath(vert0, verts, n), light_prim, counters


def generate_eye_subpath(world: World, camera, settings, film_uv, lam, key, counters):
    n = film_uv.shape[0]
    ul = jax.random.uniform(sampling.fold(key, 300), (n, 2))
    # λ-aware dispatch: realistic assemblies trace chromatically
    # (integrator/pt.py camera_ray)
    from pathtracer_tpu.integrator.pt import camera_ray

    o0, d0, tau = camera_ray(camera, film_uv[:, 0], film_uv[:, 1],
                             ul[:, 0], ul[:, 1], lam)
    cos_cam = jnp.abs(vecmath.dot(d0, camera.w))
    a_film = camera.we_film_area()
    pdf_dir_sa = safe_div(camera.we_focal()**2, cos_cam**3 * a_film)
    vert0 = dict(
        pos=o0, ns=jnp.broadcast_to(camera.w, o0.shape),
        gn=jnp.broadcast_to(camera.w, o0.shape), wi=jnp.zeros((n, 3)),
        mat_id=jnp.zeros((n,), jnp.int32), prim_id=jnp.zeros((n,), jnp.int32),
        is_light=jnp.zeros((n,), bool),
        beta=tau, pdf_fwd=jnp.ones((n,)),
        pdf_rev=jnp.zeros((n,)), valid=tau > 0.0,
    )
    counters = counters.at[prof.CAMERA_RAYS].add(jnp.sum((tau > 0).astype(jnp.float32)))
    verts, escapes, counters = _walk_subpath(
        world, o0, d0, tau, lam, TransportMode.Radiance,
        sampling.fold(key, 400), settings.max_depth, pdf_dir_sa, vert0=vert0,
        counters=counters,
    )
    return _stack_subpath(vert0, verts, n), escapes, counters


def _remap0(x):
    """PBRT's remap: treat zero/delta pdfs as 1 in MIS ratio products."""
    return jnp.where(x > 1e-18, x, 1.0)


def _gather(sp: Subpath, idx: int):
    return jax.tree_util.tree_map(lambda a: a[:, idx], sp)


def _mis_weight(world, lam, y: Subpath, z: Subpath, s: int, t: int, max_depth: int,
                pdf_rev_y_end, pdf_rev_y_prev, pdf_rev_z_end, pdf_rev_z_prev):
    """Balance-heuristic weight for strategy (s,t) over all strategies of the
    same path length (Veach 10.9 via pdf-ratio walk; reference eval_mis,
    bdpt/utils.rs:424-520). The *_end/_prev args are the recomputed reverse
    area pdfs at the junction (pdf of the connection generating those
    vertices).

    The denominator counts ONLY strategies inside the implemented universe
    (s' ≤ max_depth, 1 ≤ t' ≤ max_depth): a ratio term for a split the
    integrator never evaluates would claim probability mass no strategy
    contributes, biasing every long path low (this was a real ~10% deficit
    on the Veach MIS scene before the cap)."""
    n_verts = s + t
    sum_ri = 0.0
    # eye side: ratio walk z_{t-1} .. z_1 (z_0 = camera, delta position);
    # term i ↔ strategy (s'=n-i, t'=i)
    ri = 1.0
    for i in range(t - 1, 0, -1):
        rev = pdf_rev_z_end if i == t - 1 else (pdf_rev_z_prev if i == t - 2 else z.pdf_rev[:, i])
        ri = ri * safe_div(_remap0(rev), _remap0(z.pdf_fwd[:, i]))
        if n_verts - i <= max_depth:
            sum_ri = sum_ri + jnp.where(z.valid[:, i], ri, 0.0)
    # light side: ratio walk y_{s-1} .. y_0; term i ↔ strategy (s'=i, t'=n-i)
    ri = 1.0
    for i in range(s - 1, -1, -1):
        rev = pdf_rev_y_end if i == s - 1 else (pdf_rev_y_prev if i == s - 2 else y.pdf_rev[:, i])
        ri = ri * safe_div(_remap0(rev), _remap0(y.pdf_fwd[:, i]))
        if n_verts - i <= max_depth:
            sum_ri = sum_ri + jnp.where(y.valid[:, i], ri, 0.0)
    return 1.0 / (1.0 + sum_ri)


def _mis_weight_batched(y: Subpath, z: Subpath, s_arr, t_arr, max_depth,
                        pdf_rev_y_end, pdf_rev_y_prev,
                        pdf_rev_z_end, pdf_rev_z_prev):
    """[N, P] balance-heuristic weights for P strategies at once — the
    vectorized form of _mis_weight (identical ratio walks; the sequential
    `ri *=` accumulation becomes a reversed-cumprod suffix product, so
    values agree to f32 reassociation). s_arr/t_arr are [P] int arrays,
    junction reverse pdfs are [N, P]. Batching every (s,t) pair into ONE
    pass is what makes the max_depth=6 program compile in seconds instead
    of the 853 s the unrolled per-pair graphs cost (round-4 measurement,
    tools/probe_bdpt_steady.py)."""
    D = max_depth
    k = jnp.arange(D)[None, None, :]                       # [1,1,D]
    s_b = s_arr[None, :, None]
    t_b = t_arr[None, :, None]
    nv = s_b + t_b
    # eye side: terms i = t-1 .. 1; rev overridden at the junction
    rev_z = jnp.where(k == t_b - 1, pdf_rev_z_end[:, :, None],
                      jnp.where(k == t_b - 2, pdf_rev_z_prev[:, :, None],
                                z.pdf_rev[:, None, :]))
    a_z = safe_div(_remap0(rev_z), _remap0(z.pdf_fwd[:, None, :]))
    in_z = (k >= 1) & (k <= t_b - 1)
    c_z = jnp.flip(jnp.cumprod(jnp.flip(jnp.where(in_z, a_z, 1.0), -1), -1), -1)
    ok_z = in_z & (nv - k <= D) & z.valid[:, None, :]
    sum_ri = jnp.sum(jnp.where(ok_z, c_z, 0.0), -1)
    # light side: terms i = s-1 .. 0
    rev_y = jnp.where(k == s_b - 1, pdf_rev_y_end[:, :, None],
                      jnp.where(k == s_b - 2, pdf_rev_y_prev[:, :, None],
                                y.pdf_rev[:, None, :]))
    a_y = safe_div(_remap0(rev_y), _remap0(y.pdf_fwd[:, None, :]))
    in_y = k <= s_b - 1
    c_y = jnp.flip(jnp.cumprod(jnp.flip(jnp.where(in_y, a_y, 1.0), -1), -1), -1)
    ok_y = in_y & (nv - k <= D) & y.valid[:, None, :]
    sum_ri = sum_ri + jnp.sum(jnp.where(ok_y, c_y, 0.0), -1)
    return 1.0 / (1.0 + sum_ri)


def _gather_pairs(sp: Subpath, idx):
    """[N, P(, 3)] vertex gather for a static index list."""
    return jax.tree_util.tree_map(lambda a: a[:, idx], sp)


def _bdpt_trace_per_pair(world: World, camera, settings: BDPTSettings, film_uv, key):
    """Per-pair strategy loops (the round-4 implementation, one graph per
    (s,t)): ~2x the batched path's throughput at small max_depth (13.3 vs
    6.6 Mrays/s md=4 on-chip, 2026-08-21) but compile cost O(D^2) graphs
    (853 s at md=6) - dispatched for max_depth <= 4. Returns (own f32[N],
    splat_uv f32[M,2], splat_energy f32[M], lam f32[N], lam_splat, counters)
    where splats are the t=1 strategies (M = N·(max_depth-1))."""
    n = film_uv.shape[0]
    wb = settings.wavelength_bounds
    k_lam, k_light, k_eye, k_con = jax.random.split(key, 4)
    lam = wb.sample(jax.random.uniform(k_lam, (n,)))
    # λ is drawn once per sample (uniform); the 1/pdf = span factor is
    # applied exactly once by the renderer, so subpath betas carry none
    lam_pdf = jnp.ones((n,))
    counters = prof.zeros() + jnp.sum(lam * 0.0)

    y, light_prim0, counters = generate_light_subpath(
        world, settings, lam, lam_pdf, k_light, n, counters
    )
    z, z_escapes, counters = generate_eye_subpath(
        world, camera, settings, film_uv, lam, k_eye, counters
    )
    # the eye subpath's ACTUAL sampled lens point: all camera-side
    # connections/pdfs use it (round-1 used camera.origin, i.e. a pinhole —
    # biased for thin-lens apertures)
    lens_pt = z.pos[:, 0]

    D = settings.max_depth
    own = jnp.zeros((n,))
    splat_uv = []
    splat_e = []

    def pair_enabled(s, t):
        if settings.selected_pair is None:
            return True
        return settings.selected_pair == (s, t)

    a_film = camera.we_film_area()

    # ---------- environment family (disjoint from instance-light paths):
    # s=0 env escape at each eye depth, MIS-paired with env-NEE from the
    # same vertex — together they cover every eye...surface...env path the
    # way PT does (the reference's bdpt env strategies, utils.rs:18-116)
    if settings.selected_pair is None:
        for i, esc in enumerate(z_escapes):
            env_e = env_emission(world.env, world.bank, world.tex, esc["dir"], lam)
            env_pdf = env_pdf_for(world.env, esc["dir"])
            if i == 0:
                w_esc = jnp.ones((n,))
            else:
                w_esc = safe_div(esc["pdf_sa"], esc["pdf_sa"] + env_pdf)
            own = own + jnp.where(esc["escaped"], esc["beta"] * env_e * w_esc, 0.0)
        u_env = jax.random.uniform(sampling.fold(k_con, 777), (n, 2 * D))
        for i in range(1, D):
            zv = _gather(z, i)
            env_dir, env_pdf = env_sample_uv(
                world.env, u_env[:, 2 * i], u_env[:, 2 * i + 1]
            )
            env_e = env_emission(world.env, world.bank, world.tex, env_dir, lam)
            frame_z = vecmath.TangentFrame(*_frame(zv.ns))
            fz, fz_pdf = bsdf_eval(
                world.mats, world.bank, world.tex, zv.mat_id, lam,
                jnp.zeros((n, 2)), frame_z.to_local(-zv.wi),
                frame_z.to_local(env_dir), TransportMode.Radiance,
            )
            cos_z = jnp.abs(vecmath.dot(zv.ns, env_dir))
            w_nee = safe_div(env_pdf, env_pdf + fz_pdf)
            contrib = safe_div(zv.beta * fz * cos_z * env_e * w_nee, env_pdf)
            worth = zv.valid & ~zv.is_light & (contrib > 0.0) & jnp.isfinite(contrib)
            so = zv.pos + zv.gn * (
                NORMAL_OFFSET * jnp.sign(vecmath.dot(zv.gn, env_dir) + 1e-9)
            )[..., None]
            blocked = world.intersect_any(
                so, env_dir,
                jnp.full((n,), INTERSECTION_TIME_OFFSET, jnp.float32),
                jnp.full((n,), RAY_TMAX, jnp.float32),
            )
            counters = counters.at[prof.SHADOW_RAYS].add(
                jnp.sum(worth.astype(jnp.float32))
            )
            own = own + jnp.where(worth & ~blocked, contrib, 0.0)

    # ---------- s = 0: eye path hits a light (bdpt/utils.rs:18-116 s=0 case)
    for t in range(2, D + 1):
        if not pair_enabled(0, t):
            continue
        zv = _gather(z, t - 1)
        cos_l = vecmath.dot(zv.gn, -zv.wi)
        le = emission(world.mats, world.bank, zv.mat_id, lam, jnp.zeros((n, 2)), cos_l)
        ok = zv.valid & zv.is_light & (le > 0.0)
        # reverse pdfs at the junction: light position + emission direction
        pdf_rev_z_end = jnp.where(ok, _light_pos_pdf(world, zv), 0.0)
        pdf_rev_z_prev = jnp.where(
            ok,
            _to_area_pdf(
                emission_direction_pdf(world.mats, zv.mat_id, cos_l),
                zv.pos, z.pos[:, t - 2], z.ns[:, t - 2],
            ),
            0.0,
        ) if t >= 2 else 0.0
        w = _mis_weight(world, lam, y, z, 0, t, D, 0.0, 0.0, pdf_rev_z_end, pdf_rev_z_prev)
        own = own + jnp.where(ok, zv.beta * le * w, 0.0)

    # ---------- s >= 1, t >= 2: vertex connections
    for s in range(1, D + 1):
        for t in range(2, D + 1):
            if not pair_enabled(s, t):
                continue
            yv = _gather(y, s - 1)
            zv = _gather(z, t - 1)
            con = zv.pos - yv.pos
            dist2 = jnp.maximum(vecmath.length_squared(con), 1e-12)
            dist = jnp.sqrt(dist2)
            dir_yz = con / dist[..., None]
            cos_y = vecmath.dot(yv.ns, dir_yz)
            cos_z = vecmath.dot(zv.ns, -dir_yz)
            geo = safe_div(jnp.abs(cos_y) * jnp.abs(cos_z), dist2)

            if s == 1:
                # light vertex end: directional emission toward z
                le = emission(world.mats, world.bank, yv.mat_id, lam,
                              jnp.zeros((n, 2)), vecmath.dot(yv.gn, dir_yz))
                fy = le
                fy_rev_pdf_sa = emission_direction_pdf(
                    world.mats, yv.mat_id, vecmath.dot(yv.gn, dir_yz)
                )
            else:
                frame_y = vecmath.TangentFrame(*_frame(yv.ns))
                fy, fy_pdf = bsdf_eval(
                    world.mats, world.bank, world.tex, yv.mat_id, lam,
                    jnp.zeros((n, 2)), frame_y.to_local(-yv.wi),
                    frame_y.to_local(dir_yz), TransportMode.Importance,
                )
                fy_rev_pdf_sa = fy_pdf
            frame_z = vecmath.TangentFrame(*_frame(zv.ns))
            fz, fz_pdf = bsdf_eval(
                world.mats, world.bank, world.tex, zv.mat_id, lam,
                jnp.zeros((n, 2)), frame_z.to_local(-zv.wi),
                frame_z.to_local(-dir_yz), TransportMode.Radiance,
            )
            contrib = yv.beta * fy * geo * fz * zv.beta
            worth = yv.valid & zv.valid & (contrib > 0.0) & jnp.isfinite(contrib)
            so = yv.pos + yv.gn * (
                NORMAL_OFFSET * jnp.sign(vecmath.dot(yv.gn, dir_yz) + 1e-9)
            )[..., None]
            blocked = world.intersect_any(
                so, dir_yz,
                jnp.full((n,), INTERSECTION_TIME_OFFSET, jnp.float32),
                dist * 0.99,
            )
            counters = counters.at[prof.SHADOW_RAYS].add(
                jnp.sum(worth.astype(jnp.float32))
            )
            # junction reverse pdfs (area measure)
            # z_{t-1} generated from y_{s-1}:
            if s == 1:
                pdf_z_end_sa = emission_direction_pdf(
                    world.mats, yv.mat_id, vecmath.dot(yv.gn, dir_yz)
                )
            else:
                frame_y = vecmath.TangentFrame(*_frame(yv.ns))
                _, pdf_z_end_sa = bsdf_eval(
                    world.mats, world.bank, world.tex, yv.mat_id, lam,
                    jnp.zeros((n, 2)), frame_y.to_local(-yv.wi),
                    frame_y.to_local(dir_yz), TransportMode.Importance,
                )
            pdf_rev_z_end = _to_area_pdf(pdf_z_end_sa, yv.pos, zv.pos, zv.ns)
            # z_{t-2} generated from z_{t-1} (incoming now from y):
            _, pdf_z_prev_sa = bsdf_eval(
                world.mats, world.bank, world.tex, zv.mat_id, lam,
                jnp.zeros((n, 2)), frame_z.to_local(-dir_yz),
                frame_z.to_local(-zv.wi), TransportMode.Radiance,
            )
            pdf_rev_z_prev = _to_area_pdf(pdf_z_prev_sa, zv.pos, z.pos[:, t - 2], z.ns[:, t - 2])
            # y_{s-1} generated from z_{t-1}:
            _, pdf_y_end_sa = bsdf_eval(
                world.mats, world.bank, world.tex, zv.mat_id, lam,
                jnp.zeros((n, 2)), frame_z.to_local(-zv.wi),
                frame_z.to_local(-dir_yz), TransportMode.Radiance,
            )
            pdf_rev_y_end = _to_area_pdf(pdf_y_end_sa, zv.pos, yv.pos, yv.ns)
            # y_{s-2} generated from y_{s-1} (incoming from z):
            if s >= 2:
                frame_y = vecmath.TangentFrame(*_frame(yv.ns))
                _, pdf_y_prev_sa = bsdf_eval(
                    world.mats, world.bank, world.tex, yv.mat_id, lam,
                    jnp.zeros((n, 2)), frame_y.to_local(dir_yz),
                    frame_y.to_local(-yv.wi), TransportMode.Importance,
                )
                pdf_rev_y_prev = _to_area_pdf(pdf_y_prev_sa, yv.pos, y.pos[:, s - 2], y.ns[:, s - 2])
            else:
                pdf_rev_y_prev = 0.0
            w = _mis_weight(world, lam, y, z, s, t, D,
                            pdf_rev_y_end, pdf_rev_y_prev,
                            pdf_rev_z_end, pdf_rev_z_prev)
            own = own + jnp.where(worth & ~blocked, contrib * w, 0.0)

    # ---------- t = 1: splat through the lens (lt.rs-style connection)
    for s in range(2, D + 1):
        if not pair_enabled(s, 1):
            continue
        yv = _gather(y, s - 1)
        to_cam = lens_pt - yv.pos
        dist2 = jnp.maximum(vecmath.length_squared(to_cam), 1e-12)
        dist = jnp.sqrt(dist2)
        dir_c = to_cam / dist[..., None]
        fu, fv, on_film = camera.get_pixel_for_ray(lens_pt, -dir_c, lam)
        cos_cam = jnp.abs(vecmath.dot(-dir_c, camera.w))
        we = safe_div(camera.we_focal()**2, jnp.maximum(cos_cam, 1e-6) ** 4 * a_film)
        frame_y = vecmath.TangentFrame(*_frame(yv.ns))
        fy, fy_pdf = bsdf_eval(
            world.mats, world.bank, world.tex, yv.mat_id, lam,
            jnp.zeros((n, 2)), frame_y.to_local(-yv.wi),
            frame_y.to_local(dir_c), TransportMode.Importance,
        )
        geo = safe_div(jnp.abs(vecmath.dot(yv.ns, dir_c)) * cos_cam, dist2)
        contrib = yv.beta * fy * geo * we
        so = yv.pos + yv.gn * (
            NORMAL_OFFSET * jnp.sign(vecmath.dot(yv.gn, dir_c) + 1e-9)
        )[..., None]
        blocked = world.intersect_any(
            so, dir_c,
            jnp.full((n,), INTERSECTION_TIME_OFFSET, jnp.float32),
            dist * 0.99,
        )
        counters = counters.at[prof.CAMERA_RAYS].add(
            jnp.sum((yv.valid & on_film).astype(jnp.float32))
        )
        # junction pdfs: y_{s-1} from camera; y_{s-2} from y_{s-1}
        cam_dir_pdf_sa = safe_div(camera.we_focal()**2, cos_cam**3 * a_film)
        pdf_rev_y_end = _to_area_pdf(cam_dir_pdf_sa, lens_pt, yv.pos, yv.ns)
        _, pdf_y_prev_sa = bsdf_eval(
            world.mats, world.bank, world.tex, yv.mat_id, lam,
            jnp.zeros((n, 2)), frame_y.to_local(dir_c),
            frame_y.to_local(-yv.wi), TransportMode.Importance,
        )
        pdf_rev_y_prev = _to_area_pdf(pdf_y_prev_sa, yv.pos, y.pos[:, s - 2], y.ns[:, s - 2])
        w = _mis_weight(world, lam, y, z, s, 1, D, pdf_rev_y_end, pdf_rev_y_prev, 0.0, 0.0)
        ok = yv.valid & on_film & ~blocked & (contrib > 0.0) & jnp.isfinite(contrib)
        splat_uv.append(jnp.stack([fu, fv], axis=-1))
        splat_e.append(jnp.where(ok, contrib * w, 0.0))

    # ---------- s = 1, t = 1: light vertex direct to lens
    if pair_enabled(1, 1):
        yv = _gather(y, 0)
        to_cam = lens_pt - yv.pos
        dist2 = jnp.maximum(vecmath.length_squared(to_cam), 1e-12)
        dist = jnp.sqrt(dist2)
        dir_c = to_cam / dist[..., None]
        fu, fv, on_film = camera.get_pixel_for_ray(lens_pt, -dir_c, lam)
        cos_cam = jnp.abs(vecmath.dot(-dir_c, camera.w))
        we = safe_div(camera.we_focal()**2, jnp.maximum(cos_cam, 1e-6) ** 4 * a_film)
        le = emission(world.mats, world.bank, yv.mat_id, lam, jnp.zeros((n, 2)),
                      vecmath.dot(yv.gn, dir_c))
        geo = safe_div(jnp.abs(vecmath.dot(yv.ns, dir_c)) * cos_cam, dist2)
        contrib = yv.beta * le * geo * we
        so = yv.pos + yv.gn * (
            NORMAL_OFFSET * jnp.sign(vecmath.dot(yv.gn, dir_c) + 1e-9)
        )[..., None]
        blocked = world.intersect_any(
            so, dir_c,
            jnp.full((n,), INTERSECTION_TIME_OFFSET, jnp.float32),
            dist * 0.99,
        )
        counters = counters.at[prof.CAMERA_RAYS].add(
            jnp.sum((yv.valid & on_film).astype(jnp.float32))
        )
        cam_dir_pdf_sa = safe_div(camera.we_focal()**2, cos_cam**3 * a_film)
        pdf_rev_y_end = _to_area_pdf(cam_dir_pdf_sa, lens_pt, yv.pos, yv.ns)
        w = _mis_weight(world, lam, y, z, 1, 1, D, pdf_rev_y_end, 0.0, 0.0, 0.0)
        ok = yv.valid & on_film & ~blocked & (contrib > 0.0) & jnp.isfinite(contrib)
        splat_uv.append(jnp.stack([fu, fv], axis=-1))
        splat_e.append(jnp.where(ok, contrib * w, 0.0))

    splat_uv = jnp.concatenate(splat_uv, axis=0) if splat_uv else jnp.zeros((0, 2))
    splat_e = jnp.concatenate(splat_e, axis=0) if splat_e else jnp.zeros((0,))
    lam_splat = jnp.tile(lam, (splat_e.shape[0] // max(n, 1),)) if splat_e.shape[0] else lam[:0]
    return own, splat_uv, splat_e, lam, lam_splat, counters


def bdpt_trace(world: World, camera, settings: BDPTSettings, film_uv, key):
    """One BDPT sample per film point. Returns (own_pixel_energy f32[N],
    splat_uv f32[M,2], splat_energy f32[M], lam f32[N], lam_splat, counters)
    where splats are the t=1 strategies (M = N·max_depth).

    Every strategy family runs as ONE batched pass over a static (s,t)
    pair list (vertex gathers -> [N, P] lanes -> shared bsdf/emission
    bodies -> one batched shadow sweep -> _mis_weight_batched), instead of
    a Python loop emitting O(max_depth²) separate graphs: the md=6 program
    that cost 853 s of AOT compile as unrolled per-pair passes compiles
    sub-linearly in max_depth this way (VERDICT r4 #5). Shallow depths
    (max_depth <= 4) dispatch to the per-pair loops instead: their
    unrolled graphs compile fine at that size and run ~2x faster on-chip
    (13.3 vs 6.6 Mrays/s, control A/B 2026-08-21); PT_BDPT_BATCHED=1
    forces the batched path."""
    import os as _os

    if settings.max_depth <= 4 and not _os.environ.get("PT_BDPT_BATCHED"):
        return _bdpt_trace_per_pair(world, camera, settings, film_uv, key)
    n = film_uv.shape[0]
    wb = settings.wavelength_bounds
    k_lam, k_light, k_eye, k_con = jax.random.split(key, 4)
    lam = wb.sample(jax.random.uniform(k_lam, (n,)))
    # λ is drawn once per sample (uniform); the 1/pdf = span factor is
    # applied exactly once by the renderer, so subpath betas carry none
    lam_pdf = jnp.ones((n,))
    counters = prof.zeros() + jnp.sum(lam * 0.0)

    y, light_prim0, counters = generate_light_subpath(
        world, settings, lam, lam_pdf, k_light, n, counters
    )
    z, z_escapes, counters = generate_eye_subpath(
        world, camera, settings, film_uv, lam, k_eye, counters
    )
    # the eye subpath's ACTUAL sampled lens point: all camera-side
    # connections/pdfs use it (round-1 used camera.origin, i.e. a pinhole —
    # biased for thin-lens apertures)
    lens_pt = z.pos[:, 0]

    D = settings.max_depth
    own = jnp.zeros((n,))
    splat_uv = []
    splat_e = []

    def pair_enabled(s, t):
        if settings.selected_pair is None:
            return True
        return settings.selected_pair == (s, t)

    a_film = camera.we_film_area()

    def flat(a):
        return a.reshape((-1,) + a.shape[2:])

    def unflat(a, P):
        return a.reshape((n, P) + a.shape[1:])

    def lam_for(P):
        return flat(jnp.broadcast_to(lam[:, None], (n, P)))

    def bsdf_eval_b(mat_id, wi_local, wo_local, mode, P):
        f, pdf = bsdf_eval(world.mats, world.bank, world.tex, flat(mat_id),
                           lam_for(P), jnp.zeros((n * P, 2)), flat(wi_local),
                           flat(wo_local), mode)
        return unflat(f, P), unflat(pdf, P)

    # ---------- environment family (disjoint from instance-light paths):
    # s=0 env escape at each eye depth, MIS-paired with env-NEE from the
    # same vertex — together they cover every eye...surface...env path the
    # way PT does (the reference's bdpt env strategies, utils.rs:18-116)
    if settings.selected_pair is None and D >= 2:
        # escapes: [N, D-1] stacked, one batched env_emission/pdf eval
        Pe = len(z_escapes)
        esc_dir = jnp.stack([e["dir"] for e in z_escapes], axis=1)
        esc_beta = jnp.stack([e["beta"] for e in z_escapes], axis=1)
        esc_pdf = jnp.stack([e["pdf_sa"] for e in z_escapes], axis=1)
        esc_on = jnp.stack([e["escaped"] for e in z_escapes], axis=1)
        env_e = unflat(env_emission(world.env, world.bank, world.tex,
                                    flat(esc_dir), lam_for(Pe)), Pe)
        env_pdf_esc = unflat(env_pdf_for(world.env, flat(esc_dir)), Pe)
        first = jnp.arange(Pe)[None, :] == 0
        w_esc = jnp.where(first, 1.0,
                          safe_div(esc_pdf, esc_pdf + env_pdf_esc))
        own = own + jnp.sum(jnp.where(esc_on, esc_beta * env_e * w_esc, 0.0),
                            axis=1)
        # env-NEE from eye vertices 1..D-1: one batched pass + ONE sweep
        Pn = D - 1
        zv = _gather_pairs(z, list(range(1, D)))
        u_env = jax.random.uniform(sampling.fold(k_con, 777), (n, 2 * D))
        env_dir, env_pdf = env_sample_uv(
            world.env, flat(u_env[:, 2:2 * D:2]), flat(u_env[:, 3:2 * D:2]))
        env_dir = unflat(env_dir, Pn)
        env_pdf = unflat(env_pdf, Pn)
        env_e = unflat(env_emission(world.env, world.bank, world.tex,
                                    flat(env_dir), lam_for(Pn)), Pn)
        frame_z = vecmath.TangentFrame(*_frame(zv.ns))
        fz, fz_pdf = bsdf_eval_b(zv.mat_id, frame_z.to_local(-zv.wi),
                                 frame_z.to_local(env_dir),
                                 TransportMode.Radiance, Pn)
        cos_z = jnp.abs(vecmath.dot(zv.ns, env_dir))
        w_nee = safe_div(env_pdf, env_pdf + fz_pdf)
        contrib = safe_div(zv.beta * fz * cos_z * env_e * w_nee, env_pdf)
        worth = zv.valid & ~zv.is_light & (contrib > 0.0) & jnp.isfinite(contrib)
        so = zv.pos + zv.gn * (
            NORMAL_OFFSET * jnp.sign(vecmath.dot(zv.gn, env_dir) + 1e-9)
        )[..., None]
        blocked = unflat(world.intersect_any(
            flat(so), flat(env_dir),
            jnp.full((n * Pn,), INTERSECTION_TIME_OFFSET, jnp.float32),
            jnp.full((n * Pn,), RAY_TMAX, jnp.float32)), Pn)
        counters = counters.at[prof.SHADOW_RAYS].add(
            jnp.sum(worth.astype(jnp.float32)))
        own = own + jnp.sum(jnp.where(worth & ~blocked, contrib, 0.0), axis=1)

    # ---------- s = 0: eye path hits a light (bdpt/utils.rs:18-116 s=0
    # case), batched over t = 2..D
    t0_list = [t for t in range(2, D + 1) if pair_enabled(0, t)]
    if t0_list:
        P0 = len(t0_list)
        zv = _gather_pairs(z, [t - 1 for t in t0_list])
        zprev = _gather_pairs(z, [t - 2 for t in t0_list])
        cos_l = vecmath.dot(zv.gn, -zv.wi)
        le = unflat(emission(world.mats, world.bank, flat(zv.mat_id),
                             lam_for(P0), jnp.zeros((n * P0, 2)),
                             flat(cos_l)), P0)
        ok = zv.valid & zv.is_light & (le > 0.0)
        pdf_rev_z_end = jnp.where(ok, _light_pos_pdf(world, zv), 0.0)
        pdf_rev_z_prev = jnp.where(
            ok,
            _to_area_pdf(
                unflat(emission_direction_pdf(
                    world.mats, flat(zv.mat_id), flat(cos_l)), P0),
                zv.pos, zprev.pos, zprev.ns),
            0.0)
        zero_p = jnp.zeros((n, P0))
        w = _mis_weight_batched(
            y, z, jnp.zeros((P0,), jnp.int32), jnp.asarray(t0_list, jnp.int32),
            D, zero_p, zero_p, pdf_rev_z_end, pdf_rev_z_prev)
        own = own + jnp.sum(jnp.where(ok, zv.beta * le * w, 0.0), axis=1)

    # ---------- s >= 1, t >= 2: vertex connections — ONE batched pass over
    # the whole (s,t) grid: P-pair vertex gathers, 4 shared bsdf bodies
    # (the light-end s=1 emission case is a masked select), one batched
    # shadow sweep, batched MIS
    pairs = [(s, t) for s in range(1, D + 1) for t in range(2, D + 1)
             if pair_enabled(s, t)]
    if pairs:
        P = len(pairs)
        s_np = jnp.asarray([s for s, _ in pairs], jnp.int32)
        t_np = jnp.asarray([t for _, t in pairs], jnp.int32)
        s_is1 = (s_np == 1)[None, :]
        yv = _gather_pairs(y, [s - 1 for s, _ in pairs])
        zv = _gather_pairs(z, [t - 1 for _, t in pairs])
        yprev = _gather_pairs(y, [max(s - 2, 0) for s, _ in pairs])
        zprev = _gather_pairs(z, [t - 2 for _, t in pairs])
        con = zv.pos - yv.pos
        dist2 = jnp.maximum(vecmath.length_squared(con), 1e-12)
        dist = jnp.sqrt(dist2)
        dir_yz = con / dist[..., None]
        cos_y = vecmath.dot(yv.ns, dir_yz)
        cos_z = vecmath.dot(zv.ns, -dir_yz)
        geo = safe_div(jnp.abs(cos_y) * jnp.abs(cos_z), dist2)

        frame_y = vecmath.TangentFrame(*_frame(yv.ns))
        frame_z = vecmath.TangentFrame(*_frame(zv.ns))
        cos_gy = vecmath.dot(yv.gn, dir_yz)
        # light-vertex end (s=1): directional emission toward z; else bsdf
        le = unflat(emission(world.mats, world.bank, flat(yv.mat_id),
                             lam_for(P), jnp.zeros((n * P, 2)),
                             flat(cos_gy)), P)
        edir_pdf = unflat(emission_direction_pdf(
            world.mats, flat(yv.mat_id), flat(cos_gy)), P)
        fy_b, fy_pdf_b = bsdf_eval_b(yv.mat_id, frame_y.to_local(-yv.wi),
                                     frame_y.to_local(dir_yz),
                                     TransportMode.Importance, P)
        fy = jnp.where(s_is1, le, fy_b)
        fz, fz_pdf = bsdf_eval_b(zv.mat_id, frame_z.to_local(-zv.wi),
                                 frame_z.to_local(-dir_yz),
                                 TransportMode.Radiance, P)
        contrib = yv.beta * fy * geo * fz * zv.beta
        worth = yv.valid & zv.valid & (contrib > 0.0) & jnp.isfinite(contrib)
        so = yv.pos + yv.gn * (
            NORMAL_OFFSET * jnp.sign(cos_gy + 1e-9)
        )[..., None]
        blocked = unflat(world.intersect_any(
            flat(so), flat(dir_yz),
            jnp.full((n * P,), INTERSECTION_TIME_OFFSET, jnp.float32),
            flat(dist) * 0.99), P)
        counters = counters.at[prof.SHADOW_RAYS].add(
            jnp.sum(worth.astype(jnp.float32)))
        # junction reverse pdfs (area measure)
        # z_{t-1} generated from y_{s-1} (same eval as fy — reuse its pdf):
        pdf_z_end_sa = jnp.where(s_is1, edir_pdf, fy_pdf_b)
        pdf_rev_z_end = _to_area_pdf(pdf_z_end_sa, yv.pos, zv.pos, zv.ns)
        # z_{t-2} generated from z_{t-1} (incoming now from y):
        _, pdf_z_prev_sa = bsdf_eval_b(zv.mat_id, frame_z.to_local(-dir_yz),
                                       frame_z.to_local(-zv.wi),
                                       TransportMode.Radiance, P)
        pdf_rev_z_prev = _to_area_pdf(pdf_z_prev_sa, zv.pos, zprev.pos,
                                      zprev.ns)
        # y_{s-1} generated from z_{t-1} (same eval as fz — reuse its pdf):
        pdf_rev_y_end = _to_area_pdf(fz_pdf, zv.pos, yv.pos, yv.ns)
        # y_{s-2} generated from y_{s-1} (incoming from z):
        _, pdf_y_prev_sa = bsdf_eval_b(yv.mat_id, frame_y.to_local(dir_yz),
                                       frame_y.to_local(-yv.wi),
                                       TransportMode.Importance, P)
        pdf_rev_y_prev = jnp.where(
            s_is1, 0.0,
            _to_area_pdf(pdf_y_prev_sa, yv.pos, yprev.pos, yprev.ns))
        w = _mis_weight_batched(y, z, s_np, t_np, D,
                                pdf_rev_y_end, pdf_rev_y_prev,
                                pdf_rev_z_end, pdf_rev_z_prev)
        own = own + jnp.sum(jnp.where(worth & ~blocked, contrib * w, 0.0),
                            axis=1)

    # ---------- t = 1: splat through the lens (lt.rs-style connection),
    # batched over s = 1..D (s=1 = light vertex direct to lens)
    s1_list = [s for s in range(1, D + 1) if pair_enabled(s, 1)]
    if s1_list:
        P1 = len(s1_list)
        s_np = jnp.asarray(s1_list, jnp.int32)
        s_is1 = (s_np == 1)[None, :]
        yv = _gather_pairs(y, [s - 1 for s in s1_list])
        yprev = _gather_pairs(y, [max(s - 2, 0) for s in s1_list])
        to_cam = lens_pt[:, None, :] - yv.pos
        dist2 = jnp.maximum(vecmath.length_squared(to_cam), 1e-12)
        dist = jnp.sqrt(dist2)
        dir_c = to_cam / dist[..., None]
        fu, fv, on_film = camera.get_pixel_for_ray(
            jnp.broadcast_to(lens_pt[:, None, :], dir_c.shape).reshape(-1, 3),
            flat(-dir_c), lam_for(P1))
        fu, fv, on_film = unflat(fu, P1), unflat(fv, P1), unflat(on_film, P1)
        cos_cam = jnp.abs(vecmath.dot(-dir_c, camera.w))
        we = safe_div(camera.we_focal()**2,
                      jnp.maximum(cos_cam, 1e-6) ** 4 * a_film)
        cos_gy = vecmath.dot(yv.gn, dir_c)
        frame_y = vecmath.TangentFrame(*_frame(yv.ns))
        le = unflat(emission(world.mats, world.bank, flat(yv.mat_id),
                             lam_for(P1), jnp.zeros((n * P1, 2)),
                             flat(cos_gy)), P1)
        fy_b, _ = bsdf_eval_b(yv.mat_id, frame_y.to_local(-yv.wi),
                              frame_y.to_local(dir_c),
                              TransportMode.Importance, P1)
        fy = jnp.where(s_is1, le, fy_b)
        geo = safe_div(jnp.abs(vecmath.dot(yv.ns, dir_c)) * cos_cam, dist2)
        contrib = yv.beta * fy * geo * we
        so = yv.pos + yv.gn * (
            NORMAL_OFFSET * jnp.sign(cos_gy + 1e-9)
        )[..., None]
        blocked = unflat(world.intersect_any(
            flat(so), flat(dir_c),
            jnp.full((n * P1,), INTERSECTION_TIME_OFFSET, jnp.float32),
            flat(dist) * 0.99), P1)
        counters = counters.at[prof.CAMERA_RAYS].add(
            jnp.sum((yv.valid & on_film).astype(jnp.float32)))
        # junction pdfs: y_{s-1} from camera; y_{s-2} from y_{s-1}
        cam_dir_pdf_sa = safe_div(camera.we_focal()**2, cos_cam**3 * a_film)
        pdf_rev_y_end = _to_area_pdf(cam_dir_pdf_sa, lens_pt[:, None, :],
                                     yv.pos, yv.ns)
        _, pdf_y_prev_sa = bsdf_eval_b(yv.mat_id, frame_y.to_local(dir_c),
                                       frame_y.to_local(-yv.wi),
                                       TransportMode.Importance, P1)
        pdf_rev_y_prev = jnp.where(
            s_is1, 0.0,
            _to_area_pdf(pdf_y_prev_sa, yv.pos, yprev.pos, yprev.ns))
        zero_p = jnp.zeros((n, P1))
        w = _mis_weight_batched(y, z, s_np, jnp.ones((P1,), jnp.int32), D,
                                pdf_rev_y_end, pdf_rev_y_prev, zero_p, zero_p)
        ok = (yv.valid & on_film & ~blocked & (contrib > 0.0)
              & jnp.isfinite(contrib))
        # p-major flatten: lam_splat below tiles lam per strategy block
        splat_uv.append(
            jnp.stack([fu, fv], axis=-1).transpose(1, 0, 2).reshape(-1, 2))
        splat_e.append(
            jnp.where(ok, contrib * w, 0.0).transpose(1, 0).reshape(-1))

    splat_uv = jnp.concatenate(splat_uv, axis=0) if splat_uv else jnp.zeros((0, 2))
    splat_e = jnp.concatenate(splat_e, axis=0) if splat_e else jnp.zeros((0,))
    lam_splat = jnp.tile(lam, (splat_e.shape[0] // max(n, 1),)) if splat_e.shape[0] else lam[:0]
    return own, splat_uv, splat_e, lam, lam_splat, counters


def _light_pos_pdf(world: World, zv):
    """Area pdf of light-subpath generation of the light vertex the eye
    path hit: uniform pick × that primitive's area (exact — the hit prim id
    is carried on the vertex)."""
    return safe_div(
        1.0, world.n_lights.astype(jnp.float32) * world.prims.area[zv.prim_id]
    )
