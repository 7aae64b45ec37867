"""Componentwise kernel math (kernels/cmath.py) vs the [..., 3] wavefront
implementations — must agree to float tolerance on random batches, since the
Pallas megakernel's physics rides entirely on these ports."""

import numpy as np
import jax.numpy as jnp
import pytest

from pathtracer_tpu.core import vecmath, sampling
from pathtracer_tpu.kernels import cmath
from pathtracer_tpu.kernels.cmath import V3
from pathtracer_tpu.materials import ggx as ggx_ref
from pathtracer_tpu.materials import lambertian as lam_ref
from pathtracer_tpu.prelude import TransportMode

N = 4096


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def unit(rng, n=N):
    v = rng.normal(size=(n, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v


def as_v3(a):
    return V3(jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]), jnp.asarray(a[:, 2]))


def v3_np(v):
    return np.stack([np.asarray(v.x), np.asarray(v.y), np.asarray(v.z)], axis=-1)


def test_vector_ops(rng):
    a, b = unit(rng), unit(rng)
    av, bv = as_v3(a), as_v3(b)
    np.testing.assert_allclose(np.asarray(cmath.dot(av, bv)),
                               np.asarray(vecmath.dot(jnp.asarray(a), jnp.asarray(b))),
                               rtol=1e-6)
    np.testing.assert_allclose(v3_np(cmath.cross(av, bv)),
                               np.asarray(jnp.cross(jnp.asarray(a), jnp.asarray(b))),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(v3_np(cmath.reflect(av, bv)),
                               np.asarray(vecmath.reflect(jnp.asarray(a), jnp.asarray(b))),
                               rtol=1e-5, atol=1e-6)
    eta = rng.uniform(0.4, 1.6, N).astype(np.float32)
    wt_c, tir_c = cmath.refract(av, bv, jnp.asarray(eta))
    wt_r, tir_r = vecmath.refract(jnp.asarray(a), jnp.asarray(b), jnp.asarray(eta))
    np.testing.assert_array_equal(np.asarray(tir_c), np.asarray(tir_r))
    np.testing.assert_allclose(v3_np(wt_c), np.asarray(wt_r), rtol=1e-5, atol=1e-6)
    t_c, b_c = cmath.orthonormal_basis(av)
    t_r, b_r = vecmath.orthonormal_basis(jnp.asarray(a))
    np.testing.assert_allclose(v3_np(t_c), np.asarray(t_r), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(v3_np(b_c), np.asarray(b_r), rtol=1e-5, atol=1e-6)


def test_frame_roundtrip(rng):
    n = unit(rng)
    w = unit(rng)
    nv, wv = as_v3(n), as_v3(w)
    t, b = cmath.orthonormal_basis(nv)
    wl = cmath.to_local(t, b, nv, wv)
    frame = vecmath.TangentFrame(*vecmath.orthonormal_basis(jnp.asarray(n)), jnp.asarray(n))
    wl_ref = frame.to_local(jnp.asarray(w))
    np.testing.assert_allclose(v3_np(wl), np.asarray(wl_ref), rtol=1e-5, atol=1e-6)
    back = cmath.to_world(t, b, nv, wl)
    np.testing.assert_allclose(v3_np(back), w, rtol=1e-4, atol=1e-5)


def test_equirect(rng):
    d = unit(rng)
    u_c, v_c = cmath.direction_to_uv(as_v3(d))
    u_r, v_r = vecmath.direction_to_uv(jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(u_c), np.asarray(u_r), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_c), np.asarray(v_r), rtol=1e-5, atol=1e-6)
    dd = cmath.uv_to_direction(jnp.asarray(np.asarray(u_c)), jnp.asarray(np.asarray(v_c)))
    np.testing.assert_allclose(
        v3_np(dd), np.asarray(vecmath.uv_to_direction(u_r, v_r)), rtol=1e-4, atol=1e-5)


def test_samplers(rng):
    u1 = rng.random(N).astype(np.float32)
    u2 = rng.random(N).astype(np.float32)
    c = cmath.random_cosine_direction(jnp.asarray(u1), jnp.asarray(u2))
    r = sampling.random_cosine_direction(jnp.asarray(u1), jnp.asarray(u2))
    np.testing.assert_allclose(v3_np(c), np.asarray(r), rtol=1e-5, atol=1e-6)
    dx, dy = cmath.random_in_unit_disk(jnp.asarray(u1), jnp.asarray(u2))
    dr = sampling.random_in_unit_disk(jnp.asarray(u1), jnp.asarray(u2))
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dr)[:, 0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dy), np.asarray(dr)[:, 1], rtol=1e-5, atol=1e-6)


def test_lambertian(rng):
    wi, wo = unit(rng), unit(rng)
    refl = rng.uniform(0, 1.2, N).astype(np.float32)
    f_c, p_c = cmath.eval_lambertian(jnp.asarray(refl), as_v3(wi), as_v3(wo))
    f_r, p_r = lam_ref.eval_lambertian(jnp.asarray(refl), jnp.asarray(wi), jnp.asarray(wo))
    np.testing.assert_allclose(np.asarray(f_c), np.asarray(f_r), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p_c), np.asarray(p_r), rtol=1e-6)
    u1 = rng.random(N).astype(np.float32)
    u2 = rng.random(N).astype(np.float32)
    wo_c, f_c, p_c = cmath.sample_lambertian(jnp.asarray(refl), as_v3(wi),
                                             jnp.asarray(u1), jnp.asarray(u2))
    wo_r, f_r, p_r = lam_ref.sample_lambertian(jnp.asarray(refl), jnp.asarray(wi),
                                               jnp.asarray(u1), jnp.asarray(u2))
    np.testing.assert_allclose(v3_np(wo_c), np.asarray(wo_r), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(f_c), np.asarray(f_r), rtol=1e-6)


def _ggx_params(rng):
    alpha = rng.uniform(0.01, 1.0, N).astype(np.float32)
    eta_i = rng.uniform(1.1, 2.4, N).astype(np.float32)
    eta_o = np.ones(N, np.float32)
    kappa = np.where(rng.random(N) < 0.5, 0.0, rng.uniform(0.5, 4.0, N)).astype(np.float32)
    metallic = jnp.asarray(kappa > 0.0)
    perm = rng.uniform(0.0, 1.0, N).astype(np.float32)
    return (jnp.asarray(alpha), jnp.asarray(eta_i), jnp.asarray(eta_o),
            jnp.asarray(kappa), metallic, jnp.asarray(perm))


def test_ggx_eval(rng):
    wi, wo = unit(rng), unit(rng)
    alpha, eta_i, eta_o, kappa, metallic, perm = _ggx_params(rng)
    for mode in (TransportMode.Radiance, TransportMode.Importance):
        f_c, p_c = cmath.eval_ggx(alpha, eta_i, eta_o, kappa, metallic, perm,
                                  as_v3(wi), as_v3(wo), mode)
        f_r, p_r = ggx_ref.eval_ggx(alpha, eta_i, eta_o, kappa, metallic, perm,
                                    jnp.asarray(wi), jnp.asarray(wo), mode)
        np.testing.assert_allclose(np.asarray(f_c), np.asarray(f_r), rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(p_c), np.asarray(p_r), rtol=2e-4, atol=1e-6)


def test_ggx_sample(rng):
    wi = unit(rng)
    alpha, eta_i, eta_o, kappa, metallic, perm = _ggx_params(rng)
    u1 = rng.random(N).astype(np.float32)
    u2 = rng.random(N).astype(np.float32)
    ul = rng.random(N).astype(np.float32)
    wo_c, f_c, p_c, w_c = cmath.sample_ggx(
        alpha, eta_i, eta_o, kappa, metallic, perm, as_v3(wi),
        jnp.asarray(u1), jnp.asarray(u2), jnp.asarray(ul), TransportMode.Radiance)
    wo_r, f_r, p_r, w_r = ggx_ref.sample_ggx(
        alpha, eta_i, eta_o, kappa, metallic, perm, jnp.asarray(wi),
        jnp.asarray(u1), jnp.asarray(u2), jnp.asarray(ul), TransportMode.Radiance)
    np.testing.assert_allclose(v3_np(wo_c), np.asarray(wo_r), rtol=1e-4, atol=1e-5)

    def mostly_close(a, b, frac=0.995):
        # near-delta lobes amplify last-ulp wo differences into large f/pdf
        # relative deltas; demand 99.5% tight agreement + everything finite
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all()
        ok = np.isclose(a, b, rtol=1e-3, atol=1e-6)
        assert ok.mean() >= frac, f"only {ok.mean():.4f} within tolerance"

    mostly_close(f_c, f_r)
    mostly_close(p_c, p_r)
    mostly_close(w_c, w_r)


def test_ggx_near_delta_stable(rng):
    """Near-delta lobes (gem/arrangement alpha=4e-4): f and pdf must agree
    TIGHTLY between the kernel math and the XLA tables math. The textbook
    D denominator nz2*(a2-1)+1 cancels catastrophically in f32 at wh_z~1 —
    before the stable a2*cos2+sin2 form, claimed pdfs collapsed ~1e4x on
    the last ulp of wh_z (killing paths via the sample_ok gates and
    corrupting MIS weights) while the closed-form weight hid it."""
    n = N
    wi = unit(rng)
    for alpha_v, eta_v in ((4e-4, 2.45), (4e-4, 1.5), (1e-4, 1.5)):
        alpha = jnp.full(n, max(alpha_v, 1e-4), jnp.float32)
        eta_i = jnp.full(n, eta_v, jnp.float32)
        eta_o = jnp.ones(n, jnp.float32)
        kappa = jnp.zeros(n, jnp.float32)
        metallic = jnp.zeros(n, bool)
        perm = jnp.ones(n, jnp.float32)
        u1 = jnp.asarray(rng.random(n).astype(np.float32))
        u2 = jnp.asarray(rng.random(n).astype(np.float32))
        ul = jnp.asarray(rng.random(n).astype(np.float32))
        wo_c, f_c, p_c, w_c = cmath.sample_ggx(
            alpha, eta_i, eta_o, kappa, metallic, perm, as_v3(wi),
            u1, u2, ul, TransportMode.Radiance)
        wo_r, f_r, p_r, w_r = ggx_ref.sample_ggx(
            alpha, eta_i, eta_o, kappa, metallic, perm, jnp.asarray(wi),
            u1, u2, ul, TransportMode.Radiance)
        f_c, p_c, f_r, p_r = map(np.asarray, (f_c, p_c, f_r, p_r))
        # mean ratios catch any systematic scale divergence (were ~1e-4)
        assert abs(f_c.mean() / f_r.mean() - 1.0) < 1e-3
        assert abs(p_c.mean() / p_r.mean() - 1.0) < 1e-3
        np.testing.assert_allclose(np.asarray(w_c), np.asarray(w_r),
                                   rtol=1e-4, atol=1e-6)
        # sampled pdfs must be far above the integrators' 1e-12 kill gates
        pos = p_r > 0
        assert np.percentile(p_c[pos], 1) > 1.0
        # eval at the sampled direction: same scale both paths
        fe_c, pe_c = cmath.eval_ggx(alpha, eta_i, eta_o, kappa, metallic,
                                    perm, as_v3(wi), as_v3(np.asarray(wo_r)),
                                    TransportMode.Radiance)
        fe_r, pe_r = ggx_ref.eval_ggx(alpha, eta_i, eta_o, kappa, metallic,
                                      perm, jnp.asarray(wi), wo_r,
                                      TransportMode.Radiance)
        fe_c, pe_c, fe_r, pe_r = map(np.asarray, (fe_c, pe_c, fe_r, pe_r))
        assert abs(fe_c.mean() / fe_r.mean() - 1.0) < 1e-3
        assert abs(pe_c.mean() / pe_r.mean() - 1.0) < 1e-3
