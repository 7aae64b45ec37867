import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.core import spectral, vecmath
from pathtracer_tpu.materials import ggx as G
from pathtracer_tpu.materials import lambertian as L
from pathtracer_tpu.materials.diffuse_light import (
    SIDE_FORWARD, SIDE_REVERSE, SIDE_DUAL, emission_diffuse,
)
from pathtracer_tpu.prelude import TransportMode


def _rand_unit(rng, n):
    v = rng.normal(size=(n, 3)).astype(np.float32)
    return jnp.asarray(v / np.linalg.norm(v, axis=-1, keepdims=True))


def test_fresnel_dielectric_normal_incidence():
    f = G.fresnel_dielectric(jnp.float32(1.0), jnp.float32(1.5), jnp.float32(1.0))
    assert abs(float(f) - 0.04) < 1e-3
    # grazing -> 1
    f = G.fresnel_dielectric(jnp.float32(1.0), jnp.float32(1.5), jnp.float32(1e-4))
    assert float(f) > 0.98
    # TIR from inside beyond critical angle
    f = G.fresnel_dielectric(jnp.float32(1.0), jnp.float32(1.5), jnp.float32(-0.5))
    assert float(f) == 1.0


def test_fresnel_conductor_reasonable():
    # gold-ish at 550nm: eta~0.42, k~2.35 -> R ~ 0.85-0.95 at normal incidence
    f = G.fresnel_conductor(jnp.float32(0.42), jnp.float32(2.35), jnp.float32(1.0))
    assert 0.75 < float(f) < 1.0


def test_lambertian_furnace():
    rng = np.random.default_rng(0)
    n = 20000
    wi = jnp.tile(jnp.array([[0.3, 0.1, 0.95]]), (n, 1))
    wi = vecmath.normalize(wi)
    u1 = jnp.asarray(rng.uniform(size=n), jnp.float32)
    u2 = jnp.asarray(rng.uniform(size=n), jnp.float32)
    refl = jnp.ones(n)
    wo, f, pdf = L.sample_lambertian(refl, wi, u1, u2)
    # E[f |cos| / pdf] == reflectance == 1 exactly (per-sample for cosine sampling)
    ratio = np.asarray(f * jnp.abs(wo[..., 2]) / jnp.maximum(pdf, 1e-9))
    assert np.allclose(ratio, 1.0, atol=1e-4)


def test_ggx_sample_eval_properties():
    """Port of the reference's proptest (src/materials/ggx.rs:637-756):
    generated samples have f >= 0, pdf >= 0, all finite, over random
    roughness/wi/λ."""
    rng = np.random.default_rng(1)
    n = 4096
    alpha = jnp.asarray(10 ** rng.uniform(-3.5, 0, size=n), jnp.float32)
    wi = _rand_unit(rng, n)
    lam = jnp.asarray(rng.uniform(400, 800, size=n), jnp.float32)
    eta_i = 1.4 + 4500.0 / (lam * lam)
    eta_o = jnp.ones(n)
    kappa = jnp.zeros(n)
    metallic = jnp.zeros(n, bool)
    perm = jnp.ones(n)
    u1 = jnp.asarray(rng.uniform(size=n), jnp.float32)
    u2 = jnp.asarray(rng.uniform(size=n), jnp.float32)
    ul = jnp.asarray(rng.uniform(size=n), jnp.float32)
    wo, f, pdf, w = G.sample_ggx(
        alpha, eta_i, eta_o, kappa, metallic, perm, wi, u1, u2, ul, TransportMode.Radiance
    )
    f, pdf, w = np.asarray(f), np.asarray(pdf), np.asarray(w)
    assert np.all(np.isfinite(f)) and np.all(np.isfinite(pdf)) and np.all(np.isfinite(w))
    assert np.all(f >= 0) and np.all(pdf >= 0) and np.all(w >= 0)
    # swapped args also valid (reciprocity-shaped check)
    f2, pdf2 = G.eval_ggx(
        alpha, eta_i, eta_o, kappa, metallic, perm, wo, wi, TransportMode.Radiance
    )
    assert np.all(np.isfinite(np.asarray(f2))) and np.all(np.asarray(pdf2) >= 0)


def test_ggx_furnace_smooth_glass():
    """White-furnace energy: near-specular dielectric with transmission must
    return ~1 (reference test_integral, src/materials/ggx.rs:942-979)."""
    rng = np.random.default_rng(2)
    n = 200_000
    alpha = jnp.full(n, 0.05)
    wi = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    eta_i = jnp.full(n, 1.5)
    eta_o = jnp.ones(n)
    kappa = jnp.zeros(n)
    metallic = jnp.zeros(n, bool)
    perm = jnp.ones(n)
    u1 = jnp.asarray(rng.uniform(size=n), jnp.float32)
    u2 = jnp.asarray(rng.uniform(size=n), jnp.float32)
    ul = jnp.asarray(rng.uniform(size=n), jnp.float32)
    wo, f, pdf, w = G.sample_ggx(
        alpha, eta_i, eta_o, kappa, metallic, perm, wi, u1, u2, ul, TransportMode.Importance
    )
    # closed-form weight and recomputed f·cos/pdf must both conserve energy
    est = float(np.asarray(w).mean())
    assert abs(est - 1.0) < 0.03, est
    w2 = np.asarray(f * jnp.abs(wo[..., 2]) / jnp.maximum(pdf, 1e-12))
    w2 = w2[np.asarray(pdf) > 1e-9]
    assert abs(w2.mean() - 1.0) < 0.05, w2.mean()


def test_ggx_metal_energy_below_one():
    rng = np.random.default_rng(3)
    n = 100_000
    alpha = jnp.full(n, 0.1)
    wi = vecmath.normalize(jnp.tile(jnp.array([[0.2, 0.0, 0.98]]), (n, 1)))
    eta_i = jnp.full(n, 0.42)
    eta_o = jnp.ones(n)
    kappa = jnp.full(n, 2.35)
    metallic = jnp.ones(n, bool)
    perm = jnp.zeros(n)
    u1 = jnp.asarray(rng.uniform(size=n), jnp.float32)
    u2 = jnp.asarray(rng.uniform(size=n), jnp.float32)
    ul = jnp.asarray(rng.uniform(size=n), jnp.float32)
    wo, f, pdf, w = G.sample_ggx(
        alpha, eta_i, eta_o, kappa, metallic, perm, wi, u1, u2, ul, TransportMode.Importance
    )
    est = float(np.asarray(w).mean())
    assert 0.5 < est <= 1.01, est


def test_diffuse_light_sidedness():
    spd = jnp.float32(3.14159265)
    up, down = jnp.float32(0.8), jnp.float32(-0.8)
    assert float(emission_diffuse(spd, SIDE_FORWARD, up)) > 0
    assert float(emission_diffuse(spd, SIDE_FORWARD, down)) == 0
    assert float(emission_diffuse(spd, SIDE_REVERSE, down)) > 0
    assert float(emission_diffuse(spd, SIDE_REVERSE, up)) == 0
    assert float(emission_diffuse(spd, SIDE_DUAL, up)) > 0
    assert float(emission_diffuse(spd, SIDE_DUAL, down)) > 0
