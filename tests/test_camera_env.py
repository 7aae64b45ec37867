"""Camera inversion + Sun environment + importance-map cache tests
(reference: src/camera/projective_camera.rs:213-309 ray<->pixel inversion,
src/world/environment.rs Sun, importance-map bincode cache)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from pathtracer_tpu.camera import make_projective_camera
from pathtracer_tpu.camera.panorama import make_panorama_camera
from pathtracer_tpu.core import spectral, vecmath
from pathtracer_tpu.parsing import SceneBuilder
from pathtracer_tpu.world.environment import ENV_SUN, Environment, env_emission, env_pdf_for, env_sample_uv
from pathtracer_tpu.world import importance_map as imp


def test_projective_ray_pixel_roundtrip():
    cam = make_projective_camera([1.0, 2.0, 3.0], [4.0, 2.0, 2.0],
                                 vfov_degrees=50.0, focal_distance=2.5,
                                 aperture_diameter=0.02, aspect_ratio=1.5)
    rng = np.random.default_rng(0)
    fu = jnp.asarray(rng.uniform(0.05, 0.95, 256), jnp.float32)
    fv = jnp.asarray(rng.uniform(0.05, 0.95, 256), jnp.float32)
    u1 = jnp.asarray(rng.uniform(size=256), jnp.float32)
    u2 = jnp.asarray(rng.uniform(size=256), jnp.float32)
    o, d, tau = cam.get_ray(fu, fv, u1, u2)
    bu, bv, ok = cam.get_pixel_for_ray(o, d)
    assert np.asarray(ok).all()
    assert np.allclose(np.asarray(bu), np.asarray(fu), atol=2e-3)
    assert np.allclose(np.asarray(bv), np.asarray(fv), atol=2e-3)


def test_panorama_ray_pixel_roundtrip():
    cam = make_panorama_camera([0, 0, 0], [1, 0, 0], fov_degrees=(180.0, 90.0))
    rng = np.random.default_rng(1)
    fu = jnp.asarray(rng.uniform(0.1, 0.9, 128), jnp.float32)
    fv = jnp.asarray(rng.uniform(0.1, 0.9, 128), jnp.float32)
    o, d, tau = cam.get_ray(fu, fv)
    assert np.allclose(np.asarray(vecmath.length(d)), 1.0, atol=1e-5)
    bu, bv, ok = cam.get_pixel_for_ray(o, d)
    assert np.asarray(ok).all()
    assert np.allclose(np.asarray(bu), np.asarray(fu), atol=1e-3)
    assert np.allclose(np.asarray(bv), np.asarray(fv), atol=1e-3)


def _sun_env(builder):
    one = builder.add_curve(spectral.FlatCurve(1.0), name="one")
    base = Environment.constant(one, 5.0)
    sd = np.array([0.3, 0.2, 0.9])
    sd = sd / np.linalg.norm(sd)
    return base._replace(
        kind=jnp.int32(ENV_SUN),
        sun_direction=jnp.asarray(sd, jnp.float32),
        sun_cos_angle=jnp.float32(np.cos(0.15)),
    ), sd


def test_sun_environment_cap():
    b = SceneBuilder()
    env, sd = _sun_env(b)
    b.env = env
    zero = b.add_curve(spectral.FlatCurve(0.0), name="z")
    tex = b.add_texture([(np.ones((1, 1), np.float32), zero)], name="t")
    m = b.add_lambertian(tex, name="m")
    b.add_sphere([100.0, 0, 0], 0.1, m)  # far dummy prim
    world = b.build()
    lam = jnp.full((3,), 550.0)
    d_in = jnp.asarray(np.stack([sd, sd, sd]), jnp.float32)
    e = env_emission(world.env, world.bank, world.tex, d_in, lam)
    assert np.all(np.asarray(e) == pytest.approx(5.0))
    d_out = jnp.asarray(np.stack([-sd] * 3), jnp.float32)
    e0 = env_emission(world.env, world.bank, world.tex, d_out, lam)
    assert np.all(np.asarray(e0) == 0.0)
    # sampling stays in the cap with pdf = 1/cap area
    rng = np.random.default_rng(2)
    u1 = jnp.asarray(rng.uniform(size=512), jnp.float32)
    u2 = jnp.asarray(rng.uniform(size=512), jnp.float32)
    d_s, pdf = env_sample_uv(world.env, u1, u2)
    cosang = np.asarray(vecmath.dot(d_s, jnp.asarray(sd, jnp.float32)))
    assert (cosang >= np.cos(0.15) - 1e-5).all()
    cap = 2 * np.pi * (1 - np.cos(0.15))
    assert np.allclose(np.asarray(pdf), 1.0 / cap, rtol=1e-4)


def test_importance_map_cache_roundtrip(tmp_path):
    layers = [(np.random.default_rng(0).uniform(size=(8, 16)).astype(np.float32), 0)]
    curves = [spectral.FlatCurve(1.0)]
    m1, r1, p1 = imp.load_or_bake(str(tmp_path), "tex", layers, curves, 16, 8)
    cache_file = os.path.join(str(tmp_path), "importance_maps")
    assert os.path.isdir(cache_file) and len(os.listdir(cache_file)) == 1
    # second call loads the cache (poison the layers to prove it)
    m2, r2, p2 = imp.load_or_bake(str(tmp_path), "tex",
                                  [(np.zeros((8, 16), np.float32), 0)], curves, 16, 8)
    assert np.array_equal(m1, m2) and np.array_equal(p1, p2)
