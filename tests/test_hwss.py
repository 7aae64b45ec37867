"""Hero-wavelength spectral sampling: unbiasedness + variance reduction
(the reference's hwss flag, src/parsing/config.rs:51 + random_walk_hero,
utils.rs:377-602)."""

import numpy as np
import jax
import pytest

from pathtracer_tpu.camera import make_projective_camera
from pathtracer_tpu.core import spectral
from pathtracer_tpu.core.bounds import BOUNDED_VISIBLE_RANGE
from pathtracer_tpu.integrator.pt import PTSettings, sample_hero_wavelengths
from pathtracer_tpu.materials.diffuse_light import SIDE_REVERSE
from pathtracer_tpu.parsing import SceneBuilder
from pathtracer_tpu.renderer import render_sampled

pytestmark = pytest.mark.slow  # heavy render test (see pytest.ini)


def test_hero_wavelengths_cover_range():
    lam = np.asarray(sample_hero_wavelengths(jax.random.PRNGKey(0), 1000,
                                             BOUNDED_VISIBLE_RANGE, 4))
    assert lam.shape == (1000, 4)
    assert lam.min() >= 380.0 and lam.max() <= 780.0
    # rotations are span/4 apart modulo the range
    d = np.sort((lam - lam[:, :1]) % 400.0, axis=1)
    assert np.allclose(d[:, 1], 100.0, atol=1e-3)


def _scene():
    b = SceneBuilder()
    white = b.add_curve(spectral.FlatCurve(0.7), name="white")
    emit = b.add_curve(spectral.BlackbodyCurve(4500.0, 30.0), name="emit")
    b78 = b.add_curve(spectral.FlatCurve(0.78), name="b78")
    zero = b.add_curve(spectral.FlatCurve(0.0), name="zero")
    one_px = np.ones((1, 1), np.float32)
    tw = b.add_texture([(one_px, white)], name="tw")
    mw = b.add_lambertian(tw, name="mw")
    ml = b.add_diffuse_light(emit, b78, SIDE_REVERSE, name="ml")
    s = 0.5
    b.add_rect([s, s, 0.0], [s, 0, 0], [0, s, 0], mw)
    b.add_rect([s, s, 2 * s], [s, 0, 0], [0, s, 0], mw)
    b.add_rect([2 * s, s, s], [0, s, 0], [0, 0, s], mw)
    b.add_rect([s, 2 * s, s], [s, 0, 0], [0, 0, s], mw)
    b.add_rect([s, 0.0, s], [s, 0, 0], [0, 0, s], mw)
    b.add_rect([s, s, 2 * s - 1e-3], [0.2, 0, 0], [0, 0.2, 0], ml)
    b.set_environment_constant(zero, 0.0)
    b.env_sampling_probability = 0.0
    world = b.build()
    cam = make_projective_camera([-1.2, 0.5, 0.5], [0.5, 0.5, 0.5],
                                 vfov_degrees=45.0, focal_distance=1.7,
                                 aperture_diameter=0.0)
    return world, cam


def test_hwss_unbiased_and_lower_variance():
    world, cam = _scene()
    res = 12
    common = dict(max_bounces=3, min_bounces=3, light_samples=1,
                  russian_roulette=False)
    f1, _, _ = render_sampled(world, cam, PTSettings(hwss=False, **common),
                              res, res, 200, key=jax.random.PRNGKey(1),
                              sample_chunk=50)
    f4, _, _ = render_sampled(world, cam, PTSettings(hwss=True, **common),
                              res, res, 200, key=jax.random.PRNGKey(2),
                              sample_chunk=50)
    m1 = float(np.asarray(f1[..., 1]).mean())
    m4 = float(np.asarray(f4[..., 1]).mean())
    assert abs(m4 - m1) / m1 < 0.1, (m1, m4)

    # variance: compare per-pixel scatter across two short independent runs
    a1, _, _ = render_sampled(world, cam, PTSettings(hwss=False, **common),
                              res, res, 8, key=jax.random.PRNGKey(3), sample_chunk=8)
    b1, _, _ = render_sampled(world, cam, PTSettings(hwss=False, **common),
                              res, res, 8, key=jax.random.PRNGKey(4), sample_chunk=8)
    a4, _, _ = render_sampled(world, cam, PTSettings(hwss=True, **common),
                              res, res, 8, key=jax.random.PRNGKey(3), sample_chunk=8)
    b4, _, _ = render_sampled(world, cam, PTSettings(hwss=True, **common),
                              res, res, 8, key=jax.random.PRNGKey(4), sample_chunk=8)
    noise1 = float(np.mean((np.asarray(a1) - np.asarray(b1)) ** 2))
    noise4 = float(np.mean((np.asarray(a4) - np.asarray(b4)) ** 2))
    assert noise4 < 0.6 * noise1, (noise1, noise4)
