"""Hero-wavelength spectral MIS (Wilkie et al. 2014) regression: a unit
furnace with a near-delta DISPERSIVE dielectric sphere must conserve energy
with HWSS enabled.

Before the pdf-ratio-product estimator, companion λ lanes starved on every
dispersive refraction (their BSDF is ~0 at the hero-sampled direction and
nothing compensated), losing their share — ~55% of all transmitted energy at
C=4 — in pt.py, pt_regen AND the megakernel. The reference never hits this
because its HWSS is dormant upstream (SURVEY §2.8); this framework's HWSS is
active, so it must also be correct.
"""

import jax
import numpy as np
import pytest

from pathtracer_tpu.camera import make_projective_camera
from pathtracer_tpu.core import spectral
from pathtracer_tpu.integrator.pt import PTSettings
from pathtracer_tpu.integrator.pt_regen import pt_trace_regen
from pathtracer_tpu.parsing.builder import SceneBuilder
from pathtracer_tpu.renderer.naive import render_sampled


def _furnace_world(dispersive=True, alpha=0.0004):
    b = SceneBuilder()
    if dispersive:
        # diamond-like Cauchy: eta 2.40 + 34000/λ² (≈2.62 at 400nm)
        eta = b.add_curve(spectral.CauchyCurve(2.4, 34000.0), name="eta")
    else:
        eta = b.add_curve(spectral.FlatCurve(1.5), name="eta")
    air = b.add_curve(spectral.FlatCurve(1.0), name="air")
    kz = b.add_curve(spectral.FlatCurve(0.0), name="kz")
    mg = b.add_ggx(alpha, eta, air, kz, permeability=1.0, name="mg")
    b.add_sphere([0.0, 0.0, 0.0], 0.8, mg)
    one = b.add_curve(spectral.FlatCurve(1.0), name="one")
    b.set_environment_constant(one, 1.0)
    return b.build()


CAM = make_projective_camera(
    look_from=[0.0, -3.0, 0.0], look_at=[0.0, 0.0, 0.0], vfov_degrees=35.0,
    focal_distance=3.0, aperture_diameter=0.0, aspect_ratio=1.0)


def _center_over_corner(y_img, h, w):
    center = y_img[h // 2 - 3:h // 2 + 3, w // 2 - 3:w // 2 + 3].mean()
    corner = np.concatenate([y_img[:3, :3].ravel(),
                             y_img[-3:, -3:].ravel()]).mean()
    return center / corner


@pytest.mark.parametrize("dispersive", [True, False])
def test_dispersive_furnace_regen_hwss(dispersive):
    w = h = 16
    spp = 256
    s = PTSettings(max_bounces=32, min_bounces=4, light_samples=0,
                   russian_roulette=False, hwss=True)
    world = _furnace_world(dispersive)
    acc, _ = pt_trace_regen(world, CAM, s, w, h, spp, jax.random.PRNGKey(0))
    img = (np.asarray(acc)[:, 1] / spp).reshape(h, w)
    assert abs(_center_over_corner(img, h, w) - 1.0) < 0.06


def test_dispersive_furnace_wavefront_hwss():
    w = h = 16
    spp = 128
    s = PTSettings(max_bounces=32, min_bounces=4, light_samples=0,
                   russian_roulette=False, hwss=True)
    world = _furnace_world(True)
    film, _, _ = render_sampled(world, CAM, s, w, h, spp,
                                jax.random.PRNGKey(7), sample_chunk=64)
    img = np.asarray(film)[:, :, 1]
    assert abs(_center_over_corner(img, h, w) - 1.0) < 0.08


@pytest.mark.slow
def test_dispersive_furnace_mega_hwss():
    from pathtracer_tpu.kernels.megakernel import pt_trace_regen_mega

    w = h = 16
    spp = 64
    s = PTSettings(max_bounces=24, min_bounces=4, light_samples=0,
                   russian_roulette=False, hwss=True)
    world = _furnace_world(True)
    acc, _ = pt_trace_regen_mega(world, CAM, s, w, h, spp,
                                 jax.random.PRNGKey(3), interpret=True)
    img = (np.asarray(acc)[:, 1] / spp).reshape(h, w)
    assert abs(_center_over_corner(img, h, w) - 1.0) < 0.12
