"""BDPT vs PT consistency: BDPT's MIS-weighted strategies must sum to an
unbiased estimate of the same image (reference BDPT capability,
src/integrator/bdpt/)."""

import numpy as np
import jax
import pytest

from pathtracer_tpu.camera import make_projective_camera
from pathtracer_tpu.core import spectral
from pathtracer_tpu.integrator.pt import PTSettings
from pathtracer_tpu.integrator.bdpt import BDPTSettings
from pathtracer_tpu.materials.diffuse_light import SIDE_REVERSE
from pathtracer_tpu.parsing import SceneBuilder
from pathtracer_tpu.renderer import render_sampled
from pathtracer_tpu.renderer.bdpt_renderer import render_bdpt

pytestmark = pytest.mark.slow  # heavy render test (see pytest.ini)


@pytest.fixture(scope="module")
def box_scene():
    b = SceneBuilder()
    white = b.add_curve(spectral.FlatCurve(0.7), name="white")
    emit = b.add_curve(spectral.FlatCurve(40.0), name="emit")
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
    cam = make_projective_camera(
        look_from=[-1.2, 0.5, 0.5], look_at=[0.5, 0.5, 0.5], vfov_degrees=45.0,
        focal_distance=1.7, aperture_diameter=0.0, aspect_ratio=1.0,
    )
    return world, cam


def test_bdpt_matches_pt_mean(box_scene):
    world, cam = box_scene
    res = 12
    # matched coverage: BDPT max_depth=3 integrates <=5-segment paths
    # (s+t-1); PT with final-vertex NEE integrates <= max_bounces+1
    pt_film, _, _ = render_sampled(
        world, cam, PTSettings(max_bounces=4, min_bounces=4, light_samples=1,
                               russian_roulette=False),
        res, res, min_samples=300, key=jax.random.PRNGKey(5), sample_chunk=75,
    )
    bd_film, _, _ = render_bdpt(
        world, cam, BDPTSettings(max_depth=3),
        res, res, min_samples=150, key=jax.random.PRNGKey(6),
    )
    pt_y = float(np.asarray(pt_film[..., 1]).mean())
    bd_y = float(np.asarray(bd_film[..., 1]).mean())
    assert np.all(np.isfinite(np.asarray(bd_film)))
    assert bd_y > 0
    assert abs(bd_y - pt_y) / pt_y < 0.05, (pt_y, bd_y)


def test_bdpt_selected_pair_decomposition(box_scene):
    """Σ_(s,t) single-pair renders ≈ the full BDPT render (the reference's
    selected_pair debug config, src/parsing/config.rs:25-27)."""
    world, cam = box_scene
    res = 8
    full, _, _ = render_bdpt(
        world, cam, BDPTSettings(max_depth=2), res, res, min_samples=80,
        key=jax.random.PRNGKey(7),
    )
    parts = []
    for pair in [(0, 2), (1, 2), (2, 2), (1, 1), (2, 1)]:
        f, _, _ = render_bdpt(
            world, cam, BDPTSettings(max_depth=2, selected_pair=pair),
            res, res, min_samples=80, key=jax.random.PRNGKey(7),
        )
        parts.append(np.asarray(f))
    total = np.stack(parts).sum(0)
    full = np.asarray(full)
    assert np.allclose(total[..., 1].mean(), full[..., 1].mean(), rtol=1e-3)


def test_bdpt_env_strategies_match_pt():
    """Env-lit scene through BDPT: the s=0 escape + env-NEE strategy family
    (round-1 gap) must agree with PT (reference env cases,
    bdpt/utils.rs:18-116)."""
    b = SceneBuilder()
    white = b.add_curve(spectral.FlatCurve(0.6), name="white")
    envc = b.add_curve(spectral.FlatCurve(1.5), name="envc")
    one_px = np.ones((1, 1), np.float32)
    tw = b.add_texture([(one_px, white)], name="tw")
    mw = b.add_lambertian(tw, name="mw")
    b.add_sphere([0.0, 0.0, 0.0], 1.0, mw)
    b.set_environment_constant(envc, 1.0)
    b.env_sampling_probability = 1.0
    world = b.build()
    cam = make_projective_camera(
        look_from=[-3.0, 0.0, 0.0], look_at=[0.0, 0.0, 0.0], vfov_degrees=30.0,
        focal_distance=3.0, aperture_diameter=0.0, aspect_ratio=1.0,
    )
    res = 12
    pt_film, _, _ = render_sampled(
        world, cam, PTSettings(max_bounces=3, min_bounces=3, light_samples=1,
                               russian_roulette=False),
        res, res, min_samples=200, key=jax.random.PRNGKey(8), sample_chunk=50,
    )
    bd_film, profile, _ = render_bdpt(
        world, cam, BDPTSettings(max_depth=3),
        res, res, min_samples=100, key=jax.random.PRNGKey(9),
    )
    pt_y = float(np.asarray(pt_film[..., 1]).mean())
    bd_y = float(np.asarray(bd_film[..., 1]).mean())
    assert bd_y > 0, "BDPT env-lit render is black"
    assert profile.total_rays > 0, "BDPT Profile must count rays now"
    assert abs(bd_y - pt_y) / pt_y < 0.05, (pt_y, bd_y)


def test_bdpt_thin_lens_aperture_matches_pt(box_scene):
    """Finite-aperture BDPT: camera-side connections use the eye path's
    sampled lens point (round 1 used a pinhole at camera.origin)."""
    world, _ = box_scene
    cam = make_projective_camera(
        look_from=[-1.2, 0.5, 0.5], look_at=[0.5, 0.5, 0.5], vfov_degrees=45.0,
        focal_distance=1.7, aperture_diameter=0.15, aspect_ratio=1.0,
    )
    res = 12
    pt_film, _, _ = render_sampled(
        world, cam, PTSettings(max_bounces=4, min_bounces=4, light_samples=1,
                               russian_roulette=False),
        res, res, min_samples=300, key=jax.random.PRNGKey(10), sample_chunk=75,
    )
    bd_film, _, _ = render_bdpt(
        world, cam, BDPTSettings(max_depth=3),
        res, res, min_samples=150, key=jax.random.PRNGKey(11),
    )
    pt_y = float(np.asarray(pt_film[..., 1]).mean())
    bd_y = float(np.asarray(bd_film[..., 1]).mean())
    assert bd_y > 0
    assert abs(bd_y - pt_y) / pt_y < 0.05, (pt_y, bd_y)


def test_bdpt_realistic_camera_matches_pt(box_scene):
    """BDPT through a full lens assembly (VERDICT r3 #8): eye subpaths ride
    the λ-aware camera_ray dispatch, t=1 splats reverse-trace to film, and
    the camera pdfs/W_e use the assembly's chief-ray effective focal
    length. Means must agree with PT within MC noise."""
    from pathtracer_tpu.camera.realistic import make_realistic_camera

    world, _ = box_scene
    cam = make_realistic_camera(
        dict(lens_spec="/root/reference/data/cameras/petzval_kodak.txt",
             fstop=2.0, sensor_size=35.0,
             look_from=[-1.2, 0.5, 0.5], look_at=[0.5, 0.5, 0.5]),
        aspect_ratio=1.0,
    )
    res = 16
    pt_film, _, _ = render_sampled(
        world, cam, PTSettings(max_bounces=4, min_bounces=4, light_samples=1,
                               russian_roulette=False),
        res, res, min_samples=200, key=jax.random.PRNGKey(5), sample_chunk=50,
    )
    bd_film, profile, _ = render_bdpt(
        world, cam, BDPTSettings(max_depth=5), res, res, 60,
        key=jax.random.PRNGKey(6),
    )
    pt_y = float(np.asarray(pt_film[..., 1]).mean())
    bd_y = float(np.asarray(bd_film[..., 1]).mean())
    assert pt_y > 0 and bd_y > 0
    assert abs(bd_y - pt_y) / pt_y < 0.15, (pt_y, bd_y)
