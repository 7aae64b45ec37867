"""LT megakernel validation (interpret mode on CPU): estimator-level
agreement vs the XLA LT wavefront (integrator/lt.py — same spawn machinery
by construction via spawn_particles, same per-vertex math; different RNG
streams, so films agree statistically)."""

import numpy as np
import jax
import pytest

from pathtracer_tpu.integrator.lt import LTSettings, lt_trace
from pathtracer_tpu.kernels.lt_mega import lt_mega_available, lt_trace_mega
from pathtracer_tpu.parsing.cameras import build_camera
from pathtracer_tpu.parsing.construct import construct_world


@pytest.fixture(scope="module")
def cornell():
    return construct_world(
        "data/scenes/cornell_box.toml",
        search_paths=["/root/repo", "/root/reference"],
        cache_dir="/tmp/pt_cache", camera_surfaces=True,
    )


def test_lt_mega_gate(cornell):
    cam = build_camera(cornell.camera_by_id("main"), aspect_ratio=1.0)
    s = LTSettings(max_bounces=4, camera_samples=1)
    assert lt_mega_available(cornell.world, cam, s)


def test_lt_mega_matches_xla(cornell):
    """Film-total agreement within MC noise at equal path counts; exact
    spawn-count parity. (Bounce/camera counters intentionally differ: the
    megakernel counts only genuinely-continued bounces and live-lane
    connection sweeps, while the XLA while_loop also counts the final
    never-traced extension and dead-lane shadow tests.)"""
    w = h = 16
    n_paths = 4096
    cam = build_camera(cornell.camera_by_id("main"), aspect_ratio=1.0)
    s = LTSettings(max_bounces=3, camera_samples=1, stratified=False)
    film_m, c_m = lt_trace_mega(cornell.world, cam, s, w, h, n_paths,
                                jax.random.PRNGKey(3), interpret=True)
    film_r, c_r = jax.jit(
        lambda k: lt_trace(cornell.world, cam, s, w, h, n_paths, k)
    )(jax.random.PRNGKey(4))
    fm = np.asarray(film_m)
    fr = np.asarray(film_r)
    assert np.isfinite(fm).all()
    c_m, c_r = np.asarray(c_m), np.asarray(c_r)
    assert c_m[3] == c_r[3] == n_paths  # LIGHT_RAYS: exact spawn parity
    sm, sr = fm.sum(axis=0), fr.sum(axis=0)
    assert (sm > 0).all() and (sr > 0).all()
    # 4096 single-seed path totals: measured channel std ~1-3% (Z heavy-
    # tailed); 4-seed mega mean vs 8-seed XLA mean agreed to 0.1/0.3/3.2%
    np.testing.assert_allclose(sm[:2], sr[:2], rtol=0.12)
    np.testing.assert_allclose(sm[2], sr[2], rtol=0.2)


@pytest.mark.slow
def test_lt_mega_camera_samples_stratified(cornell):
    """camera_samples=2 + stratified spawns through the megakernel."""
    w = h = 16
    n_paths = 4096
    cam = build_camera(cornell.camera_by_id("main"), aspect_ratio=1.0)
    s = LTSettings(max_bounces=3, camera_samples=2, stratified=True)
    film_m, c_m = lt_trace_mega(cornell.world, cam, s, w, h, n_paths,
                                jax.random.PRNGKey(7), interpret=True)
    film_r, c_r = jax.jit(
        lambda k: lt_trace(cornell.world, cam, s, w, h, n_paths, k)
    )(jax.random.PRNGKey(8))
    fm, fr = np.asarray(film_m), np.asarray(film_r)
    assert np.isfinite(fm).all()
    np.testing.assert_allclose(fm.sum(axis=0)[:2], fr.sum(axis=0)[:2],
                               rtol=0.12)
    np.testing.assert_allclose(fm.sum(axis=0)[2], fr.sum(axis=0)[2],
                               rtol=0.2)


@pytest.mark.slow
def test_lt_mega_exact_path_budget(cornell):
    """n_paths that doesn't divide the lane count still spawns exactly
    n_paths (remainder spread over the first lanes)."""
    cam = build_camera(cornell.camera_by_id("main"), aspect_ratio=1.0)
    s = LTSettings(max_bounces=2, camera_samples=1)
    n_paths = 3001
    film, c = lt_trace_mega(cornell.world, cam, s, 8, 8, n_paths,
                            jax.random.PRNGKey(5), interpret=True)
    assert int(np.asarray(c)[3]) == n_paths


def test_lt_mega_inkernel_spawn_matches_feed(monkeypatch):
    """v2 in-kernel spawning (emission-λ CDF inversion on the λ-knot
    compare machinery, in-kernel direction/surface sampling + light-vertex
    connection) vs the v1 XLA spawn feed, on a scene with a SPIKY emission
    spectrum so a wrong λ inversion shifts the film's chromaticity hard.
    Same machinery class, different packaging — film totals must agree
    within MC noise and spawn counts exactly."""
    from pathtracer_tpu.camera import make_projective_camera
    from pathtracer_tpu.core import spectral
    from pathtracer_tpu.materials.diffuse_light import SIDE_REVERSE
    from pathtracer_tpu.parsing import SceneBuilder

    b = SceneBuilder()
    white = b.add_curve(spectral.FlatCurve(0.7), name="white")
    # two narrow spikes -> strongly bimodal λ distribution
    emit = b.add_curve(spectral.SpikeCurve(460.0, 8.0, 8.0, 30.0), name="emit")
    b78 = b.add_curve(spectral.FlatCurve(0.78), name="b78")
    zero = b.add_curve(spectral.FlatCurve(0.0), name="zero")
    one_px = np.ones((1, 1), np.float32)
    tw = b.add_texture([(one_px, white)], name="tw")
    mw = b.add_lambertian(tw, name="mw")
    ml = b.add_diffuse_light(emit, b78, SIDE_REVERSE, name="ml")
    sc = 0.5
    b.add_rect([sc, sc, 0.0], [sc, 0, 0], [0, sc, 0], mw)
    b.add_rect([sc, sc, 2 * sc], [sc, 0, 0], [0, sc, 0], mw)
    b.add_rect([2 * sc, sc, sc], [0, sc, 0], [0, 0, sc], mw)
    b.add_rect([sc, sc, 2 * sc - 1e-3], [0.2, 0, 0], [0, 0.2, 0], ml)
    b.set_environment_constant(zero, 0.0)
    b.env_sampling_probability = 0.0
    bundle = b.build()
    cam = make_projective_camera(
        look_from=[-1.2, 0.5, 0.5], look_at=[0.5, 0.5, 0.5],
        vfov_degrees=45.0, focal_distance=1.7, aperture_diameter=0.01,
        aspect_ratio=1.0)
    s = LTSettings(max_bounces=3, camera_samples=1, stratified=False)
    n_paths = 8192
    sums = {}
    for tag, env in (("v2", None), ("v1", "1")):
        if env is None:
            monkeypatch.delenv("PT_LT_MEGA_V1", raising=False)
        else:
            monkeypatch.setenv("PT_LT_MEGA_V1", env)
        film, c = lt_trace_mega(bundle, cam, s, 16, 16, n_paths,
                                jax.random.PRNGKey(11), interpret=True)
        f = np.asarray(film)
        assert np.isfinite(f).all()
        assert int(np.asarray(c)[3]) == n_paths
        sums[tag] = f.sum(axis=0)
    monkeypatch.delenv("PT_LT_MEGA_V1", raising=False)
    assert (sums["v2"] > 0).all()
    # equal machinery, equal path counts, independent streams: film XYZ
    # totals within MC noise (spiky λ makes chromaticity the sharp probe)
    np.testing.assert_allclose(sums["v2"], sums["v1"], rtol=0.15)
