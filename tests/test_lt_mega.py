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
