"""Multi-device film sharding over the (virtual 8-CPU) mesh.

The reference has no distributed backend (SURVEY §2.14 row "multi-device
scale-out: absent"); these tests validate the TPU-native design: film pixels
sharded over a jax.sharding.Mesh via shard_map, Profile counters psum-reduced,
and the sharded result agreeing with the single-device production integrator.
"""

import numpy as np
import jax
import pytest

from pathtracer_tpu.parsing.construct import construct_world
from pathtracer_tpu.parsing.cameras import build_camera
from pathtracer_tpu.integrator.pt import PTSettings
from pathtracer_tpu.parallel import (
    make_render_mesh,
    render_regen_sharded,
    render_sampled_sharded,
)
from pathtracer_tpu.renderer.persistent import render_regen

pytestmark = pytest.mark.slow  # heavy render test (see pytest.ini)

SEARCH = ["/root/repo", "/root/reference"]


def _bundle():
    return construct_world("data/scenes/cornell_box.toml", search_paths=SEARCH,
                           cache_dir="/tmp/pt_cache_par")


def test_regen_sharded_matches_single_device():
    bundle = _bundle()
    cam = build_camera(bundle.camera_by_id("main"), 1.0)
    s = PTSettings(max_bounces=4, min_bounces=1, light_samples=1,
                   russian_roulette=True)
    mesh = make_render_mesh(8)
    f_sh, p_sh, _ = render_regen_sharded(bundle.world, cam, s, 16, 16, 96,
                                         mesh=mesh, key=jax.random.PRNGKey(3))
    f_1, p_1, _ = render_regen(bundle.world, cam, s, 16, 16, 96,
                               key=jax.random.PRNGKey(4))
    a, b = np.asarray(f_1), np.asarray(f_sh)
    assert b.shape == (16, 16, 3)
    assert np.isfinite(b).all()
    assert p_sh.total_rays > 0
    # Same estimator, different RNG streams: means agree statistically.
    assert b.mean() / a.mean() == pytest.approx(1.0, abs=0.12)


def test_sampled_sharded_runs_and_counts():
    bundle = _bundle()
    cam = build_camera(bundle.camera_by_id("main"), 1.0)
    s = PTSettings(max_bounces=3, min_bounces=1, light_samples=1)
    mesh = make_render_mesh(8)
    film, profile, _ = render_sampled_sharded(bundle.world, cam, s, 16, 16,
                                              min_samples=2, mesh=mesh,
                                              sample_chunk=2,
                                              key=jax.random.PRNGKey(5))
    f = np.asarray(film)
    assert f.shape == (16, 16, 3)
    assert np.isfinite(f).all()
    assert profile.camera_rays >= 16 * 16 * 2


def test_tiled_renderer_routes_to_sharded_regen():
    from pathtracer_tpu.renderer.tiled import render_tiled

    bundle = _bundle()
    cam = build_camera(bundle.camera_by_id("main"), 1.0)
    s = PTSettings(max_bounces=3, min_bounces=1, light_samples=1)
    film, profile, _ = render_tiled(bundle.world, cam, s, 16, 16, 8,
                                    key=jax.random.PRNGKey(6))
    f = np.asarray(film)
    assert f.shape == (16, 16, 3)
    assert np.isfinite(f).all()
    assert profile.total_rays > 0


def test_splatted_sharded_matches_single():
    """Sharded LT (light paths over the mesh, psum'd splat films) must be an
    unbiased estimator of the single-device LT film."""
    from pathtracer_tpu.integrator.lt import LTSettings
    from pathtracer_tpu.parallel import render_splatted_sharded
    from pathtracer_tpu.renderer.splatted import render_splatted

    bundle = _bundle()
    world = bundle.world
    cam = build_camera(bundle.camera_by_id("main"), 1.0)
    settings = LTSettings(max_bounces=3, min_bounces=3, camera_samples=1,
                          russian_roulette=False)
    res = 16
    mesh = make_render_mesh(8)
    f_sh, prof_sh, _ = render_splatted_sharded(
        world, cam, settings, res, res, min_samples=160, mesh=mesh,
        key=jax.random.PRNGKey(3),
    )
    f_1, _, _ = render_splatted(
        world, cam, settings, res, res, min_samples=160,
        key=jax.random.PRNGKey(4),
    )
    y_sh = float(np.asarray(f_sh[..., 1]).mean())
    y_1 = float(np.asarray(f_1[..., 1]).mean())
    assert prof_sh.light_rays > 0
    assert y_sh > 0
    assert abs(y_sh - y_1) / y_1 < 0.1, (y_sh, y_1)


def test_tiled_phases_preview_callback():
    """Phased tile rendering (the reference's 10-sample phases with preview
    snapshots, tiled.rs:279-542): callbacks fire per phase and the final
    film equals the mean of the phases."""
    from pathtracer_tpu.renderer.tiled import render_tiled

    bundle = _bundle()
    cam = build_camera(bundle.camera_by_id("main"), 1.0)
    s = PTSettings(max_bounces=3, min_bounces=1, light_samples=1)
    snaps = []
    film, profile, _ = render_tiled(
        bundle.world, cam, s, 16, 16, 6, key=jax.random.PRNGKey(2),
        phase_samples=2,
        phase_callback=lambda f, done: snaps.append((np.asarray(f), done)),
    )
    assert [d for _, d in snaps] == [2, 4, 6]
    assert np.allclose(snaps[-1][0], np.asarray(film), atol=1e-5)
    assert profile.total_rays > 0
    assert np.isfinite(np.asarray(film)).all()
