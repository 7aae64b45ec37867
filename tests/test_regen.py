"""Sample-regeneration wavefront: agreement with the plain wavefront (the
production PT path — ~2x plain throughput on TPU)."""

import numpy as np
import jax
import pytest

from pathtracer_tpu.parsing.construct import construct_world
from pathtracer_tpu.parsing.cameras import build_camera
from pathtracer_tpu.integrator.pt import PTSettings
from pathtracer_tpu.renderer.naive import render_sampled
from pathtracer_tpu.renderer.persistent import render_regen

pytestmark = pytest.mark.slow  # heavy render test (see pytest.ini)

SEARCH = ["/root/repo", "/root/reference"]


@pytest.mark.parametrize("hwss", [False, True])
def test_regen_matches_plain(hwss):
    bundle = construct_world("data/scenes/cornell_box.toml", search_paths=SEARCH,
                             cache_dir="/tmp/pt_cache_rg")
    cam = build_camera(bundle.camera_by_id("main"), 1.0)
    s = PTSettings(max_bounces=4, min_bounces=1, light_samples=1,
                   russian_roulette=True, hwss=hwss)
    f1, _, _ = render_sampled(bundle.world, cam, s, 16, 16, 192,
                              key=jax.random.PRNGKey(1), sample_chunk=64)
    f2, p2, _ = render_regen(bundle.world, cam, s, 16, 16, 192,
                             key=jax.random.PRNGKey(2))
    a, b = np.asarray(f1), np.asarray(f2)
    assert np.isfinite(b).all()
    assert p2.total_rays > 0
    assert b.mean() / a.mean() == pytest.approx(1.0, abs=0.12)
    med_a, med_b = np.median(a[..., 1]), np.median(b[..., 1])
    assert med_b / med_a == pytest.approx(1.0, abs=0.15)


def test_regen_stepped_identical():
    """Bounded-dispatch stepping (the two-level watchdog fix) draws the
    SAME sample stream as the one-dispatch render: the uniform cursor and
    all integrator state ride the carry, so films must agree to f32
    accumulation noise (persistent.py::_regen_pass_stepped)."""
    from pathtracer_tpu.renderer.persistent import (_regen_pass,
                                                    _regen_pass_stepped)

    bundle = construct_world("data/scenes/cornell_box.toml", search_paths=SEARCH,
                             cache_dir="/tmp/pt_cache_rg")
    cam = build_camera(bundle.camera_by_id("main"), 1.0)
    s = PTSettings(max_bounces=6, min_bounces=1, light_samples=2,
                   russian_roulette=True)
    key = jax.random.PRNGKey(3)
    n = 16 * 16
    f1, c1 = _regen_pass(bundle.world, cam, key, s, 16, 16, 8,
                         start=0, batch_n=n)
    f2, c2 = _regen_pass_stepped(bundle.world, cam, key, s, 16, 16, 8,
                                 0, n, rounds_per_dispatch=3)
    a, b = np.asarray(f1), np.asarray(f2)
    assert np.isfinite(b).all()
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c1), rtol=1e-6)
