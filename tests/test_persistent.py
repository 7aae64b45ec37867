"""Persistent-wavefront renderer: agreement with the plain wavefront."""

import numpy as np
import jax
import pytest

from pathtracer_tpu.parsing.construct import construct_world
from pathtracer_tpu.parsing.cameras import build_camera
from pathtracer_tpu.integrator.pt import PTSettings
from pathtracer_tpu.renderer.naive import render_sampled
from pathtracer_tpu.renderer.persistent import render_persistent

pytestmark = pytest.mark.slow  # heavy render test (see pytest.ini)

SEARCH = ["/root/repo", "/root/reference"]


def test_persistent_matches_plain():
    bundle = construct_world("data/scenes/cornell_box.toml", search_paths=SEARCH,
                             cache_dir="/tmp/pt_cache_pp")
    cam = build_camera(bundle.camera_by_id("main"), 1.0)
    s = PTSettings(max_bounces=4, min_bounces=1, light_samples=1,
                   russian_roulette=True)
    f1, p1, _ = render_sampled(bundle.world, cam, s, 16, 16, 192,
                               key=jax.random.PRNGKey(1), sample_chunk=64)
    f2, p2, _ = render_persistent(bundle.world, cam, s, 16, 16, 192,
                                  key=jax.random.PRNGKey(2), pool_size=2048)
    a, b = np.asarray(f1), np.asarray(f2)
    assert np.isfinite(b).all()
    assert p2.total_rays > 0
    # same estimator: means agree within the (firefly-dominated) noise floor
    assert b.mean() / a.mean() == pytest.approx(1.0, abs=0.12)
    # darker regions (no fireflies) agree more tightly
    med_a = np.median(a[..., 1])
    med_b = np.median(b[..., 1])
    assert med_b / med_a == pytest.approx(1.0, abs=0.15)
