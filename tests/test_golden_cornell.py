"""Golden-image regression: the Cornell box rendered at equal settings must
match the checked-in 1024-spp golden (rendered on TPU) — the project's
equivalent of the reference's compare_exr-based validation workflow
(src/bin/compare_exr.rs; BASELINE 'RMSE at equal spp' methodology)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pathtracer_tpu.parsing.construct import construct_world
from pathtracer_tpu.parsing.cameras import build_camera
from pathtracer_tpu.integrator.pt import PTSettings
from pathtracer_tpu.renderer.naive import render_sampled
from pathtracer_tpu.tonemap import read_exr, Reinhard1, tonemap_to_rgb

pytestmark = pytest.mark.slow  # heavy render test (see pytest.ini)

GOLDEN = "data/golden/cornell_128.exr"
SEARCH = ["/root/repo", "/root/reference"]


@pytest.mark.skipif(not os.path.exists(os.path.join("/root/repo", GOLDEN)),
                    reason="golden not rendered yet")
def test_cornell_matches_golden():
    golden = read_exr(os.path.join("/root/repo", GOLDEN))
    bundle = construct_world("data/scenes/cornell_box.toml", search_paths=SEARCH,
                             cache_dir="/tmp/pt_cache_golden")
    cam = build_camera(bundle.camera_by_id("main"), 1.0)
    s = PTSettings(max_bounces=12, min_bounces=1, light_samples=2,
                   russian_roulette=True, hwss=True)
    film, _, _ = render_sampled(bundle.world, cam, s, 128, 128, 16,
                                key=jax.random.PRNGKey(77), sample_chunk=16)
    a = np.asarray(film)
    # unbiasedness: film means agree
    assert a.mean() / golden.mean() == pytest.approx(1.0, abs=0.02)
    # perceptual closeness: tonemapped per-pixel RMSE small at 16 spp
    tm = Reinhard1(key_value=0.18, white_point=1.0, luminance_only=False)
    da, _ = tonemap_to_rgb(jnp.asarray(a), tm, "Rec709")
    dg, _ = tonemap_to_rgb(jnp.asarray(golden), tm, "Rec709")
    rmse = float(np.sqrt(np.mean((np.asarray(da) - np.asarray(dg)) ** 2)))
    assert rmse < 0.1, rmse
