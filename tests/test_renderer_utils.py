import numpy as np

from pathtracer_tpu.renderer.tiled import generate_tiles
from pathtracer_tpu.utils.vec2d import Vec2D
from pathtracer_tpu.utils.logging import setup_logging, warn_once
from pathtracer_tpu.utils.profile import Profile
import pytest

pytestmark = pytest.mark.slow  # heavy render test (see pytest.ini)


def test_generate_tiles_covers_film():
    """Every pixel covered exactly once (reference test_generate_tiles,
    src/renderer/tiled.rs:676-689, on the same 1920x1080 film)."""
    w, h = 1920, 1080
    cover = np.zeros((h, w), np.int32)
    for t in generate_tiles(w, h, 32, 32):
        cover[t.y0 : t.y0 + t.height, t.x0 : t.x0 + t.width] += 1
    assert (cover == 1).all()


def test_generate_tiles_remnants():
    tiles = generate_tiles(70, 50, 32, 32)
    widths = {t.width for t in tiles}
    heights = {t.height for t in tiles}
    assert 32 in widths and 6 in widths  # 70 = 32+32+6
    assert 32 in heights and 18 in heights  # 50 = 32+18


def test_vec2d_uv_clamping():
    v = Vec2D(4, 2)
    v.write_at(3, 1, 7.0)
    assert v.at(3, 1) == 7.0
    assert v.at_uv(0.99, 0.99) == 7.0
    assert v.at_uv(1.5, 2.0) == 7.0  # clamped
    assert v.at_uv(0.0, 0.0) == 0.0


def test_warn_once(tmp_path, caplog):
    log = setup_logging("WARNING", "INFO", str(tmp_path / "main.log"))
    with caplog.at_level("WARNING", logger="pathtracer_tpu"):
        warn_once(log, "k1", "hello %d", 1)
        warn_once(log, "k1", "hello %d", 2)
    assert sum("hello" in r.message for r in caplog.records) == 1


def test_profile_pretty_print():
    p = Profile(camera_rays=100, bounce_rays=200, shadow_rays=300)
    out = p.pretty_print(2.0, devices=2)
    assert "Mrays/s" in out and "600" in out


def test_render_checkpoint_resume(tmp_path):
    """Interrupted renders resume from the film checkpoint."""
    import jax
    import numpy as np
    from pathtracer_tpu.camera import make_projective_camera
    from pathtracer_tpu.core import spectral
    from pathtracer_tpu.integrator.pt import PTSettings
    from pathtracer_tpu.parsing import SceneBuilder
    from pathtracer_tpu.renderer.naive import render_sampled

    b = SceneBuilder()
    one = b.add_curve(spectral.FlatCurve(1.0), name="one")
    tex = b.add_texture([(np.ones((1, 1), np.float32), one)], name="t")
    m = b.add_lambertian(tex, name="m")
    b.add_sphere([0, 0, 0], 1.0, m)
    b.set_environment_constant(one, 1.0)
    b.env_sampling_probability = 1.0
    world = b.build()
    cam = make_projective_camera([-4, 0, 0], [0, 0, 0], vfov_degrees=30.0,
                                 focal_distance=4.0)
    s = PTSettings(max_bounces=2, light_samples=1)
    ck = str(tmp_path / "film.npz")
    key = jax.random.PRNGKey(0)
    full, _, _ = render_sampled(world, cam, s, 8, 8, 8, key=key, sample_chunk=4)
    # run only the first chunk (pretend interruption), then resume
    render_sampled(world, cam, s, 8, 8, 4, key=key, sample_chunk=4,
                   checkpoint_path=ck)
    import os
    assert os.path.exists(ck)
    resumed, _, _ = render_sampled(world, cam, s, 8, 8, 8, key=key,
                                   sample_chunk=4, checkpoint_path=ck)
    assert np.allclose(np.asarray(resumed), np.asarray(full), atol=1e-5)
