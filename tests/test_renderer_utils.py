import numpy as np

from pathtracer_tpu.renderer.tiled import generate_tiles
from pathtracer_tpu.utils.vec2d import Vec2D
from pathtracer_tpu.utils.logging import setup_logging, warn_once
from pathtracer_tpu.utils.profile import Profile


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
