"""CLI-level checks: every shipped config_test_*.toml parses and its scene
constructs (main.rs dry-run equivalent); a multi-settings config renders
both entries through the real CLI loop."""

import os
import textwrap

import numpy as np
import pytest

from pathtracer_tpu.cli import main as cli_main
from pathtracer_tpu.parsing.config import parse_config
from pathtracer_tpu.parsing.construct import construct_world
from pathtracer_tpu.parsing.paths import resolve
from pathtracer_tpu.tonemap import read_exr

pytestmark = pytest.mark.slow  # heavy render test (see pytest.ini)

SEARCH = ["/root/repo", "/root/reference"]

CONFIGS = [
    "data/config.toml",
    "data/config_test_cornell_box.toml",
    "data/config_test_whitefurnace.toml",
    "data/config_test_lighting_hdri.toml",
    "data/config_test_blackbox.toml",
    "data/config_test_candela_calibration.toml",
    "data/config_test_lighting_north.toml",
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=[c.split("/")[-1] for c in CONFIGS])
def test_config_dry_run(cfg):
    config = parse_config(resolve(cfg, SEARCH))
    assert config.render_settings
    bundle = construct_world(config.default_scene_file, search_paths=SEARCH,
                             cache_dir="/tmp/pt_cache_cfg")
    assert bundle.world.prims.count > 0
    assert bundle.cameras


def test_cli_multi_settings_render(tmp_path):
    cfg = tmp_path / "multi.toml"
    cfg.write_text(textwrap.dedent("""
        default_scene_file = "data/scenes/cornell_box.toml"
        [renderer]
        type = "Naive"

        [[render_settings]]
        filename = "pt_pass"
        min_samples = 2
        max_bounces = 3
        camera_id = "main"
        [render_settings.integrator]
        type = "PT"
        light_samples = 1
        [render_settings.resolution]
        width = 8
        height = 8

        [[render_settings]]
        filename = "lt_pass"
        min_samples = 2
        max_bounces = 3
        camera_id = "main"
        [render_settings.integrator]
        type = "LT"
        camera_samples = 1
        [render_settings.resolution]
        width = 8
        height = 8
    """))
    out = str(tmp_path / "out")
    rc = cli_main.main(["--config", str(cfg), "--output-dir", out,
                        "--cache-dir", str(tmp_path / "cache")])
    assert rc == 0
    pt_img = read_exr(os.path.join(out, "pt_pass.exr"))
    lt_img = read_exr(os.path.join(out, "lt_pass_lightfilm.exr"))
    assert np.isfinite(pt_img).all() and np.isfinite(lt_img).all()
    assert pt_img.mean() > 0
