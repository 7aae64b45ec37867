"""Parsing round-trips against the reference's shipped data
(mirrors src/parsing/mod.rs:583-687 + src/parsing/curves.rs:407-478 tests).
"""

import numpy as np
import pytest

from pathtracer_tpu.parsing.config import parse_config, calculate_widest_wavelength_bounds
from pathtracer_tpu.parsing.construct import construct_world
from pathtracer_tpu.parsing.curves import load_csv_column, load_spectra, parse_curve
from pathtracer_tpu.parsing.meshes import load_obj
from pathtracer_tpu.parsing.paths import resolve

SEARCH = ["/root/repo", "/root/reference"]


def test_load_gold_csv():
    xs, ys = load_csv_column(resolve("data/test/gold.csv", SEARCH), 1, x_scale=1000.0)
    assert len(xs) > 10
    assert 150.0 < xs.min() < 400.0  # 0.1879 um -> 187.9 nm
    assert np.all(ys > 0)


def test_load_cornell_csv():
    xs, ys = load_csv_column(resolve("data/test/cornell.csv", SEARCH), 1)
    assert xs.min() == pytest.approx(400.0)
    assert xs.max() == pytest.approx(700.0, abs=10)


def test_load_spectra():
    vals, bounds = load_spectra(resolve("data/test/xenon_lamp.spectra", SEARCH))
    assert len(vals) > 100
    assert bounds.lower < bounds.upper


def test_parse_reference_config():
    cfg = parse_config(resolve("data/config.toml", SEARCH))
    assert cfg.renderer_kind == "Tiled"
    assert cfg.tile_size == (32, 32)
    rs = cfg.render_settings[0]
    assert rs.min_samples == 256
    assert rs.max_bounces == 2
    assert rs.integrator.kind == "PT"
    assert rs.integrator.light_samples == 4
    assert rs.colorspace == "Rec2020"
    assert rs.tonemap.kind == "Clamp"
    assert rs.premultiply == pytest.approx(10.0)


def test_parse_cornell_config():
    cfg = parse_config(resolve("data/config_test_cornell_box.toml", SEARCH))
    rs = cfg.render_settings[0]
    assert rs.width == 1080 and rs.height == 1080
    assert rs.tonemap.kind == "Reinhard1"
    assert rs.integrator.light_samples == 2


def test_construct_cornell_world():
    bundle = construct_world("data/scenes/cornell_box.toml", search_paths=SEARCH,
                             cache_dir="/tmp/pt_cache_test")
    w = bundle.world
    assert int(w.n_lights) >= 1
    assert w.prims.count >= 31  # 30 cornell tris + light rect (padded)
    assert len(bundle.cameras) == 1
    assert bundle.cameras[0].name == "main"
    # materials: error + white + red + green + light
    assert w.mats.count == 5


def test_construct_white_furnace_world():
    bundle = construct_world("data/scenes/white_furnace.toml", search_paths=SEARCH,
                             cache_dir="/tmp/pt_cache_test")
    w = bundle.world
    assert int(w.n_lights) == 0
    assert float(w.env_sampling_probability) == pytest.approx(1.0)
    assert float(w.env.strength) == pytest.approx(1.0)


def test_parse_inline_and_named_curves():
    lib = {"named_flat": {"type": "Flat", "strength": 0.5}}
    c1 = parse_curve("named_flat", lib)
    c2 = parse_curve({"type": "Cauchy", "a": 1.5, "b": 4000.0}, lib)
    lam = np.array([500.0])
    assert c1.sample(lam)[0] == pytest.approx(0.5)
    assert c2.sample(lam)[0] == pytest.approx(1.5 + 4000.0 / 250000.0)


def test_load_obj_prism():
    meshes = load_obj(resolve("data/meshes/prism.obj", SEARCH))
    assert len(meshes) >= 1
    m = meshes[0]
    assert len(m.indices) > 0
    assert m.vertices.shape[1] == 3


def test_load_generated_cornell_obj():
    meshes = load_obj(resolve("data/meshes/cornell_box.obj", SEARCH))
    m = meshes[0]
    assert len(m.indices) == 30  # 15 quads fan-triangulated
    assert set(m.material_names) == {"lambertian_white", "lambertian_red", "lambertian_green"}
    # per-face materials assigned
    assert (m.face_materials >= 0).all()


def test_widest_wavelength_bounds():
    cfg = parse_config(resolve("data/config.toml", SEARCH))
    b = calculate_widest_wavelength_bounds(cfg.render_settings)
    assert b.lower <= 400.0 and b.upper >= 700.0
