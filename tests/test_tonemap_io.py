import os

import numpy as np
import jax.numpy as jnp
import pytest

from pathtracer_tpu.tonemap import (
    Clamp, Reinhard0, Reinhard0x3, Reinhard1, Reinhard1x3,
    sRGB_oetf, rec709_oetf, rec2020_oetf, tonemap_to_rgb,
    write_png, write_exr, read_exr,
)
from pathtracer_tpu.tonemap.io_png import read_png
from pathtracer_tpu.cli.compare_exr import compare
from pathtracer_tpu.prelude import MAUVE_XYZ


def _film(h=8, w=8):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.uniform(0.0, 2.0, size=(h, w, 3)), jnp.float32)


def test_clamp_luminance_only():
    film = _film()
    tm = Clamp(exposure=0.0, luminance_only=True)
    out = tm.map(tm.initialize(film), film)
    assert float(out[..., 1].max()) <= 1.0 + 1e-5


def test_nan_flagged_mauve():
    film = np.array(_film())
    film[2, 2] = np.nan
    tm = Clamp()
    out = np.asarray(tm.map(tm.initialize(jnp.asarray(film)), jnp.asarray(film)))
    assert np.all(np.isfinite(out))
    # mauve direction preserved (scaled by clamp)
    assert out[2, 2, 2] > out[2, 2, 1]


@pytest.mark.parametrize("tm", [Reinhard0(), Reinhard0x3(), Reinhard1(), Reinhard1x3()])
def test_reinhard_operators_bounded(tm):
    film = _film() * 50.0
    out = np.asarray(tm.map(tm.initialize(film), film))
    assert np.all(np.isfinite(out))
    assert out.max() < 60.0  # compresses


def test_oetf_monotonic_and_range():
    x = jnp.linspace(0, 1, 64)
    for oetf in (sRGB_oetf, rec709_oetf, rec2020_oetf):
        y = np.asarray(oetf(x))
        assert np.all(np.diff(y) >= -1e-6)
        assert y[0] == pytest.approx(0.0, abs=1e-6)
        assert y[-1] == pytest.approx(1.0, abs=1e-2)


def test_exr_roundtrip(tmp_path):
    img = np.asarray(_film(16, 12), np.float32)
    path = str(tmp_path / "t.exr")
    write_exr(path, img, chromaticities=None)
    back = read_exr(path)
    assert back.shape == img.shape
    assert np.allclose(back, img, atol=1e-6)


def test_png_roundtrip(tmp_path):
    img = (np.asarray(_film(9, 7)) / 2.0 * 255).astype(np.uint8)
    path = str(tmp_path / "t.png")
    write_png(path, img)
    back = read_png(path)
    assert back.shape == img.shape
    assert np.array_equal(back, img)


def test_compare_exr_stats(tmp_path):
    a = np.asarray(_film(8, 8), np.float32)
    b = a + 0.01
    pa, pb = str(tmp_path / "a.exr"), str(tmp_path / "b.exr")
    write_exr(pa, a)
    write_exr(pb, b)
    stats, _ = compare(read_exr(pa), read_exr(pb))
    assert stats["rmse"] == pytest.approx(0.01, rel=1e-3)


def test_tonemap_to_rgb_pipeline():
    film = _film()
    display, linear = tonemap_to_rgb(film, Reinhard1(), "Rec2020", factor=1.0)
    d = np.asarray(display)
    assert d.min() >= 0.0 and d.max() <= 1.0
