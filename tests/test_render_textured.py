"""uv-dependent surface textures end-to-end (VERDICT r3 #5/#7).

The reference's textured-walls scene (`cornell_box_textured_walls.toml`,
reference src/texture.rs:204-276 + src/parsing/texture.rs:20-47) needs a
test.png its checkout does not ship; data/scenes/cornell_box_textured.toml
is the repo's analogue over synthetic assets (tools/gen_texture_assets.py):
an 8x8 checkered back wall (Texture1, hard uv discontinuities) and a 64x64
RGBA cloud floor (Texture4, per-channel SRGB-basis upsampling).

Checks: (a) the scene constructs with real multi-texel layer stacks,
(b) rendered reflectance actually varies with uv across the film (the
checker's tiles are resolvable), (c) the megakernel gate ACCEPTS the scene
and its XLA texture feed (_tex_feed) agrees with the XLA wavefront at the
estimator level — counters near-exact, film means within MC noise."""

import numpy as np
import jax
import pytest

from pathtracer_tpu.integrator.pt import PTSettings
from pathtracer_tpu.integrator.pt_regen import pt_trace_regen
from pathtracer_tpu.kernels.megakernel import (
    build_mega_scene,
    mega_available,
    pt_trace_regen_mega,
)
from pathtracer_tpu.parsing.cameras import build_camera
from pathtracer_tpu.parsing.construct import construct_world

SEARCH = ["/root/repo", "/root/reference"]


@pytest.fixture(scope="module")
def textured():
    return construct_world(
        "data/scenes/cornell_box_textured.toml",
        search_paths=SEARCH, cache_dir="/tmp/pt_cache",
    )


def test_textured_scene_constructs(textured):
    w = textured.world
    lw = np.asarray(w.tex.layer_w)
    lh = np.asarray(w.tex.layer_h)
    lc = np.asarray(w.tex.layer_count)
    # the checker (8x8 single layer) and the RGBA cloud (64x64 x 4 layers)
    assert ((lw == 8) & (lh == 8)).any(), "checker texture missing"
    assert (lw == 64).any(), "cloud texture missing"
    assert int(lc.max()) >= 4, "Texture4 stack missing"


def test_mega_gate_accepts_textured(textured):
    settings = PTSettings(max_bounces=5, min_bounces=1, light_samples=1,
                          russian_roulette=True)
    cam = build_camera(textured.camera_by_id("main"), aspect_ratio=1.0)
    assert mega_available(textured.world, cam, settings)
    scene = build_mega_scene(textured.world, cam, settings)
    assert scene.consts.get("tex_feed") is True
    assert scene.tex_args is not None
    assert np.isfinite(np.asarray(scene.spec_tab)).all()


def _film(acc, spp):
    """xyz sums [n_pix, 3] -> per-pixel mean film [n_pix, 3]."""
    return np.asarray(acc) / spp


@pytest.mark.slow
def test_checker_tiles_resolve(textured):
    """The checkered back wall must be visibly non-uniform: direct-light
    rows crossing the wall alternate bright/dark with the 8x8 tiling."""
    w = h = 64
    spp = 16
    cam = build_camera(textured.camera_by_id("main"), aspect_ratio=1.0)
    settings = PTSettings(max_bounces=3, min_bounces=1, light_samples=1,
                          russian_roulette=False)
    acc, _ = pt_trace_regen(textured.world, cam, settings, w, h, spp,
                            jax.random.PRNGKey(5))
    img = _film(acc, spp).reshape(h * w, 3)[..., 1]
    assert np.isfinite(img).all()
    # ground-truth tile parity per pixel: trace each pixel's center ray
    # with the real camera, intersect the checkered wall plane (x = +1,
    # the rect at origin [1,0,0] with half-edges pb/pc), apply the rect
    # uv formula (geometry/soa.py:351-358) and the 8x8 texel grid
    pix = np.arange(h * w)
    fu = ((pix % w) + 0.5) / w
    fv = ((pix // w) + 0.5) / h
    z = np.zeros_like(fu, np.float32)
    o, d, _ = jax.vmap(lambda a, b: cam.get_ray(a, b, 0.5, 0.5))(
        fu.astype(np.float32), fv.astype(np.float32))
    o, d = np.asarray(o), np.asarray(d)
    prims = textured.world.prims
    widx = int(np.argmax(np.asarray(prims.pa)[:, 0] > 0.5))  # wall at x=+1
    pa = np.asarray(prims.pa)[widx]
    pb = np.asarray(prims.pb)[widx]
    pc = np.asarray(prims.pc)[widx]
    t = (pa[0] - o[:, 0]) / d[:, 0]
    rel = o + t[:, None] * d - pa
    uu = 0.5 * (rel @ pb / (pb @ pb) + 1.0)
    vv = 0.5 * (rel @ pc / (pc @ pc) + 1.0)
    on_wall = (t > 0) & (np.abs(uu - 0.5) < 0.49) & (np.abs(vv - 0.5) < 0.49)
    tu, tv = uu * 8, vv * 8
    # skip pixels near texel boundaries (bilinear filtering blends there)
    interior = (np.abs(tu - np.round(tu)) > 0.25) & (
        np.abs(tv - np.round(tv)) > 0.25)
    par = ((np.floor(tu) + np.floor(tv)) % 2).astype(bool)
    sel = on_wall & interior
    a = img[sel & par].mean()
    b = img[sel & ~par].mean()
    hi, lo = max(a, b), min(a, b)
    assert sel.sum() > 200
    assert hi > lo * 1.5, f"checker not resolved: {hi:.4g} vs {lo:.4g}"


@pytest.mark.slow
def test_mega_texfeed_matches_regen(textured):
    """Estimator equivalence megakernel(texture feed) vs XLA wavefront."""
    w = h = 48
    spp = 8
    cam = build_camera(textured.camera_by_id("main"), aspect_ratio=1.0)
    settings = PTSettings(max_bounces=5, min_bounces=1, light_samples=1,
                          russian_roulette=True)
    acc_m, c_m = pt_trace_regen_mega(textured.world, cam, settings, w, h,
                                     spp, jax.random.PRNGKey(7),
                                     interpret=True)
    acc_r, c_r = pt_trace_regen(textured.world, cam, settings, w, h, spp,
                                jax.random.PRNGKey(8))
    assert np.isfinite(np.asarray(acc_m)).all()
    c_m, c_r = np.asarray(c_m), np.asarray(c_r)
    nz = c_r > 0
    np.testing.assert_allclose(c_m[nz], c_r[nz], rtol=0.05)
    am, ar = _film(acc_m, spp), _film(acc_r, spp)
    np.testing.assert_allclose(am.mean(axis=0), ar.mean(axis=0), rtol=0.2)
    # the films must also agree on the uv STRUCTURE, not just the mean:
    # per-channel contrast over the film (std across pixels) within noise
    np.testing.assert_allclose(am.std(axis=0), ar.std(axis=0), rtol=0.3)


@pytest.mark.slow
def test_tex_lut_matches_general_eval(textured, monkeypatch):
    """The baked (texel, λ-knot) LUT path must agree with the general
    eval_texture path to f32 reassociation error (the layer sum commutes
    with the λ-lerp, so the two differ only in summation order)."""
    import pathtracer_tpu.kernels.megakernel as mk

    w = h = 24
    spp = 4
    cam = build_camera(textured.camera_by_id("main"), aspect_ratio=1.0)
    settings = PTSettings(max_bounces=3, min_bounces=1, light_samples=1,
                          russian_roulette=False)
    scene_lut = build_mega_scene(textured.world, cam, settings)
    assert scene_lut.tex_args[4] is not None, "LUT bake unexpectedly skipped"
    acc_l, c_l = pt_trace_regen_mega(textured.world, cam, settings, w, h,
                                     spp, jax.random.PRNGKey(23),
                                     interpret=True)
    monkeypatch.setattr(mk, "TEX_LUT_MAX_TEXELS", 0)
    mk._SCENE_CACHE.clear()  # keyed on (world, camera) identity
    scene_gen = build_mega_scene(textured.world, cam, settings)
    assert scene_gen.tex_args[4] is None
    acc_g, c_g = pt_trace_regen_mega(textured.world, cam, settings, w, h,
                                     spp, jax.random.PRNGKey(23),
                                     interpret=True)
    np.testing.assert_array_equal(np.asarray(c_l), np.asarray(c_g))
    np.testing.assert_allclose(np.asarray(acc_l), np.asarray(acc_g),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_mega_texfeed_hwss(textured):
    """C=4 hero-wavelength lanes through the texture feed (each companion
    evaluates the full layer stack at its own lambda)."""
    w = h = 32
    spp = 6
    cam = build_camera(textured.camera_by_id("main"), aspect_ratio=1.0)
    settings = PTSettings(max_bounces=4, min_bounces=1, light_samples=1,
                          russian_roulette=True, hwss=True)
    acc_m, c_m = pt_trace_regen_mega(textured.world, cam, settings, w, h,
                                     spp, jax.random.PRNGKey(17),
                                     interpret=True)
    acc_r, c_r = pt_trace_regen(textured.world, cam, settings, w, h, spp,
                                jax.random.PRNGKey(18))
    assert np.isfinite(np.asarray(acc_m)).all()
    c_m, c_r = np.asarray(c_m), np.asarray(c_r)
    nz = c_r > 0
    np.testing.assert_allclose(c_m[nz], c_r[nz], rtol=0.08)
    np.testing.assert_allclose(_film(acc_m, spp).mean(axis=0),
                               _film(acc_r, spp).mean(axis=0),
                               rtol=0.25)
