"""On-TPU regression smoke (VERDICT r2 #5): runs on a real chip, asserts
golden-film agreement + finite outputs across the accelerator paths.

Checks (each isolated so one failure doesn't blank the rest):
  1. cornell 128x128 regen render: relative RMSE vs data/golden/cornell_128.exr
  2. gem scene mini render: finite film, nonzero
  3. instanced arrangement mini render: finite film (two-level path)
  4. BDPT + LT mini passes: finite films

Run: python tools/tpu_smoke.py  (skips cleanly when only CPU is present:
these are device-regression checks, not CPU tests). bench.py runs this
first so perf numbers are never reported for a silently-broken build.
"""
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEARCH = ["/root/repo", "/root/reference"]
CACHE = "/tmp/pt_cache"


def _world(path, **kw):
    from pathtracer_tpu.parsing.construct import construct_world

    return construct_world(path, search_paths=SEARCH, cache_dir=CACHE, **kw)


def check_cornell_golden(results):
    import numpy as np
    import jax

    from pathtracer_tpu.parsing.cameras import build_camera
    from pathtracer_tpu.integrator.pt import PTSettings
    from pathtracer_tpu.renderer.persistent import render_regen
    from pathtracer_tpu.tonemap.io_exr import read_exr

    b = _world("data/scenes/cornell_box.toml")
    cam = build_camera(b.camera_by_id("main"), aspect_ratio=1.0)
    settings = PTSettings(max_bounces=12, min_bounces=1, light_samples=2,
                          russian_roulette=True)
    film, prof, el = render_regen(b.world, cam, settings, 128, 128, 128,
                                  key=jax.random.PRNGKey(42))
    film = np.asarray(film)
    assert np.isfinite(film).all(), "cornell film has non-finite pixels"
    # golden stores the raw XYZ film; compare like tests/test_golden_cornell
    # (mean ratio + tonemapped per-pixel RMSE — compare_exr methodology)
    import jax.numpy as jnp

    from pathtracer_tpu.tonemap import Reinhard1, tonemap_to_rgb

    golden = np.asarray(read_exr("data/golden/cornell_128.exr"))
    mean_ratio = float(film.mean() / golden.mean())
    results["cornell_golden_mean_ratio"] = round(mean_ratio, 4)
    assert abs(mean_ratio - 1.0) < 0.02, f"mean ratio {mean_ratio:.4f}"
    tm = Reinhard1(key_value=0.18, white_point=1.0, luminance_only=False)
    da, _ = tonemap_to_rgb(jnp.asarray(film), tm, "Rec709")
    dg, _ = tonemap_to_rgb(jnp.asarray(golden), tm, "Rec709")
    da, dg = np.asarray(da), np.asarray(dg)
    # raw per-pixel tonemapped RMSE at 128 spp is MC-noise-floored at
    # ~0.085 regardless of integrator path (tools/golden_diag.py: mega and
    # XLA films measure 0.0847/0.0848 vs golden; seed-vs-seed is 0.112 =
    # sqrt(2)x) — record it, but assert on the 8x8 box-filtered RMSE,
    # which averages the noise down ~8x (floor ~0.012) while leaving
    # systematic shading/MIS bias fully visible.
    rmse = float(np.sqrt(np.mean((da - dg) ** 2)))
    results["cornell_golden_tm_rmse"] = round(rmse, 4)

    def box8(a):
        h, w, c = a.shape
        return a.reshape(h // 8, 8, w // 8, 8, c).mean(axis=(1, 3))

    brmse = float(np.sqrt(np.mean((box8(da) - box8(dg)) ** 2)))
    results["cornell_golden_box8_rmse"] = round(brmse, 4)
    assert brmse < 0.03, f"cornell golden box8 RMSE {brmse:.4f}"
    results["cornell_mrays"] = round(prof.total_rays / el / 1e6, 2)


def check_gem(results):
    import numpy as np
    import jax

    from pathtracer_tpu.parsing.cameras import build_camera
    from pathtracer_tpu.integrator.pt import PTSettings
    from pathtracer_tpu.renderer.persistent import render_regen

    b = _world("/root/reference/data/scenes/cornell_box_diamond_gem.toml")
    cam = build_camera(b.camera_by_id("main"), aspect_ratio=1.0)
    settings = PTSettings(max_bounces=12, min_bounces=1, light_samples=2,
                          russian_roulette=True)
    film, prof, el = render_regen(b.world, cam, settings, 128, 128, 16,
                                  key=jax.random.PRNGKey(7))
    film = np.asarray(film)
    assert np.isfinite(film).all(), "gem film non-finite"
    assert film.mean() > 0, "gem film black"
    results["gem_smoke_mrays"] = round(prof.total_rays / el / 1e6, 2)


def check_arrangement(results):
    import numpy as np
    import jax

    from pathtracer_tpu.parsing.cameras import build_camera
    from pathtracer_tpu.integrator.pt import PTSettings
    from pathtracer_tpu.renderer.persistent import render_regen

    b = _world("data/scenes/diamond_arrangement_instanced.toml")
    cam = build_camera(b.camera_by_id("main"), aspect_ratio=1.0)
    settings = PTSettings(max_bounces=8, min_bounces=1, light_samples=2,
                          russian_roulette=True)
    film, prof, el = render_regen(b.world, cam, settings, 128, 128, 4,
                                  key=jax.random.PRNGKey(9))
    film = np.asarray(film)
    assert np.isfinite(film).all(), "arrangement film non-finite"
    assert film.mean() > 0, "arrangement film black"
    results["arrangement_smoke_mrays"] = round(prof.total_rays / el / 1e6, 2)


def check_dispersive_hwss_furnace(results):
    """Energy conservation of the Mosaic-compiled spectral-MIS path on
    chip: a unit furnace with a diamond-Cauchy near-delta sphere under
    HWSS must hold center/corner ~ 1 (tests/test_spectral_mis.py is the
    CPU/interpret twin; this one exercises the compiled kernels)."""
    import numpy as np
    import jax

    from pathtracer_tpu.camera import make_projective_camera
    from pathtracer_tpu.core import spectral
    from pathtracer_tpu.integrator.pt import PTSettings
    from pathtracer_tpu.kernels.megakernel import pt_trace_regen_mega
    from pathtracer_tpu.parsing.builder import SceneBuilder

    b = SceneBuilder()
    eta = b.add_curve(spectral.CauchyCurve(2.4, 34000.0), name="eta")
    air = b.add_curve(spectral.FlatCurve(1.0), name="air")
    kz = b.add_curve(spectral.FlatCurve(0.0), name="kz")
    mg = b.add_ggx(0.0004, eta, air, kz, permeability=1.0, name="mg")
    b.add_sphere([0.0, 0.0, 0.0], 0.8, mg)
    one = b.add_curve(spectral.FlatCurve(1.0), name="one")
    b.set_environment_constant(one, 1.0)
    world = b.build()
    cam = make_projective_camera(
        look_from=[0.0, -3.0, 0.0], look_at=[0.0, 0.0, 0.0],
        vfov_degrees=35.0, focal_distance=3.0, aperture_diameter=0.0,
        aspect_ratio=1.0)
    s = PTSettings(max_bounces=24, min_bounces=4, light_samples=0,
                   russian_roulette=False, hwss=True)
    w = h = 32
    spp = 64
    acc, _ = pt_trace_regen_mega(world, cam, s, w, h, spp,
                                 jax.random.PRNGKey(3))
    img = (np.asarray(acc)[:, 1] / spp).reshape(h, w)
    center = img[h // 2 - 4:h // 2 + 4, w // 2 - 4:w // 2 + 4].mean()
    corner = np.concatenate([img[:3, :3].ravel(), img[-3:, -3:].ravel()]).mean()
    cc = float(center / corner)
    results["dispersive_hwss_furnace_cc"] = round(cc, 4)
    assert abs(cc - 1.0) < 0.1, f"dispersive HWSS furnace c/c {cc:.4f}"


def check_hdri(results):
    """HDR-env megakernel pass on chip: the env feed rows (XLA emission /
    pdf_for / importance-sampled NEE directions computed inside the same
    dispatched program — kernels/megakernel._env_feed) are a new Mosaic
    input surface; CPU/interpret twins live in tests/test_kernels_pallas.py
    (test_mega_matches_regen_hdri, test_mega_hdr_furnace)."""
    import numpy as np
    import jax

    from pathtracer_tpu.parsing.cameras import build_camera
    from pathtracer_tpu.integrator.pt import PTSettings
    from pathtracer_tpu.kernels.megakernel import mega_available
    from pathtracer_tpu.renderer.persistent import render_regen

    b = _world("data/scenes/hdri_blob_test.toml")
    cam = build_camera(b.camera_by_id("main"), aspect_ratio=1.0)
    settings = PTSettings(max_bounces=5, min_bounces=1, light_samples=2,
                          russian_roulette=True)
    assert mega_available(b.world, cam, settings), "hdri outside mega gate"
    film, prof, el = render_regen(b.world, cam, settings, 128, 128, 8,
                                  key=jax.random.PRNGKey(17))
    film = np.asarray(film)
    assert np.isfinite(film).all(), "hdri film non-finite"
    assert film.mean() > 0, "hdri film black"
    results["hdri_smoke_mrays"] = round(prof.total_rays / el / 1e6, 2)


def check_medium(results):
    """Medium-aware megakernel pass on chip: the medium feed rows (XLA free
    flight / σ sums / phase sampling computed inside the same dispatched
    program — kernels/megakernel._med_feed) plus the in-kernel Beer–Lambert
    exp and stack transitions are a new Mosaic surface; CPU/interpret twins
    live in tests/test_kernels_pallas.py (test_mega_matches_regen_medium,
    test_mega_medium_beer_lambert)."""
    import numpy as np
    import jax

    from pathtracer_tpu.parsing.cameras import build_camera
    from pathtracer_tpu.integrator.pt import PTSettings
    from pathtracer_tpu.kernels.megakernel import mega_available
    from pathtracer_tpu.renderer.persistent import render_regen

    b = _world("/root/reference/data/scenes/cornell_box_medium.toml")
    cam = build_camera(b.camera_by_id("main"), aspect_ratio=1.0)
    settings = PTSettings(max_bounces=6, min_bounces=1, light_samples=2,
                          russian_roulette=True, medium_aware=True)
    assert mega_available(b.world, cam, settings), "medium outside mega gate"
    film, prof, el = render_regen(b.world, cam, settings, 128, 128, 8,
                                  key=jax.random.PRNGKey(23))
    film = np.asarray(film)
    assert np.isfinite(film).all(), "medium film non-finite"
    assert film.mean() > 0, "medium film black"
    results["medium_smoke_mrays"] = round(prof.total_rays / el / 1e6, 2)


def check_bdpt_lt(results):

    import numpy as np
    import jax

    from pathtracer_tpu.parsing.cameras import build_camera
    from pathtracer_tpu.integrator.bdpt import BDPTSettings
    from pathtracer_tpu.integrator.lt import LTSettings
    from pathtracer_tpu.renderer.bdpt_renderer import render_bdpt
    from pathtracer_tpu.renderer.splatted import render_splatted

    b = _world("data/scenes/cornell_box.toml", camera_surfaces=True)
    cam = build_camera(b.camera_by_id("main"), aspect_ratio=1.0)
    film, prof, _ = render_bdpt(b.world, cam, BDPTSettings(max_depth=4),
                                128, 128, 1, key=jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(film)).all(), "bdpt film non-finite"
    results["bdpt_smoke"] = "ok"
    film, prof, _ = render_splatted(b.world, cam, LTSettings(max_bounces=4),
                                    128, 128, 2, key=jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(film)).all(), "lt film non-finite"
    results["lt_smoke"] = "ok"


def main():
    import jax

    dev = jax.devices()[0]
    results = {"device": str(dev)}
    if dev.platform == "cpu":
        print({"skipped": "no TPU present", **results})
        return 0
    failures = []
    checks = [("cornell_golden", check_cornell_golden),
              ("gem", check_gem),
              ("arrangement", check_arrangement),
              ("dispersive_hwss", check_dispersive_hwss_furnace),
              ("hdri", check_hdri),
              ("medium", check_medium),
              ("bdpt_lt", check_bdpt_lt)]
    if "--quick" in sys.argv:
        # bench gate: the golden-film RMSE + the spectral-MIS furnace are
        # the two physics-regression catchers; the full 7-check sweep
        # (fresh compile per check) runs long past any sane bench cap
        quick = {"cornell_golden", "dispersive_hwss"}
        checks = [c for c in checks if c[0] in quick]
    for name, fn in checks:
        t0 = time.perf_counter()
        try:
            fn(results)
            results[name] = "pass"
        except Exception as e:
            traceback.print_exc()
            results[name] = f"FAIL: {e}"
            failures.append(name)
        results[name + "_s"] = round(time.perf_counter() - t0, 1)
        # incremental flush: a timeout must not blank completed checks
        print({name: results[name], "s": results[name + "_s"]}, flush=True)
    print(results, flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
