"""Diagnose the smoke golden-RMSE gap: bias or variance?

Renders cornell 128x128 @128spp three ways on the current backend —
mega seed A, mega seed B, XLA-path seed A — and prints pairwise
tonemapped RMSEs plus each film vs the checked-in golden, raw and after
an 8x8 box filter (the box filter suppresses MC noise ~8x, so residual
filtered RMSE is systematic bias).

Run: python tools/golden_diag.py [spp]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tm_rgb(film):
    import jax.numpy as jnp
    import numpy as np

    from pathtracer_tpu.tonemap import Reinhard1, tonemap_to_rgb

    tm = Reinhard1(key_value=0.18, white_point=1.0, luminance_only=False)
    d, _ = tonemap_to_rgb(jnp.asarray(film), tm, "Rec709")
    return np.asarray(d)


def rmse(a, b):
    import numpy as np

    return float(np.sqrt(np.mean((a - b) ** 2)))


def box8(a):
    import numpy as np

    h, w, c = a.shape
    return a.reshape(h // 8, 8, w // 8, 8, c).mean(axis=(1, 3))


def main():
    import numpy as np
    import jax

    from pathtracer_tpu.parsing.cameras import build_camera
    from pathtracer_tpu.parsing.construct import construct_world
    from pathtracer_tpu.integrator.pt import PTSettings
    from pathtracer_tpu.renderer.persistent import render_regen
    from pathtracer_tpu.tonemap.io_exr import read_exr

    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    b = construct_world("data/scenes/cornell_box.toml",
                        search_paths=["/root/repo", "/root/reference"],
                        cache_dir="/tmp/pt_cache")
    cam = build_camera(b.camera_by_id("main"), aspect_ratio=1.0)
    s = PTSettings(max_bounces=12, min_bounces=1, light_samples=2,
                   russian_roulette=True)
    golden = np.asarray(read_exr("data/golden/cornell_128.exr"))
    films = {}
    for name, kw in [
        ("megaA", dict(key=jax.random.PRNGKey(42), use_megakernel=True)),
        ("megaB", dict(key=jax.random.PRNGKey(1042), use_megakernel=True)),
        ("xlaA", dict(key=jax.random.PRNGKey(42), use_megakernel=False)),
    ]:
        t0 = time.perf_counter()
        film, prof_, el = render_regen(b.world, cam, s, 128, 128, spp, **kw)
        films[name] = np.asarray(film)
        print(f"{name}: mean={films[name].mean():.4f} "
              f"mrays={prof_.total_rays / el / 1e6:.1f} "
              f"wall={time.perf_counter() - t0:.1f}s", flush=True)
    tms = {k: tm_rgb(v) for k, v in films.items()}
    tmg = tm_rgb(golden)
    for k in films:
        print(f"{k:6s} vs golden: mean_ratio={films[k].mean() / golden.mean():.4f} "
              f"tm_rmse={rmse(tms[k], tmg):.4f} "
              f"box8_rmse={rmse(box8(tms[k]), box8(tmg)):.4f}", flush=True)
    print(f"megaA vs megaB : tm_rmse={rmse(tms['megaA'], tms['megaB']):.4f} "
          f"box8={rmse(box8(tms['megaA']), box8(tms['megaB'])):.4f}")
    print(f"megaA vs xlaA  : tm_rmse={rmse(tms['megaA'], tms['xlaA']):.4f} "
          f"box8={rmse(box8(tms['megaA']), box8(tms['xlaA'])):.4f}")


if __name__ == "__main__":
    main()
