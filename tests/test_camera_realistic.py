

def test_chromatic_pupil_and_splat_roundtrip():
    """r3: (a) the exit-pupil bake is radial×λ (RadialSampler parity,
    realistic_camera.rs:146-181) — short-λ pupils differ from long-λ;
    (b) get_pixel_for_ray inverts get_ray through the full assembly
    (film-side reverse trace), unlocking LT/BDPT lens splats."""
    import numpy as np
    import jax.numpy as jnp
    from pathtracer_tpu.camera.realistic import make_realistic_camera

    cam = make_realistic_camera(
        dict(lens_spec="data/cameras/petzval_kodak.txt", fstop=2.0,
             sensor_size=35.0, look_from=[0, 0, 0], look_at=[1, 0, 0]),
        aspect_ratio=1.0, search_paths=["/root/reference", "/root/repo"])
    radii = np.asarray(cam.pupil_radii)
    assert radii.ndim == 2 and radii.shape[1] >= 4
    # chromatic: the bake must not be λ-constant everywhere
    assert (radii.std(axis=1) > 0).any() or not np.allclose(
        radii[:, 0], radii[:, -1])

    n = 512
    rng = np.random.default_rng(0)
    fu = jnp.asarray(rng.uniform(0.3, 0.7, n).astype(np.float32))
    fv = jnp.asarray(rng.uniform(0.3, 0.7, n).astype(np.float32))
    u1 = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    o, d, tau = cam.get_ray(fu, fv, u1, u2)
    ok_fwd = np.asarray(tau) > 0.5
    assert ok_fwd.mean() > 0.3, "most central rays should make it through"
    bu, bv, ok = cam.get_pixel_for_ray(o, d)
    ok = np.asarray(ok) & ok_fwd
    assert ok.mean() > 0.25, f"reverse trace succeeds for {ok.mean():.2f}"
    du = np.abs(np.asarray(bu) - np.asarray(fu))[ok]
    dv = np.abs(np.asarray(bv) - np.asarray(fv))[ok]
    # sub-pixel-scale inversion at 1080p => ~1e-3 in film uv
    assert np.median(du) < 2e-3 and np.median(dv) < 2e-3, (
        np.median(du), np.median(dv))
