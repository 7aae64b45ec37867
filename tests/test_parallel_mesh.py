

def test_multihost_module_single_process():
    """distributed.py's degenerate single-process path: the global mesh is
    the local 8-device mesh and render_regen_multihost matches the sharded
    regen film (same per-device keys)."""
    import numpy as np
    import jax
    from pathtracer_tpu.parallel import distributed as dist
    from pathtracer_tpu.parallel import render_regen_sharded
    from pathtracer_tpu.integrator.pt import PTSettings
    import __graft_entry__ as g

    assert dist.init_distributed() is False  # no multi-process runtime here
    world = g._mini_cornell()
    cam = g._camera()
    s = PTSettings(max_bounces=3, min_bounces=1, light_samples=1)
    mesh = dist.make_global_render_mesh()
    film, prof, _ = dist.render_regen_multihost(
        world, cam, s, 32, 32, 1, mesh, key=jax.random.PRNGKey(4))
    assert np.isfinite(film).all() and prof.total_rays > 0
    film2, prof2, _ = render_regen_sharded(
        world, cam, s, 32, 32, 1, mesh=mesh, key=jax.random.PRNGKey(4))
    np.testing.assert_allclose(film, np.asarray(film2), rtol=1e-5, atol=1e-6)
