"""BVH accelerator: build invariants + hit parity vs the dense sweep
(reference test analogue: accelerator correctness,
src/accelerator/{bvh,lbvh}.rs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pathtracer_tpu.accel import build_bvh_arrays, intersect_bvh, intersect_any_bvh
from pathtracer_tpu.accel.sah import build_sah_bvh
from pathtracer_tpu.geometry import intersect_dense, intersect_any_dense
from pathtracer_tpu.parsing import SceneBuilder
from pathtracer_tpu.parsing.meshes import load_obj
from pathtracer_tpu.parsing.paths import resolve
from pathtracer_tpu.core import spectral


def _triangle_soup_world(n_tris=600, seed=0):
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    white = b.add_curve(spectral.FlatCurve(0.7), name="w")
    one_px = np.ones((1, 1), np.float32)
    tw = b.add_texture([(one_px, white)], name="t")
    mw = b.add_lambertian(tw, name="m")
    centers = rng.uniform(-2, 2, size=(n_tris, 3))
    verts = []
    faces = []
    for i, c in enumerate(centers):
        tri = c + rng.normal(scale=0.45, size=(3, 3))
        verts.extend(tri)
        faces.append([3 * i, 3 * i + 1, 3 * i + 2])
    b.add_mesh(np.asarray(verts), np.asarray(faces), None, mw)
    one = b.add_curve(spectral.FlatCurve(1.0), name="one")
    b.set_environment_constant(one, 1.0)
    return b.build()


def test_sah_build_invariants():
    rng = np.random.default_rng(1)
    lo = rng.uniform(-5, 5, size=(300, 3))
    hi = lo + rng.uniform(0.01, 0.5, size=(300, 3))
    nodes, order = build_sah_bvh(lo, hi, leaf_size=4)
    assert sorted(order.tolist()) == list(range(300))
    bvh = build_bvh_arrays(lo, hi)
    m = bvh.n_nodes
    exit_idx = np.asarray(bvh.exit_idx)
    assert (exit_idx >= 0).all() and (exit_idx <= m).all()
    # exit always jumps FORWARD in DFS order (stackless invariant)
    assert (exit_idx > np.arange(m)).all()
    # leaves cover all prims
    starts = np.asarray(bvh.prim_start)
    counts = np.asarray(bvh.prim_count)
    covered = sum(int(c) for s, c in zip(starts, counts) if s >= 0)
    assert covered == 300


def test_bvh_hit_parity_with_dense():
    world = _triangle_soup_world()
    rng = np.random.default_rng(2)
    n = 512
    o = jnp.asarray(rng.uniform(-4, 4, size=(n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    t_min = jnp.full((n,), 1e-4)
    t_max = jnp.full((n,), 1e9)
    hd = intersect_dense(world.prims, o, d, t_min, t_max)
    hb = intersect_bvh(world.prims, world.bvh, o, d, t_min, t_max)
    assert np.array_equal(np.asarray(hd.hit), np.asarray(hb.hit))
    hit = np.asarray(hd.hit)
    assert hit.mean() > 0.15, "soup should be hit reasonably often"
    assert np.allclose(np.asarray(hd.t)[hit], np.asarray(hb.t)[hit], rtol=1e-4)
    assert np.array_equal(np.asarray(hd.prim_id)[hit], np.asarray(hb.prim_id)[hit])


def test_bvh_anyhit_parity():
    world = _triangle_soup_world()
    rng = np.random.default_rng(3)
    n = 256
    o = jnp.asarray(rng.uniform(-4, 4, size=(n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    t_min = jnp.full((n,), 1e-4)
    t_max = jnp.full((n,), 3.0)
    a = np.asarray(intersect_any_dense(world.prims, o, d, t_min, t_max))
    bvh_hit = np.asarray(intersect_any_bvh(world.prims, world.bvh, o, d, t_min, t_max))
    assert np.array_equal(a, bvh_hit)


def test_monkey_mesh_renders_via_bvh():
    """The monkey OBJ (~1k faces) exceeds DENSE_MAX_PRIMS, exercising the
    BVH path end-to-end."""
    from pathtracer_tpu.camera import make_projective_camera
    from pathtracer_tpu.integrator.pt import PTSettings
    from pathtracer_tpu.renderer import render_sampled

    meshes = load_obj(resolve("data/meshes/monkey.obj", ["/root/reference"]))
    b = SceneBuilder()
    white = b.add_curve(spectral.FlatCurve(0.8), name="w")
    one = b.add_curve(spectral.FlatCurve(1.0), name="one")
    one_px = np.ones((1, 1), np.float32)
    tw = b.add_texture([(one_px, white)], name="t")
    mw = b.add_lambertian(tw, name="m")
    for mesh in meshes:
        b.add_mesh(mesh.vertices, mesh.indices, mesh.normals, mw)
    b.set_environment_constant(one, 1.0)
    b.env_sampling_probability = 1.0
    world = b.build()
    assert world.prims.count > 256
    cam = make_projective_camera([0.0, -3.0, 0.3], [0, 0, 0], vfov_degrees=35.0,
                                 focal_distance=3.0)
    film, profile, _ = render_sampled(
        world, cam, PTSettings(max_bounces=3, light_samples=1), 24, 24,
        min_samples=4, key=jax.random.PRNGKey(0), sample_chunk=4,
    )
    f = np.asarray(film)
    assert np.all(np.isfinite(f))
    assert f[..., 1].mean() > 1.0  # lit by the furnace env


def test_native_builder_matches_python():
    """The C++ builder (native/bvh_builder.cpp) must produce a tree that
    traverses to identical hits as the Python reference builder."""
    from pathtracer_tpu.accel.native import build_bvh_native, native_available
    from pathtracer_tpu.accel.flatten import build_bvh_arrays, BVH
    import jax.numpy as jnp

    if not native_available():
        pytest.skip("no g++ toolchain for the native builder")
    world = _triangle_soup_world(n_tris=500, seed=7)
    prims = world.prims
    lo = np.asarray(
        jnp.minimum(jnp.minimum(prims.pa, prims.pb), prims.pc) - 1e-4
    )[: 1500]
    hi = np.asarray(
        jnp.maximum(jnp.maximum(prims.pa, prims.pb), prims.pc) + 1e-4
    )[: 1500]
    # use only the real (non-padded) triangles
    valid = np.asarray(prims.valid)
    lo, hi = lo[valid[: len(lo)]], hi[valid[: len(hi)]]

    native = build_bvh_native(lo, hi, 4)
    assert native is not None
    n_lo, n_hi, n_exit, n_start, n_count, n_order = native
    m = len(n_lo)
    assert sorted(n_order.tolist()) == list(range(len(lo)))
    assert (n_exit > np.arange(m)).all() and (n_exit <= m).all()
    covered = int(n_count[n_start >= 0].sum())
    assert covered == len(lo)

    # traversal parity: python-built vs native-built BVH over the same prims
    bvh_py = build_bvh_arrays(lo, hi, use_native=False)
    bvh_nat = BVH(
        lo=jnp.asarray(n_lo), hi=jnp.asarray(n_hi), exit_idx=jnp.asarray(n_exit),
        prim_start=jnp.asarray(n_start), prim_count=jnp.asarray(n_count),
        prim_order=jnp.asarray(np.concatenate([n_order, np.zeros(4, np.int32)])),
    )
    rng = np.random.default_rng(11)
    n = 256
    # the boxes here are the world prims' triangles, so reuse world.prims
    o = jnp.asarray(rng.uniform(-4, 4, size=(n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    t_min = jnp.full((n,), 1e-4)
    t_max = jnp.full((n,), 1e9)
    h1 = intersect_bvh(world.prims, bvh_py, o, d, t_min, t_max)
    h2 = intersect_bvh(world.prims, bvh_nat, o, d, t_min, t_max)
    assert np.array_equal(np.asarray(h1.hit), np.asarray(h2.hit))
    hitm = np.asarray(h1.hit)
    assert np.allclose(np.asarray(h1.t)[hitm], np.asarray(h2.t)[hitm], rtol=1e-4)


# ----------------------------------------------------- two-level TLAS/BLAS


def _gem_world(instanced: bool):
    """Three instances of the gem mesh (identity / translate / non-uniform
    scale+rotate) + a floor rect + a light. instanced=True routes them
    through the shared-BLAS two-level path; False bakes each to world space
    (distinct mesh keys)."""
    from pathtracer_tpu.core.transform import from_stack

    mesh = load_obj(resolve("data/meshes/gem.obj", ["/root/reference"]))[0]
    b = SceneBuilder()
    b.force_instancing = instanced
    white = b.add_curve(spectral.FlatCurve(0.7), name="w")
    emit = b.add_curve(spectral.BlackbodyCurve(5500.0, 10.0), name="e")
    one_px = np.ones((1, 1), np.float32)
    tw = b.add_texture([(one_px, white)], name="t")
    mw = b.add_lambertian(tw, name="m")
    m2 = b.add_lambertian(tw, name="m2")
    ml = b.add_diffuse_light(emit, white, 2, name="ml")
    xf1 = from_stack(None, [], [2.0, 0.0, 0.0])
    xf2 = from_stack([0.6, 1.3, 0.9], [([0.0, 0.0, 1.0], 35.0)], [-1.5, 0.4, 0.2])
    for i, (xf, ovr) in enumerate([(None, mw), (xf1, m2), (xf2, mw)]):
        b.add_mesh(
            mesh.vertices, mesh.indices, mesh.normals, 0,
            transform=xf,
            mesh_key="gem" if instanced else f"gem{i}",
            material_override=ovr,
        )
    b.add_rect([0.0, 0.0, -2.0], [6.0, 0, 0], [0, 6.0, 0], mw)
    b.add_rect([0.0, 0.0, 4.0], [1.0, 0, 0], [0, 1.0, 0], ml)
    zero = b.add_curve(spectral.FlatCurve(0.0), name="z")
    b.set_environment_constant(zero, 0.0)
    return b.build()


def _gem_rays(n=512, seed=3):
    rng = np.random.default_rng(seed)
    # rays converging on the instance cluster from a shell
    targets = np.concatenate([
        rng.uniform(-0.8, 0.8, size=(n // 2, 3)),
        rng.uniform(-2.2, 2.8, size=(n - n // 2, 3)) * np.array([1, 0.4, 0.4]),
    ])
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = targets - 6.0 * dirs
    return jnp.asarray(origins, jnp.float32), jnp.asarray(dirs, jnp.float32)


def test_two_level_parity_with_baked():
    w_inst = _gem_world(True)
    w_bake = _gem_world(False)
    assert w_inst.accel2 is not None
    assert w_bake.accel2 is None
    # shared BLAS memory: one copy of the gem triangles, not three
    n_gem = 64
    assert w_inst.prims.count < w_bake.prims.count - n_gem
    o, d = _gem_rays()
    n = o.shape[0]
    tmin = jnp.zeros(n)
    tmax = jnp.full(n, 1e9)
    h1 = w_inst.intersect(o, d, tmin, tmax)
    h2 = w_bake.intersect(o, d, tmin, tmax)
    assert np.array_equal(np.asarray(h1.hit), np.asarray(h2.hit))
    hit = np.asarray(h1.hit)
    np.testing.assert_allclose(
        np.asarray(h1.t)[hit], np.asarray(h2.t)[hit], rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(h1.point)[hit], np.asarray(h2.point)[hit], rtol=1e-3, atol=2e-4
    )
    # normals must match incl. the inverse-transpose of the non-uniform xf
    nd = np.abs(np.asarray(h1.normal) - np.asarray(h2.normal))[hit]
    assert nd.max() < 2e-3
    assert np.array_equal(np.asarray(h1.material_id)[hit], np.asarray(h2.material_id)[hit])
    assert np.array_equal(np.asarray(h1.mat_kind)[hit], np.asarray(h2.mat_kind)[hit])
    # occlusion parity
    a1 = np.asarray(w_inst.intersect_any(o, d, tmin, jnp.full(n, 5.0)))
    a2 = np.asarray(w_bake.intersect_any(o, d, tmin, jnp.full(n, 5.0)))
    assert np.array_equal(a1, a2)


def test_two_level_render_equivalence():
    """Same RNG + identical intersections => the instanced and baked gem
    worlds must render (near-)identical films through the full PT path."""
    from pathtracer_tpu.camera import make_projective_camera
    from pathtracer_tpu.integrator.pt import PTSettings
    from pathtracer_tpu.renderer.naive import render_sampled

    cam = make_projective_camera(
        look_from=[0.0, -7.0, 1.5], look_at=[0.0, 0.0, 0.0], vfov_degrees=35.0,
        focal_distance=7.0, aperture_diameter=0.0, aspect_ratio=1.0,
    )
    settings = PTSettings(max_bounces=3, min_bounces=1, light_samples=1)
    films = []
    for instanced in (True, False):
        world = _gem_world(instanced)
        film, _, _ = render_sampled(world, cam, settings, 24, 24, min_samples=2)
        films.append(np.asarray(film))
    assert np.isfinite(films[0]).all()
    assert films[0].mean() > 0.0
    np.testing.assert_allclose(films[0], films[1], rtol=2e-3, atol=2e-4)


def test_flatten_policy(monkeypatch):
    """Default policy bakes small instanced scenes to world space (dense
    sweep / megakernel eligibility — no TLAS/BLAS); PT_FLATTEN_MAX=0
    restores the shared-BLAS route; intersections agree either way."""
    from pathtracer_tpu.core.transform import from_stack
    from pathtracer_tpu.parsing.meshes import load_obj

    def world(flatten_max):
        monkeypatch.setenv("PT_FLATTEN_MAX", str(flatten_max))
        mesh = load_obj(resolve("data/meshes/gem.obj", ["/root/reference"]))[0]
        b = SceneBuilder()
        white = b.add_curve(spectral.FlatCurve(0.7), name="w")
        one_px = np.ones((1, 1), np.float32)
        tw = b.add_texture([(one_px, white)], name="t")
        mw = b.add_lambertian(tw, name="m")
        emit = b.add_curve(spectral.BlackbodyCurve(5500.0, 10.0), name="e")
        ml = b.add_diffuse_light(emit, white, 2, name="ml")
        xf1 = from_stack(None, [], [2.0, 0.0, 0.0])
        xf2 = from_stack([0.6, 1.3, 0.9], [([0.0, 0.0, 1.0], 35.0)],
                         [-1.5, 0.4, 0.2])
        for xf in (None, xf1, xf2):
            b.add_mesh(mesh.vertices, mesh.indices, mesh.normals, 0,
                       transform=xf, mesh_key="gem", material_override=mw)
        b.add_rect([0.0, 0.0, 4.0], [1.0, 0, 0], [0, 1.0, 0], ml)
        zero = b.add_curve(spectral.FlatCurve(0.0), name="z")
        b.set_environment_constant(zero, 0.0)
        return b.build()

    w_flat = world(8192)
    w_blas = world(0)
    assert w_flat.accel2 is None, "small scene must flatten by default"
    assert w_blas.accel2 is not None
    assert int(np.asarray(w_flat.prims.xf_inv).shape[0]) == 1, \
        "flattened rows must leave the all-identity transform fast path on"
    o, d = _gem_rays()
    n = o.shape[0]
    tmin = jnp.zeros(n)
    tmax = jnp.full(n, 1e9)
    h1 = w_flat.intersect(o, d, tmin, tmax)
    h2 = w_blas.intersect(o, d, tmin, tmax)
    assert np.array_equal(np.asarray(h1.hit), np.asarray(h2.hit))
    hit = np.asarray(h1.hit)
    np.testing.assert_allclose(np.asarray(h1.t)[hit], np.asarray(h2.t)[hit],
                               rtol=2e-4, atol=2e-5)
