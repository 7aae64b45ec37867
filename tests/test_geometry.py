import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.geometry import (
    Primitives,
    PRIM_TRIANGLE,
    PRIM_SPHERE,
    PRIM_RECT,
    PRIM_DISK,
    intersect_dense,
    sample_surface,
)


def _make_prims(ptype, pa, pb, pc, area, xf=None, material_id=None):
    p = len(ptype)
    pad = (-p) % 16
    pn = p + pad

    def padv(a, fill=0.0):
        a = np.asarray(a, np.float32)
        return jnp.asarray(np.concatenate([a, np.full((pad,) + a.shape[1:], fill, np.float32)]))

    def padi(a, fill=0):
        a = np.asarray(a, np.int32)
        return jnp.asarray(np.concatenate([a, np.full((pad,), fill, np.int32)]))

    ident = np.eye(4, dtype=np.float32)[None]
    xf_fwd = ident if xf is None else np.concatenate([ident, xf[None]], axis=0)
    xf_inv = ident if xf is None else np.concatenate([ident, np.linalg.inv(xf)[None]], axis=0)
    return Primitives(
        ptype=padi(ptype),
        pa=padv(pa),
        pb=padv(pb),
        pc=padv(pc),
        na=padv(np.zeros((p, 3))),
        nb=padv(np.zeros((p, 3))),
        nc=padv(np.zeros((p, 3))),
        material_id=padi(material_id if material_id is not None else np.zeros(p)),
        mat_kind=padi(np.zeros(p)),
        instance_id=padi(np.arange(p)),
        transform_id=padi(np.zeros(p) if xf is None else np.ones(p)),
        area=padv(area),
        valid=jnp.asarray(np.concatenate([np.ones(p, bool), np.zeros(pad, bool)])),
        xf_fwd=jnp.asarray(xf_fwd),
        xf_inv=jnp.asarray(xf_inv),
    )


def test_sphere_hit():
    prims = _make_prims(
        [PRIM_SPHERE], [[0, 0, 0]], [[1.0, 0, 0]], [[0, 0, 0]], [4 * np.pi]
    )
    o = jnp.array([[-5.0, 0, 0], [-5.0, 3.0, 0]])
    d = jnp.array([[1.0, 0, 0], [1.0, 0, 0]])
    hr = intersect_dense(prims, o, d, jnp.zeros(2), jnp.full(2, 1e9))
    assert bool(hr.hit[0]) and not bool(hr.hit[1])
    assert abs(float(hr.t[0]) - 4.0) < 1e-4
    assert np.allclose(np.asarray(hr.normal[0]), [-1, 0, 0], atol=1e-5)


def test_triangle_and_rect_hit():
    prims = _make_prims(
        [PRIM_TRIANGLE, PRIM_RECT],
        [[0, -1, -1], [3, 0, 0]],
        [[0, 1, -1], [0, 0.5, 0]],
        [[0, 0, 1], [0, 0, 0.5]],
        [2.0, 1.0],
    )
    o = jnp.array([[-2.0, 0, 0], [-2.0, 0.2, 0.1], [-2.0, 0.9, 0.9]])
    d = jnp.array([[1.0, 0, 0], [1.0, 0, 0], [1.0, 0, 0]])
    hr = intersect_dense(prims, o, d, jnp.zeros(3), jnp.full(3, 1e9))
    # ray 0 hits the triangle at x=0 first
    assert bool(hr.hit[0]) and abs(float(hr.t[0]) - 2.0) < 1e-4
    assert int(hr.prim_id[0]) == 0
    # ray 1 passes within tri (0,0.2,0.1)? barycentric: inside -> still tri
    # ray 2 misses the tri but hits... rect half-size 0.5 -> (0.9,0.9) misses both
    assert not bool(hr.hit[2])


def test_closest_hit_ordering():
    # two spheres along +x; closest must win
    prims = _make_prims(
        [PRIM_SPHERE, PRIM_SPHERE],
        [[3, 0, 0], [6, 0, 0]],
        [[1.0, 0, 0], [1.0, 0, 0]],
        [[0, 0, 0], [0, 0, 0]],
        [4 * np.pi, 4 * np.pi],
    )
    o = jnp.array([[0.0, 0, 0]])
    d = jnp.array([[1.0, 0, 0]])
    hr = intersect_dense(prims, o, d, jnp.zeros(1), jnp.full(1, 1e9))
    assert int(hr.prim_id[0]) == 0
    assert abs(float(hr.t[0]) - 2.0) < 1e-4


def test_transformed_sphere():
    # sphere radius 1 at origin, translated to (0,0,5) via transform
    xf = np.eye(4, dtype=np.float32)
    xf[2, 3] = 5.0
    prims = _make_prims(
        [PRIM_SPHERE], [[0, 0, 0]], [[1.0, 0, 0]], [[0, 0, 0]], [4 * np.pi], xf=xf
    )
    o = jnp.array([[0.0, 0, 0]])
    d = jnp.array([[0.0, 0, 1.0]])
    hr = intersect_dense(prims, o, d, jnp.zeros(1), jnp.full(1, 1e9))
    assert bool(hr.hit[0])
    assert abs(float(hr.t[0]) - 4.0) < 1e-4
    assert np.allclose(np.asarray(hr.point[0]), [0, 0, 4.0], atol=1e-4)
    assert np.allclose(np.asarray(hr.normal[0]), [0, 0, -1.0], atol=1e-4)


def test_sample_surface_on_rect():
    prims = _make_prims(
        [PRIM_RECT], [[0, 0, 2.0]], [[0.5, 0, 0]], [[0, 0.25, 0]], [0.5]
    )
    rng = np.random.default_rng(0)
    u1 = jnp.asarray(rng.uniform(size=256), jnp.float32)
    u2 = jnp.asarray(rng.uniform(size=256), jnp.float32)
    pid = jnp.zeros(256, jnp.int32)
    p, n, pdf = sample_surface(prims, pid, u1, u2)
    p = np.asarray(p)
    assert np.all(np.abs(p[:, 0]) <= 0.5 + 1e-5)
    assert np.all(np.abs(p[:, 1]) <= 0.25 + 1e-5)
    assert np.allclose(p[:, 2], 2.0, atol=1e-5)
    assert np.allclose(np.asarray(pdf), 1.0 / 0.5)


def test_watertight_shared_edges_no_leak():
    """Rays aimed exactly at shared mesh edges must hit SOME triangle — the
    watertight test (soa._t_triangle, reference mesh.rs:67-198) guarantees a
    crossing ray lands in at least one of the two adjacent triangles."""
    from pathtracer_tpu.parsing.meshes import load_obj

    mesh = load_obj("/root/reference/data/meshes/brilliant_diamond.obj")[0]
    v = np.asarray(mesh.vertices, np.float32)
    f = np.asarray(mesh.indices, np.int32).reshape(-1, 3)
    tri = v[f]  # [F,3,3]
    # collect interior (shared) edges
    edges = {}
    for fi, (a, b, c) in enumerate(f):
        for e in [(a, b), (b, c), (c, a)]:
            k = (min(e), max(e))
            edges.setdefault(k, []).append(fi)
    shared = [k for k, fs in edges.items() if len(fs) == 2]
    assert len(shared) > 50
    rng = np.random.default_rng(7)
    targets = []
    for a, b in shared:
        w = rng.uniform(0.25, 0.75)
        targets.append(v[a] * w + v[b] * (1.0 - w))
    targets = np.asarray(targets, np.float32)
    m = len(targets)
    # grazing-ish origins from random far points
    dirs = rng.normal(size=(m, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = targets - 10.0 * dirs

    n_tri = len(f)
    prims = _make_prims(
        [PRIM_TRIANGLE] * n_tri, tri[:, 0], tri[:, 1], tri[:, 2],
        np.ones(n_tri, np.float32),
    )
    hr = intersect_dense(
        prims, jnp.asarray(origins), jnp.asarray(dirs),
        jnp.zeros(m), jnp.full(m, 1e9),
    )
    hit = np.asarray(hr.hit)
    t = np.asarray(hr.t)
    # every edge-targeted ray must hit, and the nearest hit can't be *behind*
    # the targeted point (leaking through the front edge to the back face)
    assert hit.all(), f"{(~hit).sum()}/{m} edge rays leaked through the mesh"
    assert np.all(t <= 10.0 + 1e-3), "ray passed through the front surface"
