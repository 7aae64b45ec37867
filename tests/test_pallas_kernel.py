"""Pallas dense-sweep kernel parity (interpret mode on CPU; the axon TPU
tunnel in this environment cannot compile Mosaic kernels, so the compiled
path is exercised on real pods only)."""

import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.accel.pallas_sweep import pallas_intersect_dense
from pathtracer_tpu.geometry import intersect_dense
from pathtracer_tpu.parsing.construct import construct_world
import pytest

pytestmark = pytest.mark.slow  # heavy render test (see pytest.ini)

SEARCH = ["/root/repo", "/root/reference"]


def test_pallas_sweep_matches_xla():
    bundle = construct_world("data/scenes/cornell_box.toml", search_paths=SEARCH,
                             cache_dir="/tmp/pt_cache_pk")
    w = bundle.world
    rng = np.random.default_rng(0)
    n = 700
    o = jnp.asarray(rng.uniform(-0.5, 1.0, size=(n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    tmin = jnp.full((n,), 1e-5)
    tmax = jnp.full((n,), 1e9)
    h1 = intersect_dense(w.prims, o, d, tmin, tmax)
    h2 = pallas_intersect_dense(w.prims, o, d, tmin, tmax, interpret=True)
    assert np.array_equal(np.asarray(h1.hit), np.asarray(h2.hit))
    m = np.asarray(h1.hit)
    assert np.allclose(np.asarray(h1.t)[m], np.asarray(h2.t)[m], rtol=1e-5)
    assert np.array_equal(np.asarray(h1.prim_id)[m], np.asarray(h2.prim_id)[m])
