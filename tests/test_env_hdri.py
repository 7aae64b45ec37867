"""HDRI environment + importance sampling end-to-end (synthetic assets;
reference capability: config_test_lighting_hdri.toml + importance map,
src/world/environment.rs + importance_map.rs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pathtracer_tpu.parsing.construct import construct_world
from pathtracer_tpu.parsing.cameras import build_camera
from pathtracer_tpu.integrator.pt import PTSettings
from pathtracer_tpu.renderer import render_sampled
from pathtracer_tpu.world.environment import env_sample_uv, env_emission, env_pdf_for

pytestmark = pytest.mark.slow  # heavy render test (see pytest.ini)

SEARCH = ["/root/repo", "/root/reference"]


@pytest.fixture(scope="module")
def hdri_bundle():
    return construct_world("data/scenes/hdri_blob_test.toml", search_paths=SEARCH,
                           cache_dir="/tmp/pt_cache_hdri")


def test_importance_map_baked(hdri_bundle):
    env = hdri_bundle.world.env
    assert bool(env.imp_baked)
    assert env.imp_pdf.shape == (32, 64)
    # pdf integrates to ~1 over the uv unit square
    assert float(jnp.mean(env.imp_pdf)) == pytest.approx(1.0, rel=1e-3)


def test_env_sampling_targets_blob(hdri_bundle):
    """Importance samples concentrate where the radiance blob is, and the
    MC identity E[L/p] == ∫L dω holds."""
    world = hdri_bundle.world
    rng = np.random.default_rng(0)
    n = 20000
    u1 = jnp.asarray(rng.uniform(size=n), jnp.float32)
    u2 = jnp.asarray(rng.uniform(size=n), jnp.float32)
    d, pdf = env_sample_uv(world.env, u1, u2)
    lam = jnp.full((n,), 550.0)
    le = env_emission(world.env, world.bank, world.tex, d, lam)
    le = np.asarray(le)
    assert (le > 1.0).mean() > 0.5, "importance sampling should hit the blob often"
    est = np.mean(le / np.maximum(np.asarray(pdf), 1e-9))
    # brute-force ∫L dω by uniform sphere sampling
    v = rng.normal(size=(80000, 3))
    v = jnp.asarray(v / np.linalg.norm(v, axis=-1, keepdims=True), jnp.float32)
    le_u = np.asarray(env_emission(world.env, world.bank, world.tex, v,
                                   jnp.full((80000,), 550.0)))
    ref = le_u.mean() * 4 * np.pi
    assert est == pytest.approx(ref, rel=0.08), (est, ref)


def test_env_nee_matches_bsdf_only(hdri_bundle):
    """Rendering the sphere with env NEE (importance map) vs pure BSDF
    sampling must agree — validates pdf_for/sample consistency + MIS."""
    world = hdri_bundle.world
    cam = build_camera(hdri_bundle.cameras[0], 1.0)
    res = 10
    common = dict(max_bounces=3, min_bounces=3, russian_roulette=False)
    f_nee, _, _ = render_sampled(world, cam, PTSettings(light_samples=1, **common),
                                 res, res, 150, key=jax.random.PRNGKey(1), sample_chunk=50)
    f_bsdf, _, _ = render_sampled(world, cam, PTSettings(light_samples=0, **common),
                                  res, res, 600, key=jax.random.PRNGKey(2), sample_chunk=100)
    a = float(np.asarray(f_nee[..., 1]).mean())
    b = float(np.asarray(f_bsdf[..., 1]).mean())
    assert abs(a - b) / b < 0.15, (a, b)
