import numpy as np
import jax.numpy as jnp
import pytest

from pathtracer_tpu.mediums.hg import hg_phase, hg_sample_cos, hg_sample_direction
from pathtracer_tpu.mediums.rayleigh import rayleigh_phase, rayleigh_sample_cos
from pathtracer_tpu.core import vecmath

pytestmark = pytest.mark.slow  # heavy render test (see pytest.ini)


@pytest.mark.parametrize("g", [-0.7, -0.2, 0.0, 0.3, 0.8])
def test_hg_phase_normalised(g):
    # ∫ p dω = 2π ∫ p(c) dc = 1
    c = np.linspace(-1, 1, 20001)
    p = np.asarray(hg_phase(jnp.float32(g), jnp.asarray(c, jnp.float32)))
    integral = 2 * np.pi * np.trapezoid(p, c)
    assert integral == pytest.approx(1.0, rel=1e-3)


@pytest.mark.parametrize("g", [-0.5, 0.0, 0.6])
def test_hg_sampling_matches_phase(g):
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.uniform(size=200_000), jnp.float32)
    c = np.asarray(hg_sample_cos(jnp.float32(g), u))
    # mean cosine of HG is exactly g
    assert c.mean() == pytest.approx(g, abs=0.01)
    assert c.min() >= -1.0 and c.max() <= 1.0


def test_hg_forward_peak():
    # g>0 must bias cosθ towards +1 (forward scattering)
    u = jnp.linspace(0.001, 0.999, 1001)
    c = np.asarray(hg_sample_cos(jnp.float32(0.8), u))
    assert (c > 0).mean() > 0.8


def test_rayleigh_phase_normalised():
    c = np.linspace(-1, 1, 20001)
    p = np.asarray(rayleigh_phase(jnp.asarray(c, jnp.float32)))
    integral = 2 * np.pi * np.trapezoid(p, c)
    assert integral == pytest.approx(1.0, rel=1e-3)


def test_rayleigh_inverse_cdf():
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.uniform(size=100_000), jnp.float32)
    c = np.asarray(rayleigh_sample_cos(u))
    # symmetric phase: mean 0; heavier tails than uniform
    assert abs(c.mean()) < 0.01
    assert np.var(c) > 1.0 / 3.0  # uniform variance is 1/3; Rayleigh is larger


def test_hg_sample_direction_unit():
    rng = np.random.default_rng(2)
    wi = jnp.asarray(rng.normal(size=(256, 3)), jnp.float32)
    wi = vecmath.normalize(wi)
    u1 = jnp.asarray(rng.uniform(size=256), jnp.float32)
    u2 = jnp.asarray(rng.uniform(size=256), jnp.float32)
    wo, pdf = hg_sample_direction(jnp.full(256, 0.5), wi, u1, u2)
    assert np.allclose(np.asarray(vecmath.length(wo)), 1.0, atol=1e-4)
    assert np.all(np.asarray(pdf) > 0)
