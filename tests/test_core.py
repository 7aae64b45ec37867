import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pathtracer_tpu.core import vecmath, cie, spectral, sampling
from pathtracer_tpu.core.bounds import Bounds1D, BOUNDED_VISIBLE_RANGE
from pathtracer_tpu.prelude import power_heuristic


def test_normalize_and_dot():
    v = jnp.array([[3.0, 0.0, 4.0], [0.0, 0.0, 0.0]])
    n = vecmath.normalize(v)
    assert np.allclose(vecmath.length(n)[0], 1.0, atol=1e-6)
    assert np.all(np.isfinite(np.asarray(n)))


def test_tangent_frame_roundtrip():
    rng = np.random.default_rng(0)
    n = vecmath.normalize(jnp.asarray(rng.normal(size=(64, 3)), jnp.float32))
    frame = vecmath.TangentFrame.from_normal(n)
    v = vecmath.normalize(jnp.asarray(rng.normal(size=(64, 3)), jnp.float32))
    back = frame.to_world(frame.to_local(v))
    assert np.allclose(np.asarray(back), np.asarray(v), atol=1e-5)
    # frame orthonormality
    assert np.allclose(np.asarray(vecmath.dot(frame.tangent, frame.normal)), 0, atol=1e-5)
    assert np.allclose(np.asarray(vecmath.length(frame.tangent)), 1, atol=1e-5)


def test_uv_direction_roundtrip():
    rng = np.random.default_rng(1)
    d = vecmath.normalize(jnp.asarray(rng.normal(size=(128, 3)), jnp.float32))
    u, v = vecmath.direction_to_uv(d)
    d2 = vecmath.uv_to_direction(u, v)
    assert np.allclose(np.asarray(d2), np.asarray(d), atol=1e-4)


def test_cie_ybar_peak():
    # y_bar peaks near 555nm with value ~1
    lam = jnp.linspace(380.0, 780.0, 2001)
    y = cie.y_bar(lam)
    peak_lam = float(lam[jnp.argmax(y)])
    assert abs(peak_lam - 555.0) < 5.0
    assert abs(float(jnp.max(y)) - 1.0) < 0.15


def test_curve_bank_eval_flat_and_cauchy():
    curves = [
        spectral.FlatCurve(0.78),
        spectral.CauchyCurve(1.4, 4500.0),
        spectral.BlackbodyCurve(5000.0, 1.0),
    ]
    bank = spectral.bake_curves(curves)
    lam = jnp.array([500.0, 600.0])
    flat = spectral.evaluate(bank, jnp.array([0, 0]), lam)
    assert np.allclose(np.asarray(flat), 0.78, atol=1e-3)
    cau = spectral.evaluate(bank, jnp.array([1, 1]), lam)
    expected = 1.4 + 4500.0 / np.array([500.0, 600.0]) ** 2
    assert np.allclose(np.asarray(cau), expected, rtol=1e-3)
    bb = spectral.evaluate(bank, jnp.array([2, 2]), lam)
    assert np.all(np.asarray(bb) > 0)


def test_spectral_cdf_sampling_matches_histogram():
    # A spike curve: sampled wavelengths must concentrate near the spike
    curves = [spectral.SpikeCurve(550.0, 20.0, 20.0, 1.0)]
    bank = spectral.bake_curves(curves)
    u = jnp.asarray(np.random.default_rng(2).uniform(size=4096), jnp.float32)
    idx = jnp.zeros(4096, jnp.int32)
    lam, power, pdf = spectral.sample_power_and_pdf(bank, idx, u, BOUNDED_VISIBLE_RANGE)
    lam = np.asarray(lam)
    assert np.all(lam >= 380) and np.all(lam <= 780)
    assert abs(np.median(lam) - 550.0) < 10.0
    assert np.all(np.asarray(pdf) >= 0)
    # MC estimate of the integral using importance samples: E[power/pdf] = ∫power
    est = np.mean(np.asarray(power) / np.maximum(np.asarray(pdf), 1e-9))
    host = curves[0].integral(Bounds1D(380.0, 780.0), 4096)
    assert abs(est - host) / host < 0.05


def test_sampling_cosine_direction_pdf():
    rng = np.random.default_rng(3)
    u, v = jnp.asarray(rng.uniform(size=(2, 20000)), jnp.float32)
    d = sampling.random_cosine_direction(u, v)
    assert np.allclose(np.asarray(vecmath.length(d)), 1.0, atol=1e-4)
    # E[z] for cosine-weighted = 2/3
    assert abs(float(jnp.mean(d[..., 2])) - 2.0 / 3.0) < 0.01


def test_power_heuristic_balance():
    assert float(power_heuristic(jnp.float32(1.0), jnp.float32(3.0))) == pytest.approx(0.25)
