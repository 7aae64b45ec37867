"""The batched (s,t)-grid MIS weights must equal the per-pair loop walk.

_mis_weight (the reference-shaped sequential ratio walk, Veach 10.9 /
bdpt/utils.rs:424-520) is the semantics; _mis_weight_batched re-expresses
it as masked suffix-products over a [N, P, D] grid so the whole strategy
family compiles as ONE graph. This pins them against each other on random
subpath pdf tables for every pair in the implemented universe."""

import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.integrator.bdpt import (
    Subpath,
    _mis_weight,
    _mis_weight_batched,
)


def _random_subpath(rng, n, d):
    def arr(shape=()):
        return jnp.asarray(rng.uniform(0.05, 4.0, (n, d) + shape)
                           .astype(np.float32))

    return Subpath(
        pos=arr((3,)), ns=arr((3,)), gn=arr((3,)), wi=arr((3,)),
        mat_id=jnp.zeros((n, d), jnp.int32),
        prim_id=jnp.zeros((n, d), jnp.int32),
        is_light=jnp.asarray(rng.uniform(size=(n, d)) < 0.3),
        beta=arr(), pdf_fwd=arr(), pdf_rev=arr(),
        valid=jnp.asarray(rng.uniform(size=(n, d)) < 0.8),
    )


def test_mis_batched_matches_loop():
    rng = np.random.default_rng(7)
    n, D = 64, 6
    y = _random_subpath(rng, n, D)
    z = _random_subpath(rng, n, D)
    # every strategy family's pair list: connections, s=0, t=1
    pairs = ([(s, t) for s in range(1, D + 1) for t in range(2, D + 1)]
             + [(0, t) for t in range(2, D + 1)]
             + [(s, 1) for s in range(1, D + 1)])
    P = len(pairs)
    je = [jnp.asarray(rng.uniform(0.0, 3.0, (n, P)).astype(np.float32))
          for _ in range(4)]
    # sprinkle zeros: the walk remaps zero/delta pdfs to 1
    je = [jnp.where(jnp.asarray(rng.uniform(size=(n, P))) < 0.15, 0.0, a)
          for a in je]
    prye, pryp, prze, przp = je
    w_b = _mis_weight_batched(
        y, z,
        jnp.asarray([s for s, _ in pairs], jnp.int32),
        jnp.asarray([t for _, t in pairs], jnp.int32),
        D, prye, pryp, prze, przp)
    for j, (s, t) in enumerate(pairs):
        w_l = _mis_weight(None, None, y, z, s, t, D,
                          prye[:, j], pryp[:, j], prze[:, j], przp[:, j])
        np.testing.assert_allclose(np.asarray(w_b[:, j]), np.asarray(w_l),
                                   rtol=2e-5,
                                   err_msg=f"pair (s={s}, t={t})")
