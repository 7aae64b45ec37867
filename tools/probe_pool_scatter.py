"""Feasibility probe for the per-tile sample-pool respawn (occupancy-pool
megakernel): measures the two in-kernel primitives the pool needs, at
production tile shapes, against a baseline copy kernel:

  1. lane prefix-sum (rank of dying lanes in flat lane order) via the
     hierarchical matmul trick: per-sublane-row strict-LT [128,128] matmul
     + cross-row offset [16,16] matmul.
  2. film scatter-add by target lane slot via chunked one-hot matmuls:
     4 x ([4,512] values x [512,2048] one-hot), one-hot built by
     iota-compare.

If (1)+(2) cost << the ~8.5 ms/round of the production 2-prog round, the
pool (which removes the ~2x occupancy drain tail at bench spp) is worth
building. Run on the chip: python tools/probe_pool_scatter.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

TILE = 2048
SUB = TILE // 128
N = 1080 * 1080
N_PAD = -(-N // TILE) * TILE
ROWS = 8  # state rows carried through (xyz + pix + mask + spare)


def _tile(row):
    return row.reshape(SUB, 128)


def _flat(a):
    return a.reshape(TILE)


def _copy_kernel(s_ref, o_ref):
    for r in range(ROWS):
        o_ref[r, :] = s_ref[r, :] * 1.0000001


def _pool_kernel(s_ref, o_ref):
    """Prefix-rank of mask lanes + one-hot scatter of 4 value rows."""
    mask = _tile(s_ref[4, :]) > 0.5
    mf = mask.astype(jnp.float32)
    # (1) prefix rank, flat lane order = (sublane-major rows of 128)
    lt128 = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
             < jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
             ).astype(jnp.float32)
    within = jax.lax.dot_general(mf, lt128, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    rowsum = jnp.sum(mf, axis=1, keepdims=True)  # [SUB,1]
    ltS = (jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1)
           < jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
           ).astype(jnp.float32)
    offs = jax.lax.dot_general(ltS, jnp.broadcast_to(rowsum, (SUB, 128)),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    rank = within + offs  # [SUB,128] exclusive prefix of mask
    total = jnp.sum(mf)
    # target slot = (pc + rank) mod TILE — pc fed as row 5 lane 0 (take max)
    pc = jnp.max(_tile(s_ref[5, :]))
    tgt = pc + rank
    tgt = tgt - jnp.floor(tgt / TILE) * TILE
    tgt = jnp.where(mask, tgt, -1.0)
    # (2) chunked one-hot scatter of rows 0..3 into [4, TILE]
    tgt_flat = _flat(tgt)                     # [2048]
    film = jnp.zeros((ROWS // 2, TILE), jnp.float32)
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (512, TILE), 1
                                         ).astype(jnp.float32)
    for g in range(4):
        seg = tgt_flat[g * 512:(g + 1) * 512]
        oh = (seg[:, None] == slot_iota).astype(jnp.float32)  # [512, 2048]
        vals = jnp.stack(
            [s_ref[r, g * 512:(g + 1) * 512] for r in range(4)],
            axis=0)  # [4,512]
        film = film + jax.lax.dot_general(
            vals, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    for r in range(4):
        o_ref[r, :] = film[r, :]
    o_ref[4, :] = _flat(rank)
    o_ref[5, :] = jnp.full((TILE,), pc + total, jnp.float32)
    for r in range(6, ROWS):
        o_ref[r, :] = s_ref[r, :]


def run(kernel, s, tag, rep=32):
    from jax.experimental.pallas import tpu as pltpu

    interp = (pltpu.InterpretParams()
              if jax.devices()[0].platform == "cpu" else False)
    f = jax.jit(lambda x: pl.pallas_call(
        kernel,
        grid=(N_PAD // TILE,),
        in_specs=[pl.BlockSpec((ROWS, TILE), lambda i: (0, i))],
        out_specs=pl.BlockSpec((ROWS, TILE), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((ROWS, N_PAD), jnp.float32),
        interpret=interp,
    )(x))
    red = jax.jit(lambda a: jnp.sum(a[0]))
    out = f(s)
    np.asarray(red(out))
    t0 = time.perf_counter()
    for _ in range(rep):
        out = f(s)
    np.asarray(red(out))
    dt = (time.perf_counter() - t0) / rep
    print(f"{tag}: {dt*1e3:.2f} ms/round", flush=True)
    return out


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    s = np.zeros((ROWS, N_PAD), np.float32)
    s[0:4] = rng.normal(size=(4, N_PAD))
    s[4] = (rng.random(N_PAD) < 0.3).astype(np.float32)  # 30% dying
    s[5] = 100.0  # pool counter
    s = jnp.asarray(s)
    run(_copy_kernel, s, "copy baseline")
    out = run(_pool_kernel, s, "prefix+scatter")
    # correctness spot-check vs numpy on tile 0
    sh = np.asarray(s[:, :TILE])
    oh = np.asarray(out[:, :TILE])
    mask = sh[4] > 0.5
    rank = np.cumsum(mask) - mask
    np.testing.assert_allclose(oh[4], rank, rtol=0, atol=0.5)
    tgt = ((100.0 + rank) % TILE).astype(int)
    film = np.zeros((4, TILE))
    for r in range(4):
        np.add.at(film[r], tgt[mask], sh[r][mask])
    np.testing.assert_allclose(oh[:4], film, rtol=1e-5, atol=1e-5)
    print("correctness ok (tile 0)", flush=True)


if __name__ == "__main__":
    sys.exit(main())
