"""Probe for the 2026-08-18 tunnel AOT VMEM-OOM (kept as the negative
control): chains two trivial pallas calls with the megakernel's exact
block structure over swept lane counts — ALL compile fine, which is how
the real diagnosis was pinned down. The failing "Scoped allocation with
size 26.29M and limit 16.00M ... allocating on stack for %_k12_call"
names the custom-call by its [48, n] RESULT label, but the 26.3 MiB is
Mosaic's internal stack frame for the KERNEL BODY (the inline-sweep shade
kernel's unrolled per-chunk temporaries on multi-chunk scenes — gem's 10
chunks — grew past the new compiler's 16 MiB scoped budget after the
round-3 spectral-MIS/blocked-fetch additions; cornell's 1-chunk body
fits). Fix: megakernel._mega_jit forwards
xla_tpu_scoped_vmem_limit_kib=65536 (PT_SCOPED_VMEM_KIB) through per-jit
compiler_options — client-side XLA_FLAGS cannot carry TPU-only flags
(the axon client's flag parser rejects them) but proto-backed debug
options forward per-compile.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

TILE = 2048
NS, NU, NK = 32, 16, 48


def _k1(u_ref, s_ref, o_ref):
    o_ref[:NU, :] = u_ref[...] * 2.0 + s_ref[:NU, :]
    o_ref[NU:, :] = s_ref[...] + 1.0


def _k2(k_ref, s_ref, o_ref):
    o_ref[...] = s_ref[...] * 0.5 + k_ref[:NS, :]


def build(n, opts):
    def f(u, s):
        mid = pl.pallas_call(
            _k1,
            grid=(n // TILE,),
            in_specs=[pl.BlockSpec((NU, TILE), lambda i: (0, i)),
                      pl.BlockSpec((NS, TILE), lambda i: (0, i))],
            out_specs=pl.BlockSpec((NK, TILE), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((NK, n), jnp.float32),
        )(u, s)
        return pl.pallas_call(
            _k2,
            grid=(n // TILE,),
            in_specs=[pl.BlockSpec((NK, TILE), lambda i: (0, i)),
                      pl.BlockSpec((NS, TILE), lambda i: (0, i))],
            out_specs=pl.BlockSpec((NS, TILE), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((NS, n), jnp.float32),
        )(mid, s)

    u = jnp.zeros((NU, n), jnp.float32)
    s = jnp.ones((NS, n), jnp.float32)
    lowered = jax.jit(f).lower(u, s)
    t0 = time.perf_counter()
    compiled = lowered.compile(compiler_options=opts or None)
    dt = time.perf_counter() - t0
    out = np.asarray(compiled(u, s))
    assert out.shape == (NS, n) and np.isfinite(out).all()
    return dt


def main():
    print("device:", jax.devices()[0], flush=True)
    for n in (16384, 65536, 131072, 262144, 524288, 1048576, 2097152):
        for tag, opts in (
            ("default", {}),
            ("scoped96M", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
        ):
            try:
                dt = build(n, opts)
                print(f"n={n} {tag}: OK compile {dt:.1f}s", flush=True)
            except Exception as e:
                msg = repr(e)
                i = msg.find("Scoped allocation")
                key = msg[i:i + 80] if i >= 0 else msg[:160]
                print(f"n={n} {tag}: FAIL {key}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
