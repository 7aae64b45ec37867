"""LT mega v2 round cost split at 1M lanes: K12 pallas alone, K34 alone,
full round with/without the film scatter. The chain A/B showed the round
is device-compute-bound (~78 ms at 1M lanes vs the PT fused round's ~9 ms
at 2M) — find which kernel holds the cost."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from pathtracer_tpu.integrator.lt import LTSettings
from pathtracer_tpu.kernels import lt_mega as lm
from pathtracer_tpu.kernels import megakernel as mk
from pathtracer_tpu.parsing.cameras import build_camera
from pathtracer_tpu.parsing.construct import construct_world

print("device:", jax.devices()[0], flush=True)

c = construct_world("data/scenes/cornell_box.toml",
                    search_paths=["/root/repo", "/root/reference"],
                    cache_dir="/tmp/pt_cache", camera_surfaces=True)
cam = build_camera(c.camera_by_id("main"), aspect_ratio=1.0)
s = LTSettings(max_bounces=8, camera_samples=1, stratified=False)
W = H = 512
scene = lm.build_mega_scene(c.world, cam, lm._PTShim())
n_pad = 1 << 20

consts = dict(scene.consts)
consts["lt_a_lens"] = float(np.pi) * float(cam.lens_radius) ** 2
consts["lt_a_film"] = float((2.0 * cam.half_width) * (2.0 * cam.half_height))
consts["lt_has_proxy"] = True
consts.pop("tex_feed", None)
consts.pop("medium", None)
consts["lt_world_radius"] = float(np.asarray(c.world.radius))
consts["lt_world_center"] = tuple(float(x) for x in np.asarray(c.world.center))
wb = s.wavelength_bounds
settings_d = dict(camera_samples=1, max_bounces=8.0, min_bounces=1.0,
                  russian_roulette=True, width=float(W), height=float(H),
                  wb_lo=float(wb.lower), wb_span=float(wb.span), tile=mk.TILE)
settings_t = lm._freeze(settings_d)
consts_t = lm._freeze(consts)
lcdf = jnp.asarray(lm.bake_lt_spawn_tab(c.world, wb))
cs = 1
nu = lm._nu_lt(cs)
nq = lm._q2_rows(cs)
nk4 = lm._k4_rows_v2(cs)

state = jnp.zeros((lm.NS_LT, n_pad), jnp.float32)
state = state.at[lm.LS_BUDGET].set(4.0)
state = state.at[lm.LS_ALIVE].set(1.0)
state = state.at[lm.LS_D + 2].set(1.0)
state = state.at[lm.LS_LAM].set(550.0)
state = state.at[lm.LS_BETA].set(1.0)
u = jax.random.uniform(jax.random.PRNGKey(0), (nu, n_pad))
usp = jax.random.uniform(jax.random.PRNGKey(1), (lm.NUSP, n_pad))


@jax.jit
def k12_only(u, state):
    settings = dict(settings_t)
    consts = dict(consts_t)
    return pl.pallas_call(
        functools.partial(lm._lt_shade_kernel, consts, settings),
        grid=(n_pad // mk.TILE,),
        in_specs=[lm._row_spec(nu), lm._row_spec(lm.NS_LT),
                  lm._full_block_spec(scene.dense_tab),
                  lm._full_block_spec(scene.prim_tab),
                  lm._full_block_spec(scene.mat_tab),
                  lm._full_block_spec(scene.spec_tab)],
        out_specs=lm._row_spec(nq),
        out_shape=jax.ShapeDtypeStruct((nq, n_pad), jnp.float32),
    )(u, state, scene.dense_tab, scene.prim_tab, scene.mat_tab,
      scene.spec_tab)


@jax.jit
def k34_only(u, usp, state, k2):
    settings = dict(settings_t)
    consts = dict(consts_t)
    return pl.pallas_call(
        functools.partial(lm._lt_finalize_spawn_kernel, consts, settings),
        grid=(n_pad // mk.TILE,),
        in_specs=[lm._row_spec(nu), lm._row_spec(lm.NUSP),
                  lm._row_spec(lm.NS_LT), lm._row_spec(nq),
                  lm._full_block_spec(scene.dense_tab),
                  lm._full_block_spec(scene.light_tab),
                  lm._full_block_spec(scene.spec_tab),
                  lm._full_block_spec(lcdf)],
        out_specs=lm._row_spec(nk4),
        out_shape=jax.ShapeDtypeStruct((nk4, n_pad), jnp.float32),
    )(u, usp, state, k2, scene.dense_tab, scene.light_tab, scene.spec_tab,
      lcdf)


def timed(tag, fn, *a):
    out = fn(*a)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # compile+warm
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    el = (time.perf_counter() - t0) / reps
    print(f"{tag}: {el * 1e3:.2f} ms/call", flush=True)
    return out


k2 = timed("K12 (sweep+shade)", k12_only, u, state)
timed("K34 (sweeps+spawn)", k34_only, u, usp, state, k2)


# ---- scatter microbenchmark: does film.at[pid].add cost scale with the
# update count (compaction would win) or per-call? Plus unique-index
# permutation scatter (the cumsum-compaction building block).
film0 = jnp.zeros((W * H, 3), jnp.float32)
for n_upd in (1 << 21, 1 << 19, 1 << 17):
    pid = jax.random.randint(jax.random.PRNGKey(2), (n_upd,), 0, W * H)
    xyz = jax.random.uniform(jax.random.PRNGKey(3), (n_upd, 3))

    @jax.jit
    def scat_add(film, pid, xyz):
        return film.at[pid].add(xyz)

    timed(f"scatter-add {n_upd >> 10}k dups", scat_add, film0, pid, xyz)

n_upd = 1 << 21
mask = jax.random.uniform(jax.random.PRNGKey(4), (n_upd,)) < 0.12
vals = jax.random.uniform(jax.random.PRNGKey(5), (n_upd, 4))


@jax.jit
def compact_then_add(film, mask, vals):
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
    cap = 1 << 19
    dst = jnp.where(mask, jnp.minimum(rank, cap - 1), cap - 1)
    buf = jnp.zeros((cap, 4), jnp.float32).at[dst].set(
        jnp.where(mask[:, None], vals, 0.0), mode="drop",
        unique_indices=False)
    pid = jnp.clip(buf[:, 0].astype(jnp.int32), 0, W * H - 1)
    return film.at[pid].add(buf[:, 1:4])


timed("compact(2M->512k)+add", compact_then_add, film0, mask, vals)
