"""On-chip probe: cost of a ONE-TIME alive-first stable partition of the
mega state [NS=32, n_pad] at bench widths, three ways:

  a) argsort(stable) + take      — the round-2 ladder's partition (the
                                   measured loser at 2M lanes)
  b) cumsum ranks + scatter      — O(n): dest = alive? rank_a-1 : na+rank_d-1
  c) cumsum + searchsorted + take (gather form)

Honest timing: each variant is ONE jitted program, timed across a value
fetch of a small slice, averaged over reps. The partition is the enabling
half of the tail plan (compact + chain rounds-per-program); rule 8's
pacing floor only sinks compaction when rounds stay 1-per-program.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

NS = 32
S_ALIVE = 22


def make_state(n_pad, frac_alive, seed=0):
    rng = np.random.default_rng(seed)
    st = rng.standard_normal((NS, n_pad), dtype=np.float32)
    st[S_ALIVE] = (rng.random(n_pad) < frac_alive).astype(np.float32)
    return jnp.asarray(st)


def part_argsort(state, m):
    order = jnp.argsort(1.0 - state[S_ALIVE], stable=True)
    sh = jnp.take(state, order, axis=1)
    return sh[:, :m], sh[18:26, m:]


def part_scatter(state, m):
    alive = state[S_ALIVE] > 0.5
    ca = jnp.cumsum(alive.astype(jnp.int32))
    cd = jnp.cumsum(jnp.logical_not(alive).astype(jnp.int32))
    dest = jnp.where(alive, ca - 1, ca[-1] + cd - 1)
    sh = jnp.zeros_like(state).at[:, dest].set(state, unique_indices=True)
    return sh[:, :m], sh[18:26, m:]


def part_gather(state, m):
    alive = state[S_ALIVE] > 0.5
    n = state.shape[1]
    ca = jnp.cumsum(alive.astype(jnp.int32))
    cd = jnp.cumsum(jnp.logical_not(alive).astype(jnp.int32))
    j = jnp.arange(n, dtype=jnp.int32)
    src_a = jnp.searchsorted(ca, j + 1)
    src_d = jnp.searchsorted(cd, j + 1 - ca[-1])
    src = jnp.where(j < ca[-1], src_a, src_d)
    sh = jnp.take(state, src, axis=1)
    return sh[:, :m], sh[18:26, m:]


def time_one(fn, state, m, tag, reps=3, chain=8):
    f = jax.jit(fn, static_argnames=("m",))
    front, tail = f(state, m)          # warm/compile
    np.asarray(front[S_ALIVE, :8])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        cur = state
        for _ in range(chain):          # chain to amortize the fetch RTT
            front, tail = f(cur, m)
            cur = cur.at[0, 0].add(front[0, 0] * 0.0)  # keep deps honest
        np.asarray(front[S_ALIVE, :8])  # one value fetch
        ts.append((time.perf_counter() - t0) / chain)
    med = sorted(ts)[len(ts) // 2]
    # correctness: all alive lanes land in front, count preserved
    na = int(np.asarray(jnp.sum(state[S_ALIVE])))
    fa = int(np.asarray(jnp.sum(front[S_ALIVE] > 0.5)))
    ok = (fa == na)
    print(f"  {tag:10s} m={m}: {med*1e3:7.2f} ms  (alive {na}->{fa} ok={ok})",
          flush=True)
    return med


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    for n_pad in (1167360, 583680):
        print(f"n_pad={n_pad}, 45% alive:", flush=True)
        st = make_state(n_pad, 0.45)
        m = n_pad // 2
        time_one(part_scatter, st, m, "scatter")
        time_one(part_gather, st, m, "gather")
        time_one(part_argsort, st, m, "argsort")
