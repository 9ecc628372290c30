"""Scatter strategy probe: how fast can a (B, 128)-row scatter-add into a
(100K, 128) f32 table go on this TPU, under different lowerings?

Variants:
  plain        table.at[ids].add(upd)
  sorted       argsort ids first, then scatter with indices_are_sorted=True
  dedup        segment-sum duplicate ids into unique slots (sort-based),
               then scatter with unique+sorted flags
  merged       one scatter of 3B rows into a 2R merged table vs 2 scatters

Run: python benchmarks/scatter_probe2.py
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

R = 100_096
K = 100
D = 128


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def timeit(fn, *args, iters=5, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def bench(tag, body, table, ids, upd):
    @jax.jit
    def prog(table, ids, upd):
        def step(t, xs):
            i, u = xs
            return body(t, i, u), ()

        t, _ = jax.lax.scan(step, table, (ids, upd))
        return t

    dt = timeit(prog, table, ids, upd) / K
    print(f"{tag:44s}: {dt*1e6:9.1f} us/step")
    return dt


def plain(t, i, u):
    return t.at[i].add(u)


def sorted_scatter(t, i, u):
    order = jnp.argsort(i)
    return t.at[i[order]].add(u[order], indices_are_sorted=True)


def dedup_scatter(t, i, u):
    b = i.shape[0]
    order = jnp.argsort(i)
    si, su = i[order], u[order]
    # segment boundaries: first occurrence of each run
    first = jnp.concatenate([jnp.ones((1,), bool), si[1:] != si[:-1]])
    seg = jnp.cumsum(first) - 1  # (B,) segment index, sorted
    summed = jax.ops.segment_sum(su, seg, num_segments=b)
    # representative id per segment: scatter first-occurrence ids
    rep = jnp.full((b,), R - 1, jnp.int32)
    rep = rep.at[seg].set(si)  # last write per segment wins; all equal anyway
    return t.at[rep].add(summed, indices_are_sorted=False, unique_indices=False)


def main():
    key = jax.random.PRNGKey(0)
    table = jnp.zeros((R, D), jnp.float32)

    for b in (4096, 8192, 12288, 16384, 24576, 32768):
        ids = jax.random.randint(key, (K, b), 0, R, jnp.int32)
        upd = jnp.ones((K, b, D), jnp.float32)
        bench(f"plain        B={b:6d}", plain, table, ids, upd)

    b = 16384
    ids = jax.random.randint(key, (K, b), 0, R, jnp.int32)
    upd = jnp.ones((K, b, D), jnp.float32)
    bench(f"sorted       B={b:6d}", sorted_scatter, table, ids, upd)
    bench(f"argsort only B={b:6d}",
          lambda t, i, u: t.at[0, 0].add(jnp.sum(jnp.argsort(i)).astype(jnp.float32)),
          table, ids, upd)

    b = 8192
    ids8 = jax.random.randint(key, (K, b), 0, R, jnp.int32)
    upd8 = jnp.ones((K, b, D), jnp.float32)
    bench(f"sorted       B={b:6d}", sorted_scatter, table, ids8, upd8)

    # merged: one 3B-row scatter into a (2R, D) table vs user+item separate
    big = jnp.zeros((2 * R, D), jnp.float32)
    ids3 = jax.random.randint(key, (K, 24576), 0, 2 * R, jnp.int32)
    upd3 = jnp.ones((K, 24576, D), jnp.float32)
    bench("merged 1x24576 into 2R", plain, big, ids3, upd3)

    print()
    print("reference: full-table copy (read+write 51 MB):")

    @jax.jit
    def sweep(t):
        def stp(t, _):
            return t * 1.000001, ()

        t, _ = jax.lax.scan(stp, t, jnp.arange(K))
        return t

    dt = timeit(sweep, table) / K
    print(f"{'table*scalar sweep':44s}: {dt*1e6:9.1f} us/step")


if __name__ == "__main__":
    main()
