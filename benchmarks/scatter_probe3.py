"""Scatter probe 3: can we force XLA's fast scatter lowering?

Observed (scatter_probe2): scatter-add of B rows into (R=100K, 128) flips
from ~36-48 ns/row (serial) to ~13 ns/row at B >= R/8. Variants here:

  pad-to-fast  user-sized scatter (8192) padded with zero-update rows to
               cross the threshold
  presorted    ids sorted outside the loop, indices_are_sorted=True
  dedup        sort + segment-sum + scatter with unique_indices=True
  smallR       B=8192 into R=64K (above threshold naturally)

Run: python benchmarks/scatter_probe3.py
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
    print(f"{tag:46s}: {dt*1e6:9.1f} us/step")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    table = jnp.zeros((R, D), jnp.float32)
    b = 8192
    ids = jax.random.randint(key, (K, b), 0, R, jnp.int32)
    upd = jnp.ones((K, b, D), jnp.float32)

    # pad with zero updates aimed at row R-1 to cross the B >= R/8 threshold
    thresh = -(-R // 8)
    pad = ((thresh + 127) // 128) * 128 - b + 256

    def pad_fast(t, i, u):
        i2 = jnp.concatenate([i, jnp.full((pad,), R - 1, jnp.int32)])
        u2 = jnp.concatenate([u, jnp.zeros((pad, D), jnp.float32)])
        return t.at[i2].add(u2)

    bench(f"pad-to-fast  B=8192(+{pad})", pad_fast, table, ids, upd)

    sids = jnp.sort(ids, axis=1)

    def presorted(t, i, u):
        return t.at[i].add(u, indices_are_sorted=True)

    bench("presorted    B=8192 (flag only)", presorted, table, sids, upd)

    def dedup(t, i, u):
        b = i.shape[0]
        order = jnp.argsort(i)
        si, su = i[order], u[order]
        first = jnp.concatenate([jnp.ones((1,), bool), si[1:] != si[:-1]])
        seg = jnp.cumsum(first) - 1
        summed = jax.ops.segment_sum(su, seg, num_segments=b)
        rep = jnp.where(
            jnp.arange(b) < seg[-1] + 1,
            jnp.zeros((b,), jnp.int32).at[seg].max(si),
            R - 1,
        )
        return t.at[rep].add(summed, indices_are_sorted=False, unique_indices=True)

    bench("dedup+unique B=8192", dedup, table, ids, upd)

    small = jnp.zeros((64_000, D), jnp.float32)
    ids_s = jax.random.randint(key, (K, b), 0, 64_000, jnp.int32)
    bench("smallR       B=8192 into 64K", lambda t, i, u: t.at[i].add(u), small, ids_s, upd)

    # the combined real shape: pad item scatter (16384) and user (8192+pad)
    def both(t, i, u):
        i2 = jnp.concatenate([i, jnp.full((pad,), R - 1, jnp.int32)])
        u2 = jnp.concatenate([u, jnp.zeros((pad, D), jnp.float32)])
        t = t.at[i2].add(u2)  # "user"
        ii = jnp.concatenate([i, i])
        uu = jnp.concatenate([u, u])
        return t.at[ii].add(uu)  # "item" 16384

    bench("user(pad)+item scatters combined", both, table, ids, upd)


if __name__ == "__main__":
    main()
