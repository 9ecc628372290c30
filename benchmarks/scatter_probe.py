"""Micro-probe: embedding gather/scatter costs at the north-star MLP step
shapes, measured inside a lax.scan of 200 iterations (same context as the
epoch; per-call dispatch over the axon tunnel would otherwise dominate).

Shapes: user table (100K, D), item table (100K, D); per step the item table
sees a 16384-row scatter-add (pos+neg halves) and the user table an
8192-row one; gathers are the mirror reads. D in {81 (augmented f32 layout
used today), 128 (lane-aligned padded layout)}.

Run: python benchmarks/scatter_probe.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

R = 100_096
K = 200


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


def bench_scan(tag, make_body, table, ids):
    @jax.jit
    def prog(table, ids):
        def body(t, i):
            return make_body(t, i)

        return jax.lax.scan(body, table, ids)

    dt = timeit(prog, table, ids) / K
    print(f"{tag:52s}: {dt*1e6:9.1f} us/step")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    for d in (81, 128):
        table = jnp.zeros((R, d), jnp.float32)
        for b in (8192, 16384):
            ids = jax.random.randint(key, (K, b), 0, R, jnp.int32)
            rows = jnp.ones((b, d), jnp.float32)

            bench_scan(
                f"scatter-add (B={b:5d}, D={d})",
                lambda t, i, rows=rows: (t.at[i].add(rows), jnp.sum(t[0, :1])),
                table,
                ids,
            )
            bench_scan(
                f"gather      (B={b:5d}, D={d})",
                lambda t, i: (t, jnp.sum(jnp.take(t, i, axis=0))),
                table,
                ids,
            )
            # gather -> elementwise adagrad math -> scatter (the real update)
            def upd(t, i, rows=rows, d=d):
                raw = jnp.take(t, i, axis=0)
                g = rows[:, : d - 1] if d == 81 else rows[:, :80]
                acc_old = raw[:, -1]
                msq = jnp.mean(g * g, axis=-1)
                scale = jax.lax.rsqrt(acc_old + msq + 1e-10)
                pad = jnp.zeros((g.shape[0], t.shape[1] - g.shape[1] - 1))
                u = jnp.concatenate([-0.05 * g * scale[:, None], pad, msq[:, None]], axis=1)
                return t.at[i].add(u), jnp.sum(raw[0, :1])

            bench_scan(f"gather+adagrad+scatter (B={b:5d}, D={d})", upd, table, ids)
        print()


if __name__ == "__main__":
    main()
