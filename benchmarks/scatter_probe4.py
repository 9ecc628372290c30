"""Scatter probe 4: hand-written Pallas sweep-scatter vs XLA's scatter-add.

PROFILE.md's remaining-step-budget table puts the two embedding scatters at
~318 us/step, 2-3x above the ~60-80 us random-512B-row HBM ceiling, and
names a Pallas sweep-scatter as the candidate fix (VERDICT r3 next #2).
This probe measures that kernel at the exact workload shapes:

  scatter-add of (B, 128) f32 update rows into a (100096, 128) f32 table,
  B = 8192 sorted ids (the user scatter) and B = 16384 (the item scatter,
  sorted variant measured too since the kernel requires sorted ids).

Kernel design ("aliased revisit accumulation"): grid = B steps; the ids
ride scalar prefetch so both the input table block and the output block of
step i are the (8, 128) tile CONTAINING row ids[i] (Mosaic's minimum f32
block; index_map reads ids_ref[i] // 8). The kernel routes update row i
(sublane i % 8 of its (8, 128) update block) to sublane ids[i] % 8 of the
table tile with iota masks. Pallas skips the DMA when consecutive steps map
to the same block, so ids sharing a tile (adjacent, because sorted)
accumulate in VMEM and flush once:

  first-of-tile (ids[i]//8 != ids[i-1]//8):  out = table_tile + contrib
  continuation:                              out += contrib

The table is input/output-aliased, so untouched tiles stay in place and
each touched tile moves exactly once: one 4 KB read + one 4 KB write per
UNIQUE tile (~8x the per-row minimum when ids are spread, equal to it when
ids cluster 8-per-tile).

Run: python benchmarks/scatter_probe4.py   (real TPU)
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

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 100_096
D = 128
K = 100  # scan steps per timing


def _sweep_kernel(ids_ref, tbl_ref, upd_ref, out_ref):
    i = pl.program_id(0)
    id_i = ids_ref[i]
    prev_tile = ids_ref[jnp.maximum(i - 1, 0)] // 8
    first = jnp.logical_or(i == 0, id_i // 8 != prev_tile)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (8, D), 0)
    # update row i lives in sublane i%8 of its (8, D) update block; route it
    # to sublane id%8 of the table tile
    sel = jnp.sum(
        jnp.where(row_iota == i % 8, upd_ref[:], 0.0), axis=0, keepdims=True
    )
    contrib = jnp.where(row_iota == id_i % 8, sel, 0.0)

    @pl.when(first)
    def _():
        out_ref[:] = tbl_ref[:] + contrib

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:] += contrib


@jax.jit
def pallas_sweep_scatter(table, ids, upd):
    """Scatter-add upd (B, D) into table rows ids (B,) — ids SORTED."""
    b = ids.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((8, D), lambda i, ids: (ids[i] // 8, 0)),
            pl.BlockSpec((8, D), lambda i, ids: (i // 8, 0)),
        ],
        out_specs=pl.BlockSpec((8, D), lambda i, ids: (ids[i] // 8, 0)),
    )
    return pl.pallas_call(
        _sweep_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, D), jnp.float32),
        input_output_aliases={1: 0},  # table (after the scalar arg) -> out
        cost_estimate=pl.CostEstimate(
            flops=b * D,
            bytes_accessed=2 * b * 8 * D * 4,
            transcendentals=0,
        ),
    )(ids, table, upd)


def _sync(x):
    return float(jnp.asarray(x).ravel()[0])


def bench(tag, prog, *args, iters=5, warmup=1):
    for _ in range(warmup):
        out = prog(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = prog(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters / K
    print(f"{tag:52s}: {dt*1e6:9.1f} us/step", flush=True)
    return dt


def scan_prog(body):
    @jax.jit
    def prog(table, ids, upd):
        def step(t, xs):
            i, u = xs
            return body(t, i, u), ()

        t, _ = jax.lax.scan(step, table, (ids, upd))
        return t

    return prog


def main():
    key = jax.random.PRNGKey(0)
    print("backend:", jax.default_backend(), flush=True)

    for b in (8192, 16384):
        table = jnp.zeros((R, D), jnp.float32)
        ids = jnp.sort(jax.random.randint(key, (K, b), 0, R, jnp.int32), axis=1)
        upd = jnp.ones((K, b, D), jnp.float32)

        # correctness first (1 scan step)
        t0 = np.zeros((R, D), np.float32)
        np.add.at(t0, np.asarray(ids[0]), np.asarray(upd[0]))
        got = np.asarray(
            scan_prog(lambda t, i, u: pallas_sweep_scatter(t, i, u))(
                jnp.zeros((R, D), jnp.float32), ids[:1], upd[:1]
            )
        )
        np.testing.assert_allclose(got, t0, rtol=1e-6)
        print(f"B={b}: pallas sweep-scatter correctness ok", flush=True)

        bench(
            f"XLA sorted + indices_are_sorted     B={b}",
            scan_prog(lambda t, i, u: t.at[i].add(u, indices_are_sorted=True)),
            table, ids, upd,
        )
        bench(
            f"XLA sorted, no hint                 B={b}",
            scan_prog(lambda t, i, u: t.at[i].add(u)),
            table, ids, upd,
        )
        bench(
            f"pallas sweep (1 row/step, aliased)  B={b}",
            scan_prog(lambda t, i, u: pallas_sweep_scatter(t, i, u)),
            table, ids, upd,
        )


if __name__ == "__main__":
    main()
