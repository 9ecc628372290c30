"""Scatter probe 4: hand-written Pallas sweep-scatter vs XLA's scatter-add.

PROFILE.md's remaining-step-budget table puts the two embedding scatters at
~318 us/step, 2-3x above the ~60-80 us random-512B-row HBM ceiling, and
names a Pallas sweep-scatter as the candidate fix (VERDICT r3 next #2).
This probe measures that kernel at the exact workload shapes:

  scatter-add of (B, 128) f32 update rows into a (100096, 128) f32 table,
  B = 8192 sorted ids (the user scatter) and B = 16384 (the item scatter,
  sorted variant measured too since the kernel requires sorted ids).

Kernel design ("aliased revisit accumulation"): grid = B steps; the ids ride
scalar prefetch so BOTH the input table block and the output block of step i
are table row ids[i] (index_map reads ids_ref[i]). Pallas skips the DMA when
consecutive steps map to the same block, so duplicate ids (adjacent, because
sorted) accumulate in VMEM and flush once:

  first-of-run (ids[i] != ids[i-1]):  out = table_row + upd[i]
  continuation:                       out += upd[i]

The table is input/output-aliased, so untouched rows stay in place and the
touched rows are updated in HBM with exactly one 512 B read + one 512 B
write per UNIQUE id — the theoretical minimum traffic for this op.

A G-rows-per-step variant (G=8) amortizes grid-step overhead: each step
owns updates [8i, 8i+8); all G table blocks are declared as G separate
aliased in/out pairs. Correctness requires no id to span a step boundary
shared with a different slot — guaranteed here by deduplicating ids into a
(B,) unique-padded layout first (measured separately).

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
    first = jnp.logical_or(i == 0, ids_ref[i] != ids_ref[jnp.maximum(i - 1, 0)])

    @pl.when(first)
    def _():
        out_ref[:] = tbl_ref[:] + upd_ref[:]

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:] += upd_ref[:]


@functools.partial(jax.jit, donate_argnums=(0,))
def pallas_sweep_scatter(table, ids, upd):
    """Scatter-add upd (B, D) into table rows ids (B,) — ids SORTED."""
    b = ids.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, D), lambda i, ids: (ids[i], 0)),
            pl.BlockSpec((1, D), lambda i, ids: (i, 0)),
        ],
        out_specs=pl.BlockSpec((1, D), lambda i, ids: (ids[i], 0)),
    )
    return pl.pallas_call(
        _sweep_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, D), jnp.float32),
        input_output_aliases={1: 0},  # table (after the scalar arg) -> out
        cost_estimate=pl.CostEstimate(
            flops=b * D,
            bytes_accessed=3 * b * D * 4,
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
