"""Ablation + microbenchmark breakdown of the north-star MLP train step.

The axon-tunneled TPU does not emit device xplanes (jax.profiler traces come
back with host planes only — see benchmarks/PROFILE.md), so the per-op
breakdown is measured the robust way: (a) the REAL jitted epoch with one
piece removed at a time, and (b) standalone microbenchmarks of each
constituent op at the exact workload shapes. Together they bound where the
~1.04 ms/step goes.

Workload: bench.py north star — 10M interactions, MLP [1024,128]+BN,
n_factors=80, batch 8192, dynamic negatives, bf16 compute.

Run: python benchmarks/ablate_step.py [--n 10000000] [--quick]
"""

from __future__ import annotations

import argparse
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

from benchmarks.scale_10m import structured_interactions  # noqa: E402


def _sync(out):
    """True device barrier: on the axon tunnel jax.block_until_ready returns
    before execution finishes; a scalar host pull is the only real sync."""
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def timeit(fn, *args, iters=20, warmup=3):
    """Mean wall time of back-to-back dispatches with a hard final sync.
    NOTE: per-call timings over the tunnel are dominated by a ~50 us
    dispatch floor; treat anything near that as 'free'."""
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def epoch_time(trainer, state, store, epochs=2):
    # fit() returns host floats of the per-epoch losses — a true sync.
    state, _ = trainer.fit(state, store, epochs=1, verbose=False)  # compile
    t0 = time.perf_counter()
    state, _ = trainer.fit(state, store, epochs=epochs, verbose=False)
    return (time.perf_counter() - t0) / epochs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--users", type=int, default=100_000)
    ap.add_argument("--items", type=int, default=100_000)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--quick", action="store_true", help="microbench only")
    args = ap.parse_args()

    from torchrecsys_tpu.config import ModelConfig, TrainConfig
    from torchrecsys_tpu.data import prepare_data
    from torchrecsys_tpu.models import build_model
    from torchrecsys_tpu.train import Trainer

    B, D, H1, H2 = args.batch, 80, 1024, 128
    R = args.users
    print(f"== microbench (B={B}, 2B={2*B} tower rows, D={D}) ==")
    key = jax.random.PRNGKey(0)

    # fused-layout table (R, 81) and ids
    tab = jax.random.normal(key, (R, D + 1), jnp.float32)
    ids = jax.random.randint(key, (2 * B,), 0, R, jnp.int32)
    upd = jax.random.normal(key, (2 * B, D + 1), jnp.float32)

    t_gather = timeit(jax.jit(lambda t, i: jnp.take(t, i, axis=0)), tab, ids)
    t_scatter = timeit(jax.jit(lambda t, i, u: t.at[i].add(u)), tab, ids, upd)
    # scatter with donated (in-place) buffer — what the epoch scan actually
    # does; each donated call consumes its input, so chain the output back in
    f_don = jax.jit(lambda t, i, u: t.at[i].add(u), donate_argnums=(0,))
    cur = f_don(tab + 0.0, ids, upd)
    _sync(cur)
    t0 = time.perf_counter()
    for _ in range(20):
        cur = f_don(cur, ids, upd)
    _sync(cur)
    t_scatter_donate = (time.perf_counter() - t0) / 20

    x = jax.random.normal(key, (2 * B, 3 * D), jnp.bfloat16)
    w1 = jax.random.normal(key, (3 * D, H1), jnp.bfloat16)
    w2 = jax.random.normal(key, (H1, H2), jnp.bfloat16)
    w3 = jax.random.normal(key, (H2, 1), jnp.bfloat16)

    def tower(x, w1, w2, w3):
        return (jax.nn.relu(jax.nn.relu(x @ w1) @ w2) @ w3).sum()

    t_fwd = timeit(jax.jit(tower), x, w1, w2, w3)
    t_fwdbwd = timeit(jax.jit(jax.grad(tower, argnums=(0, 1, 2, 3))), x, w1, w2, w3)

    def tower_bn(x, w1, w2, w3):
        h = x @ w1
        m = jnp.mean(h.astype(jnp.float32), axis=0)
        v = jnp.var(h.astype(jnp.float32), axis=0)
        h = ((h - m.astype(h.dtype)) * jax.lax.rsqrt(v + 1e-5).astype(h.dtype))
        h = jax.nn.relu(h)
        h2 = h @ w2
        m2 = jnp.mean(h2.astype(jnp.float32), axis=0)
        v2 = jnp.var(h2.astype(jnp.float32), axis=0)
        h2 = ((h2 - m2.astype(h2.dtype)) * jax.lax.rsqrt(v2 + 1e-5).astype(h2.dtype))
        return (jax.nn.relu(h2) @ w3).sum()

    t_fwdbwd_bn = timeit(
        jax.jit(jax.grad(tower_bn, argnums=(0, 1, 2, 3))), x, w1, w2, w3
    )

    t_sample = timeit(
        jax.jit(lambda k: jax.random.randint(k, (B,), 0, args.items, jnp.int32)),
        key,
    )

    # per-epoch shuffle, amortized per step
    n = args.n
    nsteps = n // B
    packed = jax.random.randint(key, (n, 2), 0, R, jnp.int32)
    perm = jax.random.permutation(key, n)
    t_shuffle = timeit(
        jax.jit(lambda p, pm: jnp.take(p, pm, axis=0)), packed, perm, iters=5
    )

    flops_step = 2 * (2 * B) * (3 * D * H1 + H1 * H2 + H2) * 3  # fwd+bwd
    print(f"row gather   (2B={2*B} x {D+1} f32)        : {t_gather*1e3:8.3f} ms")
    print(f"row scatter-add same shape                 : {t_scatter*1e3:8.3f} ms")
    print(f"row scatter-add donated (1 shot)           : {t_scatter_donate*1e3:8.3f} ms")
    print(f"tower fwd  bf16 (no BN)                    : {t_fwd*1e3:8.3f} ms")
    print(f"tower fwd+bwd bf16 (no BN)                 : {t_fwdbwd*1e3:8.3f} ms"
          f"  -> {flops_step/t_fwdbwd/1e12:.1f} TFLOP/s")
    print(f"tower fwd+bwd bf16 (with BN)               : {t_fwdbwd_bn*1e3:8.3f} ms")
    print(f"neg sampling randint (B)                   : {t_sample*1e3:8.3f} ms")
    print(f"epoch shuffle 10M rows ({t_shuffle*1e3:.1f} ms) /step : {t_shuffle/nsteps*1e3:8.3f} ms")

    if args.quick:
        return

    print(f"\n== real-epoch ablations (n={args.n}) ==")
    data = structured_interactions(args.users, args.items, args.n)

    def run(tag, *, dynamic=True, bn=True, dtype="bfloat16", batch=None,
            net="mlp", fused=True):
        store = prepare_data(
            data, "user_id", "item_id", dynamic_neg_sampling=dynamic
        )
        model = build_model(
            store.schema,
            ModelConfig(net_type=net, n_factors=80, hidden_layers=(1024, 128),
                        use_batch_norm=bn, compute_dtype=dtype),
        )
        cfg = TrainConfig(
            batch_size=batch or args.batch, learning_rate=0.05,
            dynamic_neg_sampling=dynamic, loss="hinge",
            fused_embedding_update=fused,
        )
        trainer = Trainer(model, cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        dt = epoch_time(trainer, state, store)
        exps = args.n / dt
        print(f"{tag:42s}: {dt:7.3f} s/epoch  {exps/1e6:7.2f} M ex/s")
        return dt

    base = run("mlp base (bn, dyn, bf16, b=8192)")
    run("mlp no batch-norm", bn=False)
    run("mlp static negatives", dynamic=False)
    run("mlp f32 compute", dtype="float32")
    run("mlp unfused adagrad (1D acc ops)", fused=False)
    run("mlp batch 16384", batch=16384)
    run("mlp batch 32768", batch=32768)
    run("linear same data (no tower at all)", net="linear")
    print(f"\nbase step time: {base / (args.n // args.batch) * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
