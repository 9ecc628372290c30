"""Finer ablations of the north-star MLP step (companion to
step_breakdown.py; results in benchmarks/PROFILE.md).

Isolates: BN batch-stats vs normalize, dense-optimizer choice, dynamic
negative sampling, and the relu — each as a scan of 200 REAL steps with the
piece swapped out.

Run: python benchmarks/step_breakdown2.py
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

from torchrecsys_tpu.config import DataSchema, ModelConfig, TrainConfig
from torchrecsys_tpu.models import build_model
from torchrecsys_tpu.models import mlp as mlp_mod
from torchrecsys_tpu.train import Trainer
from torchrecsys_tpu.train.optim import augment_tables

K, B = 200, 8192


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


def scan_time(tag, bn=True, dtype="bfloat16", dense_opt="adam", static_neg=False,
              frozen_bn_stats=False):
    schema = DataSchema(num_users=100_000, num_items=100_000)
    key = jax.random.PRNGKey(0)
    batches = {
        "user_id": jnp.sort(
            jax.random.randint(key, (K, B), 0, 100_000, jnp.int32), axis=1
        ),
        "pos_item_id": jax.random.randint(key, (K, B), 0, 100_000, jnp.int32),
    }
    if static_neg:
        batches["neg_item_id"] = jax.random.randint(
            jax.random.PRNGKey(1), (K, B), 0, 100_000, jnp.int32
        )
    model = build_model(
        schema,
        ModelConfig(net_type="mlp", n_factors=80, hidden_layers=(1024, 128),
                    use_batch_norm=bn, compute_dtype=dtype),
    )
    if frozen_bn_stats:
        # semantics-breaking probe: normalize with running stats in train
        # mode — isolates the cost of computing batch stats
        orig = mlp_mod.MLPModel.score_rows

        def score_frozen(self, dense, state, rows, batch, train):
            return orig(self, dense, state, rows, batch, False)

        mlp_mod.MLPModel.score_rows = score_frozen
    try:
        cfg = TrainConfig(batch_size=B, learning_rate=0.05,
                          dynamic_neg_sampling=not static_neg, loss="hinge",
                          dense_optimizer=dense_opt)
        tr = Trainer(model, cfg)
        state = tr.init_state(jax.random.PRNGKey(0))
        state = dict(
            state,
            tables=augment_tables(state["tables"], state["emb_opt"]),
            emb_opt={name: {} for name in state["emb_opt"]},
        )

        @jax.jit
        def prog(state, bt):
            def body(st, b):
                return tr._step_impl(st, b, None, fused=True, user_sorted=True)

            return jax.lax.scan(body, state, bt)

        dt = timeit(prog, state, batches) / K
        print(f"{tag:46s}: {dt*1e6:9.1f} us/step  ({B/dt/1e6:6.1f} M ex/s)")
        return dt
    finally:
        if frozen_bn_stats:
            mlp_mod.MLPModel.score_rows = orig


def main():
    print(f"== scan of {K} REAL steps (B={B}, sorted user ids) ==")
    scan_time("full step (bn, bf16, dyn-neg, adam)")
    scan_time("  - dynamic negatives (static)", static_neg=True)
    scan_time("  - adam (sgd dense)", dense_opt="sgd")
    scan_time("  - batch stats (frozen running stats)", frozen_bn_stats=True)
    scan_time("  - batch-norm entirely", bn=False)


if __name__ == "__main__":
    main()
