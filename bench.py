"""Headline benchmark: the BASELINE.md north-star workload — MLP two-tower
training throughput on 10M interactions, one chip.

Reference baseline (BASELINE.md): the reference's MLP [1024,128]+BN path
sustains ~38K examples/s (torchrecsys/model.py:274-285, measured on the
2-vCPU host; its throughput is model-compute-bound, so the 100K-row and
10M-row workloads run at the same examples/s — verified on the 100K config,
the largest that finishes in reasonable time on CPU).

Workload (BASELINE.json north star): 100K users x 100K items, 10M
interactions with learnable block structure, MLP [1024,128]+BN n_factors=80,
dynamic uniform negatives, hinge loss, bfloat16 compute, batch 8192.
Steady-state epochs after one warmup (compile) epoch.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import jax
import numpy as np

# Persistent compile cache: cold XLA compiles over the TPU tunnel can take
# minutes; cache them across bench invocations.
jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_MLP_EXAMPLES_PER_SEC = 38_000.0

N_USERS, N_ITEMS, N_INTERACTIONS = 100_000, 100_000, 10_000_000
BATCH = 8192
TIMED_EPOCHS = 3


def structured_interactions(n_users: int, n_items: int, n: int, seed: int = 0):
    """Block-preference data: user block b prefers item block b (8 blocks,
    70% on-block) — learnable signal so the measured epochs train a real
    task (AUC ~0.8 at convergence, benchmarks/scale_10m.py)."""
    r = np.random.default_rng(seed)
    blocks = 8
    users = r.integers(0, n_users, n).astype(np.int64)
    on_block = r.random(n) < 0.7
    u_block = users % blocks
    rand_items = r.integers(0, n_items, n)
    block_items = (rand_items // blocks) * blocks + u_block
    items = np.where(on_block, block_items % n_items, rand_items)
    return {"user_id": users, "item_id": items.astype(np.int64)}


def main() -> None:
    from torchrecsys_tpu.config import ModelConfig, TrainConfig
    from torchrecsys_tpu.data import prepare_data
    from torchrecsys_tpu.models import build_model
    from torchrecsys_tpu.train import Trainer

    data = structured_interactions(N_USERS, N_ITEMS, N_INTERACTIONS)
    store = prepare_data(data, "user_id", "item_id", dynamic_neg_sampling=True)

    model = build_model(
        store.schema,
        ModelConfig(
            net_type="mlp",
            n_factors=80,
            hidden_layers=(1024, 128),
            use_batch_norm=True,
            compute_dtype="bfloat16",
        ),
    )
    cfg = TrainConfig(
        batch_size=BATCH,
        learning_rate=0.05,
        dynamic_neg_sampling=True,
        loss="hinge",
    )
    trainer = Trainer(model, cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))

    # warmup (compile + first execution + host->HBM upload)
    state, _ = trainer.fit(state, store, epochs=1, verbose=False)
    jax.block_until_ready(state["tables"])

    nb = store.num_train // cfg.batch_size
    examples = TIMED_EPOCHS * nb * cfg.batch_size
    t0 = time.perf_counter()
    state, _ = trainer.fit(state, store, epochs=TIMED_EPOCHS, verbose=False)
    jax.block_until_ready(state["tables"])
    dt = time.perf_counter() - t0

    value = examples / dt
    print(
        json.dumps(
            {
                "metric": "mlp_10m_train_examples_per_sec",
                "value": round(value, 1),
                "unit": "examples/s",
                "vs_baseline": round(value / BASELINE_MLP_EXAMPLES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
