"""Headline benchmark: MLP two-tower training throughput, BASELINE config #1.

Reference baseline (BASELINE.md, measured on the reference implementation):
MLP [1024,128]+BN, static negatives, 3,000 users x 1,000 items, 100K
interactions (80K train rows), n_factors=80, batch_size=1024, hinge loss
-> ~38K examples/s on a 2-vCPU CPU host (torchrecsys/model.py:274-285).

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


def main() -> None:
    from torchrecsys_tpu.config import ModelConfig, TrainConfig
    from torchrecsys_tpu.data import prepare_data
    from torchrecsys_tpu.models import build_model
    from torchrecsys_tpu.train import Trainer

    n_users, n_items, n = 3_000, 1_000, 100_000
    r = np.random.default_rng(0)
    data = {
        "user_id": r.integers(0, n_users, n),
        "item_id": r.integers(0, n_items, n),
    }
    store = prepare_data(data, "user_id", "item_id", split_ratio=0.8)

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
    cfg = TrainConfig(batch_size=1024, learning_rate=0.01, loss="hinge")
    trainer = Trainer(model, cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))

    # warmup (compile + first execution)
    state, _ = trainer.fit(state, store, epochs=1, verbose=False)
    jax.block_until_ready(state["tables"])

    epochs = 5
    nb = store.num_train // cfg.batch_size
    examples = epochs * nb * cfg.batch_size
    t0 = time.perf_counter()
    state, _ = trainer.fit(state, store, epochs=epochs, verbose=False)
    jax.block_until_ready(state["tables"])
    dt = time.perf_counter() - t0

    value = examples / dt
    print(
        json.dumps(
            {
                "metric": "mlp_train_examples_per_sec",
                "value": round(value, 1),
                "unit": "examples/s",
                "vs_baseline": round(value / BASELINE_MLP_EXAMPLES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
