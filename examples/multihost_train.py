"""Multi-host training launcher (SURVEY §2.10 row 1).

Run the SAME script on every host, one process per host:

    # host 0
    python examples/multihost_train.py --coordinator host0:8476 \
        --num-processes 2 --process-id 0
    # host 1
    python examples/multihost_train.py --coordinator host0:8476 \
        --num-processes 2 --process-id 1

On TPU pods all three flags may be omitted (auto-detected from the
environment). With no flags and one host this degenerates to ordinary
single-process training, so the script doubles as a single-chip smoke test.

What is multi-host-aware here without any further code:
- ``make_mesh()`` spans every host's devices after ``init_distributed``;
- the jitted train step is unchanged — GSPMD routes collectives over ICI
  within a slice and DCN across slices;
- the streaming input pipeline feeds each host only its addressable shards
  (``parallel/distributed.py:put_sharded``).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None,
                    help="host0:port of process 0 (omit on TPU pods)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--model-axis", type=int, default=1,
                    help="size of the 'model' (table-row-sharding) mesh axis")
    ap.add_argument("--rows", type=int, default=200_000)
    args = ap.parse_args()

    # init BEFORE any other jax usage in the process
    if args.coordinator or args.num_processes:
        from torchrecsys_tpu.parallel import init_distributed

        init_distributed(args.coordinator, args.num_processes, args.process_id)

    import jax

    from torchrecsys_tpu.config import ModelConfig, TrainConfig
    from torchrecsys_tpu.data import prepare_data
    from torchrecsys_tpu.models import build_model
    from torchrecsys_tpu.parallel import make_mesh
    from torchrecsys_tpu.train import Trainer

    # every process builds the identical dataset (seeded) — the common
    # recsys case where the interaction log fits host RAM; each host only
    # materializes its own batch shards
    r = np.random.default_rng(0)
    data = {
        "user_id": r.integers(0, 10_000, args.rows),
        "item_id": r.integers(0, 5_000, args.rows),
    }
    store = prepare_data(data, "user_id", "item_id", dynamic_neg_sampling=True)

    mesh = make_mesh(model=args.model_axis)
    model = build_model(store.schema, ModelConfig(net_type="linear", n_factors=64))
    trainer = Trainer(
        model, TrainConfig(batch_size=4096, learning_rate=0.05,
                           dynamic_neg_sampling=True), mesh=mesh,
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    # streaming fit: exercises the per-host feeding path on real clusters
    state, losses = trainer.fit_streaming(
        state, store, superbatch_size=1 << 16, epochs=2
    )
    if jax.process_index() == 0:
        print("losses:", [round(l, 5) for l in losses])
        out = trainer.evaluate(state, store, verbose=False)
        print("eval:", {k: round(v, 4) for k, v in out.items()})


if __name__ == "__main__":
    main()
