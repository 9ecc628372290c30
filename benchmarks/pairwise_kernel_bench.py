"""Measure the fused Pallas train step (ops/fused_pairwise.py) against the
XLA step it replaces, on the real chip, at the 10M-interaction scale.

Run: python benchmarks/pairwise_kernel_bench.py [--net linear|fm] [--n 10000000]
Prints one JSON line with examples/s for both paths.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from benchmarks.scale_10m import structured_interactions  # noqa: E402


def throughput(trainer, store, epochs=3):
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, _ = trainer.fit(state, store, epochs=1, verbose=False)  # compile
    jax.block_until_ready(state["tables"])
    nb = -(-store.num_train // trainer.cfg.batch_size)
    t0 = time.perf_counter()
    state, losses = trainer.fit(state, store, epochs=epochs, verbose=False)
    jax.block_until_ready(state["tables"])
    dt = time.perf_counter() - t0
    return epochs * store.num_train / dt, losses[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="linear", choices=["linear", "fm"])
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--users", type=int, default=100_000)
    ap.add_argument("--items", type=int, default=100_000)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--meta", action="store_true",
                    help="attach a scalar metadata feature (vocab 97)")
    ap.add_argument("--amp", action="store_true", help="bf16 compute")
    args = ap.parse_args()

    from torchrecsys_tpu.config import ModelConfig, TrainConfig
    from torchrecsys_tpu.data import prepare_data
    from torchrecsys_tpu.models import build_model
    from torchrecsys_tpu.train import Trainer

    data = structured_interactions(args.users, args.items, args.n)
    meta_cols = None
    if args.meta:
        # scalar per-interaction category (item-keyed, parsed once per item)
        data["cat"] = (data["item_id"] % 97).astype(np.int32)
        meta_cols = ["cat"]
    store = prepare_data(
        data, "user_id", "item_id", metadata_id_col=meta_cols,
        dynamic_neg_sampling=True,
    )
    model = build_model(
        store.schema,
        ModelConfig(
            net_type=args.net, n_factors=80,
            compute_dtype="bfloat16" if args.amp else "float32",
        ),
    )
    cfg = TrainConfig(
        batch_size=args.batch,
        learning_rate=0.05,
        dynamic_neg_sampling=True,
        loss="hinge",
    )
    t_pl = Trainer(model, cfg)
    assert t_pl._pallas_pairwise()
    eps_pl, loss_pl = throughput(t_pl, store)

    t_x = Trainer(model, dataclasses.replace(cfg, pallas_step=False))
    assert not t_x._pallas_pairwise()
    eps_x, loss_x = throughput(t_x, store)

    print(json.dumps({
        "net": args.net,
        "meta": args.meta,
        "amp": args.amp,
        "pallas_examples_per_sec": round(eps_pl, 0),
        "xla_examples_per_sec": round(eps_x, 0),
        "speedup": round(eps_pl / eps_x, 3),
        "pallas_loss": round(float(loss_pl), 5),
        "xla_loss": round(float(loss_x), 5),
    }))


if __name__ == "__main__":
    main()
