"""Profile one training epoch of the north-star workload and print the
op-level time breakdown (parsed from the jax.profiler trace).

Run: python benchmarks/profile_epoch.py [--n 10000000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from benchmarks.scale_10m import structured_interactions  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--users", type=int, default=100_000)
    ap.add_argument("--items", type=int, default=100_000)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--trace_dir", default="/tmp/trc_profile_epoch")
    args = ap.parse_args()

    from torchrecsys_tpu.config import ModelConfig, TrainConfig
    from torchrecsys_tpu.data import prepare_data
    from torchrecsys_tpu.models import build_model
    from torchrecsys_tpu.train import Trainer

    data = structured_interactions(args.users, args.items, args.n)
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
        batch_size=args.batch,
        learning_rate=0.05,
        dynamic_neg_sampling=True,
        loss="hinge",
    )
    trainer = Trainer(model, cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, _ = trainer.fit(state, store, epochs=1, verbose=False)
    jax.block_until_ready(state["tables"])

    t0 = time.perf_counter()
    with jax.profiler.trace(args.trace_dir):
        state, _ = trainer.fit(state, store, epochs=1, verbose=False)
        jax.block_until_ready(state["tables"])
    dt = time.perf_counter() - t0
    print(f"epoch wall: {dt:.3f}s  ({args.n/dt/1e6:.2f}M examples/s)")

    # per-op digest straight from the xplane wire format (utils/xplane.py) —
    # the chrome trace.json.gz is O(100MB) at 10M rows and too slow to parse
    from torchrecsys_tpu.utils.profiling import op_summary

    print(op_summary(args.trace_dir, row_limit=30))


if __name__ == "__main__":
    main()
