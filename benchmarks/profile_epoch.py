"""Profile one training epoch of the north-star workload and print the
op-level time breakdown (parsed from the jax.profiler trace).

Run: python benchmarks/profile_epoch.py [--n 10000000]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import jax
import numpy as np

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
    print(f"epoch wall: {dt:.3f}s")

    # newest trace.json.gz under the trace dir
    paths = sorted(
        glob.glob(os.path.join(args.trace_dir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        print("no trace found")
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Device-side complete events: sum duration by op name, keep only TPU pids
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e
    }
    tpu_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    by_name = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e6  # us -> s
        by_name[name] += dur
        total += dur
    print(f"device op time total: {total:.3f}s  (pids: {sorted(tpu_pids)})")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {dur*1000:9.2f} ms  {100*dur/max(total,1e-9):5.1f}%  {name}")


if __name__ == "__main__":
    main()
