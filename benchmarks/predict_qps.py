"""Full-catalog top-k prediction throughput vs the reference.

Reference analog: ``TorchRecSys.predict`` scores ONE user against the whole
catalog per call — host-side pandas chunking + full ``torch.sort``
(torchrecsys/model.py:341-452). Measured baseline (BASELINE.md): ~1.3 ms per
query on a 1K-item catalog (~770 q/s) on a 2-vCPU CPU host.

Here prediction is device-resident: Pallas fused score+top-k for
linearizable models (ops/dot_topk.py), chunked running-merge otherwise —
both batched over users. Reported as queries/s (one query = one user x full
catalog x top-k) at the reference's catalog size and at a production-scale
catalog.

Run: python benchmarks/predict_qps.py
Prints one JSON line per configuration.
"""

from __future__ import annotations

import json
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

BASELINE_QPS_1K = 770.0  # reference, 1K items, CPU (BASELINE.md)


def bench(net_type: str, n_users: int, n_items: int, batch_users: int, top_k: int):
    from torchrecsys_tpu.config import ModelConfig
    from torchrecsys_tpu.eval.predict import catalog_topk
    from torchrecsys_tpu.config import DataSchema
    from torchrecsys_tpu.models import build_model

    schema = DataSchema(num_users=n_users, num_items=n_items)
    model = build_model(schema, ModelConfig(net_type=net_type, n_factors=80))
    params, state = model.init(jax.random.PRNGKey(0))
    user_ids = jnp.arange(batch_users, dtype=jnp.int32) % n_users

    def run():
        return catalog_topk(
            model, params, state, user_ids, n_items, top_k=top_k
        )

    scores, ids = run()
    _ = np.asarray(scores)  # drain
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        scores, ids = run()
    _ = np.asarray(scores)  # single honest D2H sync
    dt = (time.perf_counter() - t0) / reps
    qps = batch_users / dt
    print(
        json.dumps(
            {
                "metric": f"predict_qps_{net_type}_{n_items}items_top{top_k}",
                "value": round(qps, 1),
                "unit": "users/s (full-catalog top-k)",
                "batch_users": batch_users,
                "latency_ms_per_batch": round(dt * 1e3, 3),
                "vs_baseline_770qps_1k": round(qps / BASELINE_QPS_1K, 1)
                if n_items == 1000
                else None,
                "device": str(jax.devices()[0]),
            }
        )
    )


def main():
    # reference-scale: 1K items (baseline comparison point)
    bench("linear", n_users=3_000, n_items=1_000, batch_users=4096, top_k=10)
    # production-scale: 1M-item catalog, fused Pallas score+top-k
    bench("linear", n_users=100_000, n_items=1_000_000, batch_users=256, top_k=10)
    # non-linearizable model -> chunked running-merge path
    bench("mlp", n_users=3_000, n_items=1_000, batch_users=256, top_k=10)


if __name__ == "__main__":
    main()
