"""Ranking-quality ablation: does WARP (K sampled negatives, rank-weighted
hinge) beat the reference's 1-negative hinge on top-k metrics?

Protocol: the matched-AUC block-structured dataset (benchmarks/
matched_auc.py generator — 3,000 users x 1,000 items, 100K interactions,
8-block preference signal), Linear n_factors=80, 15 epochs, batch 1024,
lr 0.05, dynamic in-step sampling. Each loss config trains from the same
seed and reports test-split recall@10 / ndcg@10 / hit_rate@10 (per-user,
full-catalog — eval/predict.py:ranking_eval) plus 1-negative pairwise AUC.

WARP's motivation (Weston et al. 2011; LightFM's default): precision@k-type
metrics care about the TOP of the list, and the log(1+rank) weight focuses
gradient on positives that are ranked badly — pairwise AUC (which weighs
every inversion equally) may tie while top-k metrics move.

Run: python benchmarks/warp_quality.py [--epochs 15]
Prints one JSON line per config.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from matched_auc import N_ITEMS, N_ROWS, N_USERS, structured_interactions  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--n-factors", type=int, default=80)
    args = ap.parse_args()

    from torchrecsys_tpu import RecSys

    users, items = structured_interactions(N_USERS, N_ITEMS, N_ROWS)
    data = {"user_id": users, "item_id": items}

    configs = [
        ("hinge_k1", dict(loss="hinge", num_negatives=1)),
        ("adaptive_hinge_k8", dict(loss="adaptive_hinge", num_negatives=8)),
        ("warp_k8", dict(loss="warp", num_negatives=8)),
        ("warp_k8_popularity", dict(loss="warp", num_negatives=8,
                                    neg_sampling="popularity")),
        # in-batch softmax: 1023 logQ-corrected negatives per example
        ("sampled_softmax", dict(loss="sampled_softmax")),
    ]
    for name, kw in configs:
        model = RecSys(
            dict(data), "user_id", "item_id", net_type="linear",
            n_factors=args.n_factors, dynamic_neg_sampling=True, seed=0,
        )
        t0 = time.perf_counter()
        model.fit(
            epochs=args.epochs, batch_size=1024, learning_rate=0.05,
            verbose=False, **kw,
        )
        fit_s = time.perf_counter() - t0
        out = model.evaluate(
            eval_metrics=("auc", "recall@10", "ndcg@10", "hit_rate@10"),
            verbose=False,
        )
        print(json.dumps({
            "config": name,
            "fit_s": round(fit_s, 2),
            **{k: round(v, 4) for k, v in out.items()},
        }), flush=True)


if __name__ == "__main__":
    main()
