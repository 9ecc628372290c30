"""Production-serving walkthrough: train, checkpoint, cold-load, serve.

Covers the serving-side capabilities the quickstart skips — exact vs
approximate full-catalog ranking, seen-item filtering, large result lists,
item-item similarity, and incremental catalog growth — the lifecycle a
production recommender actually runs:

    train -> save -> (new process) load -> predict variants -> new data
    arrives -> update_data + partial_fit -> predict again

Run: python examples/production_serving.py  (CPU or TPU; auto-detected)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import tempfile

import numpy as np

from torchrecsys_tpu import RecSys


def synthetic(n_users=3000, n_items=2000, n=150_000, seed=0):
    rng = np.random.default_rng(seed)
    users = rng.integers(0, n_users, n) * 7 + 13  # raw ids: any ints work
    blocks = users % 8
    items = (blocks * (n_items // 8) + rng.integers(0, n_items // 8, n)) * 3
    return {"user_id": users, "item_id": items}


def main():
    data = synthetic()

    # ---- train + checkpoint ------------------------------------------------
    model = RecSys(data, "user_id", "item_id", n_factors=48, net_type="linear",
                   dynamic_neg_sampling=True)
    model.fit(epochs=5, batch_size=2048, learning_rate=0.05, verbose=False)
    print("eval:", model.evaluate(eval_metrics=["auc", "recall@10"],
                                  verbose=False))

    ckpt = tempfile.mkdtemp(prefix="recsys_ckpt_")
    model.save(ckpt)

    # ---- cold start: a fresh serving process needs only the directory ------
    serving = RecSys.load(ckpt)
    some_user = int(data["user_id"][0])

    # exact full-catalog top-k (fused Pallas score+top-k on TPU)
    top10 = serving.predict(some_user, top_k=10)
    print("top-10:", top10)

    # large result lists route through the threshold top-k kernel (k > 16)
    top200 = serving.predict(some_user, top_k=200)
    print("top-200 head:", top200[:5], "…", len(top200), "items")

    # approximate serving: the TPU's hardware top-k, ~4x the exact path at
    # million-item catalogs for a bounded recall loss (exact off-TPU)
    fast10 = serving.predict(some_user, top_k=10, approx_recall=0.95)
    print("approx top-10:", fast10)

    # item-item similarity from the trained factors
    some_item = int(top10[0])
    print("similar to", some_item, "->", serving.similar_items(some_item, top_k=5))

    # ---- incremental: new interactions arrive (new users AND new items) ----
    fresh = {
        "user_id": np.asarray([999_001] * 6),
        "item_id": np.asarray([0, 3, 6, 9, 12, 600_001]),  # one brand-new item
    }
    # warm process: update_data grows vocabularies + trained state in place;
    # cold-loaded processes work too (encoders thaw for the extension)
    model.update_data(fresh)
    model.fit(epochs=2, batch_size=2048, verbose=False)

    # the new user now gets recommendations, with their own items excluded
    recs = model.predict(999_001, top_k=5, exclude_seen=True)
    print("new user recs (seen excluded):", recs)
    assert not set(int(x) for x in recs) & {0, 3, 6, 9, 12}


if __name__ == "__main__":
    main()
