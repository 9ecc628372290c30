"""Quickstart mirroring the reference README flow (README.md:37-81) — build a
dataset with metadata, train an FM, evaluate, and get top-k recommendations.

Run: python examples/quickstart.py  (CPU or TPU; auto-detected)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from torchrecsys_tpu import RecSys


def synthetic_interactions(n_users=2000, n_items=500, n=200_000, seed=0):
    """Synthetic dataset with real preference structure: users prefer items
    sharing their favourite category."""
    rng = np.random.default_rng(seed)
    n_cats = 16
    item_cat = rng.integers(0, n_cats, n_items)
    user_pref = rng.integers(0, n_cats, n_users)
    users = rng.integers(0, n_users, n)
    # 70% of interactions hit an item from the user's preferred category:
    # draw a random item, then map it into the preferred category's item set
    items = rng.integers(0, n_items, n)
    on_pref = rng.random(n) < 0.7
    cat_members = [np.flatnonzero(item_cat == c) for c in range(n_cats)]
    pick = rng.integers(0, n_items, n)
    for c in range(n_cats):
        if len(cat_members[c]) == 0:
            continue
        rows = np.flatnonzero(on_pref & (user_pref[users] == c))
        items[rows] = cat_members[c][pick[rows] % len(cat_members[c])]
    return {
        "user_id": users,
        "product_id": items,
        "category_ids": np.asarray([[int(c)] for c in item_cat[items]], dtype=object),
    }


def main():
    data = synthetic_interactions()
    model = RecSys(
        data,
        user_id_col="user_id",
        item_id_col="product_id",
        metadata_id_col=["category_ids"],
        n_factors=64,
        net_type="fm",
        dynamic_neg_sampling=True,
        use_amp=True,
    )
    print("dataset:", model.config)
    model.fit(optimizer="adam", epochs=5, batch_size=1024, learning_rate=0.05,
              loss="bpr")
    model.evaluate(eval_metrics=["loss", "auc"])
    user = int(data["user_id"][0])
    print(f"top-10 for user {user}:", model.predict(user_id=user, top_k=10))
    print("batch predict:", model.predict(user_id=[0, 1, 2], top_k=5).shape)
    model.save("/tmp/torchrecsys_tpu_quickstart_ckpt")
    print("checkpoint saved.")


if __name__ == "__main__":
    main()
