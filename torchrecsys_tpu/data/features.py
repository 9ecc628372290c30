"""Per-batch feature attachment.

Device-resident side-feature tables are gathered into batch "sides" with one
indexed read each — item metadata keyed by item id (reference analog:
per-batch re-padding in dataset.py:375-411) and user interaction history
keyed by user id (for sequence models; no reference analog — its sequence
package is a stub, SURVEY §2.8).

``feat`` is a (possibly empty) dict holding any of:
  meta_ids  (num_items, F, W) int32     meta_mask (num_items, F, W) bool
  hist_ids  (num_users, L)   int32      hist_mask (num_users, L)   bool
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

Features = Dict[str, jnp.ndarray]


def attach_features(side: Dict[str, jnp.ndarray], feat: Optional[Features]) -> Dict[str, jnp.ndarray]:
    """Gather per-item / per-user feature rows into a batch side (in place)."""
    if not feat:
        return side
    if "meta_ids" in feat and feat["meta_ids"].shape[1] > 0:
        side["meta_ids"] = feat["meta_ids"][side["item_id"]]
        side["meta_mask"] = feat["meta_mask"][side["item_id"]]
    if "hist_ids" in feat:
        side["hist_ids"] = feat["hist_ids"][side["user_id"]]
        side["hist_mask"] = feat["hist_mask"][side["user_id"]]
    return side
