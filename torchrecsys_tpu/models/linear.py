"""LightFM-style linear factorization model.

Score math parity with the reference (torchrecsys/collaborative/linear.py:54-79):
``score = <u, i + sum_f m_f> + b_u + b_i``, where metadata embeddings are
added into the item embedding (linear.py:74-75).

One deliberate fix: the reference embeds only the FIRST id of each metadata
list (``metadata[:, 0]``; linear.py:75 — SURVEY §2.3) and crashes with >= 2
metadata columns. Here each feature contributes the masked **sum** of all of
its ids' embeddings, for any number of features.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from torchrecsys_tpu.models.base import (
    Batch,
    RecModel,
    State,
    TableSpec,
    masked_sum,
)


class LinearModel(RecModel):
    name = "linear"
    user_gather_sites = frozenset({"user", "user_bias"})
    supports_linearized_catalog = True
    # Fused Pallas train-step layout (ops/fused_pairwise.py): score is
    # <u, i> + b_u + b_i, so the bias tables ride the packed side rows.
    pairwise_pack = {"user": ("user", "user_bias"), "item": ("item", "item_bias")}
    # Metadata-bearing fused step: metadata folds additively into the item
    # vector (linear.py:74-75), so composite rows feed the same kernel and
    # every item-side row's gradient is g*u (ops/fused_pairwise.py meta
    # section). No FM field math.
    pairwise_meta = True
    pairwise_fm_fields = False

    @property
    def pairwise_sigmoid(self) -> bool:
        return False

    def table_specs(self) -> Dict[str, TableSpec]:
        d = self.cfg.n_factors
        s = self.schema
        specs = {
            "user": TableSpec(s.num_users, d, "scaled"),
            "item": TableSpec(s.num_items, d, "scaled"),
            "user_bias": TableSpec(s.num_users, 1, "zero"),
            "item_bias": TableSpec(s.num_items, 1, "zero"),
        }
        for fname, vocab in zip(s.metadata_names, s.metadata_vocab_sizes):
            specs[f"meta_{fname}"] = TableSpec(max(vocab, 1), d, "scaled")
        return specs

    def init_dense(self, key: jax.Array) -> Any:
        return {}

    def gathers(self, batch: Batch) -> Dict[str, Tuple[str, jnp.ndarray]]:
        g = {
            "user": ("user", batch["user_id"]),
            "item": ("item", batch["item_id"]),
            "user_bias": ("user_bias", batch["user_id"]),
            "item_bias": ("item_bias", batch["item_id"]),
        }
        g.update(self._meta_gathers(batch))
        return g

    def score_rows(
        self,
        dense: Any,
        state: State,
        rows: Dict[str, jnp.ndarray],
        batch: Batch,
        train: bool,
    ) -> Tuple[jnp.ndarray, State]:
        cd = self.compute_dtype
        u = rows["user"].astype(cd)
        i = rows["item"].astype(cd)
        for f, fname in enumerate(self.schema.metadata_names[: self._meta_features(batch)]):
            m = rows[f"meta:{fname}"].astype(cd)  # (B, W, D)
            i = i + masked_sum(m, batch["meta_mask"][:, f, :])
        dot = jnp.sum(u * i, axis=-1)
        score = dot + rows["user_bias"][:, 0].astype(cd) + rows["item_bias"][:, 0].astype(cd)
        return score.astype(jnp.float32), state

    supports_sampled_softmax = True

    def pair_vectors(self, dense, state, rows, batch, train):
        """score(i, j) = u_i · (item_j + Σ meta_j) + b_item_j (+ b_user_i,
        row-constant — softmax-invariant, dropped; the user-bias table gets
        no gradient under sampled_softmax)."""
        cd = self.compute_dtype
        u = rows["user"].astype(cd)
        i = rows["item"].astype(cd)
        for f, fname in enumerate(self.schema.metadata_names[: self._meta_features(batch)]):
            m = rows[f"meta:{fname}"].astype(cd)
            i = i + masked_sum(m, batch["meta_mask"][:, f, :])
        return u, i, rows["item_bias"][:, 0].astype(cd), state

    def linearized_catalog(self, params, feat):
        """score = <u, i + Σ_f m_f> + b_i + b_u — exactly linear.py:78,
        factored for the fused score+top-k kernel. With ``use_amp`` (bf16
        compute) the factor vectors stay bf16 — half the item-matrix HBM
        stream, matching the chunked scorer's own precision — while biases
        and score accumulation stay f32."""
        tables = params["tables"]
        n = self.schema.num_items
        vd = self.compute_dtype if self.compute_dtype == jnp.bfloat16 else jnp.float32
        q = tables["item"][:n].astype(jnp.float32)
        for msum in self._catalog_meta_sums(tables, feat):
            q = q + msum.astype(jnp.float32)
        q = q.astype(vd)
        item_bias = tables["item_bias"][:n, 0].astype(jnp.float32)

        def user_fn(params_, user_ids):
            tables_ = params_["tables"]
            return (
                jnp.take(tables_["user"], user_ids, axis=0).astype(vd),
                jnp.take(tables_["user_bias"], user_ids, axis=0)[:, 0].astype(jnp.float32),
            )

        def transform(raw, user_const):
            return raw + user_const[:, None]

        return q, item_bias, user_fn, transform
