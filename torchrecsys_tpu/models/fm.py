"""Second-order Factorization Machine over {user, item, metadata...} fields.

Reference: torchrecsys/collaborative/fm.py:60-101 — stack per-field factor
embeddings ``(B, n_fields, k)``, pairwise term
``0.5 * sum((sum_f v)^2 - sum_f v^2)`` (fm.py:83-86), plus summed per-field
linear terms (fm.py:89-97), then a **sigmoid** (fm.py:99).

The sigmoid is a reference quirk (it bounds scores to (0,1) so the margin-1
hinge loss can never reach zero — SURVEY §2.5); it is kept by default for
score parity and can be disabled with ``ModelConfig.fm_sigmoid=False``.

Multi-hot metadata: each feature field is the masked **sum** of its active
ids' factor vectors — the standard FM formulation for multi-hot inputs
(the reference instead embeds only the first id; SURVEY §2.3 applies to
fm.py:78 as well).
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


class FMModel(RecModel):
    name = "fm"
    user_gather_sites = frozenset({"user", "linear_user"})
    supports_linearized_catalog = True
    # Fused Pallas train-step layout (ops/fused_pairwise.py): with the two
    # fields {user, item} the pairwise term 0.5((u+i)^2 - u^2 - i^2) is
    # exactly u.i, and the per-side linear terms ride the bias lanes — so FM
    # without metadata shares the Linear kernel (plus the sigmoid chain).
    pairwise_pack = {"user": ("user", "linear_user"), "item": ("item", "linear_item")}
    # Metadata-bearing fused step: composite rows carry q = i + sum_f c_f in
    # the vector lanes and the per-item constant + linear metadata terms in
    # the bias lane (the linearized_catalog identity below), so the kernel's
    # forward/loss/user-side math applies; item-side gradients differ per
    # field (g * (sum_v - v_field)) and are formed in XLA from the emitted
    # g lanes (ops/fused_pairwise.py meta section).
    pairwise_meta = True
    pairwise_fm_fields = True

    @property
    def pairwise_sigmoid(self) -> bool:
        return self.cfg.fm_sigmoid

    def table_specs(self) -> Dict[str, TableSpec]:
        k = self.cfg.n_factors
        s = self.schema
        specs = {
            "user": TableSpec(s.num_users, k, "scaled"),
            "item": TableSpec(s.num_items, k, "scaled"),
            "linear_user": TableSpec(s.num_users, 1, "scaled"),
            "linear_item": TableSpec(s.num_items, 1, "scaled"),
        }
        for fname, vocab in zip(s.metadata_names, s.metadata_vocab_sizes):
            specs[f"meta_{fname}"] = TableSpec(max(vocab, 1), k, "scaled")
            specs[f"linear_meta_{fname}"] = TableSpec(max(vocab, 1), 1, "scaled")
        return specs

    def init_dense(self, key: jax.Array) -> Any:
        return {}

    def gathers(self, batch: Batch) -> Dict[str, Tuple[str, jnp.ndarray]]:
        g = {
            "user": ("user", batch["user_id"]),
            "item": ("item", batch["item_id"]),
            "linear_user": ("linear_user", batch["user_id"]),
            "linear_item": ("linear_item", batch["item_id"]),
        }
        g.update(self._meta_gathers(batch))
        for f, fname in enumerate(self.schema.metadata_names[: self._meta_features(batch)]):
            g[f"linear_meta:{fname}"] = (f"linear_meta_{fname}", batch["meta_ids"][:, f, :])
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
        fields = [rows["user"].astype(cd), rows["item"].astype(cd)]
        linear = rows["linear_user"][:, 0].astype(cd) + rows["linear_item"][:, 0].astype(cd)
        for f, fname in enumerate(self.schema.metadata_names[: self._meta_features(batch)]):
            mask = batch["meta_mask"][:, f, :]
            fields.append(masked_sum(rows[f"meta:{fname}"].astype(cd), mask))
            linear = linear + masked_sum(rows[f"linear_meta:{fname}"].astype(cd), mask)[:, 0]
        v = jnp.stack(fields, axis=1)  # (B, n_fields, k)
        sum_v = jnp.sum(v, axis=1)
        sum_v2 = jnp.sum(v * v, axis=1)
        pairwise = 0.5 * jnp.sum(sum_v * sum_v - sum_v2, axis=-1)  # fm.py:83-86
        score = pairwise + linear
        if self.cfg.fm_sigmoid:
            score = jax.nn.sigmoid(score)  # fm.py:99
        return score.astype(jnp.float32), state

    supports_sampled_softmax = True

    def pair_vectors(self, dense, state, rows, batch, train):
        """Same collapse as linearized_catalog: with item-side composite
        ``q_j = v_item + Σ v_meta``, score(i, j) = u_i · q_j +
        [0.5(|q_j|² − |v_item|² − Σ|v_meta|²) + w_item_j + Σ w_meta_j]
        (+ w_user_i, row-constant — dropped). Refused under the reference's
        sigmoid quirk: softmax over (0,1)-squashed scores saturates its
        gradients — set ``ModelConfig.fm_sigmoid=False``."""
        if self.cfg.fm_sigmoid:
            raise ValueError(
                "loss='sampled_softmax' with net_type='fm' requires "
                "ModelConfig.fm_sigmoid=False (softmax over "
                "sigmoid-squashed scores saturates; the sigmoid exists "
                "only for reference score parity, fm.py:99)"
            )
        cd = self.compute_dtype
        u = rows["user"].astype(cd)
        i = rows["item"].astype(cd)
        q = i
        sq_sum = jnp.sum(i * i, axis=-1)
        vb = rows["linear_item"][:, 0].astype(cd)
        for f, fname in enumerate(self.schema.metadata_names[: self._meta_features(batch)]):
            mask = batch["meta_mask"][:, f, :]
            msum = masked_sum(rows[f"meta:{fname}"].astype(cd), mask)
            q = q + msum
            sq_sum = sq_sum + jnp.sum(msum * msum, axis=-1)
            vb = vb + masked_sum(rows[f"linear_meta:{fname}"].astype(cd), mask)[:, 0]
        vb = vb + 0.5 * (jnp.sum(q * q, axis=-1) - sq_sum)
        return u, q, vb, state

    def linearized_catalog(self, params, feat):
        """FM's pairwise term collapses to a dot product per (user, item):

        with item-side composite ``q = v_i + Σ_f v_mf``, the field math
        (fm.py:83-86) gives ``pairwise = u·q + 0.5(|q|² − |v_i|² − Σ|v_mf|²)``
        — the second term is a per-item constant. Adding the linear terms
        (fm.py:89-97) gives ``score = σ(u·q + item_const + w_u)`` — a
        monotonic transform of a bilinear score, so the fused score+top-k
        kernel applies.
        """
        tables = params["tables"]
        n = self.schema.num_items
        i = tables["item"][:n].astype(jnp.float32)
        q = i
        sq_sum = jnp.sum(i * i, axis=-1)
        lin_item = tables["linear_item"][:n, 0].astype(jnp.float32)
        meta_sums = self._catalog_meta_sums(tables, feat)
        for f, msum in enumerate(meta_sums):
            msum = msum.astype(jnp.float32)
            q = q + msum
            sq_sum = sq_sum + jnp.sum(msum * msum, axis=-1)
        if feat and "meta_ids" in feat and feat["meta_ids"].shape[1] > 0:
            for f, fname in enumerate(self.schema.metadata_names):
                lemb = jnp.take(
                    tables[f"linear_meta_{fname}"], feat["meta_ids"][:, f, :], axis=0
                ).astype(jnp.float32)
                lin_item = lin_item + masked_sum(lemb, feat["meta_mask"][:, f, :])[:, 0]
        item_const = 0.5 * (jnp.sum(q * q, axis=-1) - sq_sum)
        item_bias = item_const + lin_item
        vd = self.compute_dtype if self.compute_dtype == jnp.bfloat16 else jnp.float32
        q = q.astype(vd)

        sigmoid = self.cfg.fm_sigmoid

        def user_fn(params_, user_ids):
            tables_ = params_["tables"]
            return (
                jnp.take(tables_["user"], user_ids, axis=0).astype(vd),
                jnp.take(tables_["linear_user"], user_ids, axis=0)[:, 0].astype(jnp.float32),
            )

        def transform(raw, user_const):
            s = raw + user_const[:, None]
            return jax.nn.sigmoid(s) if sigmoid else s

        return q, item_bias, user_fn, transform
