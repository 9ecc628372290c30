"""Neural Collaborative Filtering (NeuCF / NeuMF).

The reference ships a NeuCF file that is broken and unreachable — its ctor
calls ``super().__init__(dataset, n_factors)`` on ``torch.nn.Module``
(torchrecsys/collaborative/neu.py:11), its forward indexes pandas frames
(neu.py:56-60), and the facade's ``'neucf'`` branch never wires it up
(torchrecsys/model.py:162-163). This is a working re-design of the intended
architecture (He et al. 2017): a GMF tower (elementwise product of dedicated
user/item embeddings) concatenated with an MLP tower (concat embeddings
through hidden layers), mapped to a scalar score by a final linear layer.
Metadata features, when present, join the MLP tower input as masked means.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from torchrecsys_tpu.models.base import (
    Batch,
    RecModel,
    State,
    TableSpec,
    masked_mean,
    uniform_linear_init,
)


class NeuCFModel(RecModel):
    name = "neucf"
    user_gather_sites = frozenset({"user_gmf", "user_mlp"})

    def table_specs(self) -> Dict[str, TableSpec]:
        d = self.cfg.n_factors
        s = self.schema
        specs = {
            "user_gmf": TableSpec(s.num_users, d, "scaled"),
            "item_gmf": TableSpec(s.num_items, d, "scaled"),
            "user_mlp": TableSpec(s.num_users, d, "scaled"),
            "item_mlp": TableSpec(s.num_items, d, "scaled"),
        }
        for fname, vocab in zip(s.metadata_names, s.metadata_vocab_sizes):
            specs[f"meta_{fname}"] = TableSpec(max(vocab, 1), d, "scaled")
        return specs

    def _mlp_input_width(self) -> int:
        return self.cfg.n_factors * (2 + self.schema.num_metadata_features)

    def init_dense(self, key: jax.Array) -> Any:
        widths = [self._mlp_input_width(), *self.cfg.neucf_hidden_layers]
        keys = jax.random.split(key, len(widths) + 1)
        layers: List[Dict[str, jnp.ndarray]] = []
        for k, fan_in, fan_out in zip(keys[:-2], widths[:-1], widths[1:]):
            layers.append(uniform_linear_init(k, fan_in, fan_out, self.param_dtype))
        out = uniform_linear_init(
            keys[-1], self.cfg.n_factors + widths[-1], 1, self.param_dtype
        )
        return {"layers": layers, "out": out}

    def gathers(self, batch: Batch) -> Dict[str, Tuple[str, jnp.ndarray]]:
        g = {
            "user_gmf": ("user_gmf", batch["user_id"]),
            "item_gmf": ("item_gmf", batch["item_id"]),
            "user_mlp": ("user_mlp", batch["user_id"]),
            "item_mlp": ("item_mlp", batch["item_id"]),
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
        gmf = rows["user_gmf"].astype(cd) * rows["item_gmf"].astype(cd)
        parts = [rows["user_mlp"].astype(cd), rows["item_mlp"].astype(cd)]
        for f, fname in enumerate(self.schema.metadata_names[: self._meta_features(batch)]):
            m = rows[f"meta:{fname}"].astype(cd)
            parts.append(masked_mean(m, batch["meta_mask"][:, f, :]))
        x = jnp.concatenate(parts, axis=-1)
        for layer in dense["layers"]:
            x = jax.nn.relu(x @ layer["w"].astype(cd) + layer["b"].astype(cd))
        fused = jnp.concatenate([gmf, x], axis=-1)
        score = fused @ dense["out"]["w"].astype(cd) + dense["out"]["b"].astype(cd)
        return score[:, 0].astype(jnp.float32), state
