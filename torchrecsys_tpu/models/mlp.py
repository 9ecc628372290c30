"""Two-tower-concat MLP model.

Reference: torchrecsys/collaborative/mlp.py — concat user ⊕ item ⊕
per-feature metadata embeddings (mlp.py:97-105), then a
``Linear -> [BatchNorm] -> ReLU`` stack and a scalar output layer
(mlp.py:107-113). Defaults match the reference: ``hidden_layers=[1024, 128]``
(mlp.py:57), ``use_batch_norm=True`` (mlp.py:75-82).

Differences by design:
- multi-valued metadata features contribute their masked **mean** embedding
  (the reference embeds only the first id of the pad-width axis and crashes
  on >= 2 columns — SURVEY §2.3/§2.4);
- batch-norm is functional: batch statistics are used in training and running
  statistics (momentum 0.1, torch semantics) are threaded through ``state``;
  under data parallelism the batch statistics are computed over the *global*
  batch because XLA/GSPMD reduces ``jnp.mean`` across the sharded axis —
  i.e. synced BN (SURVEY §7 hard part (d); documented divergence from
  torch's per-device stats).
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

_BN_MOMENTUM = 0.1
_BN_EPS = 1e-5


class MLPModel(RecModel):
    name = "mlp"
    user_gather_sites = frozenset({"user"})

    def table_specs(self) -> Dict[str, TableSpec]:
        d = self.cfg.n_factors
        s = self.schema
        specs = {
            "user": TableSpec(s.num_users, d, "scaled"),
            "item": TableSpec(s.num_items, d, "scaled"),
        }
        for fname, vocab in zip(s.metadata_names, s.metadata_vocab_sizes):
            specs[f"meta_{fname}"] = TableSpec(max(vocab, 1), d, "scaled")
        return specs

    def _input_width(self) -> int:
        # 2*n_factors + n_factors*n_meta_features — mlp.py:60-64
        return self.cfg.n_factors * (2 + self.schema.num_metadata_features)

    def init_dense(self, key: jax.Array) -> Any:
        widths = [self._input_width(), *self.cfg.hidden_layers]
        keys = jax.random.split(key, len(widths))
        layers: List[Dict[str, jnp.ndarray]] = []
        for k, fan_in, fan_out in zip(keys[:-1], widths[:-1], widths[1:]):
            layers.append(uniform_linear_init(k, fan_in, fan_out, self.param_dtype))
        out = uniform_linear_init(keys[-1], widths[-1], 1, self.param_dtype)
        dense: Dict[str, Any] = {"layers": layers, "out": out}
        if self.cfg.use_batch_norm:
            dense["bn"] = [
                {
                    "scale": jnp.ones((w,), self.param_dtype),
                    "bias": jnp.zeros((w,), self.param_dtype),
                }
                for w in widths[1:]
            ]
        return dense

    def init_state(self) -> State:
        if not self.cfg.use_batch_norm:
            return {}
        return {
            "bn": [
                {
                    "mean": jnp.zeros((w,), jnp.float32),
                    "var": jnp.ones((w,), jnp.float32),
                }
                for w in self.cfg.hidden_layers
            ]
        }

    def gathers(self, batch: Batch) -> Dict[str, Tuple[str, jnp.ndarray]]:
        g = {
            "user": ("user", batch["user_id"]),
            "item": ("item", batch["item_id"]),
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
        parts = [rows["user"].astype(cd), rows["item"].astype(cd)]
        for f, fname in enumerate(self.schema.metadata_names[: self._meta_features(batch)]):
            m = rows[f"meta:{fname}"].astype(cd)  # (B, W, D)
            parts.append(masked_mean(m, batch["meta_mask"][:, f, :]))
        x = jnp.concatenate(parts, axis=-1)

        if train and cd == jnp.bfloat16:
            from torchrecsys_tpu.ops.fused_tower import tower_applicable

            if tower_applicable(self.cfg, x.shape[0]):
                return self._score_rows_fused(dense, state, x)

        use_bn = self.cfg.use_batch_norm
        new_bn = []
        for li, layer in enumerate(dense["layers"]):
            x = x @ layer["w"].astype(cd) + layer["b"].astype(cd)
            if use_bn:
                bn_p = dense["bn"][li]
                bn_s = state["bn"][li]
                if train:
                    # One pass over x: mean and E[x^2] reduce in f32 without
                    # materializing an f32 copy of the (B, W) activation
                    # (jnp.var would read x twice); var = E[x^2] - mean^2 is
                    # the standard BN formulation (bf16 inputs, f32
                    # accumulation — cancellation is benign at BN scales).
                    mean = jnp.mean(x, axis=0, dtype=jnp.float32)
                    msq = jnp.mean(jax.lax.square(x), axis=0, dtype=jnp.float32)
                    var = jnp.maximum(msq - jax.lax.square(mean), 0.0)
                    n = x.shape[0]
                    unbiased = var * (n / max(n - 1, 1))
                    new_bn.append(
                        {
                            "mean": (1 - _BN_MOMENTUM) * bn_s["mean"] + _BN_MOMENTUM * mean,
                            "var": (1 - _BN_MOMENTUM) * bn_s["var"] + _BN_MOMENTUM * unbiased,
                        }
                    )
                else:
                    mean, var = bn_s["mean"], bn_s["var"]
                inv = jax.lax.rsqrt(var + _BN_EPS).astype(cd)
                x = (x - mean.astype(cd)) * inv
                x = x * bn_p["scale"].astype(cd) + bn_p["bias"].astype(cd)
            x = jax.nn.relu(x)
        score = x @ dense["out"]["w"].astype(cd) + dense["out"]["b"].astype(cd)
        new_state = {"bn": new_bn} if (use_bn and train) else state
        return score[:, 0].astype(jnp.float32), new_state

    def _score_rows_fused(
        self, dense: Any, state: State, x: jnp.ndarray
    ) -> Tuple[jnp.ndarray, State]:
        """Training tower via the fused Pallas layer kernels
        (ops/fused_tower.py): each hidden layer is one kernel per direction
        — matmul with the NEXT layer's batch statistics accumulated in the
        epilogue, BN backward reductions fused into the recompute pass.
        Statistics/normalization math between layers is the same XLA code
        path as the plain tower (mean/E[x^2] in f32, var = E[x^2]-mean^2,
        torch-momentum running stats), so semantics match up to float
        reassociation (parity tested)."""
        from torchrecsys_tpu.ops import fused_tower as ft

        cd = self.compute_dtype
        n = x.shape[0]
        interpret = ft.tower_interpret()
        new_bn = []
        bnvec = jnp.zeros((4, x.shape[1]), cd)
        z = x
        for li, layer in enumerate(dense["layers"]):
            z, s, ss = ft.fused_layer(
                z, layer["w"].astype(cd), layer["b"].astype(cd), bnvec,
                li > 0, interpret,
            )
            mean = s / n
            msq = ss / n
            var = jnp.maximum(msq - jax.lax.square(mean), 0.0)
            unbiased = var * (n / max(n - 1, 1))
            bn_s = state["bn"][li]
            new_bn.append(
                {
                    "mean": (1 - _BN_MOMENTUM) * bn_s["mean"] + _BN_MOMENTUM * mean,
                    "var": (1 - _BN_MOMENTUM) * bn_s["var"] + _BN_MOMENTUM * unbiased,
                }
            )
            inv = jax.lax.rsqrt(var + _BN_EPS).astype(cd)
            bn_p = dense["bn"][li]
            bnvec = jnp.stack(
                [
                    mean.astype(cd),
                    inv,
                    bn_p["scale"].astype(cd),
                    bn_p["bias"].astype(cd),
                ]
            )
        # output head on the last hidden layer (small; plain XLA)
        h = jax.nn.relu((z - bnvec[0:1]) * bnvec[1:2] * bnvec[2:3] + bnvec[3:4])
        score = h @ dense["out"]["w"].astype(cd) + dense["out"]["b"].astype(cd)
        return score[:, 0].astype(jnp.float32), {"bn": new_bn}
