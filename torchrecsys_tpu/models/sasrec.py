"""SASRec-style self-attentive sequence recommender (Kang & McAuley 2018).

Beyond-reference model family: the reference's sequence story is an empty
stub plus "LSTM (yet to come)" (torchrecsys/sequence/test.py:1-3,
README.md:14). Round 3 built the LSTM realization of that slot
(models/lstm.py); this adds the attention-based one the field actually
ships today — same data plane (the per-user ``(num_users, L)`` history
tables attached by the Trainer), same scoring contract
(``score = <h_u, item_emb> + b_item``), same leakage control, so
everything downstream (fused top-k predict, sharded serving, ranking
eval, checkpointing) works unchanged.

TPU notes: the whole encoder is dense batched matmuls over (B, L, D) with
L = ``history_len`` (default 20) — no sequence parallelism needed at these
lengths (SURVEY §5.7: SP/CP documented N/A). Causal + padding masking uses
a -1e9 additive mask (not -inf: rows with no valid key would softmax to
NaN). Positional embeddings live in the DENSE pytree (see init_dense).
On paired (pos|neg) training sides the encoder runs ONCE per pair against
the shared history with the positive hidden (score_rows) — measured
159K -> 378K examples/s on the 10M bench workload. The residual per-block
cost is layout-bound, not FLOP-bound: attention at (L=20, d_head=40)
leaves the 128x128 MXU mostly idle, an inherent small-sequence shape
property at serving-style history lengths.
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
    uniform_linear_init,
)

_LN_EPS = 1e-6


def _layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean(jax.lax.square(x - m), axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + _LN_EPS) * scale + bias


class SASRecModel(RecModel):
    name = "sasrec"
    needs_history = True
    # score = <h_u, item> + b_item with h_u candidate-independent at
    # serving time — same linearized-predict contract as the LSTM
    # (models/lstm.py), so full-catalog predict is encode-once + the fused
    # score+top-k kernel.
    supports_linearized_catalog = True

    def __init__(self, schema, cfg) -> None:
        super().__init__(schema, cfg)
        if cfg.n_factors % cfg.sasrec_heads:
            raise ValueError(
                f"sasrec: n_factors={cfg.n_factors} must be divisible by "
                f"sasrec_heads={cfg.sasrec_heads}"
            )

    def table_specs(self) -> Dict[str, TableSpec]:
        d = self.cfg.n_factors
        s = self.schema
        return {
            "item": TableSpec(s.num_items, d, "scaled"),
            "item_bias": TableSpec(s.num_items, 1, "zero"),
        }

    def init_dense(self, key: jax.Array) -> Any:
        d = self.cfg.n_factors
        blocks = []
        key, kp = jax.random.split(key)
        keys = jax.random.split(key, self.cfg.sasrec_blocks)
        for kb in keys:
            k1, k2, k3, k4 = jax.random.split(kb, 4)
            blocks.append(
                {
                    "qkv": uniform_linear_init(k1, d, 3 * d, self.param_dtype),
                    "attn_out": uniform_linear_init(k2, d, d, self.param_dtype),
                    "ffn1": uniform_linear_init(k3, d, d, self.param_dtype),
                    "ffn2": uniform_linear_init(k4, d, d, self.param_dtype),
                    "ln1": self._ln_params(d),
                    "ln2": self._ln_params(d),
                }
            )
        # Learned positional embeddings live in the DENSE pytree, not as an
        # embedding table: every batch row gathers positions 0..L-1
        # identically, so a table-side treatment scatter-adds 2B*L
        # duplicate gradient rows onto L rows per step — an extreme-
        # collision scatter (measured +11% train throughput from moving it
        # dense, 159K -> 177K ex/s on the 10M bench workload, before the
        # pair-encode change took it to 378K). Dense-side, autograd reduces
        # the gradient with one sum and optax updates it like any weight.
        pos = (
            jax.random.normal(kp, (self.cfg.history_len, d)) * (1.0 / d)
        ).astype(self.param_dtype)
        return {"blocks": blocks, "ln_out": self._ln_params(d), "pos": pos}

    def _ln_params(self, d: int) -> Dict[str, jnp.ndarray]:
        return {
            "scale": jnp.ones((d,), self.param_dtype),
            "bias": jnp.zeros((d,), self.param_dtype),
        }

    def gathers(self, batch: Batch) -> Dict[str, Tuple[str, jnp.ndarray]]:
        hist_ids = batch["hist_ids"]
        b = batch.get("_pair_b")
        if b is not None:
            # paired side: both halves carry the SAME user's history —
            # gather (and later scatter) each pair's history rows once
            hist_ids = hist_ids[:b]
        return {
            "item": ("item", batch["item_id"]),
            "item_bias": ("item_bias", batch["item_id"]),
            "hist": ("item", hist_ids),  # (B, L) -> (B, L, D)
        }

    def _encode(
        self,
        dense: Any,
        hist_emb: jnp.ndarray,  # (B, L, D)
        hist_mask: jnp.ndarray,  # (B, L) bool
    ) -> jnp.ndarray:
        """Masked causal self-attention encoder -> (B, D) user vectors
        (hidden state at each user's LAST valid history position)."""
        cd = self.compute_dtype
        d = self.cfg.n_factors
        h = self.cfg.sasrec_heads
        dh = d // h
        bsz, l, _ = hist_emb.shape
        mask_f = hist_mask.astype(cd)[..., None]

        pos_emb = dense["pos"][:l].astype(cd)[None, :, :]
        x = (hist_emb.astype(cd) + pos_emb) * mask_f
        # causal + key-padding additive mask, (B, 1, L, L) over heads
        causal = jnp.tril(jnp.ones((l, l), bool))
        allowed = causal[None, :, :] & hist_mask[:, None, :]
        bias = jnp.where(allowed, 0.0, -1e9).astype(cd)[:, None, :, :]

        def p(name, blk, z):
            return z @ blk[name]["w"].astype(cd) + blk[name]["b"].astype(cd)

        for blk in dense["blocks"]:
            z = _layer_norm(
                x, blk["ln1"]["scale"].astype(cd), blk["ln1"]["bias"].astype(cd)
            )
            qkv = p("qkv", blk, z).reshape(bsz, l, 3, h, dh)
            q, k, v = (
                jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3)
            )  # (B, h, L, dh)
            scores = (q @ jnp.swapaxes(k, -1, -2)) * (dh**-0.5) + bias
            attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(cd)
            ctx = jnp.moveaxis(attn @ v, 1, 2).reshape(bsz, l, d)
            x = x + p("attn_out", blk, ctx)
            z = _layer_norm(
                x, blk["ln2"]["scale"].astype(cd), blk["ln2"]["bias"].astype(cd)
            )
            x = x + p("ffn2", blk, jax.nn.relu(p("ffn1", blk, z)))
            x = x * mask_f  # keep padded positions inert through the stack

        x = _layer_norm(
            x,
            dense["ln_out"]["scale"].astype(cd),
            dense["ln_out"]["bias"].astype(cd),
        )
        # hidden state at the last VALID position (mask may be interleaved
        # after leakage masking); empty histories encode to zeros
        pos_idx = jnp.arange(l, dtype=jnp.int32)
        last = jnp.max(jnp.where(hist_mask, pos_idx[None, :], -1), axis=1)
        h_last = jnp.take_along_axis(
            x, jnp.maximum(last, 0)[:, None, None], axis=1
        )[:, 0, :]
        return jnp.where((last >= 0)[:, None], h_last, 0.0)

    def score_rows(
        self,
        dense: Any,
        state: State,
        rows: Dict[str, jnp.ndarray],
        batch: Batch,
        train: bool,
    ) -> Tuple[jnp.ndarray, State]:
        cd = self.compute_dtype
        item = rows["item"].astype(cd)  # (2B or B, D)
        b = batch.get("_pair_b")
        if b is None:
            # generic per-row batch: hide the scored candidate from its own
            # history (identical semantics to models/lstm.py)
            mask = batch["hist_mask"]
            mask = mask & (batch["hist_ids"] != batch["item_id"][:, None])
            h = self._encode(dense, rows["hist"], mask)
        else:
            # paired (pos|neg) side: one encoder pass per pair with the
            # POSITIVE hidden; both halves score against that state (see
            # models/lstm.py:score_rows for the semantics note)
            mask = batch["hist_mask"][:b] & (
                batch["hist_ids"][:b] != batch["item_id"][:b, None]
            )
            h_half = self._encode(dense, rows["hist"], mask)
            # (1+K) candidate blocks per pair group (num_negatives=K): the
            # one encoder pass serves every block
            h = jnp.tile(h_half, (item.shape[0] // b, 1))
        score = jnp.sum(h * item, axis=-1) + rows["item_bias"][:, 0].astype(cd)
        return score.astype(jnp.float32), state

    supports_sampled_softmax = True

    def pair_vectors(self, dense, state, rows, batch, train):
        """score(i, j) = h_i · item_j + b_item_j (see models/lstm.py)."""
        cd = self.compute_dtype
        mask = batch["hist_mask"] & (
            batch["hist_ids"] != batch["item_id"][:, None]
        )
        h = self._encode(dense, rows["hist"], mask)
        return h, rows["item"].astype(cd), rows["item_bias"][:, 0].astype(cd), state

    def encode_users(self, params, feat, user_ids: jnp.ndarray) -> jnp.ndarray:
        """(U,) user rows -> (U, D) encodings, one attention pass per user."""
        h_ids = jnp.take(feat["hist_ids"], user_ids, axis=0)
        h_mask = jnp.take(feat["hist_mask"], user_ids, axis=0)
        h_emb = jnp.take(params["tables"]["item"], h_ids, axis=0)
        return self._encode(params["dense"], h_emb, h_mask)

    def linearized_catalog(self, params, feat):
        """Encode-once full-catalog predict; predict-time leakage semantics
        match the LSTM's (history unmasked at serving — see
        models/lstm.py:linearized_catalog for the rationale)."""
        if not feat or "hist_ids" not in feat:
            raise ValueError(
                "SASRec full-catalog predict needs the user-history feature "
                "tables (Trainer.feature_tables(store) -> hist_ids/hist_mask)"
            )
        n = self.schema.num_items
        tables = params["tables"]
        vd = self.compute_dtype if self.compute_dtype == jnp.bfloat16 else jnp.float32
        item_vecs = tables["item"][:n].astype(vd)
        item_bias = tables["item_bias"][:n, 0].astype(jnp.float32)

        def user_fn(params_, user_ids):
            h = self.encode_users(params_, feat, user_ids)
            return (
                h.astype(vd),
                jnp.zeros((user_ids.shape[0],), jnp.float32),
            )

        def transform(raw, user_const):
            return raw

        return item_vecs, item_bias, user_fn, transform
