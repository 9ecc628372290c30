"""Model-zoo base: pure functions over parameter pytrees.

The reference models are ``torch.nn.Module`` subclasses with a duck-typed
``forward(batch, user_key, item_key, metadata_key)``
(reference: torchrecsys/collaborative/linear.py:54, mlp.py:88, fm.py:60).
Here each model is a stateless object describing

- its embedding **tables** (name -> rows x dim + init scheme), initialized like
  the reference's ``ScaledEmbedding`` N(0, 1/dim) and ``ZeroEmbedding``
  (torchrecsys/embeddings/init_embeddings.py:43-50, 90-97);
- its **dense** parameters (MLP towers etc.);
- a ``gathers`` map (which table rows a batch touches), and
- ``score_rows`` (pure math from gathered rows to scores).

The split between ``gathers`` and ``score_rows`` is what makes TPU-sparse
training possible: the train step differentiates with respect to the gathered
rows only and scatter-adds updates back into the tables, never materializing
a dense table-sized gradient (SURVEY §7 "hard part (a)").

Batch layout (one "side", all static shapes):
  user_id:  (B,)     int32
  item_id:  (B,)     int32
  meta_ids: (B,F,W)  int32   (absent or F=0 when there is no metadata)
  meta_mask:(B,F,W)  bool
"""

from __future__ import annotations

import abc
import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from torchrecsys_tpu.config import DataSchema, ModelConfig

Batch = Dict[str, jnp.ndarray]
Params = Dict[str, Any]  # {"tables": {name: (rows, dim)}, "dense": pytree}
State = Dict[str, Any]  # mutable collections (e.g. batch-norm stats)


@dataclasses.dataclass(frozen=True)
class TableSpec:
    rows: int
    dim: int
    init: str = "scaled"  # "scaled" = N(0, init_scale or 1/dim) | "zero"
    # Override the scaled-init std — used when one physical table packs
    # multiple logical embeddings side by side (e.g. NeuCF's fused
    # (R, 2*n_factors) tables must init each half like an independent
    # n_factors-wide ScaledEmbedding, std 1/n_factors not 1/(2*n_factors))
    init_scale: Optional[float] = None


# Embedding-table rows are padded to a multiple of this so tables (and their
# per-row optimizer accumulators) shard evenly across any reasonable 'model'
# mesh axis and align to TPU tiles. Ids only ever address the first
# ``spec.rows`` rows; padding rows are inert.
ROW_ALIGN = 64


def padded_rows(rows: int) -> int:
    return -(-rows // ROW_ALIGN) * ROW_ALIGN


def init_table(key: jax.Array, spec: TableSpec, dtype: jnp.dtype) -> jnp.ndarray:
    rows = padded_rows(spec.rows)
    if spec.init == "zero":
        return jnp.zeros((rows, spec.dim), dtype=dtype)
    # ScaledEmbedding: normal_(0, 1/embedding_dim) — init_embeddings.py:43-50
    scale = spec.init_scale if spec.init_scale is not None else 1.0 / spec.dim
    return (jax.random.normal(key, (rows, spec.dim)) * scale).astype(dtype)


def masked_sum(emb: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """(B, W, D) x (B, W) -> (B, D) masked sum over the width axis."""
    return jnp.sum(emb * mask[..., None].astype(emb.dtype), axis=-2)


def masked_mean(emb: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    s = masked_sum(emb, mask)
    n = jnp.maximum(jnp.sum(mask.astype(emb.dtype), axis=-1, keepdims=True), 1.0)
    return s / n


class RecModel(abc.ABC):
    """A trainable pairwise-scoring model."""

    name: str = "base"
    # Gather sites (keys of gathers()'s dict) whose ids are EXACTLY
    # ``batch["user_id"]`` passed through untouched. The trainer relies on
    # this declaration to gather each pair's user rows once and tile them
    # across the pos/neg halves (halving user-table traffic and giving
    # rowwise adagrad dense-autograd one-occurrence semantics), and to mark
    # the user scatter sorted under TrainConfig.sort_batch_by_user. It is
    # validated against object identity at trace time — a site declared
    # here that passes a derived array raises instead of silently changing
    # optimizer semantics.
    user_gather_sites: frozenset = frozenset()

    def __init__(self, schema: DataSchema, cfg: ModelConfig) -> None:
        self.schema = schema
        self.cfg = cfg
        self.param_dtype = jnp.dtype(cfg.param_dtype)
        self.compute_dtype = jnp.dtype(cfg.compute_dtype)

    # ---- structure ------------------------------------------------------
    @abc.abstractmethod
    def table_specs(self) -> Dict[str, TableSpec]:
        ...

    @abc.abstractmethod
    def init_dense(self, key: jax.Array) -> Any:
        ...

    def init_state(self) -> State:
        return {}

    # ---- compute --------------------------------------------------------
    @abc.abstractmethod
    def gathers(self, batch: Batch) -> Dict[str, Tuple[str, jnp.ndarray]]:
        """Map row-key -> (table name, index array) for one batch side."""
        ...

    @abc.abstractmethod
    def score_rows(
        self,
        dense: Any,
        state: State,
        rows: Dict[str, jnp.ndarray],
        batch: Batch,
        train: bool,
    ) -> Tuple[jnp.ndarray, State]:
        """Gathered rows -> (B,) scores (+ updated state in train mode)."""
        ...

    # ---- derived --------------------------------------------------------
    def init(self, key: jax.Array) -> Tuple[Params, State]:
        specs = self.table_specs()
        keys = jax.random.split(key, len(specs) + 1)
        tables = {
            name: init_table(k, spec, self.param_dtype)
            for k, (name, spec) in zip(keys[:-1], sorted(specs.items()))
        }
        dense = self.init_dense(keys[-1])
        return {"tables": tables, "dense": dense}, self.init_state()

    def gather_rows(
        self, tables: Dict[str, jnp.ndarray], batch: Batch
    ) -> Dict[str, jnp.ndarray]:
        return {
            key: jnp.take(tables[tname], ids, axis=0)
            for key, (tname, ids) in self.gathers(batch).items()
        }

    def score(
        self,
        params: Params,
        state: State,
        batch: Batch,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, State]:
        rows = self.gather_rows(params["tables"], batch)
        return self.score_rows(params["dense"], state, rows, batch, train)

    # True on models whose linearized_catalog returns a factorization
    supports_linearized_catalog: bool = False

    # True on models implementing pair_vectors (in-batch sampled-softmax
    # training, train/trainer.py)
    supports_sampled_softmax: bool = False

    def pair_vectors(
        self,
        dense: Any,
        state: State,
        rows: Dict[str, jnp.ndarray],
        batch: Batch,
        train: bool,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, State]:
        """Per-row factorization of the TRAIN-time score for in-batch
        sampled-softmax: ``(user_vecs (B, D), item_vecs (B, D), item_bias
        (B,), state)`` such that ``score(row i vs row j's item) =
        user_vecs[i] · item_vecs[j] + item_bias[j]`` up to a ROW-constant
        term (row constants are softmax-invariant and deliberately
        dropped — e.g. Linear's user bias receives no gradient under this
        loss). The trainer builds the (B, B) logit matrix with ONE matmul
        on the MXU — the B-1 in-batch negatives cost no extra gathers.
        Models whose score does not factorize (MLP's joint tower, NeuCF)
        leave ``supports_sampled_softmax`` False and the trainer refuses
        loudly at construction.
        """
        raise NotImplementedError

    def linearized_catalog(self, params: Params, feat):
        """Optional dot-product factorization of the scoring function.

        Models whose score reduces to ``transform(dot(user_vec, item_vec) +
        item_bias + user_const)`` with monotonic ``transform`` return
        ``(item_vecs (N, D), item_bias (N,), user_fn, transform)`` where
        ``user_fn(params, user_ids) -> (user_vecs (U, D), user_const (U,))``
        and ``transform(raw (U, k), user_const) -> scores``. Enables the
        fused Pallas score+top-k kernel (ops/dot_topk.py) and the
        model-axis-sharded catalog scorer (eval/predict.py:
        sharded_catalog_topk) for full-catalog prediction. ``params`` is the
        full ``{"tables", "dense"}`` dict — sequence models need their dense
        encoder weights to build user vectors. Models with genuinely
        non-bilinear scoring (MLP, NeuCF) return None and use the generic
        chunked path.
        """
        return None

    def _catalog_meta_sums(
        self,
        tables: Dict[str, jnp.ndarray],
        feat,
        prefix: str = "meta_",
    ) -> list:
        """Per-feature masked sums of metadata embeddings for every item:
        list of (N, D) arrays, one per metadata feature."""
        out = []
        if not feat or "meta_ids" not in feat or feat["meta_ids"].shape[1] == 0:
            return out
        meta_ids_t, meta_mask_t = feat["meta_ids"], feat["meta_mask"]
        for f, fname in enumerate(self.schema.metadata_names):
            emb = jnp.take(tables[f"{prefix}{fname}"], meta_ids_t[:, f, :], axis=0)
            out.append(masked_sum(emb, meta_mask_t[:, f, :]))
        return out

    # ---- helpers --------------------------------------------------------
    def _meta_features(self, batch: Batch) -> int:
        m = batch.get("meta_ids")
        return 0 if m is None else int(m.shape[1])

    def _meta_gathers(
        self, batch: Batch, prefix: str = "meta"
    ) -> Dict[str, Tuple[str, jnp.ndarray]]:
        out: Dict[str, Tuple[str, jnp.ndarray]] = {}
        for f, fname in enumerate(self.schema.metadata_names[: self._meta_features(batch)]):
            out[f"{prefix}:{fname}"] = (f"meta_{fname}", batch["meta_ids"][:, f, :])
        return out


def uniform_linear_init(
    key: jax.Array, fan_in: int, fan_out: int, dtype: jnp.dtype
) -> Dict[str, jnp.ndarray]:
    """torch.nn.Linear-style U(-1/sqrt(fan_in), 1/sqrt(fan_in)) init."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / (fan_in**0.5)
    return {
        "w": jax.random.uniform(kw, (fan_in, fan_out), minval=-bound, maxval=bound).astype(dtype),
        "b": jax.random.uniform(kb, (fan_out,), minval=-bound, maxval=bound).astype(dtype),
    }
