"""Fused, jitted training loop.

Reference analog: ``TorchRecSys.fit`` (torchrecsys/model.py:203-289) — a host
Python loop that per batch slices tensors, moves them to device, runs two
forwards, a hinge loss, and an optimizer step, then syncs the loss back
(``loss.item()``, model.py:200). Here the **entire epoch** is one XLA
computation: a device-side sort-free shuffle (utils/permute.py), a
``lax.scan`` over batches, and a fused train step that samples negatives,
gathers embedding rows, scores both sides, computes the loss, and applies
sparse scatter updates — with zero host round-trips and donated state buffers.

Sharding: when a ``jax.sharding.Mesh`` with axes ``('data', 'model')`` is
provided, embedding tables are row-sharded over ``'model'`` and the batch is
sharded over ``'data'``; XLA/GSPMD inserts the collectives (gather of remote
rows, psum of dense grads and batch-norm statistics). See
torchrecsys_tpu/parallel/.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torchrecsys_tpu.config import TrainConfig
from torchrecsys_tpu.data.interactions import InteractionStore
from torchrecsys_tpu.data.features import attach_features
from torchrecsys_tpu.data.sampling import sample_negatives, sample_negatives_alias
from torchrecsys_tpu.models.base import Batch, RecModel
from torchrecsys_tpu.train.losses import get_loss, get_per_row_loss
from torchrecsys_tpu.train.optim import (
    apply_embedding_updates,
    apply_embedding_updates_fused,
    augment_tables,
    init_embedding_opt,
    make_dense_optimizer,
    make_lr_schedule,
    split_augmented,
    supports_fused_layout,
)
from torchrecsys_tpu.utils.logging import get_logger
from torchrecsys_tpu.utils.permute import random_permutation

log = get_logger("torchrecsys_tpu.train")

from torchrecsys_tpu.utils.profiling import trace as profiling_trace

TrainState = Dict[str, Any]


def _null_ctx():
    return contextlib.nullcontext()


def grow_state(
    state: TrainState,
    new_model: RecModel,
    key: jax.Array,
) -> TrainState:
    """Grow a train state to a larger vocabulary (incremental training).

    Every embedding table (and its rowwise-adagrad accumulator) keeps its
    trained leading rows bit-for-bit; rows added by vocab growth get the
    model's fresh initialization (N(0, 1/dim) / zeros — models/base.py:
    init_table) and zero accumulators. Dense parameters, their optimizer
    state, BN statistics, the step counter and the rng carry over unchanged
    (vocab growth never changes dense shapes — tower widths depend on
    n_factors and feature COUNT, not vocab sizes). Same-size tables (growth
    absorbed by ROW_ALIGN padding) are kept as-is.
    """
    fresh_params, _ = new_model.init(key)
    new_tables = {}
    for name, fresh in fresh_params["tables"].items():
        old = state["tables"].get(name)
        if old is None:
            new_tables[name] = fresh
        elif old.shape == fresh.shape:
            new_tables[name] = old
        else:
            new_tables[name] = fresh.at[: old.shape[0]].set(old)
    new_emb_opt = {}
    for name, fresh in new_tables.items():
        old_opt = state["emb_opt"].get(name)
        if old_opt is None or "acc" not in old_opt:
            new_emb_opt[name] = dict(old_opt or {})
            continue
        acc_old = old_opt["acc"]
        if acc_old.shape[0] == fresh.shape[0]:
            new_emb_opt[name] = {"acc": acc_old}
        else:
            new_emb_opt[name] = {
                "acc": jnp.zeros((fresh.shape[0],), acc_old.dtype)
                .at[: acc_old.shape[0]]
                .set(acc_old)
            }
    return dict(
        state,
        tables=new_tables,
        emb_opt=new_emb_opt,
    )


def _inbatch_softmax_rows(
    h: jnp.ndarray,  # (B, D) user-side vectors
    v: jnp.ndarray,  # (B, D) item-side vectors
    vb: jnp.ndarray,  # (B,) item-side bias
    pos: jnp.ndarray,  # (B,) positive item rows (for dup mask + logQ)
    logq: Optional[jnp.ndarray],  # (num_items,) log train frequency, or None
) -> jnp.ndarray:
    """(B,) per-row in-batch sampled-softmax cross-entropy.

    One ``h @ v.T`` matmul (MXU; compute dtype of the vectors) builds every
    row's logits over the batch's B candidate items; the diagonal is the
    label. Corrections:

    - **logQ** (Bengio & Senecal 2008): subtract ``log q(candidate)`` with
      q = train-split frequency — exactly the in-batch negative
      distribution — so the learned scores estimate the popularity-debiased
      conditional (every candidate corrected, the label column included,
      as in TF-Recommenders' retrieval task).
    - **Accidental hits**: a candidate equal to the row's own positive
      (duplicate items in the batch) is masked to -inf off-diagonal.
      Mask-padded remainder rows (duplicated real rows) are likewise
      neutralized by this mask wherever they duplicate a row's positive;
      as generic negatives they mildly re-weight that final short batch —
      the documented analog of the reference's short-batch statistics.
    """
    logits = (h @ v.T).astype(jnp.float32) + vb.astype(jnp.float32)[None, :]
    if logq is not None:
        logits = logits - jnp.take(logq, pos)[None, :]
    b = pos.shape[0]
    dup = (pos[None, :] == pos[:, None]) & ~jnp.eye(b, dtype=bool)
    logits = jnp.where(dup, -jnp.inf, logits)
    label = jnp.diagonal(logits)
    return jax.nn.logsumexp(logits, axis=1) - label


class Trainer:
    """Owns the jitted step/epoch functions for one model + config."""

    def __init__(
        self,
        model: RecModel,
        cfg: TrainConfig,
        mesh: Optional[jax.sharding.Mesh] = None,
    ) -> None:
        self.model = model
        self.cfg = cfg
        self.mesh = mesh
        # The fused tower's opaque pallas_call over the 'data'-sharded
        # (2B, W) activations would force GSPMD to gather/replicate
        # activations around every layer kernel, silently defeating the
        # sharded-batch path (and the synced-BN GSPMD reduction) — refuse
        # rather than silently run slow.
        if (
            getattr(model.cfg, "pallas_tower", False) is True
            and mesh is not None
            and mesh.shape.get("data", 1) > 1
        ):
            raise ValueError(
                "ModelConfig.pallas_tower=True is a single-device option: "
                "under a mesh with data-axis size > 1 the opaque tower "
                "kernel defeats the sharded-batch path. Use the XLA tower "
                "(pallas_tower=False) with meshes."
            )
        if cfg.num_negatives < 1:
            raise ValueError(f"num_negatives must be >= 1, got {cfg.num_negatives}")
        if cfg.neg_sampling not in ("uniform", "popularity"):
            raise ValueError(
                f"neg_sampling must be 'uniform' or 'popularity', "
                f"got {cfg.neg_sampling!r}"
            )
        self._softmax = cfg.loss == "sampled_softmax"
        if self._softmax:
            if not getattr(model, "supports_sampled_softmax", False):
                raise ValueError(
                    f"loss='sampled_softmax' needs a factorizable score "
                    f"(RecModel.pair_vectors); net_type={model.name!r} does "
                    f"not factorize — use linear/fm/lstm/sasrec"
                )
            if getattr(model, "pairwise_sigmoid", False):
                raise ValueError(
                    "loss='sampled_softmax' with net_type='fm' requires "
                    "ModelConfig.fm_sigmoid=False (softmax over sigmoid-"
                    "squashed scores saturates; the sigmoid exists only "
                    "for reference score parity, fm.py:99)"
                )
            if cfg.num_negatives != 1:
                raise ValueError(
                    "sampled_softmax uses the batch itself as negatives; "
                    "num_negatives must stay 1 (batch_size controls the "
                    "negative count)"
                )
            if cfg.neg_sampling != "uniform":
                raise ValueError(
                    "neg_sampling is ignored under sampled_softmax (the "
                    "in-batch negative distribution IS the train popularity "
                    "distribution, logQ-corrected); leave it 'uniform'"
                )
            self.loss_fn = self.per_row_fn = None
            # exact singletons only — 1/np.True_/"true" must not silently
            # select a mode (same rule as pallas_step)
            if not (
                cfg.pallas_softmax is True
                or cfg.pallas_softmax is False
                or cfg.pallas_softmax == "auto"
            ):
                raise ValueError(
                    f"TrainConfig.pallas_softmax must be True, False or "
                    f"'auto'; got {cfg.pallas_softmax!r}"
                )
        else:
            self.loss_fn = get_loss(cfg.loss, model.schema.num_items)
            self.per_row_fn = get_per_row_loss(cfg.loss, model.schema.num_items)
        # K > 1 (no stored K-column), non-uniform sampling (stored static
        # negatives are uniform draws) and in-batch softmax (no explicit
        # negatives at all) each drop the stored static-negative column
        self._in_step_negs = (
            cfg.num_negatives > 1 or cfg.neg_sampling != "uniform" or self._softmax
        )
        self.lr_fn = make_lr_schedule(cfg.learning_rate, cfg.lr_schedule)
        self.dense_tx = make_dense_optimizer(
            cfg.dense_optimizer, cfg.learning_rate, schedule=self.lr_fn
        )
        self._epoch_jit = jax.jit(self._epoch_fn, donate_argnums=(0,))
        self._eval_jit = jax.jit(self._eval_fn)

    def _lr_at(self, step: jnp.ndarray):
        """Per-step learning rate for the sparse embedding updates; a traced
        value under a schedule (one compile covers every step), a plain float
        otherwise."""
        if self.lr_fn is None:
            return self.cfg.learning_rate
        return self.lr_fn(step)

    # ------------------------------------------------------------------
    def init_state(self, key: jax.Array) -> TrainState:
        params, model_state = self.model.init(key)
        state = {
            "tables": params["tables"],
            "dense": params["dense"],
            "model_state": model_state,
            "emb_opt": init_embedding_opt(self.cfg.embedding_optimizer, params["tables"]),
            "dense_opt": self.dense_tx.init(params["dense"]),
            "step": jnp.zeros((), jnp.int32),
            "rng": jax.random.PRNGKey(self.cfg.seed),
        }
        if self.mesh is not None:
            from torchrecsys_tpu.parallel.sharding import shard_state

            state = shard_state(state, self.mesh)
        return state

    # ------------------------------------------------------------------
    def _sample_negs(
        self,
        rng: jnp.ndarray,
        step: jnp.ndarray,
        pos: jnp.ndarray,
        feat: Optional[Dict[str, jnp.ndarray]],
        num: Optional[int] = None,
    ) -> jnp.ndarray:
        """In-step negative draw: (B,) for one negative, (K, B) for K > 1.

        Uniform (reference contract) or popularity-weighted
        (``TrainConfig.neg_sampling``; Walker alias tables ride
        ``feat['neg_prob']``/``feat['neg_alias']`` — data/sampling.py)."""
        k = jax.random.fold_in(rng, step)
        num = self.cfg.num_negatives if num is None else num
        tgt = pos if num == 1 else jnp.broadcast_to(pos, (num,) + pos.shape)
        if self.cfg.neg_sampling == "popularity":
            return sample_negatives_alias(
                k, tgt, feat["neg_prob"], feat["neg_alias"], feat["neg_fb"],
                self.cfg.avoid_collisions,
            )
        return sample_negatives(
            k, tgt, self.model.schema.num_items, self.cfg.avoid_collisions
        )

    # ------------------------------------------------------------------
    def _softmax_rows(
        self,
        h: jnp.ndarray,
        v: jnp.ndarray,
        vb: jnp.ndarray,
        pos: jnp.ndarray,
        logq: Optional[jnp.ndarray],
    ) -> jnp.ndarray:
        """Per-row in-batch CE: the fused Pallas kernel when the config and
        shapes allow (ops/softmax_ce.py), else the XLA formulation."""
        mode = self.cfg.pallas_softmax
        use = mode is True or (mode == "auto" and jax.default_backend() == "tpu")
        if use:
            from torchrecsys_tpu.ops.softmax_ce import (
                inbatch_softmax_ce,
                inbatch_softmax_ce_dp,
                softmax_kernel_applicable,
            )

            interp = jax.default_backend() != "tpu"
            b = h.shape[0]
            vbq = vb.astype(jnp.float32)
            if logq is not None:
                vbq = vbq - jnp.take(logq, pos)
            if self.mesh is None:
                if softmax_kernel_applicable(b, h.shape[1]):
                    return inbatch_softmax_ce(h, v, vbq, pos, interp)
            else:
                # shard_map DP wrapper: local rows vs the all-gathered
                # global batch — per-shard tile sizes must still divide
                nd = self.mesh.shape.get("data", 1)
                if b % nd == 0 and softmax_kernel_applicable(b // nd, h.shape[1]):
                    return inbatch_softmax_ce_dp(self.mesh, h, v, vbq, pos, interp)
        return _inbatch_softmax_rows(h, v, vb, pos, logq)

    # ------------------------------------------------------------------
    def _paired_side(
        self,
        user: jnp.ndarray,
        pos: jnp.ndarray,
        neg: jnp.ndarray,
        feat: Optional[Dict[str, jnp.ndarray]],
    ) -> Batch:
        """Concatenate the positive and negative halves into ONE batch side.

        The reference runs two separate forwards (model.py:171-185), which
        with batch-norm lets each half normalize by its own statistics — the
        net can then separate pos from neg via the normalization itself, and
        eval (running stats) collapses. One fused forward over ``2B`` rows
        gives both halves identical statistics, halves the kernel count, and
        merges the embedding gathers. Documented divergence from torch's
        two-call semantics.

        ``neg`` may be (B,) or (K, B) (``num_negatives=K``): the side is
        then (1+K)·B rows — positives first, then the K negative blocks in
        draw order.
        """
        negs = neg.reshape(-1)  # (K, B) row-major = draw-major blocks
        reps = 1 + (neg.shape[0] if neg.ndim == 2 else 1)
        side: Batch = {
            "user_id": jnp.tile(user, reps),
            "item_id": jnp.concatenate([pos, negs]),
        }
        side = attach_features(side, feat)
        # Static pair size: both halves of this side describe the SAME B
        # users (pos candidates first, then neg). Sequence models key on it
        # to encode each pair's shared history ONCE instead of per half —
        # halving their encoder compute and history gather/scatter traffic
        # (models/lstm.py, models/sasrec.py). Plain per-row batches (the
        # generic predict path) never carry it.
        side["_pair_b"] = user.shape[0]
        return side

    def train_step(
        self,
        state: TrainState,
        batch: Dict[str, jnp.ndarray],
        feat: Optional[Dict[str, jnp.ndarray]] = None,
    ) -> Tuple[TrainState, jnp.ndarray]:
        """One fused step: sample -> gather -> score pos|neg -> loss ->
        sparse/dense updates. Pure; shared by the epoch scan and tests."""
        return self._step_impl(state, batch, feat, fused=False)

    @staticmethod
    def _apply_batch_order(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """Apply the epoch builder's per-batch sort order (``_order``, rows
        sorted by user id) to every per-row array. The int32 id columns (and
        the f32 weight column, bitcast) ride ONE packed 2D row gather —
        ~4 us at b=8192 vs ~50 us/step for reordering the whole epoch's
        arrays with a second 10M-row flat gather."""
        order = batch.get("_order")
        if order is None:
            return batch
        batch = {k: v for k, v in batch.items() if k != "_order"}
        ikeys = sorted(
            k for k, v in batch.items()
            if v.ndim == 1 and v.dtype == jnp.int32
        )
        fkeys = sorted(
            k for k, v in batch.items()
            if v.ndim == 1 and v.dtype == jnp.float32
        )
        cols = [batch[k] for k in ikeys] + [
            jax.lax.bitcast_convert_type(batch[k], jnp.int32) for k in fkeys
        ]
        out = dict(batch)
        if cols:
            packed = jnp.stack(cols, axis=1)
            s = jnp.take(packed, order, axis=0)
            for i, k in enumerate(ikeys):
                out[k] = s[:, i]
            for j, k in enumerate(fkeys):
                out[k] = jax.lax.bitcast_convert_type(
                    s[:, len(ikeys) + j], jnp.float32
                )
        for k, v in batch.items():
            if k not in ikeys and k not in fkeys:
                out[k] = jnp.take(v, order, axis=0)
        return out

    def _step_impl(
        self,
        state: TrainState,
        batch: Dict[str, jnp.ndarray],
        feat: Optional[Dict[str, jnp.ndarray]],
        fused: bool,
        user_sorted: bool = False,
    ) -> Tuple[TrainState, jnp.ndarray]:
        """Step body. ``fused=True`` means ``state['tables']`` holds the
        (R, D+1) augmented layout (rowwise-adagrad accumulator as the last
        column — see train/optim.py): the accumulator then rides the row
        gather and the single row scatter instead of separate 1D ops."""
        model, cfg = self.model, self.cfg
        batch = self._apply_batch_order(batch)
        # Optional per-row weights: the mask-padded remainder batch
        # (drop_remainder=False) weights its filler rows 0 so they contribute
        # no gradient. Filler rows still enter batch-norm statistics of that
        # one batch (they are real, duplicated data rows) — the documented
        # analog of the reference's short final batch (dataset.py:414-433).
        w = batch.get("_w")
        batch = {k: v for k, v in batch.items() if k != "_w"}
        user = batch["user_id"]
        pos = batch["pos_item_id"]
        b = pos.shape[0]
        if self._softmax:
            # in-batch sampled softmax: no explicit negatives — the (B, B)
            # logit matrix over the batch's own positives IS the negative
            # set (one MXU matmul, RecModel.pair_vectors)
            side: Batch = {"user_id": user, "item_id": pos}
            side = attach_features(side, feat)
        else:
            if "neg_item_id" in batch and not self._in_step_negs:
                neg = batch["neg_item_id"]  # static negatives (dataset.py:56-64)
            else:
                neg = self._sample_negs(state["rng"], state["step"], pos, feat)
            side = self._paired_side(user, pos, neg, feat)
        reps = side["item_id"].shape[0] // b  # 1 + num negative blocks

        gmap = model.gathers(side)
        tables = state["tables"]
        # User-keyed gather sites receive the duplicated ids concat([user,
        # user]) that _paired_side built (the object itself — models pass
        # batch["user_id"] through untouched). Gather those rows ONCE (B rows)
        # and tile inside the loss; autograd then sums the two halves' grads
        # into one (B, D) gradient and the scatter writes B rows instead of
        # 2B — halving the user table's gather+scatter traffic. Row-wise
        # adagrad consequently sees ONE occurrence with the summed gradient
        # (dense-autograd semantics) instead of two half-gradients.
        # Sites declared by the model as carrying batch["user_id"] verbatim
        # (RecModel.user_gather_sites). Validated against object identity at
        # trace time: the halved-gather optimization below changes rowwise-
        # adagrad occurrence semantics, so a declared site passing a derived
        # array must fail loudly, not silently train differently.
        dup_uid = side["user_id"]
        halved = model.user_gather_sites & set(gmap)
        for k in halved:
            if gmap[k][1] is not dup_uid:
                raise ValueError(
                    f"{model.name}.gathers() site {k!r} is declared in "
                    "user_gather_sites but does not pass batch['user_id'] "
                    "through unchanged"
                )
        # Fallback identity detector for model subclasses that pass
        # batch['user_id'] through but forgot to declare the site: they
        # train correctly (two-occurrence rowwise-adagrad semantics) but
        # pay a 2x user-table gather/scatter — warn at trace time so the
        # halved-gather optimization isn't silently lost.
        for k, (_, ids) in gmap.items():
            if k not in halved and ids is dup_uid:
                log.warning(
                    "%s.gathers() site %r passes batch['user_id'] through "
                    "but is not declared in user_gather_sites: it trains "
                    "with two-occurrence adagrad semantics and 2x user-"
                    "table traffic. Declare it to enable the halved gather.",
                    model.name, k,
                )
        raw = {
            k: jnp.take(tables[t], user if k in halved else ids, axis=0)
            for k, (t, ids) in gmap.items()
        }
        gmap = {
            k: (t, user if k in halved else ids) for k, (t, ids) in gmap.items()
        }
        if fused:
            rows = {k: r[..., :-1] for k, r in raw.items()}
            acc_old = {k: r[..., -1] for k, r in raw.items()}
        else:
            rows = raw

        def loss_from(rows_, dense_):
            full = {
                k: jnp.concatenate([v] * reps) if k in halved else v
                for k, v in rows_.items()
            }
            if self._softmax:
                h, vv, vb, st = model.pair_vectors(
                    dense_, state["model_state"], full, side, train=True
                )
                per_row = self._softmax_rows(
                    h, vv, vb, pos, feat.get("logq") if feat else None
                )
            else:
                scores, st = model.score_rows(
                    dense_, state["model_state"], full, side, train=True
                )
                ns = scores[b:]
                if reps > 2:  # K negative blocks -> (K, B) for the loss
                    ns = ns.reshape(reps - 1, b)
                if w is None:
                    return self.loss_fn(scores[:b], ns, cfg.margin), st
                per_row = self.per_row_fn(scores[:b], ns, cfg.margin)
            if w is None:
                return jnp.mean(per_row), st
            return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0), st

        (loss, new_model_state), (g_rows, g_dense) = jax.value_and_grad(
            loss_from, argnums=(0, 1), has_aux=True
        )(rows, state["dense"])

        # Tables whose every gather site receives the (sorted, halved) user
        # ids can scatter with indices_are_sorted=True — see
        # TrainConfig.sort_batch_by_user.
        if user_sorted:
            by_table: Dict[str, List[bool]] = {}
            for k, (tname, _) in gmap.items():
                by_table.setdefault(tname, []).append(k in halved)
            sorted_tables = frozenset(
                t for t, hs in by_table.items() if hs and all(hs)
            )
        else:
            sorted_tables = frozenset()
        lr = self._lr_at(state["step"])
        if fused:
            per_table_f: Dict[str, List] = {}
            for k, (tname, ids) in gmap.items():
                per_table_f.setdefault(tname, []).append(
                    (ids, g_rows[k], acc_old[k])
                )
            new_tables = apply_embedding_updates_fused(
                lr, tables, per_table_f,
                sorted_tables=sorted_tables,
            )
            new_emb_opt = state["emb_opt"]
        else:
            per_table: Dict[str, List[Tuple[jnp.ndarray, jnp.ndarray]]] = {}
            for k, (tname, ids) in gmap.items():
                per_table.setdefault(tname, []).append((ids, g_rows[k]))
            new_tables, new_emb_opt = apply_embedding_updates(
                cfg.embedding_optimizer,
                lr,
                tables,
                state["emb_opt"],
                per_table,
                sorted_tables=sorted_tables,
            )
        updates, new_dense_opt = self.dense_tx.update(
            g_dense, state["dense_opt"], state["dense"]
        )
        new_dense = jax.tree.map(lambda p, u: p + u, state["dense"], updates)

        new_state = {
            "tables": new_tables,
            "dense": new_dense,
            "model_state": new_model_state,
            "emb_opt": new_emb_opt,
            "dense_opt": new_dense_opt,
            "step": state["step"] + 1,
            "rng": state["rng"],
        }
        return new_state, loss

    # ------------------------------------------------------------------
    def _pallas_pairwise(self) -> bool:
        """True when the epoch can use the fused Pallas train kernel.

        ``pallas_step="auto"`` (default) restricts the kernel to real TPUs:
        off-TPU it would run in Pallas interpret mode, which simulates the
        kernel op-by-op and is *slower* than the XLA step it replaces —
        interpret mode exists for parity tests (``pallas_step=True`` forces
        it on), not for performance."""
        from torchrecsys_tpu.ops.fused_pairwise import pairwise_kernel_applicable

        mode = self.cfg.pallas_step
        if mode is True:
            pass
        elif mode is False:
            return False
        elif mode == "auto":
            if jax.default_backend() != "tpu":
                return False
        else:
            # only the exact singletons are meaningful; 1 / np.True_ /
            # "true" silently disabling the kernel costs ~2.5x throughput
            # with no symptom, so reject them loudly
            raise ValueError(
                f"TrainConfig.pallas_step must be True, False or 'auto'; "
                f"got {self.cfg.pallas_step!r}"
            )
        return pairwise_kernel_applicable(self.model, self.cfg, self.mesh)

    # ------------------------------------------------------------------
    def _epoch_fn(
        self,
        state: TrainState,
        data: Dict[str, jnp.ndarray],
        feat: Optional[Dict[str, jnp.ndarray]],
    ) -> Tuple[TrainState, jnp.ndarray]:
        """One epoch = shuffle + scan(train_step). Entirely on device."""
        n = data["user_id"].shape[0]
        # clamp so datasets smaller than one batch still train (one full-set
        # batch) — the reference's loader likewise yields short batches
        b = min(self.cfg.batch_size, n)
        rng, k_shuffle = jax.random.split(state["rng"])
        state = dict(state, rng=rng)
        # Sort-free permutation: jax.random.permutation is a full key sort
        # (~0.9 s/epoch at 10M rows on TPU); the Feistel permutation is O(n)
        # vectorized integer math (utils/permute.py).
        weights = None
        if self.cfg.drop_remainder or n % b == 0:
            nb = n // b
            perm = random_permutation(k_shuffle, n)[: nb * b]
        else:
            # Remainder rows train too (reference short-batch behavior,
            # dataset.py:414-433): pad the permutation by wrapping around and
            # zero-weight the filler rows so they carry no gradient.
            nb = -(-n // b)
            pad = nb * b - n
            full = random_permutation(k_shuffle, n)
            perm = jnp.concatenate([full, full[:pad]])
            weights = (
                (jnp.arange(nb * b) < n).astype(jnp.float32).reshape(nb, b)
            )
        # Shuffle via ONE row gather of a packed (n, K) matrix: per-array 1D
        # jnp.take lowers to a scalar gather (~0.6 GB/s on TPU, 12% of the
        # epoch at 10M rows); a 2D row gather of the same data is ~20x faster.
        packable = sorted(
            k for k, v in data.items() if v.ndim == 1 and v.dtype == jnp.int32
        )
        # In-batch sort by user id (TrainConfig.sort_batch_by_user): row order
        # within a batch is semantically irrelevant — the loss mean, BN batch
        # statistics, gradient sums and the negatives' distribution are all
        # permutation-invariant — but sorted user ids let the user-table
        # scatter-add take XLA's merge lowering (3.5x faster, see
        # train/optim.py) and give the user gather HBM locality. The argsort
        # runs HERE, batched over the whole epoch (13 ms per 10M rows vs
        # slow per-step 1D sorts); the cheap (b, K) REORDER runs inside each
        # step (trainer._apply_batch_order, ~4 us) — reordering the epoch's
        # arrays here instead would cost a second 10M-row flat gather
        # (~64 ms; take_along_axis per column is worse still, ~116 ms each).
        user_sorted = bool(self.cfg.sort_batch_by_user) and "user_id" in packable
        batches = {}
        if packable:
            packed = jnp.stack([data[k] for k in packable], axis=1)
            shuf = jnp.take(packed, perm, axis=0)
            for i, k in enumerate(packable):
                batches[k] = shuf[:, i].reshape(nb, b)
            if user_sorted:
                batches["_order"] = jnp.argsort(
                    batches["user_id"], axis=1
                ).astype(jnp.int32)
        else:
            user_sorted = False
        for k, v in data.items():
            if k in packable:
                continue
            batches[k] = jnp.take(v, perm, axis=0).reshape(
                (nb, b) + v.shape[1:]
            )
        if weights is not None:
            batches["_w"] = weights

        # Switch to the augmented (R, D+1) table layout for the whole epoch
        # (one 2x-table-size copy each way — negligible next to the scan).
        fused = self.cfg.fused_embedding_update and supports_fused_layout(
            self.cfg.embedding_optimizer, state["tables"]
        )

        # Fully fused Pallas step (Linear/FM without metadata): the whole
        # score -> loss -> backward -> adagrad chain is one kernel over a
        # packed (rows, 128) layout — see ops/fused_pairwise.py. Under a mesh
        # the batch shards over 'data' (update rows all-gathered); with a
        # sharded 'model' axis the tables stay row-sharded too (gather+psum
        # full rows in, masked local scatter out). A batch that doesn't
        # divide the 'data' axis falls back to XLA.
        use_pallas = fused and self._pallas_pairwise()
        if use_pallas and self.mesh is not None and b % self.mesh.shape["data"]:
            use_pallas = False
        if use_pallas:
            from torchrecsys_tpu.ops import fused_pairwise as fp

            d = self.model.cfg.n_factors
            pack = self.model.pairwise_pack
            # user/item sides take the packed (rows, 128) layout; metadata
            # tables (when present) stay in the augmented (R, D+1) layout —
            # the meta step scatters per-occurrence fused-adagrad rows into
            # them directly (ops/fused_pairwise.py metadata section)
            aug = augment_tables(state["tables"], state["emb_opt"])
            packed = fp.pack_tables(aug, pack, d)
            consumed = {name for names in pack.values() for name in names}
            packed.update(
                {k: v for k, v in aug.items() if k not in consumed}
            )
            state = dict(
                state,
                tables=packed,
                emb_opt={name: {} for name in state["emb_opt"]},
            )
            interpret = jax.default_backend() != "tpu"
            cfg = self.cfg
            mesh = self.mesh
            bf16 = self.model.compute_dtype == jnp.bfloat16
            meta_names = self.model.schema.metadata_names
            has_meta = self.model.schema.num_metadata_features > 0
            is_fm = bool(getattr(self.model, "pairwise_fm_fields", False))

            def body_pl(st, batch):
                batch = self._apply_batch_order(batch)
                w = batch.get("_w")
                user, pos = batch["user_id"], batch["pos_item_id"]
                if "neg_item_id" in batch and not self._in_step_negs:
                    neg = batch["neg_item_id"]
                else:
                    # popularity sampling composes with the kernel: the draw
                    # happens here, the kernel only consumes the (B,) ids
                    neg = self._sample_negs(st["rng"], st["step"], pos, feat)
                kw = dict(
                    d=d, margin=cfg.margin,
                    loss_kind=cfg.loss, sigmoid=self.model.pairwise_sigmoid,
                    interpret=interpret, user_sorted=user_sorted, bf16=bf16,
                )
                lr_t = self._lr_at(st["step"])
                if has_meta:
                    mvec = tuple(st["tables"][f"meta_{nm}"] for nm in meta_names)
                    mlin = (
                        tuple(
                            st["tables"][f"linear_meta_{nm}"] for nm in meta_names
                        )
                        if is_fm
                        else None
                    )
                    margs = (
                        st["tables"]["user"], st["tables"]["item"], mvec, mlin,
                        feat["meta_ids"], feat["meta_mask"],
                        user, pos, neg, w, lr_t,
                    )
                    mkw = dict(kw, fm=is_fm)
                    if mesh is None:
                        nu, ni, nmv, nml, loss = fp.fused_pairwise_step_meta(
                            *margs, **mkw
                        )
                    elif mesh.shape.get("model", 1) > 1:
                        nu, ni, nmv, nml, loss = fp.fused_pairwise_step_meta_tp(
                            mesh, *margs, **mkw
                        )
                    else:
                        nu, ni, nmv, nml, loss = fp.fused_pairwise_step_meta_dp(
                            mesh, *margs, **mkw
                        )
                    tables = {"user": nu, "item": ni}
                    for fi, nm in enumerate(meta_names):
                        tables[f"meta_{nm}"] = nmv[fi]
                        if is_fm:
                            tables[f"linear_meta_{nm}"] = nml[fi]
                    st = dict(st, tables=tables, step=st["step"] + 1)
                    return st, loss
                if mesh is None:
                    nu, ni, loss = fp.fused_pairwise_step(
                        st["tables"]["user"], st["tables"]["item"],
                        user, pos, neg, w, lr_t, **kw,
                    )
                elif mesh.shape.get("model", 1) > 1:
                    # row-sharded tables: gather+psum full rows, kernel,
                    # all-gather updates over data, masked local scatter
                    nu, ni, loss = fp.fused_pairwise_step_tp(
                        mesh,
                        st["tables"]["user"], st["tables"]["item"],
                        user, pos, neg, w, lr_t, **kw,
                    )
                else:
                    nu, ni, loss = fp.fused_pairwise_step_dp(
                        mesh,
                        st["tables"]["user"], st["tables"]["item"],
                        user, pos, neg, w, lr_t, **kw,
                    )
                st = dict(st, tables={"user": nu, "item": ni}, step=st["step"] + 1)
                return st, loss

            state, losses = jax.lax.scan(body_pl, state, batches)
            aug_out = fp.unpack_tables(state["tables"], pack, d)
            aug_out.update(
                {k: v for k, v in state["tables"].items() if k not in pack}
            )
            tables, emb_opt = split_augmented(aug_out)
            state = dict(state, tables=tables, emb_opt=emb_opt)
            return state, jnp.mean(losses)

        if fused:
            state = dict(
                state,
                tables=augment_tables(state["tables"], state["emb_opt"]),
                emb_opt={name: {} for name in state["emb_opt"]},
            )

        def body(st, batch):
            st, loss = self._step_impl(
                st, batch, feat, fused=fused, user_sorted=user_sorted
            )
            return st, loss

        state, losses = jax.lax.scan(body, state, batches)

        if fused:
            tables, emb_opt = split_augmented(state["tables"])
            state = dict(state, tables=tables, emb_opt=emb_opt)
        return state, jnp.mean(losses)

    # ------------------------------------------------------------------
    def fit(
        self,
        state: TrainState,
        store: InteractionStore,
        epochs: Optional[int] = None,
        verbose: bool = True,
        profile_dir: str = "/tmp/torchrecsys_tpu_trace",
    ) -> Tuple[TrainState, List[float]]:
        """Host loop over jitted epochs. Mirrors fit's reporting
        (per-epoch avg loss print, torchrecsys/model.py:288) and its
        ``profile_epochs`` profiler hook (model.py:237-251) via jax.profiler."""
        epochs = self.cfg.epochs if epochs is None else epochs
        data = self._device_train_data(store)
        feat = self.feature_tables(store)
        if not verbose and self.cfg.profile_epochs <= 0:
            # fast path: dispatch all epochs back-to-back with no host
            # round-trip between them (the per-epoch ``float(loss)`` sync
            # costs a full tunnel RTT); losses are fetched once at the end.
            # Every epoch reuses the ONE compiled single-epoch program —
            # a scan-over-epochs variant was measured slower end-to-end
            # because each distinct epoch count recompiles.
            device_losses = []
            for _ in range(epochs):
                state, loss = self._epoch_jit(state, data, feat)
                device_losses.append(loss)
            return state, [float(l) for l in device_losses]
        losses_out: List[float] = []
        for epoch in range(epochs):
            profiling = epoch < self.cfg.profile_epochs
            ctx = profiling_trace(profile_dir) if profiling else _null_ctx()
            t0 = time.perf_counter()
            with ctx:
                state, loss = self._epoch_jit(state, data, feat)
                loss = float(loss)  # blocks; keeps timing/trace honest
            losses_out.append(loss)
            if verbose:
                dt = time.perf_counter() - t0
                # per-epoch reporting, reference model.py:288
                log.info("epoch %d: loss=%.5f (%.2fs)", epoch, loss, dt)
            if profiling and epoch == self.cfg.profile_epochs - 1:
                # in-terminal per-op digest of the last profiled epoch —
                # reference parity with torch.profiler's key_averages()
                # table print (model.py:268-269)
                from torchrecsys_tpu.utils.profiling import op_summary

                log.info("per-op device time digest:\n%s", op_summary(profile_dir))
        return state, losses_out

    def _device_train_data(self, store: InteractionStore) -> Dict[str, jnp.ndarray]:
        """Device-resident training arrays, uploaded once per store.

        The reference re-slices host tensors and copies them to the device
        every batch (model.py:256); here even the once-per-``fit`` upload is
        cached — repeated ``fit`` calls on the same store (warmup + timed
        runs, incremental training) skip the host->HBM transfer entirely
        (~80 MB at 10M rows over the tunnel).
        """
        # Keyed on the store's process-unique token — NOT id(store), which a
        # new store can silently reuse after the old one is collected.
        key = (store.token, store.num_train)
        if getattr(self, "_data_cache_key", None) != key:
            arrays = store.train_arrays()
            if self._in_step_negs:
                # stored static negatives are single uniform draws; K > 1 /
                # non-uniform configs sample in-step — don't upload/shuffle
                # a column the step ignores
                arrays = {k: v for k, v in arrays.items() if k != "neg_item_id"}
            self._data_cache = {k: jnp.asarray(v) for k, v in arrays.items()}
            self._data_cache_key = key
        return self._data_cache

    def fit_streaming(self, state, store, superbatch_size: int = 1 << 21,
                      epochs=None, seed: int = 0, verbose: bool = True):
        """Host->HBM double-buffered streaming fit for splits larger than
        HBM (see train/streaming.py)."""
        from torchrecsys_tpu.train.streaming import fit_streaming

        return fit_streaming(
            self, state, store, superbatch_size=superbatch_size,
            epochs=epochs, seed=seed, verbose=verbose,
        )

    def feature_tables(self, store: InteractionStore) -> Dict[str, jnp.ndarray]:
        """Device-resident side-feature tables for this model: item
        metadata, plus user history for sequence models (models/lstm.py)."""
        feat: Dict[str, jnp.ndarray] = {}
        if store.metadata.num_features > 0:
            feat["meta_ids"] = jnp.asarray(store.metadata.ids)
            feat["meta_mask"] = jnp.asarray(store.metadata.mask)
        if getattr(self.model, "needs_history", False):
            ids, mask = store.user_history(self.model.cfg.history_len)
            feat["hist_ids"] = jnp.asarray(ids)
            feat["hist_mask"] = jnp.asarray(mask)
        if self.cfg.neg_sampling == "popularity":
            from torchrecsys_tpu.data.sampling import alias_table

            prob, alias, fb = alias_table(
                store.train_items,
                self.model.schema.num_items,
                self.cfg.popularity_alpha,
            )
            feat["neg_prob"] = jnp.asarray(prob)
            feat["neg_alias"] = jnp.asarray(alias)
            feat["neg_fb"] = jnp.asarray(fb)
        if self._softmax and self.cfg.logq_correction:
            feat["logq"] = self._logq_from(store.train_items)
        return feat

    def _logq_from(self, items: np.ndarray) -> jnp.ndarray:
        """(num_items,) log empirical frequency of ``items`` — the logQ
        correction for batches whose candidate columns are drawn from that
        split. Items absent from the split never appear as columns of such
        a batch, so the 1e-12 floor only keeps their (never-gathered) logs
        finite."""
        counts = np.bincount(
            np.asarray(items, np.int64),
            minlength=self.model.schema.num_items,
        ).astype(np.float64)
        q = counts / max(counts.sum(), 1.0)
        return jnp.asarray(np.log(np.maximum(q, 1e-12)), jnp.float32)

    # ------------------------------------------------------------------
    def _eval_fn(
        self,
        state: TrainState,
        batches: Dict[str, jnp.ndarray],  # (nb, b) arrays
        valid: jnp.ndarray,  # (nb, b) bool
        feat: Optional[Dict[str, jnp.ndarray]],
    ) -> Dict[str, jnp.ndarray]:
        """Chunked eval: mean pairwise loss + pairwise AUC over valid rows,
        one ``lax.scan`` over ``batch_size`` batches so the activation
        footprint is O(batch) regardless of split size (a 5M-row MLP split
        evaluated in one call would be a tens-of-GB activation — OOM).

        Reference: TorchRecSys.evaluate (model.py:292-338) with
        Metrics.auc_score = mean(pos > neg) (evaluate/metrics.py:23-31)."""
        params = {"tables": state["tables"], "dense": state["dense"]}
        per_row_loss = self.per_row_fn

        def body(carry, xs):
            batch, v = xs
            user, pos = batch["user_id"], batch["pos_item_id"]
            b = pos.shape[0]
            if self._softmax:
                # loss = the train objective (in-batch logQ-corrected CE);
                # AUC = the reference's 1-uniform-negative pairwise
                # protocol on the factorized scores (the item side is
                # re-derived for the sampled negatives; the user-side
                # encoding h is shared)
                side_p: Batch = {"user_id": user, "item_id": pos}
                side_p = attach_features(side_p, feat)
                rows_p = self.model.gather_rows(params["tables"], side_p)
                h, vp, vbp, _ = self.model.pair_vectors(
                    params["dense"], state["model_state"], rows_p, side_p,
                    train=False,
                )
                loss_rows = self._softmax_rows(
                    h, vp, vbp, pos, feat.get("logq") if feat else None
                )
                neg = self._sample_negs(
                    state["rng"], 0x5EED + carry["i"], pos, feat, num=1
                )
                side_n: Batch = {"user_id": user, "item_id": neg}
                side_n = attach_features(side_n, feat)
                rows_n = self.model.gather_rows(params["tables"], side_n)
                _, vn, vbn, _ = self.model.pair_vectors(
                    params["dense"], state["model_state"], rows_n, side_n,
                    train=False,
                )
                ps = (jnp.sum(h * vp, axis=-1) + vbp).astype(jnp.float32)
                ns = (jnp.sum(h * vn, axis=-1) + vbn).astype(jnp.float32)
            else:
                if "neg_item_id" in batch and not self._in_step_negs:
                    neg = batch["neg_item_id"]
                else:
                    # dynamic mode: eval negatives re-drawn per call — seeded,
                    # unlike the reference's nondeterministic eval
                    # (model.py:303). The LOSS draws the train config's K
                    # negatives so its value is comparable to the train
                    # objective (warp's rank estimate collapses to
                    # 0-or-log(N) at K=1); AUC keeps the reference's
                    # 1-negative pairwise protocol via the FIRST draw.
                    neg = self._sample_negs(
                        state["rng"], 0x5EED + carry["i"], pos, feat
                    )
                side = self._paired_side(user, pos, neg, feat)
                scores, _ = self.model.score(
                    params, state["model_state"], side, train=False
                )
                reps = side["item_id"].shape[0] // b
                ps = scores[:b]
                ns_all = scores[b:]
                if reps > 2:
                    ns_all = ns_all.reshape(reps - 1, b)
                    ns = ns_all[0]  # AUC: 1-negative reference protocol
                else:
                    ns = ns_all
                loss_rows = per_row_loss(ps, ns_all, self.cfg.margin)
            w = v.astype(jnp.float32)
            new = {
                "i": carry["i"] + 1,
                "n": carry["n"] + jnp.sum(w),
                "loss": carry["loss"] + jnp.sum(loss_rows * w),
                "auc": carry["auc"] + jnp.sum((ps > ns).astype(jnp.float32) * w),
            }
            return new, None

        init = {
            "i": jnp.zeros((), jnp.int32),
            "n": jnp.zeros((), jnp.float32),
            "loss": jnp.zeros((), jnp.float32),
            "auc": jnp.zeros((), jnp.float32),
        }
        out, _ = jax.lax.scan(body, init, (batches, valid))
        n = jnp.maximum(out["n"], 1.0)
        return {"loss": out["loss"] / n, "auc": out["auc"] / n}

    def evaluate(
        self,
        state: TrainState,
        store: InteractionStore,
        batch_size: Optional[int] = None,
        verbose: bool = True,
    ) -> Dict[str, float]:
        """Pairwise loss/AUC over the test split, chunked by ``batch_size``
        (reference knob, model.py:292). Rows beyond the last full batch are
        carried in a padded, masked final batch — every test row counts."""
        if store.num_test == 0:
            # reference guard: model.py:299
            if verbose:
                log.info("evaluate: empty test split")
            return {}
        n = store.num_test
        b = min(batch_size or self.cfg.batch_size, n)
        nb = -(-n // b)
        pad = nb * b - n
        data = {}
        for k, v in store.test_arrays().items():
            arr = np.concatenate([v, v[:pad]]) if pad else v
            data[k] = jnp.asarray(arr).reshape((nb, b) + v.shape[1:])
        valid = jnp.arange(nb * b).reshape(nb, b) < n
        feat = self.feature_tables(store)
        if self._softmax and self.cfg.logq_correction:
            # eval's candidate columns are TEST positives, so the correct
            # sampling distribution is the TEST frequency — the train-split
            # logq would blow up the logsumexp for any train-cold test item
            # (e.g. every user's newest item under a temporal split)
            feat = dict(feat, logq=self._logq_from(store.test_items))
        out = self._eval_jit(state, data, valid, feat)
        result = {k: float(v) for k, v in out.items()}
        if verbose:
            log.info("eval: loss=%.5f auc=%.5f", result["loss"], result["auc"])
        return result
