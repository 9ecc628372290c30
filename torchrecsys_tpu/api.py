"""User-facing facade.

API-parity layer over the functional core, mirroring the reference's single
entry point ``TorchRecSys(dataset, user_id_col, item_id_col, ...)`` with
``.fit`` / ``.evaluate`` / ``.predict``
(reference: torchrecsys/model.py:64-452), plus capabilities the reference
lacks: multi-user batched predict, recall@k evaluation, checkpoint
save/restore, and SPMD meshes.

Constructor-argument mapping (reference model.py:64-117):
- ``dataset, user_id_col, item_id_col, n_factors, net_type, metadata_id_col,
  split_ratio, dynamic_neg_sampling`` — same meaning; ids need NOT be
  contiguous ints here (explicit encoding).
- ``use_amp`` -> bfloat16 compute (the TPU analog of torch.cuda.amp,
  model.py:86-88).
- ``use_cuda`` — accepted and ignored: JAX places arrays on the available
  accelerator automatically.
- ``hidden_layers`` / ``use_batch_norm`` — honored (the reference documents
  but never forwards them, model.py:144-149; SURVEY §2.4).
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from torchrecsys_tpu.config import ModelConfig, TrainConfig
from torchrecsys_tpu.data.interactions import InteractionStore, prepare_data
from torchrecsys_tpu.eval.predict import catalog_topk
from torchrecsys_tpu.models import build_model
from torchrecsys_tpu.train.trainer import Trainer


class RecSys:
    """TPU-native counterpart of ``TorchRecSys`` (torchrecsys/model.py:18)."""

    def __init__(
        self,
        dataset: Any,
        user_id_col: str = "user_id",
        item_id_col: str = "item_id",
        n_factors: int = 80,
        net_type: str = "linear",
        metadata_id_col: Optional[Sequence[str]] = None,
        split_ratio: float = 0.8,
        dynamic_neg_sampling: bool = False,
        use_amp: bool = False,
        use_cuda: bool = False,  # accepted for API parity; ignored
        debug: bool = False,
        path: str = "./",
        hidden_layers: Sequence[int] = (1024, 128),
        use_batch_norm: bool = True,
        mesh: Optional[jax.sharding.Mesh] = None,
        history_len: int = 20,
        seed: int = 0,
        ease_lam: float = 100.0,
        fm_sigmoid: bool = True,
    ) -> None:
        del use_cuda
        self.debug = debug
        self.path = path
        self.seed = seed
        self.mesh = mesh
        # remembered for update_data/partial_fit (incremental training)
        self._user_col = user_id_col
        self._item_col = item_id_col
        self._split_ratio = split_ratio
        self.store: InteractionStore = prepare_data(
            dataset,
            user_id_col=user_id_col,
            item_id_col=item_id_col,
            metadata_id_col=metadata_id_col,
            split_ratio=split_ratio,
            dynamic_neg_sampling=dynamic_neg_sampling,
            seed=seed + 42,
        )
        self.model_cfg = ModelConfig(
            net_type=net_type,
            n_factors=n_factors,
            hidden_layers=tuple(hidden_layers),
            use_batch_norm=use_batch_norm,
            compute_dtype="bfloat16" if use_amp else "float32",
            history_len=history_len,
            # reference score-parity quirk (fm.py:99); turn off for
            # loss='sampled_softmax' (its softmax saturates over
            # sigmoid-squashed scores) or for unbounded FM scores
            fm_sigmoid=fm_sigmoid,
        )
        self.ease = None
        if net_type == "ease":
            # Closed-form branch: the reference ships EASE but never wires it
            # into its facade (no 'ease' branch at torchrecsys/model.py:127;
            # SURVEY §2.8). Here it is a first-class net_type: fit() runs the
            # closed-form solve, predict()/evaluate() use the dense scores.
            from torchrecsys_tpu.models.ease import EASE

            s = self.store.schema
            self.model = None
            self.ease = EASE(s.num_users, s.num_items, lam=ease_lam)
        else:
            self.model = build_model(self.store.schema, self.model_cfg)
        self.dynamic_neg_sampling = dynamic_neg_sampling
        self.trainer: Optional[Trainer] = None
        self.state = None
        self._n_updates = 0  # update_data calls; decorrelates extension seeds
        if debug:
            # Reference: ProcessData.write_data(path) dumps config.json +
            # meta.csv; the call is commented out at model.py:98. Here the
            # `debug` flag makes `path` live: dataset stats + item metadata
            # map are written at construction.
            self.store.write_data(path)

    # ------------------------------------------------------------------
    @property
    def config(self) -> Dict[str, int]:
        """Dataset stats, reference-shaped (dataset.py:199-203)."""
        s = self.store.schema
        return {
            "num_users": s.num_users,
            "num_items": s.num_items,
            "num_metadata": sum(s.metadata_vocab_sizes),
        }

    def _ensure_trainer(self, train_cfg: TrainConfig) -> Trainer:
        if self.trainer is None or self.trainer.cfg != train_cfg:
            self.trainer = Trainer(self.model, train_cfg, mesh=self.mesh)
        return self.trainer

    def _require_fitted(self, what: str = "this") -> None:
        fitted = (self.ease.b is not None) if self.ease is not None else (
            self.state is not None
        )
        if not fitted:
            # a real error, not a bare assert: survives ``python -O`` and
            # reads like the framework's other errors (e.g. encode_one)
            raise RuntimeError(
                f"{what} requires a trained model — call fit() first"
            )

    # ------------------------------------------------------------------
    def fit(
        self,
        optimizer: str = "adam",
        epochs: int = 1,
        batch_size: int = 512,
        learning_rate: float = 1e-2,
        profile_epochs: int = 0,
        loss: str = "hinge",
        embedding_optimizer: str = "rowwise_adagrad",
        lr_schedule: Any = None,
        num_negatives: int = 1,
        neg_sampling: str = "uniform",
        verbose: bool = True,
    ) -> List[float]:
        """Train; returns per-epoch mean losses.

        Reference: TorchRecSys.fit(optimizer, epochs, batch_size,
        profile_epochs) (model.py:203-289). The optimizer is named, not a
        torch object; embedding tables always receive sparse row-wise
        updates (see train/optim.py) so any named optimizer works — unlike
        the reference, where the README's Adam crashes on sparse grads
        (SURVEY §2.9 #2).

        Beyond-reference knobs: ``loss`` adds ``bpr``/``logistic`` plus the
        K-negative ``adaptive_hinge`` and rank-weighted ``warp`` (LightFM's
        headline loss — pair with ``num_negatives>=5``); ``num_negatives``
        samples K negatives per positive in-step; ``neg_sampling=
        'popularity'`` draws them ∝ train-frequency^0.75 (train/losses.py,
        data/sampling.py).

        ``net_type='ease'`` has no gradient loop: fit() runs the closed-form
        solve on the train split (optimizer/epoch args are ignored) and
        returns an empty loss list.
        """
        if self.ease is not None:
            self.ease.fit(self.store.train_users, self.store.train_items)
            return []
        train_cfg = TrainConfig(
            batch_size=batch_size,
            epochs=epochs,
            learning_rate=learning_rate,
            lr_schedule=lr_schedule,
            dense_optimizer=optimizer,
            embedding_optimizer=embedding_optimizer,
            dynamic_neg_sampling=self.dynamic_neg_sampling,
            loss=loss,
            num_negatives=num_negatives,
            neg_sampling=neg_sampling,
            seed=self.seed,
            profile_epochs=profile_epochs,
        )
        trainer = self._ensure_trainer(train_cfg)
        if self.state is None:
            self.state = trainer.init_state(jax.random.PRNGKey(self.seed))
        self.state, losses = trainer.fit(
            self.state, self.store, epochs=epochs, verbose=verbose
        )
        return losses

    # ------------------------------------------------------------------
    def evaluate(
        self,
        batch_size: int = 512,
        eval_metrics: Sequence[str] = ("loss",),
        verbose: bool = True,
    ) -> Dict[str, float]:
        """Test-split evaluation; returns exactly the requested metrics.

        Reference: ``evaluate(batch_size, eval_metrics)`` computes only what
        is requested (model.py:292-338) with metrics ``loss``/``auc``. Here
        additionally ``recall@K`` / ``precision@K`` / ``hit_rate@K`` /
        ``ndcg@K`` (any K)
        are accepted — computed per-user from chunked full-catalog top-k
        (eval/predict.py:ranking_eval; legacy reference analog
        helper/evaluate.py:53-106).

        ``net_type='ease'`` supports only the ranking metrics (it scores a
        user x item matrix; there is no pairwise loss to report).
        """
        self._require_fitted("evaluate()")
        if self.store.num_test == 0:
            return {}
        pair_wanted = [m for m in eval_metrics if m in ("loss", "auc")]
        rank_ks: List[int] = []
        for m in eval_metrics:
            if "@" in m:
                kind, _, k_str = m.partition("@")
                if kind not in ("recall", "precision", "hit_rate", "ndcg") or not k_str.isdigit():
                    raise ValueError(f"unknown eval metric {m!r}")
                rank_ks.append(int(k_str))
            elif m not in ("loss", "auc"):
                raise ValueError(f"unknown eval metric {m!r}")
        if self.ease is not None:
            if pair_wanted:
                raise ValueError(
                    "net_type='ease' has no pairwise loss/auc; request "
                    "ranking metrics like 'recall@10' instead"
                )
            return self._evaluate_ease(tuple(sorted(set(rank_ks))), eval_metrics)
        out: Dict[str, float] = {}
        if pair_wanted:
            out.update(
                self.trainer.evaluate(
                    self.state, self.store, batch_size=batch_size, verbose=verbose
                )
            )
        if rank_ks:
            from torchrecsys_tpu.eval.predict import ranking_eval

            out.update(
                ranking_eval(
                    self.model,
                    {"tables": self.state["tables"], "dense": self.state["dense"]},
                    self.state["model_state"],
                    self.store.test_users,
                    self.store.test_items,
                    self.store.schema.num_items,
                    self.trainer.feature_tables(self.store),
                    ks=tuple(sorted(set(rank_ks))),
                    item_chunk=None,
                    batch_size=batch_size,
                    mesh=self.mesh,
                )
            )
        return {m: out[m] for m in eval_metrics}

    def _evaluate_ease(
        self, ks: Tuple[int, ...], eval_metrics: Sequence[str]
    ) -> Dict[str, float]:
        """Per-user recall/precision/hit_rate@K from EASE's dense scores —
        same aggregation as eval/predict.py:ranking_eval."""
        test_users = self.store.test_users
        test_items = self.store.test_items
        num_items = self.store.schema.num_items
        max_k = min(max(ks), num_items)
        uniq, inv = np.unique(np.asarray(test_users), return_inverse=True)
        topk_parts = []
        for s in range(0, len(uniq), 512):
            scores = self.ease.scores(uniq[s : s + 512])
            _, ids = jax.lax.top_k(scores, max_k)
            topk_parts.append(np.asarray(ids))
        topk = np.concatenate(topk_parts, axis=0)
        from torchrecsys_tpu.eval.predict import topk_ranking_metrics

        out = topk_ranking_metrics(
            topk, inv, np.asarray(test_items), len(uniq), ks, num_items
        )
        return {m: out[m] for m in eval_metrics}

    # ------------------------------------------------------------------
    def predict(
        self,
        user_id: Union[Any, Sequence[Any]],
        top_k: int = 10,
        prediction_batch_size: int = 4096,
        return_raw_ids: bool = True,
        exclude_seen: bool = False,
        approx_recall: Optional[float] = None,
    ) -> np.ndarray:
        """Full-catalog top-k for one user or a batch of users.

        Reference: model.py:341-452 (single user, pandas per chunk, full
        sort). Here: any number of users, device-side chunked score +
        running top-k merge, raw-id decoding on the way out.

        ``approx_recall`` (e.g. 0.95; factorizable models on TPU) switches
        to the hardware approximate top-k — measured 3.3x the exact path at
        a 1M-item catalog, trading a bounded recall loss
        (ops/dot_topk.py:dot_topk_approx).

        ``exclude_seen=True`` drops each user's train-split items from
        their results (the reference offers this only on the unwired EASE,
        ease.py:70). Gradient models exclude DEVICE-SIDE: a packed
        per-user bitmask rides into the fused scorer (sharded along the
        ``model`` axis with the catalog under a mesh), seen scores become
        -inf before selection, and ``k_fetch`` stays ``top_k`` — no
        over-fetch, no host filtering loop (the fast Pallas top-k path
        stays engaged for any |seen|). EASE — and non-linearizable models
        on a mesh — fetch ``top_k + max(|seen|)`` candidates and filter
        host-side. Either way the result is exactly the top-k UNSEEN
        items. Requires interaction data in this process (not available
        after a cold ``RecSys.load``).

        Returns (top_k,) for a scalar user or (U, top_k) for a sequence.
        """
        self._require_fitted("predict()")
        scalar = not isinstance(user_id, (list, tuple, np.ndarray))
        users_raw = [user_id] if scalar else list(user_id)
        try:
            rows = np.asarray(
                [self.store.user_encoder.encode_one(u) for u in users_raw],
                np.int32,
            )
        except KeyError as e:
            raise KeyError(f"predict: unknown user_id — {e.args[0]}") from None
        num_items = self.store.schema.num_items
        seen: Optional[List[np.ndarray]] = None
        seen_mask = None
        k_fetch = min(top_k, num_items)
        if exclude_seen:
            if self.store.num_train == 0:
                raise ValueError(
                    "predict(exclude_seen=True) needs the train interactions; "
                    "this RecSys has none (cold RecSys.load?)"
                )
            tu, ti = self.store.train_users, self.store.train_items
            # dedupe: repeat interactions would otherwise inflate the seen
            # counts past the unique-seen size for no reason (ADVICE r4)
            seen = [np.unique(ti[tu == r]) for r in rows]
            mask_ok = self.ease is None and (
                self.mesh is None or self.model.supports_linearized_catalog
            )
            if mask_ok:
                from torchrecsys_tpu.ops.dot_topk import pack_seen_mask

                seen_mask = jnp.asarray(pack_seen_mask(seen, num_items))
            else:
                k_fetch = min(top_k + max(len(s) for s in seen), num_items)
        if self.ease is not None:
            scores = self.ease.scores(rows)
            _, ids = jax.lax.top_k(scores, k_fetch)
            ids = np.asarray(ids)
        else:
            feat = self.trainer.feature_tables(self.store)
            params = {"tables": self.state["tables"], "dense": self.state["dense"]}
            _, ids = catalog_topk(
                self.model,
                params,
                self.state["model_state"],
                jnp.asarray(rows),
                num_items,
                feat,
                top_k=k_fetch,
                chunk_size=prediction_batch_size,
                mesh=self.mesh,
                approx_recall=approx_recall,
                seen_mask=seen_mask,
            )
            ids = np.asarray(ids)
        if seen_mask is not None:
            ids = self._patch_short_unseen_rows(np.array(ids), seen, num_items)
        elif seen is not None:
            ids = self._filter_seen(ids, seen, top_k)
        return self._decode_items(ids, return_raw_ids, scalar)

    @staticmethod
    def _patch_short_unseen_rows(
        ids: np.ndarray, seen: List[np.ndarray], num_items: int
    ) -> np.ndarray:
        """Device-masked top-k: masked items score -inf, so each row's first
        ``num_items - |seen|`` entries are exactly the top unseen items. A
        user with fewer unseen items than ``top_k`` gets the tail filled
        with their last unseen candidate (matching the tiny-catalog
        behavior of the host-filter path); a user with nothing unseen is an
        error, as before."""
        for r, s in enumerate(seen):
            n_unseen = num_items - len(s)
            if n_unseen == 0:
                raise ValueError(
                    "predict(exclude_seen=True): a requested user has "
                    "interacted with the entire catalog — nothing unseen "
                    "to recommend"
                )
            if n_unseen < ids.shape[1]:
                ids[r, n_unseen:] = ids[r, n_unseen - 1]
        return ids

    @staticmethod
    def _filter_seen(
        ids: np.ndarray, seen: List[np.ndarray], top_k: int
    ) -> np.ndarray:
        """Drop each row's seen items, keep rank order, truncate to top_k.

        By construction ``ids`` has ``top_k + max(|seen|)`` columns, so at
        least ``top_k`` unseen candidates survive per row (a user cannot
        remove more than |seen| of them); rows never need padding unless
        the whole catalog is smaller than top_k + |seen| — then the tail is
        filled with the last unseen candidate."""
        out = np.empty((ids.shape[0], min(top_k, ids.shape[1])), ids.dtype)
        for r, (row, s) in enumerate(zip(ids, seen)):
            keep = row[~np.isin(row, s)]
            if len(keep) == 0:
                raise ValueError(
                    "predict(exclude_seen=True): a requested user has "
                    "interacted with the entire catalog — nothing unseen "
                    "to recommend"
                )
            if len(keep) < out.shape[1]:  # tiny catalogs
                keep = np.concatenate(
                    [keep, np.repeat(keep[-1:], out.shape[1] - len(keep))]
                )
            out[r] = keep[: out.shape[1]]
        return out

    def similar_items(
        self,
        item_id: Any,
        top_k: int = 10,
        return_raw_ids: bool = True,
    ) -> np.ndarray:
        """Top-k most similar catalog items to ``item_id``.

        Reference analog: ``EASE.get_similarity`` (ease.py:75-85), which
        exists only on the unwired EASE class. Here every model with an
        item factor table answers it — similarity is the dot product of
        item factor vectors, ranked by the fused score+top-k kernel — and
        the EASE branch uses its B-matrix row weights like the reference.
        The query item itself is excluded from the results.
        """
        self._require_fitted("similar_items()")
        try:
            row = self.store.item_encoder.encode_one(item_id)
        except KeyError:
            raise KeyError(f"similar_items: unknown item_id — {item_id!r}") from None
        n = self.store.schema.num_items
        k = min(top_k + 1, n)  # +1: the query item ranks first, drop it
        if self.ease is not None:
            _, ids = jax.lax.top_k(self.ease.b[row][None, :], k)
            ids = np.asarray(ids)
        else:
            from torchrecsys_tpu.ops.dot_topk import dot_topk

            tables = self.state["tables"]
            if "item" not in tables:
                raise ValueError(
                    f"net_type {self.model_cfg.net_type!r} has no item "
                    "factor table to compute similarities from"
                )
            vecs = tables["item"][:n].astype(jnp.float32)
            q = vecs[row][None, :]
            _, ids = dot_topk(q, vecs, jnp.zeros((n,), jnp.float32), k)
            ids = np.asarray(ids)
        keep = ids[0][ids[0] != row][: min(top_k, n - 1)]
        return self._decode_items(keep[None, :], return_raw_ids, scalar=True)

    # ------------------------------------------------------------------
    def _linearized(self):
        self._require_fitted("factor-vector export")
        if self.ease is not None:
            raise ValueError(
                "net_type='ease' has no factor vectors (its model is the "
                "item-item B matrix); use predict()/similar_items()"
            )
        if self.trainer is None:
            self.trainer = Trainer(
                self.model, TrainConfig(seed=self.seed), mesh=self.mesh
            )
        feat = self.trainer.feature_tables(self.store)
        params = {"tables": self.state["tables"], "dense": self.state["dense"]}
        lin = self.model.linearized_catalog(params, feat)
        if lin is None:
            raise ValueError(
                f"net_type {self.model_cfg.net_type!r} does not factorize "
                "into user/item vectors (joint-tower scoring); factor "
                "export needs linear/fm/lstm/sasrec"
            )
        return params, lin

    def item_vectors(self) -> "tuple[np.ndarray, np.ndarray]":
        """Catalog item factor vectors for EXTERNAL ANN serving.

        Returns ``(vecs (num_items, D) f32, bias (num_items,) f32)`` in
        encoded-row order (row i = ``config``'s item row i; decode raw ids
        via the store's encoder). The model's score is a monotonic
        transform of ``user_vec · vecs[i] + bias[i] + user_const``, so
        ranking is preserved under the standard MIPS augmentation — index
        ``[vecs[i], bias[i]]`` and query with ``[user_vec, 1.0]`` in
        ScaNN/FAISS/your ANN engine of choice. Metadata side features are
        already folded into the vectors (they are item-static). No
        reference analog (its predict path is the only scorer,
        model.py:341-452).
        """
        _, (item_vecs, item_bias, _, _) = self._linearized()
        return (
            np.asarray(item_vecs, np.float32),
            np.asarray(item_bias, np.float32),
        )

    def user_vectors(
        self, user_id: Optional[Sequence[Any]] = None
    ) -> "tuple[np.ndarray, np.ndarray]":
        """User-side query vectors for external ANN serving.

        ``user_id=None`` exports every user (encoded-row order); otherwise
        raw ids. Returns ``(vecs (U, D) f32, const (U,) f32)`` — ``const``
        is the user's row-constant score term (e.g. Linear's user bias):
        irrelevant to that user's own ranking, returned for score parity.
        Sequence models encode each user's history window once (their
        serving-time unmasked semantics, models/lstm.py:linearized_catalog).
        """
        params, (_, _, user_fn, _) = self._linearized()
        if user_id is None:
            rows = jnp.arange(self.store.schema.num_users, dtype=jnp.int32)
        else:
            ids = [user_id] if np.ndim(user_id) == 0 else list(user_id)
            try:
                # encode_one is the strict (non-vocab-extending) lookup
                rows = jnp.asarray(
                    [self.store.user_encoder.encode_one(u) for u in ids],
                    jnp.int32,
                )
            except KeyError as e:
                raise KeyError(f"user_vectors: unknown user_id — {e}") from None
        vecs, const = user_fn(params, rows)
        return np.asarray(vecs, np.float32), np.asarray(const, np.float32)

    def _decode_items(
        self, ids: np.ndarray, return_raw_ids: bool, scalar: bool
    ) -> np.ndarray:
        if return_raw_ids:
            decode = self.store.item_encoder.decode
            out = np.asarray([decode(r) for r in ids], dtype=object)
            try:  # collapse to a numeric array when raw ids are numeric
                out = out.astype(np.asarray(decode(ids[0])).dtype)
            except (ValueError, TypeError):
                pass
        else:
            out = ids
        return out[0] if scalar else out

    # ------------------------------------------------------------------
    def update_data(
        self,
        dataset: Any,
        user_id_col: Optional[str] = None,
        item_id_col: Optional[str] = None,
        split_ratio: Optional[float] = None,
    ) -> None:
        """Extend the dataset with NEW interactions — incremental training.

        No reference analog (its dataset object is built once, SURVEY §2.2).
        Unseen raw user/item ids extend the vocabularies with new rows at
        the end, the new interactions get their own seeded split and are
        appended, and the trained state GROWS: existing embedding rows (and
        their adagrad accumulators) are preserved bit-for-bit, new rows get
        fresh initialization (train/trainer.py:grow_state). Continue with
        ``fit()`` — or use :meth:`partial_fit` for the one-call form.

        Metadata-bearing datasets extend too (the new data must carry the
        same metadata columns; new items' side features parse from their
        first occurrence, unseen category ids grow the metadata
        vocabularies). Cold-loaded models (``RecSys.load``) continue
        training as well: their frozen encoders thaw for the duration of
        the extension (calling update_data IS the explicit opt-in to vocab
        growth) and re-freeze after, and sequence models' checkpointed
        histories merge with the new interactions (each updated user's new
        items push into their window).
        """
        from torchrecsys_tpu.data.interactions import extend_store

        encoders = [self.store.user_encoder, self.store.item_encoder,
                    *self.store.metadata.encoders]
        thawed = [e for e in encoders if e.frozen]
        for e in thawed:
            e.thaw()
        try:
            self.store = extend_store(
                self.store,
                dataset,
                user_id_col or self._user_col,
                item_id_col or self._item_col,
                split_ratio=split_ratio
                if split_ratio is not None
                else self._split_ratio,
                dynamic_neg_sampling=self.dynamic_neg_sampling,
                # fold the extension count in so repeated update_data calls
                # don't reuse one split permutation pattern (ADVICE r4)
                seed=self.seed + 43 + self._n_updates,
            )
            self._n_updates += 1
        finally:
            for e in thawed:
                e.freeze()
        if self.ease is not None:
            from torchrecsys_tpu.models.ease import EASE

            s = self.store.schema
            # closed form: solve again over the extended interactions. The
            # prior interaction CSR carries over so a COLD-loaded model's
            # original training data merges with the increment instead of
            # being dropped (ADVICE r4); on a warm store the carried rows
            # are a subset of the store's and merging is a no-op (binary X).
            old = self.ease
            self.ease = EASE(s.num_users, s.num_items, lam=old.lam)
            if old.item_idx is not None:
                self.ease.seed_csr(old.user_ptr, old.item_idx)
            return
        self.model = build_model(self.store.schema, self.model_cfg)
        if self.state is not None:
            from torchrecsys_tpu.train.trainer import grow_state

            self.state = grow_state(
                self.state, self.model, jax.random.PRNGKey(self.seed + 1)
            )
            if self.mesh is not None:
                # growth ran as eager ops with default placement; restore
                # the canonical row-sharded layout on the mesh
                from torchrecsys_tpu.parallel.sharding import shard_state

                self.state = shard_state(self.state, self.mesh)
        # the trainer binds the old model object; rebind (same train config)
        if self.trainer is not None:
            self.trainer = Trainer(self.model, self.trainer.cfg, mesh=self.mesh)

    def partial_fit(self, dataset: Any, **fit_kwargs) -> List[float]:
        """``update_data(dataset)`` + ``fit(**fit_kwargs)`` in one call."""
        self.update_data(dataset)
        return self.fit(**fit_kwargs)

    # ------------------------------------------------------------------
    def save(self, directory: str) -> None:
        """Checkpoint everything a cold process needs: the sharded train
        state (Orbax), the schema, the raw-id vocabularies, the metadata
        table, and the model/train configs. Restore with :meth:`restore`
        (same process) or :meth:`RecSys.load` (fresh process, no dataset)."""
        from torchrecsys_tpu.utils.checkpoint import pack_store_aux, save_checkpoint

        self._require_fitted("save()")
        aux = pack_store_aux(
            self.store,
            self.model_cfg,
            self.trainer.cfg if self.trainer else None,
        )
        # dataset-facing ctor state, so a COLD load can update_data /
        # partial_fit with the ORIGINAL column names and split behavior
        aux["dataset_cols"] = {
            "user": self._user_col,
            "item": self._item_col,
            "split_ratio": self._split_ratio,
            "n_updates": self._n_updates,
        }
        if self.ease is not None:
            # B rides Orbax; the interaction CSR (variable-length, needed to
            # score users and to merge-under-update_data after a cold load)
            # rides the aux sidecar
            state = {"b": self.ease.b}
            aux["ease_csr"] = {
                "user_ptr": np.asarray(self.ease.user_ptr),
                "item_idx": np.asarray(self.ease.item_idx),
            }
        else:
            state = self.state
        save_checkpoint(directory, state, self.store.schema, aux=aux)

    def restore(self, directory: str) -> None:
        from torchrecsys_tpu.utils.checkpoint import restore_checkpoint

        if self.ease is not None:
            from torchrecsys_tpu.utils.checkpoint import load_aux

            s = self.store.schema
            target = {"b": jnp.zeros((s.num_items, s.num_items), jnp.float32)}
            self.ease.b = restore_checkpoint(directory, target)["b"]
            aux = load_aux(directory)
            if aux and "ease_csr" in aux:
                self.ease.seed_csr(
                    aux["ease_csr"]["user_ptr"], aux["ease_csr"]["item_idx"]
                )
            return
        if self.state is None:
            if self.trainer is None:
                self.trainer = Trainer(self.model, TrainConfig(seed=self.seed), mesh=self.mesh)
            self.state = self.trainer.init_state(jax.random.PRNGKey(self.seed))
        self.state = restore_checkpoint(directory, self.state)

    @classmethod
    def load(
        cls, directory: str, mesh: Optional[jax.sharding.Mesh] = None
    ) -> "RecSys":
        """Cold restore: rebuild a fully functional ``RecSys`` from a
        checkpoint directory alone — no dataset required. Raw-id ``predict``
        works immediately because the id vocabularies and the metadata table
        are part of the checkpoint (the train/test interaction splits are
        not; call ``fit`` only after feeding data via a fresh constructor).
        """
        from torchrecsys_tpu.data.encoder import IdEncoder
        from torchrecsys_tpu.data.metadata import MetadataTable
        from torchrecsys_tpu.models import build_model
        from torchrecsys_tpu.utils.checkpoint import (
            load_aux,
            load_schema,
            restore_checkpoint,
        )

        aux = load_aux(directory)
        if aux is None:
            raise FileNotFoundError(
                f"{directory} has no aux.pkl — saved by an older version? "
                "Use RecSys(...).restore(directory) with the original dataset."
            )
        schema = load_schema(directory)
        meta = aux["metadata"]
        metadata = MetadataTable(
            meta["ids"],
            meta["mask"],
            tuple(meta["names"]),
            tuple(IdEncoder.from_list(v).freeze() for v in meta["vocabs"]),
        )
        empty = np.zeros((0,), np.int32)
        hist = aux.get("history")
        store = InteractionStore(
            schema=schema,
            user_encoder=IdEncoder.from_list(aux["user_vocab"]).freeze(),
            item_encoder=IdEncoder.from_list(aux["item_vocab"]).freeze(),
            metadata=metadata,
            train_users=empty,
            train_items=empty,
            test_users=empty,
            test_items=empty,
            history_override=(hist["ids"], hist["mask"]) if hist else None,
        )
        self = cls.__new__(cls)
        self.debug = False
        self.path = directory
        self.mesh = mesh
        # original dataset-facing ctor state (absent in pre-round-5
        # checkpoints — fall back to the ctor defaults)
        cols = aux.get("dataset_cols") or {}
        self._user_col = cols.get("user", "user_id")
        self._item_col = cols.get("item", "item_id")
        self._split_ratio = cols.get("split_ratio", 0.8)
        self._n_updates = cols.get("n_updates", 0)
        self.store = store
        self.model_cfg = ModelConfig(**aux["model_cfg"])
        self.dynamic_neg_sampling = bool(
            (aux["train_cfg"] or {}).get("dynamic_neg_sampling", False)
        )
        train_cfg = (
            TrainConfig(**aux["train_cfg"]) if aux["train_cfg"] else TrainConfig()
        )
        self.seed = train_cfg.seed
        if self.model_cfg.net_type == "ease":
            from torchrecsys_tpu.models.ease import EASE

            self.model = None
            self.trainer = None
            self.state = None
            self.ease = EASE(schema.num_users, schema.num_items)
            self.restore(directory)
            return self
        self.ease = None
        self.model = build_model(schema, self.model_cfg)
        self.trainer = Trainer(self.model, train_cfg, mesh=mesh)
        self.state = self.trainer.init_state(jax.random.PRNGKey(self.seed))
        self.state = restore_checkpoint(directory, self.state)
        return self
