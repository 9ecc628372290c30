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
    ) -> None:
        del use_cuda
        self.debug = debug
        self.path = path
        self.seed = seed
        self.mesh = mesh
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
        )
        self.model = build_model(self.store.schema, self.model_cfg)
        self.dynamic_neg_sampling = dynamic_neg_sampling
        self.trainer: Optional[Trainer] = None
        self.state = None

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
        verbose: bool = True,
    ) -> List[float]:
        """Train; returns per-epoch mean losses.

        Reference: TorchRecSys.fit(optimizer, epochs, batch_size,
        profile_epochs) (model.py:203-289). The optimizer is named, not a
        torch object; embedding tables always receive sparse row-wise
        updates (see train/optim.py) so any named optimizer works — unlike
        the reference, where the README's Adam crashes on sparse grads
        (SURVEY §2.9 #2).
        """
        train_cfg = TrainConfig(
            batch_size=batch_size,
            epochs=epochs,
            learning_rate=learning_rate,
            dense_optimizer=optimizer,
            embedding_optimizer=embedding_optimizer,
            dynamic_neg_sampling=self.dynamic_neg_sampling,
            loss=loss,
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
        """Test-split pairwise loss / AUC (reference model.py:292-338)."""
        assert self.state is not None, "call fit() first"
        out = self.trainer.evaluate(
            self.state, self.store, batch_size=batch_size, verbose=verbose
        )
        if out and eval_metrics:
            wanted = set(eval_metrics)
            if "auc" not in wanted:
                wanted.add("loss")
            out = {k: v for k, v in out.items() if k in wanted or k in ("loss", "auc")}
        return out

    # ------------------------------------------------------------------
    def predict(
        self,
        user_id: Union[Any, Sequence[Any]],
        top_k: int = 10,
        prediction_batch_size: int = 4096,
        return_raw_ids: bool = True,
    ) -> np.ndarray:
        """Full-catalog top-k for one user or a batch of users.

        Reference: model.py:341-452 (single user, pandas per chunk, full
        sort). Here: any number of users, device-side chunked score +
        running top-k merge, raw-id decoding on the way out.

        Returns (top_k,) for a scalar user or (U, top_k) for a sequence.
        """
        assert self.state is not None, "call fit() first"
        scalar = not isinstance(user_id, (list, tuple, np.ndarray))
        users_raw = [user_id] if scalar else list(user_id)
        rows = np.asarray(
            [self.store.user_encoder.encode_one(u) for u in users_raw], np.int32
        )
        feat = self.trainer.feature_tables(self.store)
        params = {"tables": self.state["tables"], "dense": self.state["dense"]}
        _, ids = catalog_topk(
            self.model,
            params,
            self.state["model_state"],
            jnp.asarray(rows),
            self.store.schema.num_items,
            feat,
            top_k=top_k,
            chunk_size=prediction_batch_size,
        )
        ids = np.asarray(ids)
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
    def save(self, directory: str) -> None:
        from torchrecsys_tpu.utils.checkpoint import save_checkpoint

        assert self.state is not None, "nothing to save; call fit() first"
        save_checkpoint(directory, self.state, self.store.schema)

    def restore(self, directory: str) -> None:
        from torchrecsys_tpu.utils.checkpoint import restore_checkpoint

        if self.state is None:
            if self.trainer is None:
                self.trainer = Trainer(self.model, TrainConfig(seed=self.seed), mesh=self.mesh)
            self.state = self.trainer.init_state(jax.random.PRNGKey(self.seed))
        self.state = restore_checkpoint(directory, self.state)
