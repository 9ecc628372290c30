"""Configuration dataclasses for the framework.

The reference keeps a loose dict ``{num_users, num_items, num_metadata}``
(reference: torchrecsys/dataset/dataset.py:199-203) and passes everything else
as constructor kwargs (torchrecsys/model.py:64-76). Here the schema is explicit
and serializable.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, List, Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class DataSchema:
    """Static shape/vocab information about a dataset.

    Unlike the reference — which uses raw column values directly as embedding
    rows and silently assumes they are contiguous 0..N-1 ints
    (torchrecsys/dataset/dataset.py:30-31) — vocabularies here are explicit:
    ``num_users``/``num_items`` are encoded-vocab sizes and every id has been
    mapped through an :class:`~torchrecsys_tpu.data.encoder.IdEncoder`.

    ``metadata_vocab_sizes`` holds one vocab size per metadata feature
    (reference analog: ``num_metadata``, dataset.py:199-203, which conflates
    all features into one number). ``metadata_width`` is the fixed multi-hot
    bucket width shared by all features; entries beyond a row's true length
    are masked out (replacing the reference's ragged ``pad_sequence`` with
    colliding pad id 0, dataset.py:283).
    """

    num_users: int
    num_items: int
    metadata_names: Tuple[str, ...] = ()
    metadata_vocab_sizes: Tuple[int, ...] = ()
    metadata_width: int = 0

    @property
    def num_metadata_features(self) -> int:
        return len(self.metadata_names)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "DataSchema":
        d = dict(d)
        for k in ("metadata_names", "metadata_vocab_sizes"):
            if k in d:
                d[k] = tuple(d[k])
        return cls(**d)

    def to_json(self) -> str:
        return json.dumps(self.to_dict())


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Model hyperparameters.

    Mirrors the reference's knobs: ``n_factors`` (model.py:67),
    ``hidden_layers``/``use_batch_norm`` for the MLP (mlp.py:57,75) — which the
    reference accepts but never actually forwards from its facade
    (model.py:144-149; fixed here) — and the FM's output sigmoid
    (fm.py:99), kept behind a flag for score parity.
    """

    # linear | mlp | fm | neucf | lstm (models/__init__.py registry), plus
    # "ease" via the facade's closed-form branch (api.py) or
    # torchrecsys_tpu.models.EASE directly
    net_type: str = "linear"
    n_factors: int = 80
    hidden_layers: Tuple[int, ...] = (1024, 128)
    use_batch_norm: bool = True
    fm_sigmoid: bool = True
    # NeuCF: GMF+MLP dual towers (reference neu.py is broken/unreachable;
    # rebuilt working here).
    neucf_hidden_layers: Tuple[int, ...] = (64, 32)
    # Sequence models (lstm / sasrec): length of the per-user history
    # window (reference's sequence/ package is an empty stub — SURVEY §2.8)
    history_len: int = 20
    # SASRec encoder shape (models/sasrec.py): number of attention blocks
    # and heads; n_factors must divide sasrec_heads
    sasrec_blocks: int = 2
    sasrec_heads: int = 2
    param_dtype: str = "float32"
    compute_dtype: str = "float32"  # set "bfloat16" for MXU-friendly compute
    # Run the MLP tower's training forward/backward through the fused Pallas
    # layer kernels (ops/fused_tower.py): matmul with the next layer's BN
    # batch statistics accumulated in the epilogue, and all BN backward
    # reductions fused into the recompute pass. Applies when compute is
    # bfloat16, batch-norm is on, and the paired row count divides the tile.
    #
    # Default False: measured on TPU v5e at the north-star shapes the kernels
    # TIE the XLA tower in isolation (318 vs 317 us fwd+bwd) but LOSE
    # ~125 us/step inside the full train step — the opaque custom_vjp blocks
    # XLA's cross-op fusion with the surrounding gathers/scatters/loss
    # (benchmarks/PROFILE.md). Kept as an option (True enables; interpret
    # mode off-TPU) for parity tests and future shapes where the tradeoff
    # flips (deeper towers, wider layers). Single-device only: under a mesh
    # with data-axis size > 1 the Trainer refuses it (the opaque kernel
    # would defeat the sharded-batch path). Only the True/False singletons
    # are accepted (validated below): truthy strings like "false" would
    # silently enable it.
    pallas_tower: Any = False

    def __post_init__(self) -> None:
        if not isinstance(self.pallas_tower, bool):
            raise ValueError(
                "ModelConfig.pallas_tower must be True or False; "
                f"got {self.pallas_tower!r}"
            )


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-loop hyperparameters.

    The reference exposes optimizer objects directly (model.py:203); here the
    dense tower uses optax by name and embedding tables get sparse
    (gather/scatter) row-wise updates — see torchrecsys_tpu/train/optim.py.
    """

    batch_size: int = 1024
    epochs: int = 1
    learning_rate: float = 1e-2
    # Optional lr schedule evaluated at the global step counter, applied to
    # BOTH the dense optax optimizer and the sparse embedding updates
    # (including inside the fused Pallas step, where lr rides an SMEM scalar
    # so no retrace happens per value). None = constant learning_rate.
    # Dict specs are checkpoint-serializable — see train/optim.py:
    # make_lr_schedule; a bare callable (e.g. an optax schedule) also works.
    lr_schedule: Any = None
    dense_optimizer: str = "adam"
    embedding_optimizer: str = "rowwise_adagrad"  # rowwise_adagrad | sgd
    dynamic_neg_sampling: bool = False
    avoid_collisions: bool = True  # guarantee neg != pos (dataset.py:440-445)
    margin: float = 1.0  # hinge margin (loss.py:7)
    # hinge | bpr | logistic | adaptive_hinge | warp | sampled_softmax.
    # "sampled_softmax" trains with IN-BATCH negatives: the (B, B) logit
    # matrix is one MXU matmul over the batch's factorized user/item
    # vectors (RecModel.pair_vectors) — every other row's positive serves
    # as a negative at zero extra gather cost; logQ-corrected
    # (`logq_correction`), accidental duplicates masked. Factorizable
    # models only (linear, fm with fm_sigmoid=False, lstm, sasrec).
    loss: str = "hinge"
    # Subtract log q(item) from sampled_softmax logits, q = the item's
    # train-split frequency (the in-batch negative distribution), so the
    # learned scores estimate the popularity-debiased conditional — the
    # standard correction (Bengio & Senecal 2008; YouTube retrieval).
    logq_correction: bool = True
    # Run the sampled_softmax CE as the fused flash-style Pallas kernel
    # (ops/softmax_ce.py: row-tiled matmul + mask + logsumexp in VMEM,
    # B^2 logits never reach HBM) when applicable (single device,
    # n_factors <= 128, batch divisible by the row tile). Same tri-state
    # as pallas_step: "auto" = on real TPUs only, True = force (interpret
    # off-TPU, for parity tests), False = always the XLA formulation.
    pallas_softmax: Any = "auto"
    # Negatives sampled per positive, drawn IN-STEP (K > 1 ignores any
    # stored static negatives — there is no stored K-column). The one-
    # negative losses average over the K draws; ``adaptive_hinge`` takes the
    # max-scoring draw and ``warp`` rank-weights the first violating draw
    # (train/losses.py). K > 1 multiplies the item-side gather/score work by
    # (1+K)/2 and takes the XLA step (the fused Pallas kernel is 1-negative).
    num_negatives: int = 1
    # "uniform" (reference contract, dataset.py:56-64/440-445) or
    # "popularity": p(i) ∝ train-count(i)^popularity_alpha, sampled in-step
    # by inverse-CDF searchsorted (data/sampling.py). Non-uniform sampling
    # is always in-step (stored static negatives are uniform draws).
    neg_sampling: str = "uniform"
    popularity_alpha: float = 0.75
    seed: int = 0
    # False (default) = remainder rows train in a mask-padded final batch
    # (matching the reference's short final batch, dataset.py:414-433, while
    # keeping every batch shape static for XLA). True = truncate the epoch to
    # full batches.
    drop_remainder: bool = False
    profile_epochs: int = 0  # jax.profiler trace for first N epochs
    # Epoch-internal "augmented table" layout for rowwise_adagrad: the per-row
    # accumulator is carried as an extra trailing column of each (f32) table so
    # it rides the existing row gather/scatter instead of 1D scalar
    # scatter/gather ops (which are ~60x slower per element on TPU; an
    # (R, 80) f32 table is physically tiled T(8,128), so the extra column is
    # free HBM bandwidth). Within-batch duplicate rows then scale by
    # acc_old + own msq rather than the post-all-duplicates accumulator; the
    # accumulator contents themselves stay exact. See train/optim.py.
    fused_embedding_update: bool = True
    # Run the whole train step (score -> loss -> backward -> adagrad math) as
    # ONE Pallas kernel over packed (rows, 128) tables when the model/config
    # supports it (Linear/FM without metadata, rowwise_adagrad, f32 params
    # AND f32 compute) — see ops/fused_pairwise.py. Under a mesh the batch
    # shards over 'data'; a sharded 'model' axis keeps tables row-sharded
    # too (gather+psum in, masked local scatter out — fused_pairwise_step_tp).
    #   "auto"  (default): kernel on TPU, XLA step on other backends —
    #           Pallas interpret mode exists for parity testing, not speed.
    #   True:   force the kernel wherever applicable (interpret off-TPU).
    #   False:  always the XLA step.
    pallas_step: Any = "auto"
    # Sort each batch's rows by user id at epoch-build time. Row order within
    # a batch is semantically irrelevant (the loss mean, batch-norm statistics
    # and gradient sums are permutation-invariant), but sorted user ids let
    # the user-table scatter-add run with XLA's merge lowering
    # (indices_are_sorted=True): measured 443us -> 128us for an 8192-row
    # scatter into a (100K, 128) f32 table on TPU v5e. Costs one in-batch
    # argsort + take_along_axis per epoch (~2-3 ms per 10M rows).
    sort_batch_by_user: bool = True
