"""torchrecsys_tpu — a TPU-native collaborative-filtering engine.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
FrancescoI/torchrecsys (reference: /root/reference):

- pandas -> device-resident data plane with explicit ID encoding,
  deterministic splits, fixed-width multi-hot metadata, and vectorized
  (static or in-step dynamic) negative sampling
  (reference: torchrecsys/dataset/dataset.py).
- Model zoo as pure functions over parameter pytrees: Linear (LightFM-style),
  two-tower MLP, Factorization Machine, plus EASE and NeuCF
  (reference: torchrecsys/collaborative/*.py).
- Single fused, jitted train step: sample -> gather -> score -> hinge loss ->
  sparse (gather/scatter) embedding updates + dense optax updates
  (reference train loop: torchrecsys/model.py:203-289).
- Pairwise AUC / hit-rate / recall@k evaluation and chunked full-catalog
  top-k prediction (reference: torchrecsys/model.py:292-452,
  torchrecsys/evaluate/metrics.py).
- SPMD scaling over a (data, model) jax.sharding.Mesh with row-sharded
  embedding tables — a capability the reference does not have.
"""

__version__ = "0.1.0"

from torchrecsys_tpu.api import RecSys

__all__ = ["RecSys", "__version__"]
