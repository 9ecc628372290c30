"""Host -> HBM double-buffered streaming input pipeline.

The reference materializes the entire training split as in-memory tensors
(torchrecsys/dataset/dataset.py:251-305) — its ceiling is host RAM and it
still pays per-batch host slicing. The default Trainer path here keeps the
whole split device-resident (best when it fits in HBM). This module covers
the other regime — datasets larger than HBM (BASELINE.json stretch config:
1B interactions):

- the split is cut into equal-size **super-batches** (host numpy views);
- super-batch k+1's host->device transfer (``jax.device_put``, asynchronous)
  is issued while the TPU is still scanning super-batch k — transfer and
  compute overlap, the device never waits on PCIe/DCN unless the pipeline is
  transfer-bound;
- each super-batch runs through the same fused epoch scan (device-side
  shuffle within the super-batch), and super-batch order is reshuffled per
  epoch — standard two-level shuffle.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Tuple

import jax
import numpy as np

from torchrecsys_tpu.utils.logging import get_logger

log = get_logger("torchrecsys_tpu.streaming")


class SuperBatchStream:
    """Iterator over equal-size device-resident super-batches with one-ahead
    prefetch. ``sharding`` (e.g. batch_sharding(mesh)) places each transfer
    directly onto the mesh."""

    def __init__(
        self,
        arrays: Dict[str, np.ndarray],
        superbatch_size: int,
        seed: int = 0,
        sharding: Optional[jax.sharding.Sharding] = None,
    ) -> None:
        self.n = next(iter(arrays.values())).shape[0]
        if not all(v.shape[0] == self.n for v in arrays.values()):
            raise ValueError("array lengths differ")
        self.sb = min(superbatch_size, self.n)
        # Chunk boundaries are FIXED (chunk i = rows [i*sb, min((i+1)*sb, n)))
        # so the trailing partial chunk trains too — every row exactly once
        # per epoch, like the resident path's mask-padded remainder batch
        # (train/trainer.py). Only chunk ORDER is reshuffled per epoch;
        # within-chunk randomness comes from the device-side shuffle inside
        # the epoch scan. At most two program shapes compile: sb and n % sb.
        self.num_super = -(-self.n // self.sb)
        self.arrays = arrays
        self.rng = np.random.default_rng(seed)
        self.sharding = sharding

    def _put(self, chunk_idx: int) -> Dict[str, jax.Array]:
        start = chunk_idx * self.sb
        stop = min(start + self.sb, self.n)
        chunk = {k: v[start:stop] for k, v in self.arrays.items()}
        # device_put with a 'data'-sharded layout requires the chunk length
        # to divide the data axis; the trailing partial chunk (and tiny
        # datasets) may not — place those REPLICATED on the same mesh and
        # let GSPMD reshard inside the epoch program (a correctness-neutral
        # perf fallback on at most one chunk per epoch). The replicated
        # placement must still go through put_sharded: a bare device_put
        # produces process-local arrays that a global jitted epoch cannot
        # consume on a multi-process mesh (ADVICE r4 medium).
        sharding = self.sharding
        if sharding is not None and (stop - start) % self._dim0_shards(sharding):
            from jax.sharding import NamedSharding, PartitionSpec

            sharding = NamedSharding(sharding.mesh, PartitionSpec())
        if sharding is not None:
            # multi-process meshes route through make_global_array (each
            # host materializes only its addressable shards); single-process
            # stays the async device_put overlap path
            from torchrecsys_tpu.parallel.distributed import put_sharded

            return put_sharded(chunk, sharding)
        return {k: jax.device_put(v) for k, v in chunk.items()}

    @staticmethod
    def _dim0_shards(sharding: jax.sharding.Sharding) -> int:
        """Number of shards along dim 0 (1 for replicated/unsharded)."""
        spec = getattr(sharding, "spec", None)
        if not spec or spec[0] is None:
            return 1
        names = spec[0] if isinstance(spec[0], tuple) else (spec[0],)
        out = 1
        for nm in names:
            out *= int(sharding.mesh.shape[nm])
        return out

    def epoch(self) -> Iterator[Dict[str, jax.Array]]:
        """Yield all super-batches once, in fresh random order, with the
        next transfer in flight while the caller consumes the current one."""
        order = self.rng.permutation(self.num_super)
        pending = self._put(int(order[0]))
        for i in range(self.num_super):
            current = pending
            if i + 1 < self.num_super:
                pending = self._put(int(order[i + 1]))  # async H2D prefetch
            yield current


def fit_streaming(
    trainer,
    state,
    store,
    superbatch_size: int = 1 << 21,
    epochs: Optional[int] = None,
    seed: int = 0,
    verbose: bool = True,
) -> Tuple[dict, List[float]]:
    """Streaming variant of Trainer.fit for splits that exceed HBM.

    Semantics: per epoch, every super-batch is visited once in random order
    and scanned with the same fused train step (device-side shuffle within
    the super-batch). Loss reported per epoch as the mean over super-batches.
    """
    import time

    epochs = trainer.cfg.epochs if epochs is None else epochs
    feat = trainer.feature_tables(store)
    sharding = None
    if trainer.mesh is not None:
        from torchrecsys_tpu.parallel.sharding import batch_sharding

        sharding = batch_sharding(trainer.mesh)
    arrays = store.train_arrays()
    if trainer._in_step_negs:
        # K-negative / non-uniform configs sample in-step; don't stream a
        # column the step ignores (same rule as Trainer._device_train_data)
        arrays = {k: v for k, v in arrays.items() if k != "neg_item_id"}
    stream = SuperBatchStream(
        arrays, superbatch_size, seed=seed, sharding=sharding
    )
    losses: List[float] = []
    for epoch in range(epochs):
        t0 = time.perf_counter()
        epoch_losses = []
        sizes = []
        for sb in stream.epoch():
            sizes.append(int(next(iter(sb.values())).shape[0]))
            state, loss = trainer._epoch_jit(state, sb, feat)
            epoch_losses.append(loss)
        # size-weighted: the trailing partial chunk reports its share of the
        # epoch, not 1/num_super of it
        mean_loss = float(
            np.average([float(l) for l in epoch_losses], weights=sizes)
        )
        losses.append(mean_loss)
        if verbose:
            log.info(
                "epoch %d: loss=%.5f (%.2fs, %d super-batches)",
                epoch,
                mean_loss,
                time.perf_counter() - t0,
                stream.num_super,
            )
    return state, losses
