"""Multi-host (multi-controller) entry points.

The reference is strictly single-process (SURVEY §2.10: no
torch.distributed, no multiprocessing anywhere); multi-host is a new
capability with no reference counterpart. JAX's model is multi-controller:
one Python process per host, each seeing only its local devices, with every
process executing the same program. After :func:`init_distributed`,
``jax.devices()`` returns the GLOBAL device list, ``make_mesh`` builds the
same global ('data', 'model') mesh in every process, and the jitted train
step is unchanged — XLA routes collectives over ICI within a slice and DCN
across slices.

Launch recipe (one line per host; also in README.md):

    # host 0                                          # host 1
    python train.py \\                                python train.py \\
      --coordinator=host0:8476 \\                       --coordinator=host0:8476 \\
      --num-processes=2 --process-id=0                  --num-processes=2 --process-id=1

where train.py starts with::

    from torchrecsys_tpu.parallel import init_distributed, make_mesh
    init_distributed(args.coordinator, args.num_processes, args.process_id)
    mesh = make_mesh()   # global mesh over all hosts' devices

Data feeding: in a multi-process mesh a host can only populate its
*addressable* shards, so ``jax.device_put(host_array, sharding)`` no longer
works for 'data'-sharded batches. :func:`make_global_array` assembles the
global array from per-host data — used automatically by the streaming input
pipeline (train/streaming.py) via :func:`put_sharded`.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np

from torchrecsys_tpu.utils.logging import get_logger

log = get_logger("torchrecsys_tpu.distributed")


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Initialize multi-controller JAX (SURVEY §2.10 row 1 / §5.8).

    Thin, logged wrapper over ``jax.distributed.initialize``: on TPU pods
    all arguments are usually auto-detected from the environment and every
    argument may be None; on other platforms pass
    ``coordinator_address="host0:port"``, ``num_processes`` and this host's
    ``process_id``. Must run before any other JAX call in the process.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    log.info(
        "distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )


def process_row_range(n_rows: int, dim0_shards: int) -> tuple:
    """The [start, stop) block of dim 0 owned by THIS process when ``n_rows``
    rows are split over ``dim0_shards`` shards laid out in process order.

    Pure assembly arithmetic (unit-testable without a cluster): shards are
    assigned to processes contiguously, so a process owns
    ``shards_per_proc = dim0_shards // process_count`` consecutive shards.
    """
    pc = jax.process_count()
    pid = jax.process_index()
    if dim0_shards % pc:
        raise ValueError(
            f"dim-0 shard count {dim0_shards} not divisible by "
            f"{pc} processes"
        )
    if n_rows % dim0_shards:
        # fail here, where the cause is nameable — otherwise the orphaned
        # n_rows % dim0_shards rows surface later as an opaque shape
        # mismatch inside make_array_from_process_local_data (ADVICE r4)
        raise ValueError(
            f"n_rows {n_rows} not divisible by dim-0 shard count "
            f"{dim0_shards}; pad the array to a multiple first"
        )
    rows_per_shard = n_rows // dim0_shards
    shards_per_proc = dim0_shards // pc
    start = pid * shards_per_proc * rows_per_shard
    stop = start + shards_per_proc * rows_per_shard
    return start, stop


def make_global_array(
    host_data: np.ndarray,
    sharding: jax.sharding.Sharding,
    global_shape: Optional[tuple] = None,
) -> jax.Array:
    """Assemble a globally-sharded ``jax.Array`` in a multi-process mesh.

    Two feeding modes, selected by shape:

    - **full** (``host_data.shape == global_shape``): every host holds the
      identical full array (the common recsys case — the interaction split
      fits host RAM); each host materializes only its addressable shards
      (``jax.make_array_from_callback`` slices them out, so no host ever
      copies remote shards to a device).
    - **local rows** (``host_data`` is this process's dim-0 block, see
      :func:`process_row_range`): assembled with
      ``jax.make_array_from_process_local_data`` — the per-host feeding path
      for datasets too large to replicate per host.

    Works identically (and is tested) in a single-process mesh, where both
    modes degenerate to ``device_put``.
    """
    if global_shape is None or tuple(host_data.shape) == tuple(global_shape):
        data = np.asarray(host_data)
        return jax.make_array_from_callback(
            data.shape, sharding, lambda idx: data[idx]
        )
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(host_data), global_shape
    )


def put_sharded(
    arrays: Dict[str, np.ndarray], sharding: jax.sharding.Sharding
) -> Dict[str, jax.Array]:
    """Place a dict of host arrays onto the mesh with ``sharding``.

    Single-process: plain async ``device_put`` (the H2D overlap path the
    streaming pipeline relies on). Multi-process: every process passes the
    full arrays and only its addressable shards are materialized
    (:func:`make_global_array` full mode).
    """
    if jax.process_count() > 1:
        return {k: make_global_array(v, sharding) for k, v in arrays.items()}
    return {k: jax.device_put(v, sharding) for k, v in arrays.items()}
