"""Device mesh construction.

The reference has no distributed layer at all — its entire device story is
``tensor.cuda()`` (torchrecsys/helper/cuda.py:3-8; SURVEY §2.10). The
TPU-native replacement is a single ``jax.sharding.Mesh`` with axes
``('data', 'model')``:

- ``data``  — batch dimension (data parallelism; grads/BN stats psum'd by
  XLA across this axis);
- ``model`` — embedding-table row dimension (the analog of tensor
  parallelism for recsys workloads, where the parameters are dominated by
  the user/item tables).

Multi-host: the same mesh spans all processes after
``jax.distributed.initialize``; collectives ride ICI within a slice and DCN
across slices without code changes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: Optional[int] = None,
) -> jax.sharding.Mesh:
    """Build a ('data', 'model') mesh.

    Defaults: with ``n`` devices and no explicit split, use ``model = 1`` and
    ``data = n`` when tables are expected to fit per device; callers with
    large tables pass an explicit ``model`` degree. Both axes always exist so
    PartitionSpecs are mesh-shape-independent.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None and model is None:
        data, model = n, 1
    elif data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    elif model is None:
        if n % data:
            raise ValueError(f"{n} devices not divisible by data={data}")
        model = n // data
    if data * model != n:
        raise ValueError(f"data*model = {data}*{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return jax.sharding.Mesh(arr, ("data", "model"))
