from torchrecsys_tpu.parallel.mesh import make_mesh
from torchrecsys_tpu.parallel.sharding import (
    batch_sharding,
    shard_state,
    state_shardings,
    table_sharding,
)

__all__ = [
    "make_mesh",
    "shard_state",
    "state_shardings",
    "table_sharding",
    "batch_sharding",
]
