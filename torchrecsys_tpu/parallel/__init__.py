from torchrecsys_tpu.parallel.distributed import (
    init_distributed,
    make_global_array,
    put_sharded,
)
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
    "init_distributed",
    "make_global_array",
    "put_sharded",
]
