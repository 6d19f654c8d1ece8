"""Device-mesh parallelism: DP sharding, distributed init."""

from dtqn_tpu.parallel.mesh import (
    make_distributed_train_chunk,
    make_mesh,
    shard_state,
    state_shardings,
)
from dtqn_tpu.parallel.distributed import init_distributed, process_info

__all__ = [
    "make_mesh",
    "shard_state",
    "state_shardings",
    "make_distributed_train_chunk",
    "init_distributed",
    "process_info",
]
