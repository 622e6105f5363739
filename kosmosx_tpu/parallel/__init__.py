from kosmosx_tpu.parallel.mesh import make_mesh, initialize_distributed
from kosmosx_tpu.parallel.sharding import (
    batch_spec,
    param_specs,
    shard_params,
    shard_batch,
)

__all__ = [
    "make_mesh", "initialize_distributed",
    "batch_spec", "param_specs", "shard_params", "shard_batch",
]
