from kosmosx_tpu.parallel.mesh import make_mesh, initialize_distributed
from kosmosx_tpu.parallel.pipeline import (make_pipeline_train_step,
                                           make_pp_mesh,
                                           pipeline_state_specs)
from kosmosx_tpu.parallel.ring_attention import ring_flash_attention
from kosmosx_tpu.parallel.seq_parallel import (make_seq_parallel_train_step,
                                               make_sp_mesh, shift_labels)
from kosmosx_tpu.parallel.sharding import (
    batch_spec,
    param_specs,
    shard_params,
    shard_batch,
)

__all__ = [
    "make_mesh", "initialize_distributed",
    "batch_spec", "param_specs", "shard_params", "shard_batch",
    "ring_flash_attention",
    "make_seq_parallel_train_step", "make_sp_mesh", "shift_labels",
    "make_pipeline_train_step", "make_pp_mesh", "pipeline_state_specs",
]
