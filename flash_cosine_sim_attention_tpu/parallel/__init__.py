from .distributed import (
    initialize_distributed,
    local_batch_to_global,
    make_multihost_mesh,
    process_local_rows,
    run_multiprocess_cpu_dryrun,
)
from .mesh import DATA_AXIS, MODEL_AXIS, make_mesh, sharding
from .pipeline import (
    make_pipeline_loss_fn,
    make_pipeline_mesh,
    make_pipeline_train_step,
    merge_pipeline_params,
    shard_pipeline_params,
    split_pipeline_params,
)
from .ring_attention import ring_flash_cosine_sim_attention
from .sharded_attention import head_sharded_flash_attention
from .sharded_decode import (
    cache_shardings,
    head_sharded_decode_attention,
    shard_cache,
)
from .train import (
    make_sharded_train_step,
    param_shardings,
    shard_opt_state,
    shard_params,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "initialize_distributed",
    "local_batch_to_global",
    "make_multihost_mesh",
    "process_local_rows",
    "run_multiprocess_cpu_dryrun",
    "cache_shardings",
    "make_mesh",
    "sharding",
    "head_sharded_flash_attention",
    "head_sharded_decode_attention",
    "ring_flash_cosine_sim_attention",
    "make_pipeline_loss_fn",
    "make_pipeline_mesh",
    "make_pipeline_train_step",
    "make_sharded_train_step",
    "merge_pipeline_params",
    "param_shardings",
    "shard_cache",
    "shard_opt_state",
    "shard_params",
    "shard_pipeline_params",
    "split_pipeline_params",
]
