from .mesh import (
    data_sharding,
    get_mesh,
    get_world_size,
    is_local_rank_0,
    make_mesh,
    maybe_initialize_distributed,
    mesh_context,
    replicated_sharding,
    set_mesh,
    shard_batch,
    shard_params_fsdp,
)
from .pp import pipeline_apply, stack_module_states
