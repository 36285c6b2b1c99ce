"""Device-mesh and sharding helpers (ICI data parallelism replaces DDP/NCCL)."""

from cervical_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, data_sharding, replicated_sharding, shard_batch,
    initialize_multihost, local_batch_slice, barrier, initialize_from_cli,
    is_primary,
)
from cervical_tpu.parallel.tp import (  # noqa: F401
    fusion_param_specs, place_params,
)
from cervical_tpu.parallel.pipeline import (  # noqa: F401
    pipeline_apply, stack_block_params, middle_flow_pipeline,
)
