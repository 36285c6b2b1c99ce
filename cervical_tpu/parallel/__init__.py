"""Device-mesh and sharding helpers (ICI data parallelism replaces DDP/NCCL)."""

from cervical_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, data_sharding, replicated_sharding, shard_batch,
    initialize_multihost, local_batch_slice, barrier, initialize_from_cli,
    is_primary,
)
