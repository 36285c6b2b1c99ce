"""Mesh construction and sharding helpers.

TPU-native replacement for the reference's distributed stack (SURVEY.md §5.8):

| reference (torch)                       | here (jax)                        |
|-----------------------------------------|-----------------------------------|
| ``dist.init_process_group('nccl')``     | ``jax.distributed.initialize``    |
| DDP gradient buckets / allreduce        | batch sharded over the ``data``   |
|                                         | mesh axis; XLA inserts the grad   |
|                                         | psum over ICI under ``jit``       |
| ``DistributedSampler`` per-rank split   | :func:`local_batch_slice` +       |
|                                         | ``jax.make_array_from_process_local_data`` |
| SyncBatchNorm CUDA kernel               | batch stats are computed on the   |
|                                         | globally-sharded batch under jit — |
|                                         | cross-replica by construction     |
| ``dist.barrier()``                      | ``multihost_utils.sync_global_devices`` |

The mesh also carries a ``model`` axis for tensor-parallel layouts.  The
reference's models are small (DeepLab ~54M params), so the shipped configs
keep ``model=1`` and scale on ``data``; the plumbing accepts any (data,
model) factorization for larger deployments.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None):
    """Multi-host init (no-op single-process). Mirrors train.py:288-294."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)


def initialize_from_cli(argv):
    """Consume multihost launch flags from a CLI argv (the reference's
    ``dist.init_process_group`` + RANK/LOCAL_RANK env dance,
    train.py:288-294) and initialize jax.distributed BEFORE any backend
    use.  Returns the remaining argv.

    ``--multihost true``                       TPU-pod auto-detection
    ``--coordinator host:port --num_processes N --process_id I``
                                               explicit (CPU/GPU clusters;
                                               see tests/_multihost_worker.py)
    """
    argv = list(argv)

    def pop(flag):
        for i, a in enumerate(argv):
            if a == flag:
                if i + 1 >= len(argv):
                    raise SystemExit(f"{flag} requires a value")
                v = argv[i + 1]
                del argv[i:i + 2]
                return v
            if a.startswith(flag + "="):  # --flag=value form
                del argv[i]
                return a[len(flag) + 1:]
        return None

    coord = pop("--coordinator")
    nproc = pop("--num_processes")
    pid = pop("--process_id")
    auto = pop("--multihost")
    if auto and auto.lower() in ("1", "true", "yes"):
        jax.distributed.initialize()  # pragma: no cover - real pods only
    elif coord or nproc is not None or pid is not None:
        if not (coord and nproc is not None and pid is not None):
            raise SystemExit(
                "explicit multihost launch needs ALL of --coordinator "
                "host:port, --num_processes N and --process_id I "
                "(got coordinator={}, num_processes={}, process_id={})"
                .format(coord, nproc, pid))
        initialize_multihost(coord, int(nproc), int(pid))
    return argv


def is_primary() -> bool:
    """True on the process that owns file outputs (rank-0 guard — the
    reference wraps LossHistory/checkpoints in ``local_rank == 0``,
    train.py:353-359; utils_fit.py:185-198)."""
    return jax.process_index() == 0


def make_mesh(num_devices: Optional[int] = None, model_parallel: int = 1,
              devices=None) -> Mesh:
    """('data', 'model') mesh over the first ``num_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, batch_axis: int = 0):
    """Place a pytree of host arrays so ``batch_axis`` is sharded over
    'data' (axes before it are replicated — e.g. the K axis of stacked
    multi-step batches).

    Single-process: each array is the full global batch.  Multi-process:
    each process passes its LOCAL slice (from :func:`local_batch_slice` /
    ``host_local_batches``) and the result is a global ``jax.Array``
    assembled via ``jax.make_array_from_process_local_data`` — the
    DistributedSampler-equivalent contract (train.py:496-499), exercised
    for real by the two-process SPMD test (tests/test_multihost.py).

    Arrays whose batch dim doesn't divide this process's share of the
    data axis (ragged final eval batches) are replicated instead —
    correctness over placement.
    """
    n_data = mesh.shape["data"]
    n_proc = jax.process_count()
    local_div = n_data // n_proc  # data-axis devices owned by this process

    def put(x):
        x = np.asarray(x)
        ok = (x.ndim > batch_axis and local_div > 0
              and x.shape[batch_axis] % local_div == 0)
        if n_proc == 1:
            if ok:
                spec = [None] * x.ndim
                spec[batch_axis] = "data"
                return jax.device_put(x, NamedSharding(mesh, P(*spec)))
            return jax.device_put(x, replicated_sharding(mesh))
        if ok:  # pragma: no cover - multihost (tests/test_multihost.py)
            spec = [None] * x.ndim
            spec[batch_axis] = "data"
            gshape = list(x.shape)
            gshape[batch_axis] *= n_proc
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, P(*spec)), x, tuple(gshape))
        # Multi-process arrays that can't shard must NOT be silently
        # treated as replicated: each process holds a *different* local
        # slice, and a fake 'replicated' global array would make hosts
        # silently diverge (no collective gets inserted).  Size batches
        # divisibly, or use host_local_batches(with_weights=True), which
        # pads every batch to a (process x data-axis)-divisible size.
        raise ValueError(  # pragma: no cover - multihost misuse
            f"multi-process shard_batch: local batch dim "
            f"{x.shape[batch_axis] if x.ndim > batch_axis else None} is not "
            f"divisible by this process's {local_div} data-axis devices; "
            "pad via host_local_batches(with_weights=True) or size the "
            "global batch divisibly")
    return jax.tree_util.tree_map(put, batch)


def local_batch_slice(global_batch: int, mesh: Mesh) -> slice:
    """This process's slice of the global batch (DistributedSampler
    equivalent, train.py:496-499)."""
    n_proc = jax.process_count()
    per = global_batch // n_proc
    pid = jax.process_index()
    return slice(pid * per, (pid + 1) * per)


def barrier(name: str = "barrier"):
    """Cross-host sync (dist.barrier, train.py:308,581)."""
    if jax.process_count() > 1:  # pragma: no cover - multihost only
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)
