"""Device-feeding input pipeline: multi-host sharding + double-buffered
transfers.

Replaces the reference's ``DataLoader(pin_memory=True)`` + per-rank
``DistributedSampler`` (train.py:496-512) with a TPU-idiomatic pipeline: the
host loader yields numpy batches, this module slices each host's portion of
the global batch, uploads it asynchronously to the sharded layout, and keeps
one batch in flight so the device never waits on PCIe.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

import jax

from cervical_tpu.parallel import local_batch_slice, shard_batch


def host_local_batches(loader: Iterable, mesh) -> Iterator:
    """Slice each global batch to this process's portion (multi-host)."""
    n_proc = jax.process_count()
    for batch in loader:
        if n_proc == 1:
            yield batch
            continue
        first = jax.tree_util.tree_leaves(batch)[0]
        sl = local_batch_slice(len(first), mesh)
        yield jax.tree_util.tree_map(lambda x: x[sl], batch)


def device_prefetch(loader: Iterable, mesh, depth: int = 2) -> Iterator:
    """Upload batches to the mesh-sharded layout ahead of consumption.

    ``depth`` batches are kept in flight; device_put is asynchronous, so the
    returned arrays are ready (or in transit) when the training loop asks
    for them.
    """
    q: queue.Queue = queue.Queue(maxsize=depth)
    _SENTINEL = object()
    err: list = []

    def producer():
        try:
            for batch in host_local_batches(loader, mesh):
                q.put(shard_batch(mesh, batch))
        except Exception as e:  # pragma: no cover
            err.append(e)
        finally:
            q.put(_SENTINEL)

    threading.Thread(target=producer, daemon=True).start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
