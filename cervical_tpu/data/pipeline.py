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
    """Slice each global batch to this process's portion (multi-host).

    Ragged final batches (eval loaders keep tails) are padded by repeating
    the last row up to a process-divisible size BEFORE slicing — otherwise
    ``global // process_count`` would silently drop the remainder rows on
    every host.  Callers that must not double-count (metrics) see the
    padded rows only on multi-host runs; the seg eval path is robust to
    them because padded label rows repeat real ones and the trainer's
    on-device confusion is normalized per pixel — for exact multihost
    metrics, size eval sets divisibly.
    """
    import numpy as np

    n_proc = jax.process_count()
    for batch in loader:
        if n_proc == 1:
            yield batch
            continue
        first = jax.tree_util.tree_leaves(batch)[0]
        n = len(first)
        pad = (-n) % n_proc
        if pad:  # pragma: no cover - multihost only
            batch = jax.tree_util.tree_map(
                lambda x: np.concatenate(
                    [x, np.repeat(x[-1:], pad, axis=0)], axis=0), batch)
            n += pad
        sl = local_batch_slice(n, mesh)
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
