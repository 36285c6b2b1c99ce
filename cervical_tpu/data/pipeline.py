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


def host_local_batches(loader: Iterable, mesh, with_weights: bool = False
                       ) -> Iterator:
    """Slice each global batch to this process's portion (multi-host).

    Ragged final batches (eval loaders keep tails) are padded by repeating
    the last row up to a process-divisible size BEFORE slicing — otherwise
    ``global // process_count`` would silently drop the remainder rows on
    every host.

    ``with_weights``: additionally pad up to a (process x data-axis)-
    divisible size and append a (B,) float32 0/1 validity vector marking
    padded rows.  Eval steps thread it through ``sample_weights`` so
    confusion counts and losses are EXACT at any eval-set size (the padded
    rows contribute nothing), and every batch shards cleanly over the mesh.
    """
    import numpy as np

    n_proc = jax.process_count()
    divisor = n_proc * (mesh.shape["data"] if with_weights else 1)
    for batch in loader:
        first = jax.tree_util.tree_leaves(batch)[0]
        n = len(first)
        pad = (-n) % divisor
        weights = np.ones(n + pad, np.float32)
        if pad:
            batch = jax.tree_util.tree_map(
                lambda x: np.concatenate(
                    [x, np.repeat(x[-1:], pad, axis=0)], axis=0), batch)
            weights[n:] = 0.0
            n += pad
        if with_weights:
            batch = tuple(batch) + (weights,)
        if n_proc == 1:
            yield batch
            continue
        sl = local_batch_slice(n, mesh)  # pragma: no cover - multihost only
        yield jax.tree_util.tree_map(lambda x: x[sl], batch)


def device_prefetch(loader: Iterable, mesh, depth: int = 2,
                    with_weights: bool = False, group: int = 1) -> Iterator:
    """Upload batches to the mesh-sharded layout ahead of consumption.

    ``depth`` batches are kept in flight; device_put is asynchronous, so the
    returned arrays are ready (or in transit) when the training loop asks
    for them.  ``with_weights`` appends the validity vector (see
    :func:`host_local_batches`).

    ``group`` > 1 stacks that many consecutive batches host-side into
    (K, B, ...) arrays sharded over 'data' on axis 1, feeding the
    K-steps-per-program scan (``make_train_step_scan`` — amortizes the
    platform's fixed per-program cost).  A ragged tail of fewer than
    ``group`` batches is yielded as plain (B, ...) single-step batches
    (distinguish by ``ndim``).
    """
    import numpy as np

    q: queue.Queue = queue.Queue(maxsize=depth)
    _SENTINEL = object()
    err: list = []

    def put_group(pending):
        if len(pending) == group:
            stacked = jax.tree_util.tree_map(
                lambda *xs: np.stack(xs, axis=0), *pending)
            q.put(shard_batch(mesh, stacked, batch_axis=1))
        else:  # ragged tail: single-step batches
            for b in pending:
                q.put(shard_batch(mesh, b))

    def producer():
        try:
            pending = []
            for batch in host_local_batches(loader, mesh, with_weights):
                if group <= 1:
                    q.put(shard_batch(mesh, batch))
                    continue
                pending.append(batch)
                if len(pending) == group:
                    put_group(pending)
                    pending = []
            if pending:
                put_group(pending)
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
