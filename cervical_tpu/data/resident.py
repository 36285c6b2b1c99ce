"""Device-resident dataset: the whole train/val set lives in HBM.

The reference feeds every batch host->device through a DataLoader each
step (train.py:496-512); on the target platform host uploads serialize
with compute (docs/PLATFORM.md round-2 epoch row: full ``run_epoch``
measured ~half the pure-compute step rate).  The reference train set is
small for a TPU — 6,720 x 512^2 x 3 uint8 ≈ 5.3 GB against 16 GB HBM —
so the TPU-native design uploads it ONCE and feeds the scanned train
step from device memory.

Canonical layout is **flat** ``(N, H, W, 3)`` uint8 (round 5 revision:
the first chunked ``(C, B, ...)`` layout forced gather-mode programs to
re-flatten the whole set INSIDE every program call, which XLA
materialized as a ~7 GB copy per call at reference scale).  Flat, all
three read modes are cheap:

* chunk reads: ``lax.dynamic_slice_in_dim(flat, i*B, B)`` — a pure
  slice, measured at the elementwise floor
  (scripts/probe_resident_shuffle.py probe B);
* gather-mode shuffle reads: ``jnp.take(flat, rows, axis=0)`` on (B,)
  permuted row indices — batch-axis gathers vectorize on this platform
  (probe A, ~134 GB/s), ~6 MB extra reads per step, ZERO extra HBM;
* the optional full on-device permute ("images" mode) is one donated
  permutation+take program (transient ~2x peak on the permuted array).

Batch size is metadata (``batch_size`` field), so the freeze->unfreeze
rechunk is free.  Eval sets keep ragged tails via repeat-padding plus an
(N,) 0/1 weight vector — the same exactness contract as
``pipeline.host_local_batches(with_weights=True)``.

Sharding: the image axis is sharded over the mesh 'data' axis when it
divides (device_put rejects uneven shardings; replicated otherwise).
Note for multi-device DP: a contiguous batch slice of a block-sharded
image axis lives on one shard and is redistributed by XLA — correct,
exercised by the virtual-mesh tests and the dryrun, but the measured
production target of this path is the single chip; multi-host training
feeds per-host shards through the host pipeline instead.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def _flat_sharding(mesh, ndim, n):
    """(N, ...) with the image axis sharded over 'data' when divisible,
    replicated otherwise (shard_batch's correctness-over-placement
    fallback)."""
    if n % mesh.shape["data"] == 0:
        return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))
    return NamedSharding(mesh, P())


@dataclasses.dataclass
class ResidentSegData:
    """Flat device-resident segmentation data.

    ``images``: (N, H, W, 3) uint8, ``labels``: (N, H, W) uint8,
    ``weights``: (N,) float32 validity (eval sets; None for train).
    ``batch_size``: how the trainer reads it (metadata only).
    ``n``: number of REAL images (before padding / after tail drop).

    Mutable on purpose: :meth:`shuffle_` DONATES the previous epoch's
    buffers to the permute program (halving the transient HBM peak), so
    the object must rebind its own fields rather than hand out a copy
    whose sibling still references deleted arrays.
    """

    images: jax.Array
    labels: jax.Array
    weights: Optional[jax.Array]
    batch_size: int
    n: int
    mesh: object = dataclasses.field(repr=False)

    @property
    def num_chunks(self) -> int:
        return self.images.shape[0] // self.batch_size

    def __len__(self):  # loader-compatible: number of batches
        return self.num_chunks

    @classmethod
    def from_arrays(cls, images: np.ndarray, labels: np.ndarray,
                    batch_size: int, mesh, train: bool = True
                    ) -> "ResidentSegData":
        """Upload (N, H, W, 3)/(N, H, W) uint8 host arrays.

        ``train=True`` drops the ragged tail (BatchLoader ``drop_last``
        semantics — static shapes); ``train=False`` repeat-pads the tail
        to a full batch and carries a 0/1 weight per row so eval metrics
        stay exact (``pipeline.host_local_batches`` contract).
        """
        images = np.asarray(images)
        labels = np.asarray(labels)
        if images.dtype != np.uint8 or labels.dtype != np.uint8:
            raise ValueError("resident data must be uint8 (HBM budget)")
        n = len(images)
        if train:
            c = n // batch_size
            if c == 0:
                raise ValueError(f"dataset smaller than one batch "
                                 f"({n} < {batch_size})")
            used = c * batch_size
            images, labels, weights = images[:used], labels[:used], None
            n = used
        else:
            pad = (-n) % batch_size
            if pad:
                images = np.concatenate(
                    [images, np.repeat(images[-1:], pad, axis=0)])
                labels = np.concatenate(
                    [labels, np.repeat(labels[-1:], pad, axis=0)])
            weights = np.ones(n + pad, np.float32)
            weights[n:] = 0.0

        def put(x):
            return jax.device_put(
                x, _flat_sharding(mesh, x.ndim, len(x)))

        dev_images = put(images)
        dev_labels = put(labels)
        dev_weights = put(weights) if weights is not None else None
        return cls(dev_images, dev_labels, dev_weights, batch_size, n, mesh)

    @classmethod
    def from_dataset(cls, dataset, batch_size: int, mesh,
                     train: bool = True, log=None) -> "ResidentSegData":
        """Load a VOCSegDataset-like object fully and upload it.

        Host-side peak is one (N, H, W, 3) uint8 copy (~5.3 GB at the
        reference scale) — the device copy is the point."""
        n = len(dataset)
        im0, lb0 = dataset.load(0)
        images = np.empty((n,) + im0.shape, np.uint8)
        labels = np.empty((n,) + lb0.shape, np.uint8)
        images[0], labels[0] = im0, lb0
        for i in range(1, n):
            images[i], labels[i] = dataset.load(i)
        if log:
            log(f"resident upload: {n} images, "
                f"{(images.nbytes + labels.nbytes) / 1e9:.2f} GB")
        return cls.from_arrays(images, labels, batch_size, mesh, train=train)

    def rechunk(self, batch_size: int) -> "ResidentSegData":
        """Change the read batch size (freeze->unfreeze transition,
        train.py:531-570) — pure metadata on the flat layout, no device
        work.  The stored image count must stay full-batch coverable
        (the padded eval tail / train drop-last boundary must not move):
        len must be divisible by the new batch size."""
        total = len(self.images)
        if total % batch_size:
            raise ValueError(f"cannot rechunk {total} resident images "
                             f"to batch {batch_size}")
        return dataclasses.replace(self, batch_size=batch_size)

    def shuffle_(self, key) -> "ResidentSegData":
        """Image-level on-device reshuffle IN PLACE: one program/epoch
        (``resident_shuffle="images"``; the zero-extra-memory default is
        the trainer's gather mode, which needs no data motion at all).

        ``permutation`` + ``take`` along the image axis (batch-axis
        gather — measured at memory bandwidth by
        ``scripts/probe_resident_shuffle.py``, unlike the spatial/class
        gathers that scalarize).  Inputs are donated: the old epoch's
        arrays are freed as the new ones materialize, so the transient
        HBM peak is in+out of one array (not both).  Epochs compose —
        each shuffle permutes the previous permutation, which is still a
        uniform permutation of the original set."""
        if self.weights is not None:
            raise ValueError("shuffle is for train sets (weights=None)")
        permute = _get_permute(self.images.shape, self.labels.shape,
                               self.mesh)
        self.images, self.labels = permute(self.images, self.labels, key)
        return self


_PERMUTE_CACHE = {}


def _get_permute(im_shape, lb_shape, mesh):
    """Compile-once-per-(shape, mesh) donated permute program (a fresh
    closure per epoch would defeat the jit cache and recompile)."""
    cache_key = (im_shape, lb_shape, mesh)
    fn = _PERMUTE_CACHE.get(cache_key)
    if fn is None:
        n = im_shape[0]
        shard_im = _flat_sharding(mesh, len(im_shape), n)
        shard_lb = _flat_sharding(mesh, len(lb_shape), n)

        def permute(im, lb, k):
            perm = jax.random.permutation(k, n)
            im_p = jnp.take(im, perm, axis=0)
            lb_p = jnp.take(lb, perm, axis=0)
            return (jax.lax.with_sharding_constraint(im_p, shard_im),
                    jax.lax.with_sharding_constraint(lb_p, shard_lb))

        fn = jax.jit(permute, donate_argnums=(0, 1))
        _PERMUTE_CACHE[cache_key] = fn
    return fn
