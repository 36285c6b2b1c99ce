"""Device-resident dataset: the whole train/val set lives in HBM.

The reference feeds every batch host->device through a DataLoader each
step (train.py:496-512); on the target platform host uploads serialize
with compute (docs/PLATFORM.md round-2 epoch row: full ``run_epoch``
measured ~half the pure-compute step rate).  The reference train set is
small for a TPU — 6,720 x 512^2 x 3 uint8 ≈ 5.3 GB against 16 GB HBM —
so the TPU-native design uploads it ONCE and feeds the scanned train
step from device memory:

* canonical layout is **chunked** ``(C, B, H, W, 3)`` uint8 with the
  batch axis (axis 1) sharded over the mesh ``data`` axis: every
  training batch is already in its final sharded layout, and the scan
  body reads chunk ``i`` with ``lax.dynamic_index_in_dim`` — a pure
  slice on an unsharded axis, zero cross-device communication and zero
  gathers (this platform scalarizes gathers — docs/PLATFORM.md item 5);
* the per-epoch reshuffle runs **on device** as one jitted program
  (flatten -> ``jax.random.permutation`` -> ``take`` along the image
  axis -> rechunk), with inputs donated so the transient peak is
  in+out for one array at a time;
* eval sets keep ragged tails via repeat-padding plus a (C, B) 0/1
  weight array — the same exactness contract as
  ``pipeline.host_local_batches(with_weights=True)``.

``probe_resident_shuffle.py`` measures both the shuffle and the chunk
read path on the real chip; ``SegTrainConfig.resident_shuffle`` selects
image-level device shuffle, host-side chunk-order shuffle (no device
work, coarser randomness), or none.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def _chunk_sharding(mesh, ndim, batch_size):
    """(C, B, ...) with the batch axis sharded over 'data' — replicated
    when the batch doesn't divide the data axis (shard_batch's
    correctness-over-placement fallback; device_put rejects uneven
    shardings)."""
    if batch_size % mesh.shape["data"] == 0:
        return NamedSharding(mesh, P(None, "data", *([None] * (ndim - 2))))
    return NamedSharding(mesh, P())


@dataclasses.dataclass
class ResidentSegData:
    """Chunked device-resident segmentation data.

    ``images``: (C, B, H, W, 3) uint8, ``labels``: (C, B, H, W) uint8,
    ``weights``: (C, B) float32 validity (eval sets; None for train).
    ``n``: number of REAL images (before padding / after tail drop).

    Mutable on purpose: :meth:`shuffle_` DONATES the previous epoch's
    buffers to the permute program (halving the transient HBM peak), so
    the object must rebind its own fields rather than hand out a copy
    whose sibling still references deleted arrays.
    """

    images: jax.Array
    labels: jax.Array
    weights: Optional[jax.Array]
    n: int
    mesh: object = dataclasses.field(repr=False)

    @property
    def num_chunks(self) -> int:
        return self.images.shape[0]

    @property
    def batch_size(self) -> int:
        return self.images.shape[1]

    def __len__(self):  # loader-compatible: number of batches
        return self.num_chunks

    @classmethod
    def from_arrays(cls, images: np.ndarray, labels: np.ndarray,
                    batch_size: int, mesh, train: bool = True
                    ) -> "ResidentSegData":
        """Upload (N, H, W, 3)/(N, H, W) uint8 host arrays.

        ``train=True`` drops the ragged tail (BatchLoader ``drop_last``
        semantics — static shapes); ``train=False`` repeat-pads the tail
        to a full chunk and carries a 0/1 weight per row so eval metrics
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
            c = len(images) // batch_size
        def put(x):
            x = x.reshape((c, batch_size) + x.shape[1:])
            return jax.device_put(x, _chunk_sharding(mesh, x.ndim,
                                                     batch_size))

        dev_images = put(images)
        dev_labels = put(labels)
        dev_weights = put(weights) if weights is not None else None
        return cls(dev_images, dev_labels, dev_weights, n, mesh)

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
        """Re-chunk to a new batch size (freeze->unfreeze transition,
        train.py:531-570) — a jitted reshape, no host round-trip.

        Only full-chunk-preserving rechunks are supported (the padded
        eval tail and the train drop-last boundary must not move):
        C*B must be divisible by the new batch size."""
        total = self.num_chunks * self.batch_size
        if total % batch_size:
            raise ValueError(f"cannot rechunk {self.num_chunks}x"
                             f"{self.batch_size} to batch {batch_size}")
        if batch_size == self.batch_size:
            return self
        # padded eval rows sit at the very end, so a full-coverage rechunk
        # keeps them at the end; weights rechunk alongside the data
        c2 = total // batch_size

        def reshape(x):
            if x is None:
                return None
            flat = x.reshape((total,) + x.shape[2:])
            out = flat.reshape((c2, batch_size) + x.shape[2:])
            return jax.lax.with_sharding_constraint(
                out, _chunk_sharding(self.mesh, out.ndim, batch_size))

        f = jax.jit(lambda im, lb, w: (reshape(im), reshape(lb),
                                       reshape(w)))
        im, lb, w = f(self.images, self.labels, self.weights)
        return dataclasses.replace(self, images=im, labels=lb, weights=w)

    def shuffle_(self, key) -> "ResidentSegData":
        """Image-level on-device reshuffle IN PLACE: one program/epoch.

        ``permutation`` + ``take`` along the image axis (batch-axis
        gather — measured at memory bandwidth on the target platform by
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
        c, b = im_shape[0], im_shape[1]
        shard_im = _chunk_sharding(mesh, len(im_shape), b)
        shard_lb = _chunk_sharding(mesh, len(lb_shape), b)

        def permute(im, lb, k):
            perm = jax.random.permutation(k, c * b)
            flat_im = im.reshape((c * b,) + im.shape[2:])
            flat_lb = lb.reshape((c * b,) + lb.shape[2:])
            im_p = jnp.take(flat_im, perm, axis=0).reshape(im.shape)
            lb_p = jnp.take(flat_lb, perm, axis=0).reshape(lb.shape)
            return (jax.lax.with_sharding_constraint(im_p, shard_im),
                    jax.lax.with_sharding_constraint(lb_p, shard_lb))

        fn = jax.jit(permute, donate_argnums=(0, 1))
        _PERMUTE_CACHE[cache_key] = fn
    return fn
