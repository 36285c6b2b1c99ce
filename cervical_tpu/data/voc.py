"""VOC-layout segmentation dataset: index reading, host-side decode/staging,
batched iteration feeding the on-device augmentation kernel.

Reference: ``Segmentation/deeplabv3+/utils/dataloader.py`` (per-image PIL
decode + python-side augmentation in 4 worker processes) and the split txts
read in ``train.py:396-399``.

TPU-native split of responsibilities: the host only decodes JPEG/PNG and
stages fixed-shape uint8 arrays; *all* augmentation (geometric + photometric
+ normalization + one-hot) runs batched on device
(:func:`cervical_tpu.ops.augment.augment_batch`), so host work is byte
shuffling, not image math.
"""

from __future__ import annotations

import os
import threading
import queue as queue_mod
from typing import List, Optional, Sequence, Tuple

import numpy as np

from PIL import Image


def read_split(dataset_path: str, split: str) -> List[str]:
    """Read image ids from ``VOC2007/ImageSets/Segmentation/{split}.txt``."""
    p = os.path.join(dataset_path, "VOC2007", "ImageSets", "Segmentation",
                     f"{split}.txt")
    with open(p) as f:
        return [line.strip().split()[0] for line in f if line.strip()]


def cvt_rgb(img: Image.Image) -> Image.Image:
    """Coerce to 3-channel RGB (``cvtColor``, utils/utils.py:11-16)."""
    if img.mode == "RGB":
        return img
    return img.convert("RGB")


class VOCSegDataset:
    """Decode-and-stage dataset over a VOC2007 layout.

    Images are staged at a fixed ``stage_hw`` (host bilinear/nearest resize —
    identity for this dataset, whose images are natively 512x512 per the
    labelbox pipeline) so every batch has one static shape for the device
    warp.  Decoding prefers the native threaded C++ loader
    (:mod:`cervical_tpu.native`), falling back to PIL.
    """

    def __init__(self, dataset_path: str, ids: Sequence[str],
                 stage_hw: Tuple[int, int] = (512, 512),
                 use_native: bool = True):
        self.dataset_path = dataset_path
        self.ids = list(ids)
        self.stage_hw = stage_hw
        self.use_native = use_native
        self._check_stage_aspect()

    def _check_stage_aspect(self):
        """Warn once if the source aspect ratio differs from ``stage_hw``.

        Staging uses a plain resize (exact for this dataset's native 512x512
        images); for other sources it would silently stretch where the
        reference letterboxes at eval (docs/PARITY.md).  Only the first
        image's header is read (cheap)."""
        if not self.ids:
            return
        try:
            with Image.open(self.paths(0)[0]) as im:
                sw, sh = im.size
        except Exception:
            return
        h, w = self.stage_hw
        if sh * w != sw * h:
            import warnings
            warnings.warn(
                f"VOCSegDataset: source aspect {sw}x{sh} != stage "
                f"{w}x{h}; staging stretches (the reference letterboxes "
                f"only at eval/predict). Exact for same-aspect sources; "
                f"see docs/PARITY.md.", stacklevel=3)

    def __len__(self):
        return len(self.ids)

    def paths(self, idx: int) -> Tuple[str, str]:
        name = self.ids[idx]
        return (os.path.join(self.dataset_path, "VOC2007", "JPEGImages",
                             name + ".jpg"),
                os.path.join(self.dataset_path, "VOC2007",
                             "SegmentationClass", name + ".png"))

    def load(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        jpg_path, png_path = self.paths(idx)
        jpg = cvt_rgb(Image.open(jpg_path))
        png = Image.open(png_path)
        h, w = self.stage_hw
        if jpg.size != (w, h):
            jpg = jpg.resize((w, h), Image.BILINEAR)
        if png.size != (w, h):
            png = png.resize((w, h), Image.NEAREST)
        return np.asarray(jpg, np.uint8), np.asarray(png, np.uint8)

    def load_batch(self, idxs) -> Tuple[np.ndarray, np.ndarray]:
        """Decode a whole batch; native C++ path when available."""
        if self.use_native:
            from cervical_tpu import native
            if native.available():
                jpgs, pngs = zip(*(self.paths(int(i)) for i in idxs))
                imgs, lbls, failures = native.load_batch(
                    list(jpgs), list(pngs), self.stage_hw)
                if failures == 0:
                    return imgs, lbls
        h, w = self.stage_hw
        imgs = np.empty((len(idxs), h, w, 3), np.uint8)
        lbls = np.empty((len(idxs), h, w), np.uint8)
        for j, i in enumerate(idxs):
            imgs[j], lbls[j] = self.load(int(i))
        return imgs, lbls


class BatchLoader:
    """Shuffled, drop-last batch iterator with background prefetch threads.

    Replaces ``DataLoader(num_workers=4, pin_memory, drop_last, ...)``
    (train.py:507-512) with a thread pool (decode releases the GIL in PIL)
    feeding a bounded queue.
    """

    def __init__(self, dataset: VOCSegDataset, batch_size: int,
                 shuffle: bool = True, seed: int = 11, num_workers: int = 4,
                 prefetch: int = 4, drop_last: bool = True):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last

    def __len__(self):
        n = len(self.ds)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batches(self) -> List[np.ndarray]:
        order = np.arange(len(self.ds))
        if self.shuffle:
            self.rng.shuffle(order)
        nb = len(self)
        return [order[i * self.batch_size:(i + 1) * self.batch_size]
                for i in range(nb)]

    def __iter__(self):
        batches = self._batches()
        stop = threading.Event()

        load_batch = self.ds.load_batch

        if self.num_workers <= 1:
            for idxs in batches:
                yield load_batch(idxs)
            return

        # strided batch assignment: worker w produces batches w, w+W, ...;
        # per-batch single-slot queues preserve delivery order.  Backpressure
        # is PER WORKER (each may run at most 2 batches ahead of its own
        # consumed batches) rather than a shared pool: a shared semaphore can
        # deadlock — fast workers racing ahead can hold every token in
        # filled future slots while the owner of the next-needed batch is
        # parked on acquire, and the consumer (blocked on that slot) then
        # never releases.  With per-worker budgets the owner of the next
        # batch can always acquire.  Total decoded-but-unconsumed batches
        # stay bounded by 2*num_workers.  Worker exceptions (missing/corrupt
        # files) are delivered into the slot and re-raised in the consumer
        # instead of hanging it.
        out_slots = [queue_mod.Queue(maxsize=1) for _ in range(len(batches))]
        budgets = [threading.Semaphore(2) for _ in range(self.num_workers)]

        def slot_worker(worker_id):
            for bi in range(worker_id, len(batches), self.num_workers):
                budgets[worker_id].acquire()
                if stop.is_set():
                    return
                try:
                    out_slots[bi].put(load_batch(batches[bi]))
                except BaseException as e:  # deliver, don't hang the consumer
                    out_slots[bi].put(e)
                    return

        for wid in range(self.num_workers):
            threading.Thread(target=slot_worker, args=(wid,), daemon=True).start()
        try:
            for bi in range(len(batches)):
                item = out_slots[bi].get()
                budgets[bi % self.num_workers].release()
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # unblock workers parked on their budget so threads exit
            for b in budgets:
                b.release()


# ---------------------------------------------------------------------------
# Synthetic dataset (tests / smoke training, SURVEY.md §4d)
# ---------------------------------------------------------------------------

class ArraySegDataset:
    """In-memory VOCSegDataset-compatible wrapper over (N, H, W, 3)/(N, H, W)
    uint8 arrays — the feed for device-resident training at scales where a
    disk round-trip adds nothing (synthetic protocol runs, benchmarks).
    Implements the loader/`ResidentSegData.from_dataset` surface
    (``__len__``/``load``/``load_batch``); ``paths`` raises (no files)."""

    def __init__(self, images: np.ndarray, labels: np.ndarray):
        if len(images) != len(labels):
            raise ValueError("images/labels length mismatch")
        self.images = np.asarray(images, np.uint8)
        self.labels = np.asarray(labels, np.uint8)

    def __len__(self):
        return len(self.images)

    def load(self, idx: int):
        return self.images[idx], self.labels[idx]

    def load_batch(self, idxs):
        idxs = np.asarray(idxs)
        return self.images[idxs], self.labels[idxs]

    def paths(self, idx: int):
        raise NotImplementedError(
            "ArraySegDataset has no backing files (file-path consumers "
            "like PredictorMiouCallback need a disk dataset)")


def make_synthetic_voc(root: str, num_images: int = 16, size: int = 64,
                       num_classes: int = 5, seed: int = 0,
                       splits=(0.8, 0.1, 0.1)):
    """Write a synthetic VOC2007-layout dataset of colored blobs whose mask is
    recoverable from the image — so a few training steps measurably reduce
    loss.  Returns the dataset root."""
    rng = np.random.default_rng(seed)
    jdir = os.path.join(root, "VOC2007", "JPEGImages")
    sdir = os.path.join(root, "VOC2007", "SegmentationClass")
    idir = os.path.join(root, "VOC2007", "ImageSets", "Segmentation")
    for d in (jdir, sdir, idir):
        os.makedirs(d, exist_ok=True)

    palette = np.array([[0, 0, 0], [255, 255, 0], [255, 0, 0],
                        [0, 255, 0], [0, 0, 255]], np.uint8)[:num_classes]
    ids = []
    for i in range(num_images):
        mask = np.zeros((size, size), np.uint8)
        for c in range(1, num_classes):
            if rng.random() < 0.7:
                cy, cx = rng.integers(8, size - 8, 2)
                r = int(rng.integers(4, size // 4))
                yy, xx = np.ogrid[:size, :size]
                mask[(yy - cy) ** 2 + (xx - cx) ** 2 < r * r] = c
        img = palette[mask] + rng.integers(-20, 20, (size, size, 3))
        img = np.clip(img, 0, 255).astype(np.uint8)
        name = f"{i:06d}"
        Image.fromarray(img).save(os.path.join(jdir, name + ".jpg"), quality=95)
        Image.fromarray(mask).save(os.path.join(sdir, name + ".png"))
        ids.append(name)

    n_train = int(num_images * splits[0])
    n_val = max(1, int(num_images * splits[1]))
    parts = {
        "train": ids[:n_train],
        "val": ids[n_train:n_train + n_val],
        "test": ids[n_train + n_val:] or ids[-1:],
        "trainval": ids[:n_train + n_val],
    }
    for split, split_ids in parts.items():
        with open(os.path.join(idir, split + ".txt"), "w") as f:
            f.write("\n".join(split_ids) + "\n")
    return root
