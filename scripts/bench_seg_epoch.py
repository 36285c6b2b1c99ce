"""Epoch-level train throughput: host-fed loader vs device-resident data.

The round-2 measurement (docs/PLATFORM.md) showed the full ``run_epoch``
loop delivering ~half the pure-compute step rate — host uploads serialize
with compute on this platform.  Round 5 adds the device-resident path
(data/resident.py: dataset lives in HBM, per-epoch on-device shuffle,
scan programs read chunks by index), which removes the per-step upload
entirely.  This script ABAB-compares, in ONE process (fresh-process
warm-up rule, docs/PLATFORM.md item 9):

  host@K   full run_epoch over an in-memory host loader (upload per step)
  res@K    full run_epoch over ResidentSegData (per-epoch on-device
           full-permute image shuffle — 2x transient HBM)
  resg@K   resident with GATHER-mode shuffle (scan body fetches rows by
           permuted index; zero extra HBM — the production default)
  resc@K   resident with chunk-order shuffle only (no device shuffle)
  pure@K   compute-only bound: pre-uploaded stacked groups, direct
           scan_fn calls, no loader/upload/eval

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    python scripts/bench_seg_epoch.py [--backbone=xception] [--nb=40] \
        [--size=512] [--batch=8] [spec ...]
Default specs: host@8 res@8 host@8 res@8 pure@8
"""

import json
import sys
import time

import numpy as np
import jax


class _ArrayLoader:
    """Batch iterator over in-memory arrays (stands in for BatchLoader)."""

    def __init__(self, images, labels, batch):
        self.images, self.labels, self.batch = images, labels, batch

    def __iter__(self):
        for i in range(0, len(self.images), self.batch):
            yield (self.images[i:i + self.batch],
                   self.labels[i:i + self.batch])

    def __len__(self):
        return len(self.images) // self.batch


def main():
    from cervical_tpu.config import SegTrainConfig, SegDataConfig
    from cervical_tpu.data.resident import ResidentSegData
    from cervical_tpu.train.seg_trainer import SegTrainer

    backbone, nb, size, batch = "xception", 40, 512, 8
    specs = []
    for a in sys.argv[1:]:
        if a.startswith("--backbone="):
            backbone = a.split("=", 1)[1]
        elif a.startswith("--nb="):
            nb = int(a.split("=", 1)[1])
        elif a.startswith("--size="):
            size = int(a.split("=", 1)[1])
        elif a.startswith("--batch="):
            batch = int(a.split("=", 1)[1])
        else:
            mode, _, k = a.partition("@")
            specs.append((mode, int(k) if k else 8))
    if not specs:
        specs = [("host", 8), ("res", 8), ("host", 8), ("res", 8),
                 ("pure", 8)]

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (batch * nb, size, size, 3)).astype(np.uint8)
    lbls = rng.integers(0, 5, (batch * nb, size, size)).astype(np.uint8)
    # tiny val so the measurement is the train loop
    val = _ArrayLoader(imgs[:batch], lbls[:batch], batch)
    train = _ArrayLoader(imgs, lbls, batch)

    cfg = SegTrainConfig(data=SegDataConfig(input_shape=(size, size),
                                            num_classes=5),
                         backbone=backbone, unfreeze_batch_size=batch)
    trainer = SegTrainer(cfg)
    n_img = batch * nb

    resident = {}

    def get_resident(shuffle_mode):
        if "train" not in resident:
            resident["train"] = ResidentSegData.from_arrays(
                imgs, lbls, batch, trainer.mesh, train=True)
            resident["val"] = ResidentSegData.from_arrays(
                imgs[:batch], lbls[:batch], batch, trainer.mesh,
                train=False)
        return resident["train"], resident["val"]

    def pure_epoch(k, seed):
        from cervical_tpu.parallel import shard_batch
        import jax.numpy as jnp
        scan_fn = trainer._train_step_scan(frozen=False, k=k)
        groups = []
        for g in range(nb // k):
            sl = slice(g * k * batch, (g + 1) * k * batch)
            groups.append(shard_batch(
                trainer.mesh,
                (imgs[sl].reshape(k, batch, size, size, 3),
                 lbls[sl].reshape(k, batch, size, size)), batch_axis=1))
        for im, lb in groups:  # warm the upload
            im.block_until_ready()
        t0 = time.perf_counter()
        ms = []
        for j, (im, lb) in enumerate(groups):
            key = jax.random.PRNGKey(seed * 1000 + j)
            trainer.state, m = scan_fn(trainer.state, im, lb,
                                       jnp.float32(1e-4), key)
            ms.append(m)
        loss = float(np.mean([np.asarray(m["loss"]).mean() for m in ms]))
        return time.perf_counter() - t0, loss

    warmed = set()
    for i, (mode, k) in enumerate(specs):
        trainer.cfg.pipeline_depth = 8
        trainer.cfg.steps_per_call = k
        if mode == "pure":
            if ("pure", k) not in warmed:
                pure_epoch(k, 999)  # compile+warm
                warmed.add(("pure", k))
            dt, loss = pure_epoch(k, i + 1)
            row = {"mode": "pure", "steps_per_call": k}
        elif mode == "host":
            if ("host", k) not in warmed:
                trainer.run_epoch(train, val, 0, frozen=False, lr=1e-4)
                warmed.add(("host", k))
            t0 = time.perf_counter()
            res = trainer.run_epoch(train, val, i + 1, frozen=False,
                                    lr=1e-4)
            dt, loss = time.perf_counter() - t0, res.train_loss
            row = {"mode": "host", "steps_per_call": k}
        elif mode in ("res", "resc", "resg"):
            trainer.cfg.resident_shuffle = {"res": "images",
                                            "resc": "chunks",
                                            "resg": "gather"}[mode]
            train_rs, val_rs = get_resident(trainer.cfg.resident_shuffle)
            if (mode, k) not in warmed:
                trainer.run_epoch(train_rs, val_rs, 0, frozen=False,
                                  lr=1e-4)
                warmed.add((mode, k))
            t0 = time.perf_counter()
            res = trainer.run_epoch(train_rs, val_rs, i + 1, frozen=False,
                                    lr=1e-4)
            dt, loss = time.perf_counter() - t0, res.train_loss
            row = {"mode": mode, "steps_per_call": k,
                   "shuffle": trainer.cfg.resident_shuffle}
        else:
            raise SystemExit(f"unknown mode {mode!r}")
        row.update(backbone=backbone, batch=batch, n_images=n_img,
                   epoch_s=round(dt, 3),
                   train_img_per_s=round(n_img / dt, 1),
                   loss=round(float(loss), 4))
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
