"""Epoch-loop pipelining A/B: per-step metric fetch vs windowed fetch.

``SegTrainer.run_epoch`` keeps up to ``cfg.pipeline_depth`` steps in flight
before fetching the oldest step's metrics; the per-call dispatch round-trip
on this platform is ~30-70 ms (docs/PLATFORM.md), so a depth-1 loop (the
torch ``.item()``-per-step pattern, utils_fit.py:117-121) serializes that
cost into every step.  This measures whole epochs over an in-memory loader
— same compiled step, ABAB-interleaved depths, fresh PRNG-derived batches
each epoch (tunnel result-cache rule).

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    python scripts/bench_seg_epoch.py [depth ...]   (default: 1 8 1 8)
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
    from cervical_tpu.train.seg_trainer import SegTrainer

    # arg "8@4" = pipeline_depth 8, steps_per_call 4 (K-step scan);
    # "pure@4" = compute-only bound: pre-uploaded stacked groups, direct
    # scan_fn calls, no loader/upload/eval — isolates pipeline overhead
    specs = []
    for a in (sys.argv[1:] or ["1", "8", "1", "8"]):
        d, _, k = a.partition("@")
        specs.append((d if d == "pure" else int(d), int(k) if k else 1))
    batch, nb, size = 8, 12, 512
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (batch * nb, size, size, 3)).astype(np.uint8)
    lbls = rng.integers(0, 5, (batch * nb, size, size)).astype(np.uint8)
    # tiny val so the measurement is the train loop
    val = _ArrayLoader(imgs[:batch], lbls[:batch], batch)
    train = _ArrayLoader(imgs, lbls, batch)

    cfg = SegTrainConfig(data=SegDataConfig(input_shape=(size, size),
                                            num_classes=5),
                         backbone="mobilenet", unfreeze_batch_size=batch)
    trainer = SegTrainer(cfg)
    trainer.run_epoch(train, val, 0, frozen=False, lr=1e-4)  # compile+warm

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

    for i, (depth, k) in enumerate(specs):
        if depth == "pure":
            dt, loss = pure_epoch(k, i + 1)
            print(json.dumps({"depth": "pure", "steps_per_call": k,
                              "epoch_s": round(dt, 3),
                              "train_img_per_s": round(batch * nb / dt, 1),
                              "loss": round(loss, 4)}), flush=True)
            continue
        trainer.cfg.pipeline_depth = depth
        trainer.cfg.steps_per_call = k
        # advance trainer.rng per epoch -> unique aug params, no replay
        t0 = time.perf_counter()
        res = trainer.run_epoch(train, val, i + 1, frozen=False, lr=1e-4)
        dt = time.perf_counter() - t0
        print(json.dumps({"depth": depth, "steps_per_call": k,
                          "epoch_s": round(dt, 3),
                          "train_img_per_s": round(batch * nb / dt, 1),
                          "loss": round(res.train_loss, 4)}), flush=True)


if __name__ == "__main__":
    main()
