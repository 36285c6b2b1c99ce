"""The eval loop (`evaluate_miou`) at production scale, on the real TPU.

VERDICT r4 task #4: the eval loop had never been profiled on a platform
whose whole round-4 story was scalarized indexed access — and its
confusion accumulation was an ``.at[idx].add`` scatter.  Round 5 made the
confusion matrix a one-hot MXU contraction (metrics.confusion_matrix_jax;
the scatter survives as ``confusion_matrix_scatter`` for this A/B) and
added the device-resident eval scan.  Modes, ABAB in one process:

  host         evaluate_miou over a host loader (per-batch upload+program)
  res          evaluate_miou over ResidentSegData (scanned eval programs)
  res-scatter  resident eval with the old scatter confusion formulation

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    python scripts/bench_eval_loop.py [--n=840] [--batch=8] [--size=512] \
        [mode ...]      (default: host res host res res-scatter res)
"""

import json
import sys
import time

import numpy as np
import jax


class _ArrayLoader:
    def __init__(self, images, labels, batch):
        self.images, self.labels, self.batch = images, labels, batch

    def __iter__(self):
        for i in range(0, len(self.images), self.batch):
            yield (self.images[i:i + self.batch],
                   self.labels[i:i + self.batch])

    def __len__(self):
        return -(-len(self.images) // self.batch)


def main():
    from cervical_tpu.config import SegTrainConfig, SegDataConfig
    from cervical_tpu.data.resident import ResidentSegData
    from cervical_tpu.train import seg_trainer as T
    from cervical_tpu import metrics as M

    n, batch, size, backbone = 840, 8, 512, "xception"
    modes = []
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=", 1)[1])
        elif a.startswith("--batch="):
            batch = int(a.split("=", 1)[1])
        elif a.startswith("--size="):
            size = int(a.split("=", 1)[1])
        elif a.startswith("--backbone="):
            backbone = a.split("=", 1)[1]
        else:
            modes.append(a)
    if not modes:
        modes = ["host", "res", "host", "res", "res-scatter", "res"]

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (n, size, size, 3)).astype(np.uint8)
    lbls = rng.integers(0, 5, (n, size, size)).astype(np.uint8)

    cfg = SegTrainConfig(data=SegDataConfig(input_shape=(size, size),
                                            num_classes=5),
                         backbone=backbone, eval_batch_size=batch)
    loader = _ArrayLoader(imgs, lbls, batch)

    matmul_conf = M.confusion_matrix_jax
    scatter_conf = M.confusion_matrix_scatter
    # one trainer per confusion formulation: the eval-step closures
    # capture seg_trainer's module-level confusion_matrix_jax at TRACE
    # time, and keeping both trainers alive keeps both compiled programs
    # warm (a per-switch rebuild would pay minutes of remote compile)
    trainers, resident = {}, {}
    warmed = set()

    def run(mode):
        form = "scatter" if mode == "res-scatter" else "matmul"
        T.confusion_matrix_jax = (scatter_conf if form == "scatter"
                                  else matmul_conf)
        if form not in trainers:
            trainers[form] = T.SegTrainer(cfg)
            resident[form] = ResidentSegData.from_arrays(
                imgs, lbls, batch, trainers[form].mesh, train=False)
        tr = trainers[form]
        if mode == "host":
            return tr.evaluate_miou(loader)
        return tr.evaluate_miou(resident[form])

    for i, mode in enumerate(modes):
        if mode not in warmed:
            run(mode)  # compile+warm this mode's programs
            warmed.add(mode)
        t0 = time.perf_counter()
        out = run(mode)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "mode": mode, "n": n, "batch": batch, "backbone": backbone,
            "eval_s": round(dt, 3),
            "img_per_s": round(n / dt, 1),
            "ms_per_image": round(1e3 * dt / n, 3),
            "miou": round(float(out["miou"]), 4)}), flush=True)


if __name__ == "__main__":
    main()
