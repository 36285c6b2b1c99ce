"""Offline graph-featurization throughput on the real TPU.

The reference featurizes 1,758 patients x 3 modalities x 16 patches of
256² through ResNet101 one patch at a time (Graph_Structure:164-283).
This measures the batched rebuild (data/graphs.py::PatchFeaturizer).

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
           python scripts/bench_featurize.py [--batch=64]
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _bench_util import timed  # noqa: E402


def main():
    batch = 64  # patches per dispatch (= 4 images)
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            batch = int(a.split("=", 1)[1])
    from cervical_tpu.data.graphs import PatchFeaturizer

    f = PatchFeaturizer(depth=101)
    rng = np.random.default_rng(0)
    n = 15  # 1 compile + 4 warmup + 10 timed, all distinct
    xs = [jnp.asarray(rng.integers(0, 256, (batch, 256, 256, 3)), jnp.uint8)
          for _ in range(n)]

    def fwd(x):
        v = {"params": f.params, "batch_stats": f.batch_stats}
        return f._fwd(v, f._pre(x))

    t0 = time.perf_counter()
    dt, _ = timed(fwd, lambda i: (xs[i],))
    wall = time.perf_counter() - t0
    patches_per_s = batch / dt
    # full-cohort projection: 1758 patients x 3 modalities x 16 patches
    total = 1758 * 3 * 16
    print(json.dumps({
        "batch": batch,
        "patches_per_sec": round(patches_per_s, 1),
        "images_per_sec": round(patches_per_s / 16, 1),
        "full_cohort_seconds": round(total / patches_per_s, 1),
        "wall_incl_compile_s": round(wall, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
