"""Batch-1 DeepLab inference (the reference's get_FPS harness shape,
deeplab.py:211-264) under both conv lowerings, on the real TPU.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
           python scripts/bench_predict.py [lax|einsum ...] [--backbone xception]

Platform rules: inputs vary per timed call (the tunnel result-caches
identical executions), completion forced by a dependent scalar fetch.
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def bench(backend, backbone="xception", batch=1, size=512, iters=20,
          warmup=5):
    from cervical_tpu.ops import conv as C
    from cervical_tpu.config import SegTrainConfig, SegDataConfig
    from cervical_tpu.train import seg_trainer as T

    C.set_default_backend(backend)
    cfg = SegTrainConfig(data=SegDataConfig(input_shape=(size, size),
                                            num_classes=5),
                         backbone=backbone)
    state = T.create_state(cfg, jax.random.PRNGKey(0))
    model = T.build_model(cfg)

    @jax.jit
    def fwd(x):
        logits = model.apply({"params": state.params,
                              "batch_stats": state.batch_stats},
                             x, train=False)
        return jax.nn.softmax(logits, axis=-1)

    xs = [jax.random.normal(k, (batch, size, size, 3), jnp.bfloat16)
          for k in jax.random.split(jax.random.PRNGKey(1), 16)]
    t0 = time.perf_counter()
    out = fwd(xs[0])
    _ = float(out[0, 0, 0, 0])
    compile_s = time.perf_counter() - t0
    for i in range(warmup):
        out = fwd(xs[(i + 1) % 16])
    _ = float(out[0, 0, 0, 0])
    t0 = time.perf_counter()
    for i in range(iters):
        out = fwd(xs[i % 16])
    _ = float(out.sum())
    dt = (time.perf_counter() - t0) / iters
    return dt, compile_s


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    backbone, batch = "xception", 1
    for a in sys.argv[1:]:
        if a.startswith("--backbone"):
            backbone = a.split("=", 1)[1]
        if a.startswith("--batch"):
            batch = int(a.split("=", 1)[1])
    for backend in (args or ["lax", "einsum"]):
        dt, compile_s = bench(backend, backbone, batch=batch)
        print(json.dumps({"backend": backend, "backbone": backbone,
                          "batch": batch,
                          "ms_per_image": round(dt * 1e3 / batch, 2),
                          "fps": round(batch / dt, 1),
                          "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
