"""DeepLab inference under both conv lowerings, on the real TPU.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
           python scripts/bench_predict.py [lax|einsum ...] \
               [--backbone=xception] [--batch=1]

Batch 1 is the reference get_FPS harness shape (deeplab.py:211-264).
Measurement rules (unique input per dispatch, dependent-fetch forcing)
come from scripts/_bench_util.py.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _bench_util import input_stream, timed  # noqa: E402


def bench(backend, backbone="xception", batch=1, size=512, iters=20,
          warmup=5, seed=0):
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

    xs = input_stream((batch, size, size, 3), jnp.bfloat16,
                      1 + warmup + iters, seed=seed)
    t0 = time.perf_counter()
    out = fwd(xs(0))
    _ = float(out[0, 0, 0, 0])
    compile_s = time.perf_counter() - t0
    dt, _ = timed(fwd, lambda i: (xs(i),), iters=iters, warmup=warmup)
    return dt, compile_s


def main():
    backends, backbone, batch = [], "xception", 1
    for a in sys.argv[1:]:
        if a.startswith("--backbone"):
            backbone = a.split("=", 1)[1] if "=" in a else sys.exit(
                "use --backbone=NAME")
        elif a.startswith("--batch"):
            batch = int(a.split("=", 1)[1]) if "=" in a else sys.exit(
                "use --batch=N")
        else:
            backends.append(a)
    for run, backend in enumerate(backends or ["lax", "einsum"]):
        # distinct seed per run: repeated variants must not replay inputs
        # the tunnel has already seen (result-cache rule, _bench_util)
        dt, compile_s = bench(backend, backbone, batch=batch,
                              seed=1000 + run)
        print(json.dumps({"backend": backend, "backbone": backbone,
                          "batch": batch,
                          "ms_per_image": round(dt * 1e3 / batch, 2),
                          "fps": round(batch / dt, 1),
                          "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
